"""Shared time arithmetic for the window operators.

One definition of "seconds between two points of column dtype X" so
gaps / rate / asof cannot drift: timestamps (including TIMESTAMP_NTZ —
the ``.cast("timestamp")`` folds NTZ into ``unix_micros``' domain under
the repo-wide UTC session convention, plans/session.py) difference as
exact integer microseconds divided by 1e6; numeric columns as a plain
double difference in raw units.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["seconds_between"]


def seconds_between(a: Column, b: Column, t_dtype: str) -> Column:
    """``a - b`` in seconds (``t_dtype`` = the column's Spark simpleString)."""
    if t_dtype.startswith("timestamp"):
        return (
            F.unix_micros(a.cast("timestamp")) - F.unix_micros(b.cast("timestamp"))
        ) / F.lit(1_000_000.0)
    return (a - b).cast("double")
