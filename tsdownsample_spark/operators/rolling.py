"""Trailing time-RANGE rolling statistics: per-series aggregates over
the last ``duration`` of WALL TIME ending at each observation — the
"requests in the last 5 minutes" / "rolling 1-hour mean" primitive.

The ROWS-frame detectors (operators/anomaly.py) hold the SAMPLE size
fixed; under irregular sampling their time horizon stretches and
shrinks.  This operator holds the TIME horizon fixed instead — the shape
monitoring SLOs and rate limits are defined in.  A RANGE frame is also
tie-proof by construction: all peers sharing a timestamp land in every
frame that includes that instant, so no tiebreak column is needed and
the result is deterministic under duplicate timestamps (reference
parity note: tsdownsample's kernels are pure index-space and have no
time-window notion — this is engine surface layered on the same
per-series model as rate.py/gaps.py).

Scale shape: ONE shuffle on the series key, no UDF, no join.  Spark
evaluates a sliding RANGE frame with two ordered cursors per partition
(frame endpoints only move forward), so cost is O(n + total frame
overlap) per series — at 100 TB the plan is a single window stage whose
parallelism is the series-key cardinality, same as rollup/rate.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_time_stats", "duration_to_micros"]

_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def duration_to_micros(duration: str) -> int:
    """Parse ``"5 minutes"`` / ``"1 hour"`` / ``"30 seconds"`` into exact
    integer microseconds.  Fixed-length units only — months/years are
    calendar arithmetic, which a linear RANGE frame cannot express."""
    m = re.fullmatch(
        r"\s*(\d+)\s*(microsecond|millisecond|second|minute|hour|day)s?\s*",
        str(duration).lower(),
    )
    if not m:
        raise ValueError(
            f"unsupported duration {duration!r}: expected '<n> "
            "<microsecond|millisecond|second|minute|hour|day>[s]'"
        )
    n = int(m.group(1))
    if n <= 0:
        raise ValueError(f"duration must be positive, got {duration!r}")
    return n * _UNIT_US[m.group(2)]


def rolling_time_stats(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    duration: str = "5 minutes",
    min_obs: int = 1,
    include_current: bool = True,
) -> DataFrame:
    """Append ``roll_n``, ``roll_sum``, ``roll_mean``, ``roll_min``,
    ``roll_max``, ``roll_std`` over the trailing ``[t - duration, t]``
    frame of each row's series.

    ``include_current=False`` shifts the frame to ``[t - duration, t)``
    (strictly earlier observations, at microsecond resolution) — the
    self-exclusive form detectors want; note it also excludes PEERS at
    the exact same timestamp, which is what makes it deterministic.

    Aggregates with fewer than ``min_obs`` non-null observations are
    NULL (``roll_n`` itself always reports the true count).  ``roll_std``
    is sample stddev and NULL for single-point frames.  NULL ``y`` rows
    get a frame score like any other row but contribute nothing to any
    aggregate.  ``x_col`` may be a timestamp (trailing window in wall
    time, exact integer-microsecond arithmetic) or numeric (``duration``
    then must be a plain number string, in the column's own units).
    """
    if min_obs < 1:
        raise ValueError(f"min_obs must be >= 1, got {min_obs}")
    by = list(by)
    t_dtype = dict(df.dtypes)[x_col]
    if t_dtype.startswith("timestamp"):
        order = F.unix_micros(F.col(x_col).cast("timestamp"))
        span = duration_to_micros(duration)
    else:
        order = F.col(x_col).cast("double")
        span = float(duration)
        if span <= 0:
            raise ValueError(f"duration must be positive, got {duration!r}")
        if span != int(span):
            # the pyspark Window API only takes integer frame bounds;
            # rescale the x axis upstream for sub-unit spans
            raise ValueError(
                f"numeric x_col needs an integral duration, got {duration!r}"
            )
        span = int(span)
    hi = 0 if include_current else -1
    w = Window.partitionBy(*by).orderBy(order).rangeBetween(-span, hi)

    y = F.col(y_col).cast("double")
    n = F.count(y).over(w)
    gate = lambda c: F.when(n >= min_obs, c)  # noqa: E731
    return (
        df.withColumn("roll_n", n)
        .withColumn("roll_sum", gate(F.sum(y).over(w)))
        .withColumn("roll_mean", gate(F.avg(y).over(w)))
        .withColumn("roll_min", gate(F.min(y).over(w)))
        .withColumn("roll_max", gate(F.max(y).over(w)))
        .withColumn("roll_std", gate(F.stddev_samp(y).over(w)))
    )
