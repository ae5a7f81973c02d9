"""Heavy hitters: exact top-k most frequent values of a column per group.

A 100 TB training-data pipeline asks this constantly — most frequent
tokens / n-grams / domains / fingerprints per source or language — and it
is the corpus-statistics dual of the dedup family (operators/dedup.py
finds repeated DOCUMENTS; this finds repeated VALUES).

Spark-first shape, two stages both of which Catalyst executes with
map-side partial aggregation:

1. ``groupBy(by + value).count()`` — the heavy stage.  Whole-stage
   codegen hash aggregation with partial combine, so each executor ships
   one row per DISTINCT (group, value) it saw, not one per occurrence;
   the shuffle volume is the distinct cardinality, not the corpus size.
2. ``row_number`` over ``partitionBy(by).orderBy(count desc, value asc)``
   filtered to ``<= k`` — runs on the (already aggregated) distinct rows
   only.  The deterministic value tiebreak makes top-k reproducible under
   ties, which the DuckDB oracle requires and a re-run audit appreciates.

For group cardinalities so hot that even distinct values of one group
overwhelm a partition (the Zipf head of a web corpus), AQE's skew
handling splits stage 1; stage 2's window is bounded by distinct values
per group.  An approximate path (count-min / ``freqItems``) deliberately
does not live here: the exact form is oracle-checkable and the partial
agg already removes the scale pressure the sketch would address.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def heavy_hitters(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    k: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-``k`` most frequent ``col`` values per ``by`` group.

    Returns ``by + [col, freq, rank]`` with ``rank`` 1-based in frequency
    order (ties broken by ascending value — deterministic).  ``weight_col``
    switches from row counting to summing a weight (e.g. ``n_tok`` to rank
    by token mass instead of document count); NULL weights count as 0 via
    sum semantics, NULL values of ``col`` are dropped (a "most frequent
    NULL" is a data-quality question, not a frequency one).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    by = list(by)
    for c in ("freq", "rank"):
        if c in (*by, col):
            raise ValueError(f"reserved output column name {c!r} in input")
    freq = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).alias("freq")
    counts = (
        df.where(F.col(col).isNotNull()).groupBy(*by, col).agg(freq)
    )
    w = Window.partitionBy(*by).orderBy(F.col("freq").desc(), F.col(col).asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
