"""Gap-fill: densify per-series time grids and fill missing buckets.

The reference's *inverse* behavior: its equidistant binning silently emits
nothing for empty bins (downsample_rs/src/searchsorted.rs:118-122); gap-fill
re-materializes those empty buckets on a regular grid.

Spark-first: the grid is generated JVM-side with ``sequence()`` + explode
(no UDF), joined back to the data per series key.  The join is a left join
on (keys, bucket_ts); with the tier table pre-aggregated the grid side is
small and AQE picks a broadcast where appropriate.

Strategies:
* ``null``  — missing buckets present with NULL values;
* ``zero``  — fill 0;
* ``locf``  — last observation carried forward (window ``last(...,
  ignorenulls)`` ordered by bucket_ts);
* ``linear`` — linear interpolation between the previous and next present
  values (window-based, no UDF).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    every: str = "1 minute",
    x_col: str = "bucket_ts",
    by: Sequence[str] = ("series_key",),
    value_cols: Sequence[str] = ("agg_avg",),
    strategy: str = "null",
) -> DataFrame:
    """Densify ``df`` onto a regular ``every`` grid per group and fill.

    The grid spans [min(x), max(x)] *per series* (no fabricated data outside
    the observed range, matching the reference's bin domain [x0, xn]).
    """
    if strategy not in ("null", "zero", "locf", "linear"):
        raise ValueError(f"unknown strategy {strategy!r}")
    by = list(by)
    grid = (
        df.groupBy(*by)
        .agg(F.min(x_col).alias("_t0"), F.max(x_col).alias("_t1"))
        .select(
            *by,
            F.explode(
                F.sequence("_t0", "_t1", F.expr(f"INTERVAL {every}"))
            ).alias(x_col),
        )
    )
    filled = grid.join(df, on=by + [x_col], how="left").withColumn(
        "is_gap", F.col(value_cols[0]).isNull()
    )
    if strategy == "zero":
        for c in value_cols:
            filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    elif strategy == "locf":
        w = (
            Window.partitionBy(*by)
            .orderBy(x_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in value_cols:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif strategy == "linear":
        wb = (
            Window.partitionBy(*by)
            .orderBy(x_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # forward-looking values via a DESCENDING running frame: Spark's
        # (currentRow, unboundedFollowing) frame is O(n^2) per partition
        # (it rescans forward for every row); last() over the reversed
        # order with a running frame is the O(n) equivalent.
        wf = (
            Window.partitionBy(*by)
            .orderBy(F.desc(x_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ts_long = F.col(x_col).cast("double")
        for c in value_cols:
            prev_v = F.last(c, ignorenulls=True).over(wb)
            next_v = F.last(c, ignorenulls=True).over(wf)
            prev_t = F.last(
                F.when(F.col(c).isNotNull(), ts_long), ignorenulls=True
            ).over(wb)
            next_t = F.last(
                F.when(F.col(c).isNotNull(), ts_long), ignorenulls=True
            ).over(wf)
            interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                F.when(prev_v.isNull(), next_v)
                .when(next_v.isNull(), prev_v)
                .otherwise(
                    prev_v
                    + (next_v - prev_v) * (ts_long - prev_t) / (next_t - prev_t)
                )
            )
            filled = filled.withColumn(c, interp)
    return filled
