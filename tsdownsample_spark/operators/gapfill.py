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
    max_buckets: int | None = 10_000_000,
) -> DataFrame:
    """Densify ``df`` onto a regular ``every`` grid per group and fill.

    The grid spans [min(x), max(x)] *per series* (no fabricated data outside
    the observed range, matching the reference's bin domain [x0, xn]).

    ``max_buckets`` guards the grid explode against the degenerate-span
    class of failure (the interval_join auto-chunk lesson): ONE corrupt
    timestamp — an epoch-0 row, a year-9999 typo — stretches a series'
    [min, max] span so a minute grid is billions of rows, and the
    ``sequence()`` array OOMs the executor before any output is wrong.
    A series whose span/step exceeds the cap fails loudly IN-PLAN
    (``raise_error`` names the series' span — no extra validation job)
    instead; pass ``None`` to disable.  For calendar intervals (months,
    years) the step length used by the guard is evaluated at epoch — an
    approximation that is order-of-magnitude right, which is all a
    blow-up guard needs.
    """
    if strategy not in ("null", "zero", "locf", "linear"):
        raise ValueError(f"unknown strategy {strategy!r}")
    by = list(by)
    spans = df.groupBy(*by).agg(
        F.min(x_col).alias("_t0"), F.max(x_col).alias("_t1")
    )
    if max_buckets is not None:
        # Step length as a DIFFERENCE of two unix_micros so the session-
        # timezone offset of the epoch literal cancels: unix_micros(base)
        # is only 0 in UTC sessions, and a bare unix_micros(base + step)
        # would under- (or negatively) estimate the step east of UTC,
        # silently disarming this guard.
        _base = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
        step_us = F.unix_micros(_base + F.expr(f"INTERVAL {every}")) - F.unix_micros(
            _base
        )
        n_buckets = (
            (F.unix_micros(F.col("_t1")) - F.unix_micros(F.col("_t0")))
            / step_us
        ) + F.lit(1)
        # The guard is a standalone FILTER on the per-series span rows, not
        # a CASE wrapped around the sequence or its end bound: wrapping the
        # generator's input makes it (and the exploded x column) NULLABLE,
        # taxing every downstream grid row.  A filter evaluates once per
        # SERIES, leaves the generator/join-key types untouched, and cannot
        # be pruned (the predicate raises), keeping failure semantics
        # in-plan and identical.  Measured cost of this form: 1.003x vs no
        # guard in a randomized-order interleaved A/B — i.e. free (earlier
        # 1.2-1.4x readings were fixed-order harness bias; see
        # BENCH/BASELINE.md "Post-fix adjudication").
        spans = spans.where(
            F.when(n_buckets <= F.lit(int(max_buckets)), F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"gap_fill: a series' grid would exceed max_buckets="
                            f"{int(max_buckets)} at every='{every}' (span "
                        ),
                        F.col("_t0").cast("string"),
                        F.lit(" .. "),
                        F.col("_t1").cast("string"),
                        F.lit(
                            "); a single corrupt timestamp stretches the span — "
                            "clean the series or raise max_buckets"
                        ),
                    ).cast("string")
                ).cast("boolean")
            )
        )
    seq = F.sequence("_t0", "_t1", F.expr(f"INTERVAL {every}"))
    grid = spans.select(*by, F.explode(seq).alias(x_col))
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
