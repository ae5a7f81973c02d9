"""Counter-rate and time-weighted-average — the monitoring-side rollups
(PromQL ``rate``/``increase``, TimescaleDB ``time_weight``) that complete
the retention layer's aggregate family.

The reference is a kernel library with no aggregate semantics; these are
part of the "rollup + retention engine" surface BASELINE.json's north rule
mandates.  Both are pure window/groupBy expressions — no UDF, one shuffle
on the series key (none on a key-bucketed source), O(1) running state.

Float determinism: ``counter_rate`` emits per-row arithmetic only
(lag-subtract, divide) — bit-exact across engines, so its contract query
hash-matches unrounded.  ``time_weighted_avg`` contains an order-sensitive
SUM fold; its contract query rounds to 6 decimals, the same convention the
rollup-tier sums use (queries._oracle_rollup).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsdownsample_spark.operators.rollup import TIER_UNITS
from tsdownsample_spark.operators.timeutil import seconds_between as _seconds

__all__ = ["counter_rate", "time_weighted_avg"]


def counter_rate(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    tiebreak: Sequence[str] = (),
    handle_resets: bool = True,
) -> DataFrame:
    """Per-point increase and per-second rate of a (possibly resetting)
    monotone counter — PromQL ``increase``/``rate`` semantics at point
    granularity.

    ``delta`` = value - lag(value); if ``handle_resets`` and the delta is
    negative (the counter restarted from ~0), the raw value is taken as the
    increase, exactly like Prometheus' reset rule.  ``rate_s`` = delta /
    seconds-since-previous; NULL for each series' first point and for
    zero/negative time steps (duplicate timestamps never divide).

    ``tiebreak`` columns make the previous-row choice deterministic under
    duplicate ``x_col`` — pass a unique id (the contract query uses
    event_id) whenever timestamps can collide.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(x_col, *tiebreak)
    prev_v = F.lag(y_col).over(w)
    prev_t = F.lag(x_col).over(w)
    raw_delta = F.col(y_col) - prev_v
    delta = (
        F.when(raw_delta < 0, F.col(y_col)).otherwise(raw_delta)
        if handle_resets
        else raw_delta
    )
    dt = _seconds(F.col(x_col), prev_t, dict(df.dtypes)[x_col])
    return df.select(
        *by,
        F.col(x_col),
        F.col(y_col),
        delta.alias("delta"),
        F.when(dt > 0, delta / dt).alias("rate_s"),
    )


def time_weighted_avg(
    df: DataFrame,
    tier: str = "1h",
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Time-weighted average per (keys, bucket): each point weighted by its
    holding time (the gap to the NEXT point in the same bucket, LOCF
    semantics).  The bucket's last point carries no weight — intervals that
    cross bucket edges are attributed to neither side rather than split
    (documented simplification; buckets with a single point yield NULL
    rather than pretending a weight exists).

    Irregular sampling is the whole point: a plain AVG over-counts bursts;
    this weights by time in force, like TimescaleDB's ``time_weight('locf')``.

    Output: ``by + bucket_ts + twa + w_s`` (total weighted seconds).
    """
    by = list(by)
    unit = TIER_UNITS[tier]
    bucket = F.date_trunc(unit, F.col(x_col))
    w = Window.partitionBy(*by, bucket).orderBy(x_col, *tiebreak)
    nxt = F.lead(x_col).over(w)
    dt = _seconds(nxt, F.col(x_col), dict(df.dtypes)[x_col])
    weighted = df.select(
        *by,
        bucket.alias("bucket_ts"),
        F.col(y_col).alias("_v"),
        dt.alias("_dt"),
    )
    return weighted.groupBy(*by, "bucket_ts").agg(
        (F.sum(F.col("_v") * F.col("_dt")) / F.sum("_dt")).alias("twa"),
        F.sum("_dt").alias("w_s"),
    )
