"""Structured Streaming ingestion into the retention-tier shape.

The batch cascade (operators/rollup.py) is the system of record; this module
covers the *live edge*: a file/Kafka stream of points rolled into the same
1m-tier schema with event-time windows + watermarked late-data handling,
so a streaming writer can feed the raw tier continuously and the batch
cascade picks up from there.

The aggregate set matches rollup_raw minus first/last-by-uid (streaming
state keeps min/max timestamps; exact arrival-order first/last values are a
batch concern), and ``window(ts, '1 minute')`` produces the same bucket
boundaries as ``date_trunc('minute', ts)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_WINDOW = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def stream_rollup(
    stream_df: DataFrame,
    tier: str = "1m",
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed streaming aggregation producing tier rows.

    Returns a streaming DataFrame with schema (keys..., bucket_ts, agg_cnt,
    agg_sum, agg_min, agg_max, first_ts, last_ts); write it with
    ``.writeStream.outputMode("append")`` — the watermark closes windows.
    """
    win = TIER_WINDOW[tier]
    agg = (
        stream_df.withWatermark(x_col, watermark)
        .groupBy(*by, F.window(F.col(x_col), win).alias("w"))
        .agg(
            F.count(y_col).alias("agg_cnt"),
            F.sum(y_col).alias("agg_sum"),
            F.min(y_col).alias("agg_min"),
            F.max(y_col).alias("agg_max"),
            F.min(x_col).alias("first_ts"),
            F.max(x_col).alias("last_ts"),
        )
    )
    return agg.select(
        *by, F.col("w.start").alias("bucket_ts"), "agg_cnt", "agg_sum",
        "agg_min", "agg_max", "first_ts", "last_ts"
    )


def stream_quantile_tier(
    stream_df: DataFrame,
    tier: str = "1m",
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    ps: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming percentile tier: the live edge of
    operators/rollup.py:quantile_tier's sketch path.

    ``approx_percentile`` is a MERGEABLE sketch, so Spark keeps one bounded
    sketch per open window in the state store (rank error ~1/accuracy) —
    exact percentile is impossible on a stream without retaining every
    point, which is precisely why the batch operator's 100 TB path is the
    sketch too.  Column names match quantile_tier (``p_{percent}``) so the
    streaming tier lands in the same table schema.
    """
    from tsdownsample_spark.operators.rollup import quantile_col_name

    win = TIER_WINDOW[tier]
    # ONE sketch per open window computing every quantile (array form) —
    # k percentiles must not multiply the state store's per-window size
    arr = F.approx_percentile(
        y_col, F.array(*[F.lit(float(p)) for p in ps]), F.lit(accuracy)
    )
    agg = (
        stream_df.withWatermark(x_col, watermark)
        .groupBy(*by, F.window(F.col(x_col), win).alias("w"))
        .agg(F.count(y_col).cast("long").alias("agg_cnt"), arr.alias("_ps"))
    )
    return agg.select(
        *by, F.col("w.start").alias("bucket_ts"), "agg_cnt",
        *[F.col("_ps")[i].alias(quantile_col_name(p)) for i, p in enumerate(ps)],
    )
