"""Streaming rollup / quantile tier / sessionize / as-of enrichment:
file-stream ingestion must produce the same results as the batch
operators over the same data (micro-batch staging via conftest's
make_file_stream)."""

import pytest
from pyspark.sql import functions as F

from conftest import make_file_stream
from tsdownsample_spark.operators.rollup import rollup_raw
from tsdownsample_spark.streaming.stream_rollup import stream_rollup


def _run_stream(spark, out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.mark.slow
def test_stream_matches_batch(spark, tmp_path, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    flat = make_file_stream(spark, ev, tmp_path, seed=1)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    got = (
        _run_stream(spark, stream_rollup(stream, "1m", by=["event_type"]),
                    tmp_path, "t1m")
        .select("event_type", "bucket_ts", "agg_cnt", "agg_min", "agg_max")
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    exp = (
        rollup_raw(ev, "1m", by=["event_type"])
        .select("event_type", "bucket_ts", "agg_cnt", "agg_min", "agg_max")
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got.agg_cnt.to_numpy() == exp.agg_cnt.to_numpy()).all()
    assert (got.agg_min.to_numpy() == exp.agg_min.to_numpy()).all()
    assert (got.agg_max.to_numpy() == exp.agg_max.to_numpy()).all()


@pytest.mark.slow
def test_stream_quantile_tier_tracks_exact(spark, tmp_path, sf_dir):
    """Streaming sketch percentiles == the batch sketch (lossless GK merge
    at these bucket sizes), counts exact.  The sketch is the right
    baseline: it returns discrete rank values while exact=True
    interpolates."""
    import numpy as np

    from tsdownsample_spark.operators.rollup import quantile_tier
    from tsdownsample_spark.streaming.stream_rollup import stream_quantile_tier

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    flat = make_file_stream(spark, ev, tmp_path, seed=3)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    got = (
        _run_stream(
            spark,
            stream_quantile_tier(stream, "1h", by=["event_type"], ps=(0.5, 0.95)),
            tmp_path, "sq1h",
        )
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    exp = (
        quantile_tier(ev, tier="1h", x_col="ts", y_col="value",
                      by=["event_type"], ps=(0.5, 0.95), exact=False,
                      accuracy=10_000)
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert (got.agg_cnt.to_numpy() == exp.agg_cnt.to_numpy()).all()
    for col in ("p_50", "p_95"):
        assert np.array_equal(got[col].to_numpy(), exp[col].to_numpy()), col


@pytest.mark.slow
def test_stream_sessionize_matches_batch(spark, tmp_path, sf_dir):
    """sessionize's session_window call IS the streaming sessionization
    operator: the same grouping over a file stream (sessions merging
    across micro-batches in the state store) equals the batch sessions."""
    from tsdownsample_spark.operators.gaps import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    flat = make_file_stream(spark, ev, tmp_path, seed=7)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    got = sorted(
        tuple(r)
        for r in _run_stream(
            spark,
            sessionize(stream, x_col="ts", by=["event_type"], gap="30 minutes"),
            tmp_path, "ssess",
        ).collect()
    )
    exp = sorted(
        tuple(r) for r in sessionize(ev, x_col="ts", by=["event_type"],
                                     gap="30 minutes").collect()
    )
    assert len(got) == len(exp) > 0
    assert got == exp


@pytest.mark.slow
def test_stream_asof_enrich_batch_splitting_invariant(spark, tmp_path, sf_dir):
    """foreachBatch as-of enrichment against a static 1m tier: micro-batch
    results concatenated == the single batch join over all events (the
    as-of match of a row depends only on that row and the right side)."""
    from tsdownsample_spark.operators.asof import asof_join
    from tsdownsample_spark.operators.rollup import retention_tiers
    from tsdownsample_spark.streaming.stream_asof import asof_enrich_foreach_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    full = spark.read.parquet(f"{sf_dir}/events.parquet")
    right = (
        retention_tiers(full, x_col="ts", y_col="value", by=["event_type"],
                        uid_col="event_id")["1m"]
        .select(
            "event_type",
            (F.col("bucket_ts") + F.expr("INTERVAL 1 MINUTE")).alias("ts"),
            F.col("agg_min").alias("tier_min"),
        )
        .cache()
    )
    kw = dict(on="ts", by=["event_type"], value_cols=["tier_min"],
              matched_col="matched_ts")
    flat = make_file_stream(spark, ev, tmp_path, seed=9)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    collected = []

    def sink(df, batch_id):
        collected.extend(tuple(r) for r in df.collect())

    q = (
        stream.writeStream.foreachBatch(asof_enrich_foreach_batch(right, sink, **kw))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    exp = sorted(tuple(r) for r in asof_join(ev, right, **kw).collect())
    assert sorted(collected) == exp and len(exp) > 0
