"""Streaming rollup: file-stream ingestion must produce the same 1m tier as
the batch rollup over the same data."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.rollup import rollup_raw
from tsdownsample_spark.streaming.stream_rollup import stream_rollup


@pytest.mark.slow
def test_stream_matches_batch(spark, tmp_path, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    # stage the input as two incremental files (micro-batches)
    src_dir = str(tmp_path / "stream_in")
    os.makedirs(src_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=1)
    a.write.mode("overwrite").parquet(src_dir + "/batch1")
    b.write.mode("overwrite").parquet(src_dir + "/batch2")
    # flatten: streaming source wants a flat dir of files
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("batch1", "batch2"):
        for f in os.listdir(f"{src_dir}/{sub}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{src_dir}/{sub}/{f}", f"{flat}/{i:04d}.parquet")
                i += 1

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = stream_rollup(stream, "1m", by=["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("t1m")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("t1m")
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
    """Streaming sketch percentiles land within rank error of the batch
    EXACT percentiles (counts exactly equal) — 1h buckets over events."""
    import numpy as np

    from tsdownsample_spark.operators.rollup import quantile_tier
    from tsdownsample_spark.streaming.stream_rollup import stream_quantile_tier

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    src_dir = str(tmp_path / "stream_in")
    os.makedirs(src_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=3)
    a.write.mode("overwrite").parquet(src_dir + "/batch1")
    b.write.mode("overwrite").parquet(src_dir + "/batch2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("batch1", "batch2"):
        for f in os.listdir(f"{src_dir}/{sub}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{src_dir}/{sub}/{f}", f"{flat}/{i:04d}.parquet")
                i += 1
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = stream_quantile_tier(stream, "1h", by=["event_type"], ps=(0.5, 0.95))
    q = (
        out.writeStream.format("memory")
        .queryName("sq1h")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("sq1h")
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    # baseline = the BATCH sketch: at these bucket sizes (tens of points,
    # accuracy=10k) the GK summary retains every sample, so merges are
    # lossless and stream == batch exactly — the right comparison, since
    # the sketch returns discrete rank values while exact=True interpolates
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
        g, e = got[col].to_numpy(), exp[col].to_numpy()
        assert np.array_equal(g, e), col


@pytest.mark.slow
def test_stream_sessionize_matches_batch(spark, tmp_path, sf_dir):
    """sessionize's session_window call IS the streaming sessionization
    operator: the same grouping over a file stream (sessions merging
    across micro-batches in the state store) equals the batch sessions."""
    from tsdownsample_spark.operators.gaps import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    src_dir = str(tmp_path / "stream_in")
    os.makedirs(src_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=7)
    a.write.mode("overwrite").parquet(src_dir + "/batch1")
    b.write.mode("overwrite").parquet(src_dir + "/batch2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("batch1", "batch2"):
        for f in os.listdir(f"{src_dir}/{sub}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{src_dir}/{sub}/{f}", f"{flat}/{i:04d}.parquet")
                i += 1
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = sessionize(stream, x_col="ts", by=["event_type"], gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("ssess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.table("ssess").collect()
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

    src_dir = str(tmp_path / "stream_in")
    os.makedirs(src_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=9)
    a.write.mode("overwrite").parquet(src_dir + "/batch1")
    b.write.mode("overwrite").parquet(src_dir + "/batch2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("batch1", "batch2"):
        for f in os.listdir(f"{src_dir}/{sub}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{src_dir}/{sub}/{f}", f"{flat}/{i:04d}.parquet")
                i += 1
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
