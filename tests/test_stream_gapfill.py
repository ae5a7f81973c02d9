"""Stateful streaming LOCF: the fill state must survive micro-batch
boundaries — a value observed only in batch 1 fills nulls in batch 2."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tsdownsample_spark.streaming.stream_gapfill import stream_locf


@pytest.mark.slow
def test_stream_locf_matches_batch(spark, tmp_path, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            # deterministic nulls to fill
            F.expr("IF(event_id % 11 = 0, CAST(NULL AS DOUBLE), value)").alias("value"),
            "event_id",
        )
        .dropDuplicates(["event_type", "ts"])
    )
    # split by TIME so batch 2's nulls depend on batch-1 state
    cut = ev.selectExpr("percentile_approx(CAST(ts AS DOUBLE), 0.5) p").collect()[0]["p"]
    b1 = ev.filter(F.col("ts").cast("double") <= cut)
    b2 = ev.filter(F.col("ts").cast("double") > cut)
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    b1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
    b2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
    import shutil

    import time as _time

    i = 0
    now = _time.time()
    for j, sub in enumerate(("b1", "b2")):
        for f in sorted(os.listdir(tmp_path / sub)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:04d}.parquet"
                shutil.copy(str(tmp_path / sub / f), dst)
                # the file stream source orders by modification time — pin it
                # so batch 1 strictly precedes batch 2
                os.utime(dst, (now - 120 + 60 * j, now - 120 + 60 * j))
                i += 1

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_locf(stream, x_col="ts", y_col="value", by=["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("locf")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import math

    def _norm(v):
        # pandas float columns carry leading unfilled values as NaN; the
        # batch window mirror yields NULL — same meaning
        return None if isinstance(v, float) and math.isnan(v) else v

    got = sorted(
        tuple(_norm(v) for v in r)
        for r in spark.table("locf")
        .select("event_type", "ts_us", "value", "was_null")
        .collect()
    )
    # batch mirror: global LOCF per series in event-time order
    w = Window.partitionBy("event_type").orderBy("ts_us")
    exp_df = (
        ev.select(
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "value",
        )
        .withColumn("was_null", F.col("value").isNull())
        .withColumn(
            "value", F.last("value", ignorenulls=True).over(w)
        )
    )
    exp = sorted(
        tuple(r) for r in exp_df.select("event_type", "ts_us", "value", "was_null").collect()
    )
    assert got == exp
