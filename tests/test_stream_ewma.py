"""Streaming EWMA == batch operator bit-for-bit on in-order data (the two
spell the identical recursion), plus the all-late-batch frontier guard."""

import pandas as pd
import pytest
from conftest import make_file_stream, stage_batches
from pyspark.sql import functions as F

from tsdownsample_spark.operators.stats import ewma
from tsdownsample_spark.streaming.stream_ewma import stream_ewma


@pytest.mark.slow
def test_stream_ewma_matches_batch_bitwise(spark, tmp_path, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .dropDuplicates(["event_type", "ts"])
        .select("event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    flat = make_file_stream(spark, ev, tmp_path, time_col="ts")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_ewma(stream, x_col="ts", y_col="value", by=["event_type"], alpha=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("sewma")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["ts_us"]): r["ewma"]
        for r in spark.table("sewma").collect()
    }
    exp_rows = (
        ewma(ev, x_col="ts", y_col="value", by=["event_type"], alpha=0.3)
        .select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "ewma",
        )
        .collect()
    )
    assert len(exp_rows) == len(got) > 0
    for er in exp_rows:
        # identical recursion, identical order -> identical bits
        assert got[(er["event_type"], er["ts_us"])] == er["ewma"], er


def test_stream_ewma_all_late_batch_does_not_regress_state(spark, tmp_path):
    t = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    inorder = [("a", t(i).to_pydatetime(), float(i)) for i in range(10)]
    batches = [
        inorder,
        [("a", t(3).to_pydatetime() + pd.Timedelta(microseconds=1), 500.0)],  # late
        [("a", t(30).to_pydatetime(), 20.0)],
    ]
    flat = stage_batches(
        spark, tmp_path, batches, "event_type string, ts timestamp, value double"
    )
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = stream_ewma(stream, by=["event_type"], alpha=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("sewma_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["ts_us"]: r["ewma"] for r in spark.table("sewma_late").collect()}
    ew = None
    for _, _, v in inorder:
        ew = v if ew is None else 0.5 * v + 0.5 * ew
    final = 0.5 * 20.0 + 0.5 * ew  # late 500.0 must NOT be in the carry
    ts30 = int(pd.Timestamp("2024-01-01 00:00:30").value // 1000)
    assert rows[ts30] == final
