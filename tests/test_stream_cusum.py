"""Streaming CUSUM == batch operator (calibration-table mode) over the same
events, with prefix/running-min state straddling the micro-batch boundary;
plus the all-late-batch frontier guard."""

import numpy as np
import pandas as pd
import pytest
from conftest import make_file_stream, stage_batches
from pyspark.sql import functions as F

from tsdownsample_spark.operators.stats import cusum
from tsdownsample_spark.streaming.stream_cusum import stream_cusum


@pytest.mark.slow
def test_stream_cusum_matches_batch(spark, tmp_path, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .dropDuplicates(["event_type", "ts"])
        .select("event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    # calibration table from the full series — passed to BOTH sides, which
    # is the operator's stream==batch contract (a stream cannot know its
    # future mean; the batch default recomputes stats per input)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    stats.cache().count()
    flat = make_file_stream(spark, ev, tmp_path, time_col="ts")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_cusum(
        stream, stats, x_col="ts", y_col="value", by=["event_type"], k=0.5, h=5.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("scusum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["ts_us"]): r for r in spark.table("scusum").collect()
    }
    exp_rows = (
        cusum(
            ev, x_col="ts", y_col="value", by=["event_type"], k=0.5, h=5.0,
            stats_df=stats,
        )
        .select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "cusum_s", "alarm",
        )
        .collect()
    )
    assert len(exp_rows) == len(got) > 0
    mismatched_alarms = 0
    for er in exp_rows:
        gr = got[(er["event_type"], er["ts_us"])]
        assert gr["cusum_s"] == pytest.approx(er["cusum_s"], rel=1e-7, abs=1e-9), er
        # batch rounds to 6 before comparing with h; the stream compares
        # raw — they may only disagree within 1e-6 of the threshold
        if gr["alarm"] != er["alarm"]:
            assert abs(er["cusum_s"] - 5.0) < 1e-5, er
            mismatched_alarms += 1
    assert mismatched_alarms <= 2


def test_stream_cusum_all_late_batch_does_not_regress_state(spark, tmp_path):
    """An entirely-late micro-batch must leave the carried (pfx, runmin)
    untouched: the next in-order point continues from the true statistic."""
    t = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    inorder = [("a", t(i).to_pydatetime(), float(v))
               for i, v in enumerate([0, 1, 0, 1, 0, 1, 0, 1, 0, 1])]
    batches = [
        inorder,                                       # 10 in-order points
        [("a", t(3).to_pydatetime() + pd.Timedelta(microseconds=1), 50.0)],  # all late
        [("a", t(30).to_pydatetime(), 10.0)],          # in-order point
    ]
    flat = stage_batches(
        spark, tmp_path, batches, "event_type string, ts timestamp, value double"
    )
    stats = spark.createDataFrame(
        [("a", 0.5, 0.5)], "event_type string, _mu double, _sd double"
    )
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = stream_cusum(stream, stats, by=["event_type"], k=0.5, h=5.0)
    q = (
        out.writeStream.format("memory")
        .queryName("scusum_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["ts_us"]: r for r in spark.table("scusum_late").collect()}
    # replay the recursion over the IN-ORDER points only (the late row is
    # scored on arrival but must not move the carried state)
    s = 0.0
    for _, _, v in inorder:
        s = max(0.0, s + ((v - 0.5) / 0.5 - 0.5))
    final = max(0.0, s + ((10.0 - 0.5) / 0.5 - 0.5))
    ts30 = int(pd.Timestamp("2024-01-01 00:00:30").value // 1000)
    assert rows[ts30]["cusum_s"] == pytest.approx(final, abs=1e-9)
    assert rows[ts30]["alarm"]
