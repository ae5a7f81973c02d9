"""Streaming rolling z-score == batch operator (prefix impl) over the same
events, including frames that straddle the micro-batch boundary, NULL y,
and the warm-up NULL placement; plus the all-late-batch frontier guard."""

import numpy as np
import pandas as pd
import pytest
from conftest import make_file_stream, stage_batches
from pyspark.sql import functions as F

from tsdownsample_spark.operators.anomaly import rolling_zscore
from tsdownsample_spark.streaming.stream_anomaly import stream_rolling_zscore


@pytest.mark.slow
def test_stream_zscore_matches_batch(spark, tmp_path, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .dropDuplicates(["event_type", "ts"])
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            # deterministic NULL sprinkle exercises the mask lanes
            F.when(F.col("event_id") % 31 == 0, None)
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )
    flat = make_file_stream(spark, ev, tmp_path, time_col="ts")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_rolling_zscore(
        stream, x_col="ts", y_col="value", by=["event_type"], window=50, min_obs=10
    )
    q = (
        out.writeStream.format("memory")
        .queryName("szscore")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["ts_us"]): r for r in spark.table("szscore").collect()
    }
    exp_rows = (
        rolling_zscore(
            ev, x_col="ts", y_col="value", by=["event_type"], window=50,
            min_obs=10, impl="prefix",
        )
        .select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "roll_mean", "roll_std", "z", "is_anomaly",
        )
        .collect()
    )
    assert len(exp_rows) == len(got) > 0
    for er in exp_rows:
        gr = got[(er["event_type"], er["ts_us"])]
        for col in ("roll_mean", "roll_std", "z"):
            ev_, gv = er[col], gr[col]
            assert (ev_ is None) == (gv is None), (er, col)
            if ev_ is not None:
                assert gv == pytest.approx(ev_, rel=1e-7, abs=1e-9), (er, col)
        assert gr["is_anomaly"] == er["is_anomaly"], er


def test_stream_zscore_all_late_batch_does_not_regress_state(spark, tmp_path):
    """An entirely-late micro-batch must leave the carried tail untouched:
    the next in-order point scores against the true trailing frame."""
    t = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    inorder = [("a", t(i).to_pydatetime(), float(v))
               for i, v in enumerate(np.arange(20) % 5)]
    batches = [
        inorder,                                     # 20 in-order points
        [("a", t(5).to_pydatetime() + pd.Timedelta(microseconds=1), 500.0)],  # all late
        [("a", t(30).to_pydatetime(), 100.0)],       # in-order spike
    ]
    flat = stage_batches(spark, tmp_path, batches,
                         "event_type string, ts timestamp, value double")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_rolling_zscore(
        stream, x_col="ts", y_col="value", by=["event_type"], window=10, min_obs=5
    )
    q = (
        out.writeStream.format("memory").queryName("szscore_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["value"]: r for r in spark.table("szscore_late").collect()}
    # the spike's trailing frame is the last 10 IN-ORDER values (0..4
    # cycle), NOT polluted by the late 500.0
    tail = np.array([(10 + i) % 5 for i in range(10)], dtype=float)
    exp_mean = tail.mean()
    exp_z = (100.0 - exp_mean) / tail.std(ddof=1)
    assert rows[100.0]["roll_mean"] == pytest.approx(exp_mean, rel=1e-9)
    assert rows[100.0]["z"] == pytest.approx(exp_z, rel=1e-7)
    assert rows[100.0]["is_anomaly"] is True
    with pytest.raises(ValueError, match=">= 2"):
        stream_rolling_zscore(stream, window=1)
