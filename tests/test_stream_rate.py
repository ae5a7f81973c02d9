"""Stateful streaming counter-rate: stream output must EXACTLY equal the
batch operator's (pure pair arithmetic — bit-for-bit), with the previous
observation carried across micro-batch boundaries."""

import os
import shutil
import time as _time

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.rate import counter_rate
from tsdownsample_spark.streaming.stream_rate import stream_counter_rate


@pytest.mark.slow
def test_stream_counter_rate_matches_batch(spark, tmp_path, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            # deterministic NULL payloads: the lag must emit NULL delta for
            # a null row AND its successor, in stream and batch alike
            F.expr("IF(event_id % 13 = 0, CAST(NULL AS DOUBLE), value)").alias(
                "value"
            ),
        )
        .dropDuplicates(["event_type", "ts"])
    )
    # split by TIME so batch 2's first deltas depend on batch-1 state
    cut = ev.selectExpr("percentile_approx(CAST(ts AS DOUBLE), 0.5) p").collect()[0][
        "p"
    ]
    b1 = ev.filter(F.col("ts").cast("double") <= cut)
    b2 = ev.filter(F.col("ts").cast("double") > cut)
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    b1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
    b2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
    i = 0
    now = _time.time()
    for j, sub in enumerate(("b1", "b2")):
        for f in sorted(os.listdir(tmp_path / sub)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:04d}.parquet"
                shutil.copy(str(tmp_path / sub / f), dst)
                os.utime(dst, (now - 120 + 60 * j, now - 120 + 60 * j))
                i += 1

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_counter_rate(stream, x_col="ts", y_col="value", by=["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("crate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        tuple(r)
        for r in spark.table("crate")
        .select("event_type", "ts_us", "value", "delta", "rate_s")
        .collect()
    )
    exp = sorted(
        tuple(r)
        for r in counter_rate(ev, x_col="ts", y_col="value", by=["event_type"])
        .select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
            "delta",
            "rate_s",
        )
        .collect()
    )
    assert len(got) == len(exp) > 0
    assert got == exp  # EXACT equality, floats included


def test_stream_counter_rate_reset_rule_across_batches(spark, tmp_path):
    """The reset rule fires when the restart straddles a micro-batch
    boundary: batch 1 ends at value 100, batch 2 starts at 3."""
    import pandas as pd

    rows1 = [("a", pd.Timestamp("2024-01-01 00:00:00").to_pydatetime(), 90.0),
             ("a", pd.Timestamp("2024-01-01 00:00:10").to_pydatetime(), 100.0)]
    rows2 = [("a", pd.Timestamp("2024-01-01 00:00:20").to_pydatetime(), 3.0)]
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    now = _time.time()
    for j, rows in enumerate((rows1, rows2)):
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        d = str(tmp_path / f"b{j}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{j:04d}.parquet"
                shutil.copy(os.path.join(d, f), dst)
                os.utime(dst, (now - 120 + 60 * j, now - 120 + 60 * j))
    schema = "event_type string, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_counter_rate(stream, x_col="ts", y_col="value", by=["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("crate2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["value"]: r for r in spark.table("crate2").collect()}
    assert rows[90.0]["delta"] is None and rows[90.0]["rate_s"] is None
    assert rows[100.0]["delta"] == 10.0 and rows[100.0]["rate_s"] == 1.0
    # 100 -> 3 across the batch boundary: reset detected via carried state
    assert rows[3.0]["delta"] == 3.0 and rows[3.0]["rate_s"] == pytest.approx(0.3)


@pytest.mark.slow
def test_stream_detect_gaps_matches_batch(spark, tmp_path, sf_dir):
    """Streaming gap report == batch detect_gaps on the same events,
    including gaps that straddle the micro-batch boundary."""
    from tsdownsample_spark.operators.gaps import detect_gaps
    from tsdownsample_spark.streaming.stream_gaps import stream_detect_gaps

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", F.col("ts").cast("timestamp").alias("ts"))
        .dropDuplicates(["event_type", "ts"])
    )
    cut = ev.selectExpr("percentile_approx(CAST(ts AS DOUBLE), 0.5) p").collect()[0][
        "p"
    ]
    b1 = ev.filter(F.col("ts").cast("double") <= cut)
    b2 = ev.filter(F.col("ts").cast("double") > cut)
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    i = 0
    now = _time.time()
    for j, part in enumerate((b1, b2)):
        d = str(tmp_path / f"b{j}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:04d}.parquet"
                shutil.copy(os.path.join(d, f), dst)
                os.utime(dst, (now - 120 + 60 * j, now - 120 + 60 * j))
                i += 1
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_detect_gaps(stream, x_col="ts", by=["event_type"], min_gap=1800.0)
    q = (
        out.writeStream.format("memory")
        .queryName("sgaps")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_type"], r["gap_start_us"], r["gap_end_us"], r["gap_s"])
        for r in spark.table("sgaps").collect()
    )
    exp = sorted(
        (r["event_type"],) + tuple(r[1:])
        for r in detect_gaps(ev, x_col="ts", by=["event_type"], min_gap=1800.0)
        .select(
            "event_type",
            F.unix_micros(F.col("gap_start").cast("timestamp")).alias("s"),
            F.unix_micros(F.col("gap_end").cast("timestamp")).alias("e"),
            "gap_s",
        )
        .collect()
    )
    assert len(got) == len(exp) > 0
    assert got == exp


from conftest import stage_batches as _stage_batches


def test_stream_rate_all_late_batch_does_not_regress_state(spark, tmp_path):
    """A micro-batch composed ENTIRELY of late data must not move the
    carried last_ts backwards: the next in-order batch still pairs against
    the true frontier (t=10s, v=20), not the late point."""
    import pandas as pd

    t = lambda s: pd.Timestamp(f"2024-01-01 00:00:{s:02d}").to_pydatetime()
    batches = [
        [("a", t(0), 10.0), ("a", t(10), 20.0)],
        [("a", t(5), 15.0)],           # all-late batch
        [("a", t(20), 32.0)],          # in-order batch
    ]
    flat = _stage_batches(spark, tmp_path, batches,
                          "event_type string, ts timestamp, value double")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_counter_rate(stream, x_col="ts", y_col="value", by=["event_type"])
    q = (
        out.writeStream.format("memory").queryName("crate_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["value"]: r for r in spark.table("crate_late").collect()}
    # frontier pairing: 32 - 20 over 10 s, NOT 32 - 15 over 15 s
    assert rows[32.0]["delta"] == 12.0
    assert rows[32.0]["rate_s"] == pytest.approx(1.2)


def test_stream_gaps_all_late_batch_does_not_regress_state(spark, tmp_path):
    """Same frontier guard for gap detection: after an all-late batch, the
    next in-order point closes its gap against t=10s, not the late t=5s."""
    import pandas as pd

    from tsdownsample_spark.streaming.stream_gaps import stream_detect_gaps

    t = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    batches = [
        [("a", t(0).to_pydatetime()), ("a", t(10).to_pydatetime())],
        [("a", t(5).to_pydatetime())],            # all-late batch
        [("a", t(200).to_pydatetime())],          # in-order batch
    ]
    flat = _stage_batches(spark, tmp_path, batches, "event_type string, ts timestamp")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_detect_gaps(stream, x_col="ts", by=["event_type"], min_gap=30.0)
    q = (
        out.writeStream.format("memory").queryName("sgaps_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [(r["gap_start_us"], r["gap_end_us"], r["gap_s"])
           for r in spark.table("sgaps_late").collect()]
    base_us = int(pd.Timestamp("2024-01-01").value // 1000)
    # exactly one gap, closed against the true frontier t=10s: 190 s
    assert got == [(base_us + 10_000_000, base_us + 200_000_000, 190.0)]
