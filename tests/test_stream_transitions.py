"""stream_transitions == batch transition_matrix (integer-exact), including
the pair that straddles the micro-batch boundary."""

import pytest
from conftest import make_file_stream
from pyspark.sql import functions as F

from tsdownsample_spark.operators.funnel import transition_matrix
from tsdownsample_spark.streaming.stream_transitions import (
    stream_transitions,
    transitions_snapshot,
)


@pytest.mark.slow
def test_stream_matches_batch_exactly(spark, tmp_path, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
    )
    flat = make_file_stream(spark, ev, tmp_path, time_col="ts")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = stream_transitions(stream, x_col="ts", tiebreak="event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("stransitions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.from_type, r.to_type, r.n, round(r.p, 9))
        for r in transitions_snapshot(spark.table("stransitions")).collect()
    )
    exp = sorted(
        (r.from_type, r.to_type, r.n, round(r.p, 9))
        for r in transition_matrix(
            ev, x_col="ts", tiebreak=["event_id"]
        ).collect()
    )
    assert got == exp and len(got) > 0


def test_boundary_pair_and_late_drop(spark, tmp_path):
    """Hand fixture: the (b -> c) pair crosses the batch boundary; a late
    row older than the carried frontier is dropped, not spliced."""
    import os
    import shutil
    import time as _time

    b1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "a"), (1, "2024-01-01 00:01:00", 2, "b")],
        "user_id long, ts_s string, event_id long, event_type string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id", "event_type")
    b2 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:02:00", 3, "c"),          # pairs with b across batches
            (1, "2024-01-01 00:00:30", 9, "x"),          # LATE: before frontier -> dropped
        ],
        "user_id long, ts_s string, event_id long, event_type string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id", "event_type")
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    now = _time.time()
    i = 0
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
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_transitions(stream, x_col="ts", tiebreak="event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("stransb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.from_type, r.to_type): r.n
        for r in transitions_snapshot(spark.table("stransb")).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}
