"""Streaming latest-state view == batch asof_snapshot over the same
events (argmax partials, exactly-once ledger), including out-of-order
batches and duplicate-timestamp tiebreaks."""

import pandas as pd
import pytest
from conftest import make_file_stream, stage_batches
from pyspark.sql import functions as F

from tsdownsample_spark.operators.asof import asof_snapshot
from tsdownsample_spark.streaming.stream_snapshot import (
    latest_state_snapshot,
    stream_latest_state,
)

SCHEMA = "k string, ts timestamp, v double, rid long"


def _drain(spark, tmp_path, stream, out_root, **kw):
    q = stream_latest_state(
        stream, str(out_root),
        checkpoint=str(tmp_path / "ckpt"), **kw,
    )
    q.awaitTermination(180)


@pytest.mark.slow
def test_stream_snapshot_matches_batch(spark, tmp_path, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    flat = make_file_stream(spark, ev, tmp_path, time_col="ts")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out_root = tmp_path / "state"
    _drain(spark, tmp_path, stream, out_root,
           x_col="ts", by=["user_id"], tiebreak=["event_id"])
    got = sorted(
        latest_state_snapshot(
            spark, str(out_root), x_col="ts", by=["user_id"],
            tiebreak=["event_id"],
        ).collect(),
        key=lambda r: r["user_id"],
    )
    exp = sorted(
        asof_snapshot(
            ev, None, x_col="ts", by=["user_id"], tiebreak=["event_id"]
        ).collect(),
        key=lambda r: r["user_id"],
    )
    assert len(got) == len(exp) > 0
    for gr, er in zip(got, exp):
        assert gr.asDict() == er.asDict()


def test_out_of_order_batches_and_ties(spark, tmp_path):
    t = lambda s: (
        pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    ).to_pydatetime()
    batches = [
        [("a", t(100), 1.0, 1), ("b", t(5), 9.0, 2)],
        [("a", t(50), 99.0, 3)],                # late: must NOT win for a
        [("a", t(100), 2.0, 4), ("b", t(5), 8.0, 1)],  # ties: rid decides
    ]
    flat = stage_batches(spark, tmp_path, batches, SCHEMA)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out_root = tmp_path / "state"
    _drain(spark, tmp_path, stream, out_root,
           x_col="ts", by=["k"], tiebreak=["rid"])
    got = {
        r["k"]: r
        for r in latest_state_snapshot(
            spark, str(out_root), x_col="ts", by=["k"], tiebreak=["rid"]
        ).collect()
    }
    # a: max (ts, rid) = (t100, rid=4) -> v=2.0 (late t50 ignored)
    assert got["a"]["v"] == 2.0 and got["a"]["rid"] == 4
    # b: equal ts -> rid=2 wins
    assert got["b"]["v"] == 9.0 and got["b"]["rid"] == 2


def test_partials_table_bounded_by_batch_keys(spark, tmp_path):
    """Each batch appends ONE row per key it saw — the partials table is
    sum(batch key cardinalities), never rows-ingested."""
    t = lambda s: (
        pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    ).to_pydatetime()
    batches = [
        [("a", t(i), float(i), i) for i in range(10)],      # 10 rows, 1 key
        [("a", t(20), 20.0, 20), ("b", t(1), 1.0, 21)],     # 2 keys
    ]
    flat = stage_batches(spark, tmp_path, batches, SCHEMA)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out_root = tmp_path / "state"
    _drain(spark, tmp_path, stream, out_root,
           x_col="ts", by=["k"], tiebreak=["rid"])
    from tsdownsample_spark.sources.tableio import SnapshotTable

    raw = SnapshotTable(str(out_root / "state")).read(spark)
    assert raw.count() == 3  # 1 (batch 1) + 2 (batch 2), not 12
