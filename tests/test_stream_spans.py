"""Streaming duplicate-span detection == batch duplicate_spans over the
full corpus: the union of per-batch dups outputs equals the batch
operator's (doc_id, start, win_hash) projection — including windows whose
duplicate arrives in a LATER batch (retroactive emission) — exactly once,
with the (batch, stage) ledger making redelivered batches no-ops."""

import os
import shutil
import time as _time

import pytest

from tsdownsample_spark.operators.dedup import duplicate_spans
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_spans import stream_duplicate_spans

SCHEMA = "doc_id string, tokens array<int>"


def _stage_batches(spark, tmp_path, batches):
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    now = _time.time()
    for j, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA)
        d = str(tmp_path / f"b{j}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{j:04d}.parquet"
                shutil.copy(os.path.join(d, f), dst)
                os.utime(dst, (now - 600 + 60 * j, now - 600 + 60 * j))
    return flat


def _run(spark, flat, out_root, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_duplicate_spans(
        stream, out_root, window=16, stride=8, checkpoint=ckpt
    )
    assert q.awaitTermination(240)


def test_stream_spans_equal_batch_with_retro(spark, tmp_path):
    boiler = list(range(1000, 1048))  # 48 tokens -> 5 aligned windows
    chunk = list(range(70, 86))  # one window, repeated intra-doc in batch 2
    rng = __import__("numpy").random.default_rng(3)

    def rand(m):
        return [int(x) for x in rng.integers(0, 50_257, size=m)]

    # d1 carries the boilerplate in batch 1; its twin d3 arrives in batch 2
    # -> d1's occurrences must be emitted RETROACTIVELY in batch 2
    b1 = [("d1", boiler + rand(24)), ("d2", rand(80)), ("dn", None)]
    b2 = [
        ("d3", rand(8) + boiler + rand(16)),
        ("d4", chunk + rand(8) + chunk),
        ("d5", rand(40)),
    ]
    flat = _stage_batches(spark, tmp_path, (b1, b2))
    out_root = str(tmp_path / "spans_out")
    _run(spark, flat, out_root, str(tmp_path / "ckpt1"))

    got = sorted(
        (r.doc_id, r.start, r.win_hash)
        for r in SnapshotTable(f"{out_root}/dups").read(spark).collect()
    )
    full = spark.createDataFrame(b1 + b2, SCHEMA)
    exp = sorted(
        (r.doc_id, r.start, r.win_hash)
        for r in duplicate_spans(full, window=16, stride=8)
        .select("doc_id", "start", "win_hash")
        .collect()
    )
    assert len(exp) > 0
    assert len(got) == len(set(got))  # exactly once
    assert got == exp
    # the retro case really happened: d1 spans are in the output and d1
    # arrived a batch before its twin
    assert any(d == "d1" for d, _, _ in got)
    # intra-batch-2 self-duplicate caught too
    assert any(d == "d4" for d, _, _ in got)

    # redelivery after a LOST checkpoint: ledger makes every stage a no-op
    dups_snaps = len(SnapshotTable(f"{out_root}/dups").history())
    shutil.rmtree(str(tmp_path / "ckpt1"))
    _run(spark, flat, out_root, str(tmp_path / "ckpt1"))
    assert len(SnapshotTable(f"{out_root}/dups").history()) == dups_snaps
    regot = sorted(
        (r.doc_id, r.start, r.win_hash)
        for r in SnapshotTable(f"{out_root}/dups").read(spark).collect()
    )
    assert regot == exp

    # a different checkpoint against the same out_root is refused loudly
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    with pytest.raises(ValueError, match="bound to streaming checkpoint"):
        stream_duplicate_spans(stream, out_root, checkpoint=str(tmp_path / "ckpt2"))


def test_stream_spans_min_count_crosses_batches(spark, tmp_path):
    """min_count=3: two occurrences across batches stay silent; the third
    (in a later batch) triggers emission of ALL three."""
    w = list(range(500, 516))
    rng = __import__("numpy").random.default_rng(4)

    def rand(m):
        return [int(x) for x in rng.integers(0, 50_257, size=m)]

    b1 = [("a", w + rand(8))]
    b2 = [("b", w + rand(16))]
    b3 = [("c", rand(8) + w)]
    flat = _stage_batches(spark, tmp_path, (b1, b2, b3))
    out_root = str(tmp_path / "mc_out")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_duplicate_spans(
        stream, out_root, window=16, stride=8, min_count=3,
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(240)
    got = sorted(
        (r.doc_id, r.start)
        for r in SnapshotTable(f"{out_root}/dups").read(spark).collect()
    )
    assert got == [("a", 0), ("b", 0), ("c", 8)]
