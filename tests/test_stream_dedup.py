"""Streaming ingest dedup == batch LSH over the full corpus: the union of
per-batch candidate-pair outputs equals lsh_candidate_pairs on all docs
(set-for-set, exactly once), and the (batch, stage) ledger makes
redelivered batches no-ops."""

import pytest
from conftest import make_file_stream
from pyspark.sql import functions as F

from tsdownsample_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_dedup import stream_dedup_minhash


def _run_stream(spark, flat, schema, out_root, ckpt):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_dedup_minhash(
        stream, out_root, k=16, bands=4, rows=4, checkpoint=ckpt
    )
    assert q.awaitTermination(240)


@pytest.mark.slow
def test_stream_dedup_pairs_equal_batch(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    flat = make_file_stream(spark, docs, tmp_path)  # 2 micro-batches
    out_root = str(tmp_path / "dedup")
    _run_stream(spark, flat, docs.schema, out_root, str(tmp_path / "ckpt1"))

    got = sorted(
        (r["id_a"], r["id_b"])
        for r in SnapshotTable(f"{out_root}/pairs").read(spark).collect()
    )
    exp = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(docs, k=16), bands=4, rows=4
        ).collect()
    )
    assert len(exp) > 0
    # exactly once across batches: no duplicates in the accumulated table
    assert len(got) == len(set(got))
    assert got == exp

    # band table covers every doc x band
    n_docs = docs.count()
    bands_rows = SnapshotTable(f"{out_root}/bands").read(spark).count()
    assert bands_rows == n_docs * 4

    # redelivery: simulate a LOST Spark checkpoint (same path wiped) — the
    # stream replays batches 0..1 from scratch and the ledger + the tables'
    # self-marking batch_id summaries make every stage a no-op
    import shutil

    pairs_snaps = len(SnapshotTable(f"{out_root}/pairs").history())
    shutil.rmtree(str(tmp_path / "ckpt1"))
    _run_stream(spark, flat, docs.schema, out_root, str(tmp_path / "ckpt1"))
    assert len(SnapshotTable(f"{out_root}/pairs").history()) == pairs_snaps
    regot = sorted(
        (r["id_a"], r["id_b"])
        for r in SnapshotTable(f"{out_root}/pairs").read(spark).collect()
    )
    assert regot == exp

    # a DIFFERENT checkpoint against the same out_root is a new stream
    # whose batch ids alias the ledger — refused loudly, not silently
    from tsdownsample_spark.streaming.stream_dedup import stream_dedup_minhash

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    with pytest.raises(ValueError, match="bound to streaming checkpoint"):
        stream_dedup_minhash(stream, out_root, checkpoint=str(tmp_path / "ckpt2"))


def test_stream_dedup_cross_batch_pair(spark, tmp_path):
    """A near-dup whose two members arrive in DIFFERENT batches is caught
    in the later batch (the accumulated band table does the remembering)."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    b1 = [("d1", base), ("d2", "completely unrelated text about spark engines " * 4)]
    b2 = [("d3", base + "tail"), ("d4", "another unrelated document body " * 5)]
    import os
    import shutil
    import time as _time

    flat = str(tmp_path / "in")
    os.makedirs(flat)
    now = _time.time()
    for j, rows in enumerate((b1, b2)):
        df = spark.createDataFrame(rows, "doc_id string, text string")
        d = str(tmp_path / f"b{j}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{j:04d}.parquet"
                shutil.copy(os.path.join(d, f), dst)
                os.utime(dst, (now - 600 + 60 * j, now - 600 + 60 * j))
    out_root = str(tmp_path / "dedup")
    _run_stream(spark, flat, "doc_id string, text string", out_root,
                str(tmp_path / "ckpt"))
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in SnapshotTable(f"{out_root}/pairs").read(spark).collect()
    )
    assert ("d1", "d3") in got


def _stage_two_batches(spark, tmp_path, b1, b2):
    import os
    import shutil
    import time as _time

    flat = str(tmp_path / "in")
    os.makedirs(flat)
    now = _time.time()
    for j, rows in enumerate((b1, b2)):
        df = spark.createDataFrame(rows, "doc_id string, text string")
        d = str(tmp_path / f"b{j}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{j:04d}.parquet"
                shutil.copy(os.path.join(d, f), dst)
                os.utime(dst, (now - 600 + 60 * j, now - 600 + 60 * j))
    return flat


def test_stream_clusters_retroactive_merge(spark, tmp_path):
    """Cluster maintenance at ingest: a later batch that introduces a
    smaller component minimum RE-HOMES earlier members (retroactive
    reassignment events), and the latest event per node always equals the
    batch connected_components over all pairs so far."""
    from tsdownsample_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from tsdownsample_spark.streaming.stream_dedup import latest_clusters

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    noise = [
        ("u1", "completely unrelated text about spark engines " * 4),
        ("u2", "another unrelated document body entirely " * 5),
    ]
    b1 = [("db", base), ("dc", base)] + noise[:1]
    b2 = [("da", base)] + noise[1:]
    flat = _stage_two_batches(spark, tmp_path, b1, b2)
    out_root = str(tmp_path / "dedup")
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_dedup_minhash(
        stream, out_root, k=16, bands=4, rows=4,
        checkpoint=str(tmp_path / "ckpt"), emit_clusters=True,
    )
    assert q.awaitTermination(240)

    log = SnapshotTable(f"{out_root}/clusters").read(spark).collect()
    events = {(r.node, r.component, r.batch_id) for r in log}
    # batch 0: dc joined db's cluster; batch 1: da (smaller id) arrives and
    # BOTH earlier members re-home to it — retroactive reassignments
    assert ("dc", "db", 0) in events
    assert ("db", "da", 1) in events and ("dc", "da", 1) in events

    got = {(r.node, r.component) for r in latest_clusters(spark, out_root).collect()}
    all_docs = spark.createDataFrame(b1 + b2, "doc_id string, text string")
    exp_cc = connected_components(
        lsh_candidate_pairs(minhash_signatures(all_docs, k=16), bands=4, rows=4)
    )
    exp = {(r.node, r.component) for r in exp_cc.collect()}
    assert got == exp
    assert ("u1", "u2") not in {(a, b) for a, b, _ in events}

    # redelivery (lost Spark checkpoint): ledger makes the cluster stage a
    # no-op — the event log gains nothing
    import shutil

    n_events = len(log)
    shutil.rmtree(str(tmp_path / "ckpt"))
    stream2 = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q2 = stream_dedup_minhash(
        stream2, out_root, k=16, bands=4, rows=4,
        checkpoint=str(tmp_path / "ckpt"), emit_clusters=True,
    )
    assert q2.awaitTermination(240)
    assert SnapshotTable(f"{out_root}/clusters").read(spark).count() == n_events
