"""Streaming embedding near-dup == batch bucket-restricted derivation over
the full corpus (exactly once), and redelivered batches are no-ops."""

import pytest
from conftest import make_file_stream
from pyspark.sql import functions as F

from tsdownsample_spark.operators.similarity import (
    bucket_expr,
    lsh_planes,
    near_dup_pairs,
)
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_embed import stream_embed_neardup


@pytest.mark.slow
def test_stream_embed_neardup_equals_batch(spark, tmp_path, sf_dir):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 800)
        .select("vec_id", "embedding")
    )
    dim = len(emb.first()["embedding"])
    flat = make_file_stream(spark, emb, tmp_path)  # 2 micro-batches
    out_root = str(tmp_path / "embdup")
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_embed_neardup(
        stream, out_root, dim=dim, n_planes=4, threshold=0.28,
        checkpoint=str(tmp_path / "ckpt1"),
    )
    assert q.awaitTermination(240)

    got = sorted(
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in SnapshotTable(f"{out_root}/pairs").read(spark).collect()
    )
    # batch derivation: candidates = same-LSH-bucket pairs, then the exact
    # cosine verifier — identical planes, identical rounding
    planes = lsh_planes(dim, 4, seed=7)
    bucketed = emb.withColumn("bucket", F.expr(bucket_expr("embedding", planes)))
    a = bucketed.select(F.col("vec_id").alias("id_a"), F.col("bucket"))
    b = bucketed.select(F.col("vec_id").alias("id_b"), F.col("bucket"))
    cand = (
        a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    exp = sorted(
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in near_dup_pairs(emb, threshold=0.28, candidates=cand).collect()
    )
    assert len(exp) > 0
    assert len(got) == len(set((x, y) for x, y, _ in got))  # exactly once
    assert got == exp

    # redelivery: lost Spark checkpoint (same path wiped) replays both
    # batches; ledger + summary self-marking make every stage a no-op
    import shutil

    snaps = len(SnapshotTable(f"{out_root}/pairs").history())
    shutil.rmtree(str(tmp_path / "ckpt1"))
    stream2 = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q2 = stream_embed_neardup(
        stream2, out_root, dim=dim, n_planes=4, threshold=0.28,
        checkpoint=str(tmp_path / "ckpt1"),
    )
    assert q2.awaitTermination(240)
    assert len(SnapshotTable(f"{out_root}/pairs").history()) == snaps

    # a wrong dim fails loudly instead of degenerating to one bucket
    stream3 = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q3 = stream_embed_neardup(
        stream3, str(tmp_path / "embdup_wrongdim"), dim=dim + 1, n_planes=4,
        threshold=0.28, checkpoint=str(tmp_path / "ckpt3"),
    )
    with pytest.raises(Exception, match="hyperplane bucketing"):
        q3.awaitTermination(240)
        raise RuntimeError("stream should have failed")  # pragma: no cover
