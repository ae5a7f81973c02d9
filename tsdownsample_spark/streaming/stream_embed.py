"""Streaming embedding near-duplicate detection at ingest: incremental
LSH-bucketed cosine via ``foreachBatch`` against an accumulated bucketed
vector table — the embedding-space twin of streaming/stream_dedup.py.

Each arriving micro-batch of vectors is hyperplane-bucketed
(similarity.bucket_expr — the same deterministic planes as the batch ANN
operators), joined against the accumulated bucket table ON the bucket key
only (per-batch cost = batch x matched-bucket occupancy, never corpus x
corpus), scored with the exact cosine, and pairs >= threshold are emitted
EXACTLY ONCE across all batches: the union of per-batch outputs equals
the batch derivation (bucket-restricted near_dup_pairs over the full
corpus) set-for-set — same argument as stream_dedup, since buckets and
cosines are deterministic per vector.  Crash safety: the shared
(batch, stage) ledger, pairs committed before buckets.

Recall caveat is inherited from the batch LSH path, not added by
streaming: a near-dup pair hashing to different buckets is missed by
BOTH engines identically (raise n_planes or verify candidates exactly).
Id discipline as in stream_dedup: re-ingesting a ``vec_id`` re-announces
its pairs — upstream ownership of id uniqueness is assumed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdownsample_spark.operators.similarity import (
    _dot_expr,
    _norm_expr,
    bucket_expr,
    lsh_planes,
)
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_token_tiers import (
    _BatchLedger,
    append_exactly_once,
    claim_stream,
)

__all__ = ["stream_embed_neardup"]


def stream_embed_neardup(
    stream_df: DataFrame,
    out_root: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    threshold: float = 0.9,
    seed: int = 7,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the ingest near-dup stream.

    ``dim`` is the embedding dimensionality (fixes the hyperplane set).
    Pairs land in ``{out_root}/pairs`` as (id_a, id_b, cos_r), id_a < id_b,
    exactly once; the accumulated bucketed vectors in ``{out_root}/vecs``.
    Returns the started StreamingQuery.
    """
    planes = lsh_planes(dim, n_planes, seed=seed)
    pairs_table = SnapshotTable(os.path.join(out_root, "pairs"))
    vecs_table = SnapshotTable(os.path.join(out_root, "vecs"))
    ledger = _BatchLedger(out_root)
    ckpt = checkpoint or os.path.join(out_root, "_checkpoint")
    claim_stream(out_root, ckpt)
    PAIRS, VECS = 0, 1

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(batch_id, PAIRS) and ledger.seen(batch_id, VECS):
            return
        spark = batch_df.sparkSession
        # a dim mismatch NULLs every plane dot product and hashes the whole
        # batch into bucket 0 — silently corpus x corpus; one column-pruned
        # agg per batch buys the loud failure instead
        lens = batch_df.select(
            F.min(F.size(vec_col)).alias("mn"), F.max(F.size(vec_col)).alias("mx")
        ).first()
        if lens["mx"] is not None and (lens["mn"] != dim or lens["mx"] != dim):
            raise ValueError(
                f"embedding length {lens['mn']}..{lens['mx']} != dim={dim}: "
                "hyperplane bucketing would degenerate to one bucket "
                "(corpus x corpus join) — pass the true dimensionality"
            )
        # cached, then unpersisted before return: norms/buckets computed
        # once for both the pairs join (twice) and the vecs append
        new = batch_df.select(
            F.col(id_col),
            F.col(vec_col).alias("v"),
            F.expr(_norm_expr(vec_col)).alias("nrm"),
            F.expr(bucket_expr(vec_col, planes)).alias("bucket"),
        ).persist()
        try:
            if vecs_table.current_snapshot_id() is not None:
                allv = vecs_table.read(spark).unionByName(new)
            else:
                allv = new
            a, b = allv.alias("a"), new.alias("b")
            pairs = (
                a.join(
                    b,
                    (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
                )
                .withColumn(
                    "cos_r",
                    F.round(
                        F.expr(_dot_expr("a.v", "b.v"))
                        / (F.col("a.nrm") * F.col("b.nrm")),
                        6,
                    ),
                )
                .filter(F.col("cos_r") >= threshold)
                .select(
                    F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
                    F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
                    "cos_r",
                )
                .distinct()
            )
            append_exactly_once(pairs_table, ledger, batch_id, PAIRS, pairs)
            append_exactly_once(vecs_table, ledger, batch_id, VECS, new)
        finally:
            new.unpersist()

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", ckpt
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
