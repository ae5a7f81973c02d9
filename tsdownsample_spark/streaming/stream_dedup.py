"""Streaming near-duplicate detection at ingest: incremental MinHash-LSH
via ``foreachBatch`` against an accumulated banded-signature table.

A 100 TB training-data pipeline dedups AT INGEST, not as an offline pass:
each arriving micro-batch of documents must be checked against everything
already accepted.  The LSH decomposition makes this incremental for free —
a pair of docs is a candidate iff they share a band hash, a per-doc
property, so checking a batch means joining ONLY the batch's banded rows
against the accumulated band table (shuffle on (band_idx, band_hash), the
same canonical LSH key as the batch operator; per-batch cost is
batch-size x matched buckets, never corpus x corpus).

Exactly-once output (stream == batch): a candidate pair (x, y) with y in
the later (or same) batch is emitted exactly once — in y's batch, where x
is already in the band table (or arrives alongside y).  The union of
per-batch pair outputs therefore EQUALS ``lsh_candidate_pairs`` over the
full corpus — set-for-set, proved by the equivalence pytest — because
signatures are deterministic per document.  Crash safety follows
stream_token_tiers' two layers: Spark's checkpoint for source offsets and
a (batch, stage) ledger so a redelivered batch id never double-appends
pairs or bands ("pairs" commits BEFORE "bands", so pair computation always
sees the pre-batch band table).

Reference framing: the batch operators in operators/dedup.py pin the
semantics (MinHash signatures, banded LSH); this module only changes WHEN
the join runs, not what it computes.

Id discipline: the exactly-once argument assumes each ``id_col`` value is
ingested once.  Re-ingesting an id appends its bands again and
re-announces its pairs — upstream exact dedup (or the pairs consumer)
owns id uniqueness, exactly as in a batch re-run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdownsample_spark.operators.dedup import banded_signatures, minhash_signatures
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_token_tiers import (
    _BatchLedger,
    append_exactly_once,
    claim_stream,
)

__all__ = ["stream_dedup_minhash", "latest_clusters"]


def stream_dedup_minhash(
    stream_df: DataFrame,
    out_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle: int = 3,
    bands: int = 4,
    rows: int = 4,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
    emit_clusters: bool = False,
):
    """Start the ingest-dedup stream.

    ``stream_df``: any streaming DataFrame with (id_col, text_col).
    Candidate pairs land in ``{out_root}/pairs`` (id_a < id_b, exactly
    once across all batches); the accumulated banded signatures in
    ``{out_root}/bands``.  Returns the started StreamingQuery.

    ``emit_clusters=True`` additionally maintains near-dup CLUSTER
    assignments at ingest: after each batch's pairs commit, connected
    components run over the ACCUMULATED pair set (cost ∝ the duplicate
    subset, never the corpus) and every (node, component) assignment not
    yet in the ``{out_root}/clusters`` log is appended with the batch id.
    Pairs only accumulate, so components only MERGE and a node's
    component id is non-increasing over time — each append is therefore a
    retroactive-reassignment event (a later batch can re-home nodes
    emitted earlier, exactly like stream_spans' retroactive duplicate
    announcements), the log is append-only (Iceberg-friendly), and the
    LATEST event per node (:func:`latest_clusters`) always equals the
    batch operator ``connected_components`` over all pairs so far — the
    stream==batch proof the equivalence pytest replays.
    """
    pairs_table = SnapshotTable(os.path.join(out_root, "pairs"))
    bands_table = SnapshotTable(os.path.join(out_root, "bands"))
    clusters_table = SnapshotTable(os.path.join(out_root, "clusters"))
    ledger = _BatchLedger(out_root)
    ckpt = checkpoint or os.path.join(out_root, "_checkpoint")
    claim_stream(out_root, ckpt)
    # ledger stages ride the tier slot: 0 = pairs, 1 = bands, 2 = clusters
    PAIRS, BANDS, CLUSTERS = 0, 1, 2

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        done = ledger.seen(batch_id, PAIRS) and ledger.seen(batch_id, BANDS)
        if done and (not emit_clusters or ledger.seen(batch_id, CLUSTERS)):
            return
        spark = batch_df.sparkSession
        # cached, then unpersisted before return: the md5/shingle work runs
        # once and serves both the pairs join (twice) and the bands append
        new_banded = banded_signatures(
            minhash_signatures(
                batch_df, text_col=text_col, id_col=id_col, k=k, shingle=shingle
            ),
            id_col=id_col,
            bands=bands,
            rows=rows,
        ).persist()
        try:
            if bands_table.current_snapshot_id() is not None:
                all_banded = bands_table.read(spark).unionByName(new_banded)
            else:
                all_banded = new_banded
            a, b = all_banded.alias("a"), new_banded.alias("b")
            pairs = (
                a.join(
                    b,
                    (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
                )
                .select(
                    F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
                    F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
                )
                .distinct()
            )
            append_exactly_once(pairs_table, ledger, batch_id, PAIRS, pairs)
            append_exactly_once(bands_table, ledger, batch_id, BANDS, new_banded)
            if emit_clusters and not ledger.seen(batch_id, CLUSTERS):
                from tsdownsample_spark.operators.dedup import (
                    connected_components,
                )

                cc_now = connected_components(pairs_table.read(spark))
                if clusters_table.current_snapshot_id() is not None:
                    seen_assign = clusters_table.read(spark).select(
                        "node", "component"
                    )
                    changed = cc_now.join(
                        seen_assign, ["node", "component"], "left_anti"
                    )
                else:
                    changed = cc_now
                append_exactly_once(
                    clusters_table,
                    ledger,
                    batch_id,
                    CLUSTERS,
                    changed.withColumn("batch_id", F.lit(int(batch_id))),
                )
        finally:
            new_banded.unpersist()

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", ckpt
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_clusters(spark, out_root: str) -> DataFrame:
    """Current cluster map from the reassignment log: the latest event per
    node (components only merge, so the max-batch event is the live one;
    within a batch a node appears at most once)."""
    from pyspark.sql import Window as W

    log = SnapshotTable(os.path.join(out_root, "clusters")).read(spark)
    w = W.partitionBy("node").orderBy(F.col("batch_id").desc())
    return (
        log.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("node", "component")
    )
