"""Streaming substring-level dedup at ingest: incremental duplicate-span
detection via ``foreachBatch`` against accumulated window-hash state.

The batch operator (``operators/dedup.duplicate_spans``) flags every
stride-aligned token window whose exact content occurs ``min_count``+
times corpus-wide.  At ingest the corpus GROWS: a window unique today
becomes duplicated when its twin arrives tomorrow — so the stream must
emit retroactively (the OLD occurrence surfaces in the NEW batch) while
never emitting the same occurrence twice.

State (SnapshotTable per out_root):
  * ``spans``   — every (id, start, win_hash) ingested so far;
  * ``hashes``  — win_hash values already announced as duplicated;
  * ``dups``    — the output: occurrences of duplicated windows.

Per batch: the batch's spans are derived once (the shared
``window_spans`` expression), their hash counts joined against the
accumulated spans RESTRICTED to the batch's hashes (never a full
corpus x corpus comparison).  A hash crossing ``min_count`` for the first
time emits ALL its occurrences (accumulated + new); a hash already in
``hashes`` emits only the new ones.  The union of per-batch ``dups``
outputs therefore equals the batch operator's (id, start, win_hash)
projection over the full corpus — set-for-set, proved by the equivalence
pytest.  (``n_dup`` is deliberately NOT part of the streaming contract:
it is a corpus-wide aggregate that keeps growing after emission; compute
it from ``spans`` at read time if needed.)

Crash safety follows stream_dedup/stream_token_tiers: Spark's checkpoint
for source offsets plus the (batch, stage) ledger; ``dups`` commits FIRST
so emission always computes against the pre-batch ``spans``/``hashes``
state and a redelivered batch is a no-op at every stage.

Scale shape: per-batch cost is batch-window-count plus the accumulated
spans matching the batch's hashes.  The accumulated-spans scan is
hash-semi-join-restricted; a 100 TB deployment would additionally bucket
the ``spans`` table by a win_hash prefix so the restriction prunes files,
exactly like the band table in stream_dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdownsample_spark.operators.dedup import window_spans
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_token_tiers import (
    _BatchLedger,
    append_exactly_once,
    claim_stream,
)

__all__ = ["stream_duplicate_spans"]


def stream_duplicate_spans(
    stream_df: DataFrame,
    out_root: str,
    window: int = 16,
    stride: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the ingest duplicate-span stream.

    ``stream_df``: any streaming DataFrame with (id_col, tokens_col).
    Duplicated-window occurrences land in ``{out_root}/dups`` as
    ``(<id_col>, start, win_hash)`` exactly once across all batches;
    the full span ledger in ``{out_root}/spans``; announced hashes in
    ``{out_root}/hashes``.  Returns the started StreamingQuery.
    """
    dups_table = SnapshotTable(os.path.join(out_root, "dups"))
    spans_table = SnapshotTable(os.path.join(out_root, "spans"))
    hashes_table = SnapshotTable(os.path.join(out_root, "hashes"))
    ledger = _BatchLedger(out_root)
    ckpt = checkpoint or os.path.join(out_root, "_checkpoint")
    claim_stream(out_root, ckpt)
    DUPS, SPANS, HASHES = 0, 1, 2

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if (
            ledger.seen(batch_id, DUPS)
            and ledger.seen(batch_id, SPANS)
            and ledger.seen(batch_id, HASHES)
        ):
            return
        spark = batch_df.sparkSession
        new_spans = window_spans(
            batch_df,
            window=window,
            stride=stride,
            id_col=id_col,
            tokens_col=tokens_col,
        ).persist()
        try:
            if spans_table.current_snapshot_id() is not None:
                old_spans = spans_table.read(spark)
            else:
                old_spans = spark.createDataFrame([], new_spans.schema)
            if hashes_table.current_snapshot_id() is not None:
                known = hashes_table.read(spark)
            else:
                known = spark.createDataFrame([], "win_hash string")

            new_counts = new_spans.groupBy("win_hash").agg(
                F.count("*").alias("_n_new")
            )
            # accumulated occurrences of ONLY the batch's hashes — the
            # semi-join restriction that keeps per-batch cost bounded
            old_hits = old_spans.join(
                new_counts.select("win_hash"), "win_hash", "left_semi"
            ).persist()
            old_counts = old_hits.groupBy("win_hash").agg(
                F.count("*").alias("_n_old")
            )
            totals = new_counts.join(old_counts, "win_hash", "left").select(
                "win_hash",
                (F.col("_n_new") + F.coalesce(F.col("_n_old"), F.lit(0))).alias(
                    "_n"
                ),
            )
            newly = (
                totals.where(F.col("_n") >= min_count)
                .join(known, "win_hash", "left_anti")
                .select("win_hash")
            )
            already = new_counts.select("win_hash").join(
                known, "win_hash", "left_semi"
            )
            emit = old_hits.join(newly, "win_hash", "left_semi").unionByName(
                new_spans.join(
                    newly.unionByName(already), "win_hash", "left_semi"
                )
            ).select(id_col, "start", "win_hash")
            append_exactly_once(dups_table, ledger, batch_id, DUPS, emit)
            append_exactly_once(
                hashes_table, ledger, batch_id, HASHES, newly
            )
            append_exactly_once(spans_table, ledger, batch_id, SPANS, new_spans)
        finally:
            new_spans.unpersist()
            try:
                old_hits.unpersist()
            except NameError:  # pragma: no cover - failed before persist
                pass

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", ckpt
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
