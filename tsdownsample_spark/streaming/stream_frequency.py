"""Streaming heavy hitters: incremental per-group value counts at ingest.

Corpus frequency statistics (most frequent tokens / domains / fingerprints
per source) are monitored DURING ingest, not recomputed from scratch —
and counts are a commutative monoid, so the streaming form is exact, not
approximate: each micro-batch contributes its map-side-combined partial
``(group, value, freq_partial)`` rows, and the accumulated table's
group-sum equals the batch count over everything ingested so far.  No
per-key state store is needed at all — the append-only partials table IS
the state, and the merge happens at read time.

Two pieces:

* ``stream_value_counts`` — ``foreachBatch`` sink appending each batch's
  partial counts to a snapshot table, exactly once per batch id
  (stream_token_tiers' ledger + ``claim_stream`` lineage guard, the same
  crash-safety layer as the other ingest streams).  Per-batch cost is one
  partial aggregation of the batch — shuffle volume ∝ the batch's
  DISTINCT (group, value) cardinality, never the accumulated corpus.
* ``heavy_hitters_snapshot`` — top-k over the accumulated table: exactly
  ``operators/frequency.heavy_hitters`` with ``weight_col=freq_partial``
  (sum-merge of partials), so the streaming read path and the batch
  operator are literally the same code.

Equivalence (proved in pytest): after the stream drains,
``heavy_hitters_snapshot(...)`` == ``heavy_hitters(batch_df, ...)`` over
the full corpus, row for row.  Compaction note: the partials table grows
by #distinct-per-batch rows each batch; `sources/tableio.compact` folds
it back — at warehouse scale one would periodically rewrite the table
with its group-sum, which this layout makes a pure re-aggregation.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdownsample_spark.operators.frequency import heavy_hitters
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_token_tiers import (
    _BatchLedger,
    append_exactly_once,
    claim_stream,
)

__all__ = ["stream_value_counts", "heavy_hitters_snapshot"]

_STAGE = 0  # single ledger stage: the partial-counts append


def stream_value_counts(
    stream_df: DataFrame,
    out_root: str,
    col: str,
    by: Sequence[str] = (),
    weight_col: str | None = None,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the ingest counting stream.

    ``stream_df``: any streaming DataFrame containing ``by + [col]`` (and
    ``weight_col`` if given — rows then contribute their weight instead of
    1, e.g. ``n_tok`` to track token mass).  Partial counts accumulate in
    ``{out_root}/counts``.  Returns the started StreamingQuery.
    """
    by = list(by)
    table = SnapshotTable(os.path.join(out_root, "counts"))
    ledger = _BatchLedger(out_root)
    ckpt = checkpoint or os.path.join(out_root, "_checkpoint")
    claim_stream(out_root, ckpt)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(batch_id, _STAGE):
            return
        # Keep the partial sum's NATIVE type: a per-batch cast to long would
        # truncate fractional weights batch-by-batch and break the documented
        # stream==batch equivalence for non-integral weight_col (ADVICE r4).
        # count() is already long; sum() stays long for integral weights and
        # double for fractional ones — exactly what batch heavy_hitters sums.
        w = (
            F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
        ).alias("freq_partial")
        partial = batch_df.where(F.col(col).isNotNull()).groupBy(*by, col).agg(w)
        append_exactly_once(table, ledger, batch_id, _STAGE, partial)

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", ckpt
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def heavy_hitters_snapshot(
    spark: SparkSession,
    out_root: str,
    col: str,
    by: Sequence[str] = (),
    k: int = 10,
) -> DataFrame:
    """Exact top-k over everything the stream has ingested so far — the
    batch operator with the partials' sum as the weight."""
    counts = SnapshotTable(os.path.join(out_root, "counts")).read(spark)
    return heavy_hitters(counts, col, by=by, k=k, weight_col="freq_partial")
