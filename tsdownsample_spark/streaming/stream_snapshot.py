"""Streaming materialized latest-state view: maintain "the current row of
every series" at ingest — the live twin of operators/asof.py:
``asof_snapshot`` and the streaming form of an SCD-1 current table.

The argmax-by-(ts, tiebreak) aggregate is decomposable, so the same
append-only-partials design as stream_frequency.py applies and the
streaming form is EXACT with no per-key state store: each micro-batch
appends its per-key argmax row (one row per key seen in the batch —
shuffle ∝ batch key cardinality, never the accumulated corpus), and the
read path collapses partials with the SAME ``asof_snapshot`` operator
(``at=None``).  Late or out-of-order data needs no special casing at
all: the max ordering over appended partials IS the max ordering over
everything ingested, whatever order it arrived in.

Crash safety: stream_token_tiers' ledger + ``claim_stream`` lineage
guard — each batch's partial lands exactly once per batch id.
Compaction: the partials table grows by #keys-per-batch rows; a periodic
``sources/tableio.compact`` rewrite with the read-side snapshot folds it
back to one row per key (a pure re-aggregation, same as the counts
table).

Equivalence (pytest): after the stream drains,
``latest_state_snapshot(...)`` == ``asof_snapshot(batch_df, at=None)``
over the full corpus, row for row, including duplicate-timestamp
tiebreaks.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from tsdownsample_spark.operators.asof import asof_snapshot
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_token_tiers import (
    _BatchLedger,
    append_exactly_once,
    claim_stream,
)

__all__ = ["stream_latest_state", "latest_state_snapshot"]

_STAGE = 0  # single ledger stage: the per-batch argmax-partials append


def stream_latest_state(
    stream_df: DataFrame,
    out_root: str,
    x_col: str = "ts",
    by: Sequence[str] = ("series_key",),
    tiebreak: Sequence[str] = (),
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the latest-state ingest stream.

    ``stream_df``: any streaming DataFrame containing ``by + [x_col] +
    tiebreak`` (+ payload columns).  Per-key argmax partials accumulate in
    ``{out_root}/state``.  Returns the started StreamingQuery.  Pass a
    unique column in ``tiebreak`` whenever ``(by, x_col)`` is not unique,
    exactly as with the batch operator.
    """
    by = list(by)
    tiebreak = list(tiebreak)
    table = SnapshotTable(os.path.join(out_root, "state"))
    ledger = _BatchLedger(out_root)
    ckpt = checkpoint or os.path.join(out_root, "_checkpoint")
    claim_stream(out_root, ckpt)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(batch_id, _STAGE):
            return
        partial = asof_snapshot(
            batch_df.where(f"{x_col} IS NOT NULL"),
            None,
            x_col=x_col,
            by=by,
            tiebreak=tiebreak,
        )
        append_exactly_once(table, ledger, batch_id, _STAGE, partial)

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", ckpt
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_state_snapshot(
    spark: SparkSession,
    out_root: str,
    x_col: str = "ts",
    by: Sequence[str] = ("series_key",),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """The current row of every series over everything ingested so far —
    the batch operator over the partials table (argmax of argmaxes)."""
    state = SnapshotTable(os.path.join(out_root, "state")).read(spark)
    return asof_snapshot(state, None, x_col=x_col, by=by, tiebreak=tiebreak)
