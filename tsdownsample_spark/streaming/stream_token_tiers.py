"""Structured Streaming ingest of token sequences into the retention tiers.

The token-table retention ladder (operators/token_retention.py) is
*embarrassingly streaming-compatible*: every tier is a per-row narrow map —
no cross-row state, no event-time, no watermark.  A micro-batch of newly
arrived sequences can therefore be cascaded EXACTLY like a batch run: the
per-row north-rule invariant (tier tokens == reference selection from raw)
holds for streamed rows by construction, unlike the time-bucket rollup
(stream_rollup.py) which needs watermarked windows.

``stream_token_tiers`` wires a streaming source through ``foreachBatch``:
each micro-batch runs the full tier cascade and appends every tier to its
snapshot table.  Restart safety is two-layered:

* Spark's checkpoint makes the source offsets exactly-once *per batch id*;
* a batch-id ledger under the output root makes the sink **idempotent** —
  a re-delivered batch id (crash between the append and the checkpoint
  commit) is skipped instead of double-appended.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame

from tsdownsample_spark.operators.token_retention import token_tier_cascade
from tsdownsample_spark.sources.tableio import SnapshotTable


class _BatchLedger:
    """Crash-safe record of committed micro-batch ids (JSON lines, one file
    per batch — same atomic-rename idiom as streaming.checkpoint lineage)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_batches")
        os.makedirs(self.dir, exist_ok=True)

    def seen(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.dir, f"{batch_id}.json"))

    def commit(self, batch_id: int, info: dict) -> None:
        path = os.path.join(self.dir, f"{batch_id}.json")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, **info}, f)
        os.replace(tmp, path)

    def history(self) -> list[dict]:
        rows = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rows.append(json.load(fh))
        return rows


def stream_token_tiers(
    stream_df: DataFrame,
    out_root: str,
    tiers: Sequence[int] = (1024, 256, 64),
    algo: str = "minmax",
    mode: str = "auto",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query maintaining the retention ladder.

    ``stream_df`` is any streaming DataFrame with the input_hint columns
    (``readStream.schema(...).parquet(dir)``, Kafka + from_json, ...).
    Returns the started ``StreamingQuery``; tier ``n`` lands in
    ``{out_root}/tier_{n}`` as a snapshot table.
    """
    tables = {n: SnapshotTable(os.path.join(out_root, f"tier_{n}")) for n in tiers}
    ledger = _BatchLedger(out_root)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(batch_id):
            return
        out = token_tier_cascade(batch_df, list(tiers), algo=algo, mode=mode)
        snaps = {}
        for n in tiers:
            snaps[str(n)] = tables[n].append(out[n], summary={"batch_id": batch_id})
        ledger.commit(batch_id, {"snapshots": snaps})

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation",
        checkpoint or os.path.join(out_root, "_checkpoint"),
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
