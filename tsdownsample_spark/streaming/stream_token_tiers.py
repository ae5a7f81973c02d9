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
* a (batch id, tier) ledger under the output root makes the sink
  **idempotent at tier granularity** — on a re-delivered batch id (crash
  between an append and the checkpoint commit) only the tiers whose
  marker is missing are appended; tiers written before the crash are
  skipped, never double-appended.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame

from tsdownsample_spark.operators.token_retention import token_tier_cascade
from tsdownsample_spark.sources.tableio import SnapshotTable


class _BatchLedger:
    """Crash-safe record of committed (micro-batch, tier) units — one JSON
    file per unit, atomic rename.  Per-TIER granularity matters: a crash
    between two tier appends of the same batch must, on redelivery, skip
    the tiers already written and append only the missing ones — a
    batch-level marker alone would double-append the finished tiers."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_batches")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, batch_id: int, tier: int) -> str:
        return os.path.join(self.dir, f"{batch_id}_{tier}.json")

    def seen(self, batch_id: int, tier: int) -> bool:
        return os.path.exists(self._path(batch_id, tier))

    def commit(self, batch_id: int, tier: int, info: dict) -> None:
        path = self._path(batch_id, tier)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "tier": tier, **info}, f)
        os.replace(tmp, path)

    def history(self) -> list[dict]:
        rows = []
        for f in os.listdir(self.dir):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rows.append(json.load(fh))
        # numeric order — lexicographic listing shuffles 10 before 2
        return sorted(rows, key=lambda r: (r["batch_id"], -r["tier"]))


def claim_stream(out_root: str, checkpoint: str) -> None:
    """Bind ``out_root`` to ONE streaming-checkpoint lineage.

    Batch ids are only meaningful within a checkpoint; pointing a DIFFERENT
    checkpoint (i.e. a new stream, whose batch ids restart at 0) at tables
    whose ledger already holds those ids would silently skip the new
    stream's first batches.  First use records the checkpoint path
    atomically; any later mismatch raises instead of dropping data.
    """
    os.makedirs(out_root, exist_ok=True)
    p = os.path.join(out_root, "_stream_checkpoint")
    cp = os.path.abspath(checkpoint)
    if os.path.exists(p):
        with open(p) as f:
            prev = f.read().strip()
        if prev != cp:
            raise ValueError(
                f"out_root {out_root!r} is bound to streaming checkpoint "
                f"{prev!r} but this query uses {cp!r}; resume with the "
                "original checkpoint or use a fresh out_root (reusing the "
                "batch-id ledger across checkpoints would silently skip "
                "the new stream's first batches)"
            )
        return
    tmp = p + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(cp)
    os.replace(tmp, p)


def append_exactly_once(
    table: SnapshotTable,
    ledger: _BatchLedger,
    batch_id: int,
    stage: int,
    df: DataFrame,
    summary: dict | None = None,
) -> str | None:
    """Append ``df`` to ``table`` at most once per (batch_id, stage),
    surviving a crash BETWEEN the table append and the ledger marker (two
    non-atomic filesystem operations): redelivery consults the ledger
    first, then the table's own snapshot summaries — the append is
    self-marking via its ``batch_id`` summary — and only then appends,
    repairing a missing marker when the summary is found.  Returns the new
    snapshot id, or None when the unit was already done.  The summary scan
    is O(snapshots) per call — fine for micro-batch cadence; a warehouse
    deployment would index summaries or bound the scan to recent commits.
    """
    if ledger.seen(batch_id, stage):
        return None
    for snap in table.history():
        if snap["summary"].get("batch_id") == batch_id:
            ledger.commit(
                batch_id, stage,
                {"snapshot": snap["snapshot_id"], "recovered": True},
            )
            return None
    sid = table.append(df, summary=dict(summary or {}, batch_id=batch_id))
    ledger.commit(batch_id, stage, {"snapshot": sid})
    return sid


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
    ckpt = checkpoint or os.path.join(out_root, "_checkpoint")
    claim_stream(out_root, ckpt)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        todo = [n for n in tiers if not ledger.seen(batch_id, n)]
        if not todo:
            return
        out = token_tier_cascade(batch_df, list(tiers), algo=algo, mode=mode)
        for n in todo:  # finished-before-crash tiers no-op inside
            append_exactly_once(tables[n], ledger, batch_id, n, out[n])

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", ckpt
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
