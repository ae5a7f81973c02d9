"""Checkpoint/resume with per-partition lineage + throughput metrics.

The retention pipeline is *idempotent batch*, not Structured Streaming (the
reference has no streaming model; resumability comes from snapshot
bookkeeping, mirroring Iceberg's incremental-processing idiom):

* a job is a list of logical partitions (e.g. (source, day) slices);
* each completed partition appends an output snapshot AND a lineage row
  ``(job, partition, input_fingerprint, output_snapshot, rows, wall_ms,
  rows_per_sec, completed_ts)``;
* on restart, partitions whose lineage row matches the current input
  fingerprint are skipped — a crashed run resumes exactly where it stopped;
* if the input table advanced (new snapshot), fingerprints no longer match
  and the partition recomputes — correctness over cleverness.

Lineage rows are JSON lines appended atomically (one file per partition
completion — no read-modify-write races across concurrent drivers).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Callable, Iterable

from pyspark.sql import DataFrame

from tsdownsample_spark.sources.tableio import SnapshotTable


class PartitionedJob:
    def __init__(self, name: str, output: SnapshotTable, lineage_dir: str | None = None):
        self.name = name
        self.output = output
        self.lineage_dir = lineage_dir or os.path.join(output.root, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    # ------------------------------------------------------------ lineage
    def lineage(self) -> list[dict]:
        rows = []
        for f in sorted(os.listdir(self.lineage_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.lineage_dir, f)) as fh:
                    rows.append(json.load(fh))
        return rows

    def completed(self, input_fingerprint: str | None) -> set[str]:
        return {
            r["partition"]
            for r in self.lineage()
            if r["job"] == self.name and r["input_fingerprint"] == input_fingerprint
        }

    def _record(self, row: dict) -> None:
        path = os.path.join(self.lineage_dir, f"{uuid.uuid4().hex}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(row, f)
        os.replace(tmp, path)

    # ---------------------------------------------------------------- run
    def run(
        self,
        partitions: Iterable[str],
        process: Callable[[str], DataFrame],
        input_fingerprint: str | None = None,
        fail_fast: bool = True,
    ) -> dict:
        """Process each partition not already completed for this input state.

        Returns a summary {processed, skipped, failed, rows, wall_s}.
        """
        done = self.completed(input_fingerprint)
        processed, skipped, failed = [], [], []
        total_rows = 0
        t_job = time.time()
        for part in partitions:
            if part in done:
                skipped.append(part)
                continue
            t0 = time.time()
            try:
                df = process(part)
                sid = self.output.append(df, summary={"partition": part})
                # row count from parquet footers of the files just written —
                # no second computation of the partition
                import pyarrow.parquet as pq

                snap = self.output.snapshot(sid)
                rows = sum(
                    pq.ParquetFile(f).metadata.num_rows for f in snap["added_files"]
                )
            except Exception:
                failed.append(part)
                if fail_fast:
                    raise
                continue
            wall = time.time() - t0
            total_rows += rows
            self._record(
                {
                    "job": self.name,
                    "partition": part,
                    "input_fingerprint": input_fingerprint,
                    "output_snapshot": sid,
                    "rows": rows,
                    "wall_ms": round(wall * 1000, 1),
                    "rows_per_sec": round(rows / wall) if wall > 0 else None,
                    "completed_ts": time.time(),
                }
            )
            processed.append(part)
        return {
            "job": self.name,
            "processed": processed,
            "skipped": skipped,
            "failed": failed,
            "rows": total_rows,
            "wall_s": round(time.time() - t_job, 3),
        }


def input_fingerprint(path: str, params: dict | None = None) -> str:
    """Stable fingerprint of a job's input state: the input path + its file
    listing signature (name + mtime) + every job parameter that changes the
    output.  Folding the params in matters: a resume record from a run with
    different settings (algo, bucketing, column mapping) must NOT match, or
    the job would skip partitions whose stored results were computed under
    other semantics.

    sha256, never Python ``hash()`` — str hashing is randomized per process
    (spark-submit masks that by pinning PYTHONHASHSEED; plain ``python``
    does not), which would silently defeat resume across driver restarts.
    """
    import hashlib
    import json as _json

    if os.path.isdir(path):
        sig = sorted(
            (f, os.stat(os.path.join(path, f)).st_mtime_ns)
            for f in os.listdir(path)
        )
    else:
        sig = str(os.stat(path).st_mtime_ns)
    payload = path + str(sig) + _json.dumps(params or {}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:24]
