"""Snapshot table layer: Iceberg-shaped semantics over plain Parquet.

The sandbox has no Iceberg runtime jar, so this module provides the subset
of Iceberg semantics the engine codes against, in a way that swaps cleanly
for `spark.read.format("iceberg")` when the jar is present:

* **append-only data files** — every commit writes a new directory of
  parquet files; existing files are never mutated (compaction writes NEW
  files and publishes a replace commit; expiry deletes whole files);
* **atomic snapshots** — a commit is a JSON manifest (file list + parent
  snapshot + summary) written with write-then-rename; readers resolve a
  snapshot id to an exact file list (time travel for free);
* **current pointer** — `_snapshots/current` names the latest snapshot.

Scale notes: the manifest holds file paths + row counts only; at 100 TB the
file list per commit is thousands of entries — the JSON stays tiny relative
to data.  Readers pass the explicit file list to `spark.read.parquet`, so
partition pruning/pushdown still applies per file.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # ----------------------------------------------------------- snapshots
    def _snap_path(self, snapshot_id: str) -> str:
        return os.path.join(self.snap_dir, f"{snapshot_id}.json")

    def current_snapshot_id(self) -> str | None:
        cur = os.path.join(self.snap_dir, "current")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip() or None

    def snapshot(self, snapshot_id: str | None = None) -> dict | None:
        sid = snapshot_id or self.current_snapshot_id()
        if sid is None:
            return None
        with open(self._snap_path(sid)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        out = []
        sid = self.current_snapshot_id()
        while sid:
            snap = self.snapshot(sid)
            out.append(snap)
            sid = snap.get("parent")
        return list(reversed(out))

    # -------------------------------------------------------------- write
    def append(self, df: DataFrame, summary: dict | None = None) -> str:
        """Commit an append: write data files, then atomically publish a new
        snapshot whose file list = parent's files + the new ones."""
        files = self._write_data(df)
        parent = self.current_snapshot_id()
        prev_files = self.snapshot(parent)["files"] if parent else []
        return self._commit(prev_files + files, files, "append", summary)

    def _write_data(self, df: DataFrame) -> list:
        """Write ``df`` into a fresh commit directory; return its files."""
        data_dir = os.path.join(self.root, "data", uuid.uuid4().hex[:12])
        df.write.mode("overwrite").parquet(data_dir)
        return sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )

    def _commit(
        self, files: list, added: list, operation: str, summary: dict | None
    ) -> str:
        sid = f"{int(time.time() * 1e6)}-{uuid.uuid4().hex[:12]}"
        snap = {
            "snapshot_id": sid,
            "parent": self.current_snapshot_id(),
            "ts": time.time(),
            # "append" adds rows; "replace" rewrites the SAME rows into new
            # files (compaction) — incremental consumers must skip replace
            # commits or they double-read (operators/rollup.py honors this)
            "operation": operation,
            "files": files,
            "added_files": added,
            "summary": summary or {},
        }
        tmp = self._snap_path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self._snap_path(sid))
        cur_tmp = os.path.join(self.snap_dir, "current.tmp")
        with open(cur_tmp, "w") as f:
            f.write(sid)
        os.replace(cur_tmp, os.path.join(self.snap_dir, "current"))
        return sid

    # -------------------------------------------------------- maintenance
    def compact(
        self,
        spark: SparkSession,
        target_rows_per_file: int = 1_000_000,
        min_files: int = 2,
    ) -> str | None:
        """Rewrite the current file set into ~``target_rows_per_file``-sized
        files as a REPLACE commit (Iceberg's ``rewrite_data_files``).

        Many small appends (one per micro-batch / tier refresh) leave a
        table fragmented; at warehouse scale the scan's task count and
        footer-read overhead follow the file count, so compaction is routine
        maintenance.  Old files stay on disk — time travel to pre-compaction
        snapshots keeps working until ``expire_snapshots`` collects them.
        Row counts come from parquet footers (driver-side metadata reads,
        no data pass).  Merge-only: returns the new snapshot id, or None
        when the table has fewer than ``min_files`` data files OR is
        already at/above the target density (idempotent: compacting a
        compacted table is a no-op; oversized files are never split).
        """
        from tsdownsample_spark.sources.scan import parquet_footers

        snap = self.snapshot()
        if snap is None or len(snap["files"]) < min_files:
            return None
        rows = sum(md.num_rows for md in parquet_footers(snap["files"]))
        n_files = max(1, -(-rows // target_rows_per_file))
        if n_files >= len(snap["files"]):
            return None  # already at/above target density
        files = self._write_data(
            spark.read.parquet(*snap["files"]).repartition(n_files)
        )
        return self._commit(
            files, files, "replace",
            {"compacted_from": len(snap["files"]), "rows": rows},
        )

    def rewrite_filtered(
        self, spark: SparkSession, predicate: str, summary: dict | None = None
    ) -> str | None:
        """TTL / retention sweep: rewrite the current rows KEEPING only
        those satisfying ``predicate`` (a SQL boolean over the table's
        columns), as a REPLACE commit.

        This is how a retention policy ages raw data out while coarser
        tiers (already aggregated elsewhere) persist — e.g.
        ``raw.rewrite_filtered(spark, "ts >= timestamp '2024-06-01'")``
        after the 1m/1h/1d tiers have consumed the older rows.  Old files
        stay on disk for time travel until ``expire_snapshots``; replace
        commits are skipped by incremental consumers (continuous_rollup),
        so a sweep never double-feeds or starves a tier refresh.  Returns
        the new snapshot id, or None for an empty table or a sweep that
        would remove nothing (no-op guard: a scheduled sweep in a window
        where nothing aged out must not rewrite the whole table).  The
        predicate is evaluated by Spark — partition pruning / pushdown
        applies, and rows are rewritten only once however many files they
        spanned.
        """
        from tsdownsample_spark.sources.scan import parquet_footers

        snap = self.snapshot()
        if snap is None or not snap["files"]:
            return None
        total = sum(md.num_rows for md in parquet_footers(snap["files"]))
        df = spark.read.parquet(*snap["files"]).where(predicate)
        kept = df.count()
        if kept == total:
            return None
        files = self._write_data(df)
        return self._commit(
            files, files, "replace",
            dict(summary or {}, retention_predicate=predicate,
                 rows_kept=kept, rows_removed=total - kept),
        )

    def expire_snapshots(
        self,
        keep_last: int = 1,
        min_retained_snapshot_id: "str | list[str] | None" = None,
    ) -> dict:
        """Drop all but the last ``keep_last`` snapshots and delete data
        files no surviving snapshot references (Iceberg's
        ``expire_snapshots``).  The oldest kept snapshot becomes the chain
        root (its parent pointer is cleared — the one manifest rewrite).
        Returns {"expired_snapshots": n, "deleted_files": n}.

        Ordering with incremental consumers: only expire snapshots that
        every downstream cursor (continuous_rollup's raw_snapshot marker)
        has moved past — expiring an unconsumed append deletes files its
        delta still needs (the read then fails loudly, never silently).
        Pass those cursors as ``min_retained_snapshot_id`` (one id or a
        list — Iceberg's ref-based retention) and expiry will widen
        ``keep_last`` to retain every cursor snapshot and everything after
        it; a cursor id not found in the chain raises (it was already
        expired — the consumer must be rebuilt or repointed first).
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        hist = self.history()
        if min_retained_snapshot_id is not None:
            cursors = (
                [min_retained_snapshot_id]
                if isinstance(min_retained_snapshot_id, str)
                else list(min_retained_snapshot_id)
            )
            pos = {s["snapshot_id"]: i for i, s in enumerate(hist)}
            for cur in cursors:
                if cur not in pos:
                    raise ValueError(
                        f"consumer cursor {cur!r} is not in {self.root}'s "
                        "snapshot chain (already expired?) — refusing to "
                        "expire; rebuild or repoint the consumer first"
                    )
            keep_last = max(keep_last, len(hist) - min(pos[c] for c in cursors))
        if len(hist) <= keep_last:
            return {"expired_snapshots": 0, "deleted_files": 0}
        kept, expired = hist[-keep_last:], hist[:-keep_last]
        live = {f for snap in kept for f in snap["files"]}
        dead = {
            f for snap in expired for f in snap["files"] if f not in live
        }
        for f in sorted(dead):
            if os.path.exists(f):
                os.remove(f)
        for snap in expired:
            p = self._snap_path(snap["snapshot_id"])
            if os.path.exists(p):
                os.remove(p)
        root = dict(kept[0], parent=None)
        tmp = self._snap_path(root["snapshot_id"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(root, f)
        os.replace(tmp, self._snap_path(root["snapshot_id"]))
        return {"expired_snapshots": len(expired), "deleted_files": len(dead)}

    # --------------------------------------------------------------- read
    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snap = self.snapshot(snapshot_id)
        if snap is None or not snap["files"]:
            raise FileNotFoundError(f"table {self.root} has no committed data")
        return spark.read.parquet(*snap["files"])

    def fingerprint(self) -> str | None:
        """Stable identity of the current table state (for resume checks)."""
        return self.current_snapshot_id()


# ------------------------------------------------------------ format seam
#
# The engine codes against these two functions; whether a table is a real
# Iceberg table (jar present, identifier like "cat.db.tbl") or the local
# SnapshotTable stand-in (filesystem path) is decided here and nowhere else.


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog/runtime is on the session classpath."""
    try:  # pragma: no cover - jar absent in this sandbox
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "auto",
    summary: dict | None = None,
) -> str | None:
    """Append ``df`` to ``target``.

    fmt="iceberg": ``df.writeTo(target).using("iceberg").append()`` —
    ``target`` is a catalog identifier; returns None (Iceberg tracks its own
    snapshot ids).  fmt="snapshot": the local stand-in; ``target`` is a
    directory; returns the new snapshot id.  fmt="auto" picks iceberg when
    the runtime is present, else snapshot.
    """
    spark = df.sparkSession
    if fmt == "auto":
        fmt = "iceberg" if iceberg_available(spark) else "snapshot"
    if fmt == "iceberg":  # pragma: no cover - exercised via seam test mock
        df.writeTo(target).using("iceberg").append()
        return None
    if fmt == "snapshot":
        return SnapshotTable(target).append(df, summary=summary)
    raise ValueError(f"unknown table format {fmt!r}")


def read_table(
    spark: SparkSession,
    target: str,
    fmt: str = "auto",
    snapshot_id: str | None = None,
) -> DataFrame:
    """Read ``target`` (optionally time-traveling to ``snapshot_id``)."""
    if fmt == "auto":
        fmt = "iceberg" if iceberg_available(spark) else "snapshot"
    if fmt == "iceberg":  # pragma: no cover - exercised via seam test mock
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(target)
    if fmt == "snapshot":
        return SnapshotTable(target).read(spark, snapshot_id=snapshot_id)
    raise ValueError(f"unknown table format {fmt!r}")
