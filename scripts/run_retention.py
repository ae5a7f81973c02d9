#!/usr/bin/env python
"""Retention pipeline entrypoint — the spark-submit surface of the engine.

    spark-submit --py-files $(python -c 'from tsdownsample_spark.plans.shipping \
        import package_zip_path; print(package_zip_path())') \
        scripts/run_retention.py --input /root/testdata/sf0.01/events.parquet \
        --output /tmp/retention_demo --by event_type

Reads a long-form points table, materializes the raw->1m->1h->1d cascade
into snapshot tables (one per tier), partitioned by the series key with
checkpoint/resume + per-partition lineage.  Re-running with the same input
is a no-op (idempotent); crashing mid-run and re-running resumes.

Prints one JSON line with per-tier row counts, wall time and rows/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--by", default="event_type")
    ap.add_argument("--x-col", default="ts")
    ap.add_argument("--y-col", default="value")
    ap.add_argument("--uid-col", default=None)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tsdownsample_spark.operators.rollup import rollup_cascade, rollup_raw
    from tsdownsample_spark.plans.session import get_spark
    from tsdownsample_spark.plans.shipping import ship_package
    from tsdownsample_spark.sources.tableio import SnapshotTable
    from tsdownsample_spark.streaming.checkpoint import PartitionedJob, input_fingerprint

    t0 = time.time()
    spark = get_spark(app_name="retention-pipeline", master=f"local[{args.cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    src = spark.read.parquet(args.input)
    # input fingerprint: path + file-listing signature + the column-mapping
    # params (a resume record computed under a different mapping must not
    # match); becomes the Iceberg snapshot id when the source is a
    # SnapshotTable
    fingerprint = input_fingerprint(
        args.input,
        {"by": args.by, "x_col": args.x_col, "y_col": args.y_col,
         "uid_col": args.uid_col},
    )

    parts = sorted(str(r[0]) for r in src.select(args.by).distinct().collect())
    report: dict = {"tiers": {}, "input": args.input, "partitions": len(parts)}

    prev_tier: dict[str, SnapshotTable] = {}
    for tier, parent in (("1m", None), ("1h", "1m"), ("1d", "1h")):
        table = SnapshotTable(os.path.join(args.output, tier))
        job = PartitionedJob(f"retention_{tier}", table)

        def process(part: str, tier=tier, parent=parent, table=table):
            if parent is None:
                sub = src.filter(F.col(args.by) == part)
                return rollup_raw(
                    sub, tier, x_col=args.x_col, y_col=args.y_col,
                    by=[args.by], uid_col=args.uid_col,
                )
            sub = prev_tier[parent].read(spark).filter(F.col(args.by) == part)
            return rollup_cascade(sub, tier, by=[args.by])

        # a tier's input state includes its parent tier's snapshot: if the
        # parent recomputed, this tier's resume records are invalidated too
        tier_fp = fingerprint
        if parent is not None:
            tier_fp = f"{fingerprint}:{prev_tier[parent].current_snapshot_id()}"
        summary = job.run(parts, process, input_fingerprint=tier_fp)
        rows = sum(r["rows"] for r in job.lineage() if r["job"] == f"retention_{tier}")
        report["tiers"][tier] = {
            "processed": len(summary["processed"]),
            "skipped": len(summary["skipped"]),
            "rows": rows,
            "wall_s": summary["wall_s"],
        }
        prev_tier[tier] = table

    report["wall_s"] = round(time.time() - t0, 3)
    total_rows = sum(t["rows"] for t in report["tiers"].values())
    report["rows_per_sec"] = round(total_rows / max(report["wall_s"], 1e-9))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
