#!/usr/bin/env python
"""Token-table retention pipeline — the north-rule spark-submit surface.

    spark-submit --py-files $(python -c 'from tsdownsample_spark.plans.shipping \
        import package_zip_path; print(package_zip_path())') \
        scripts/run_token_retention.py --input tokens.parquet \
        --output /tmp/token_tiers --tiers 1024,256,64

Reads the BASELINE input_hint table ``(doc_id string, tokens array<int32>,
n_tok int32, source string)`` and materializes a retention ladder of
downsampled tiers (raw -> 1024 -> 256 -> 64 points by default), each tier
its own snapshot table with checkpoint/resume and per-partition lineage.
Resume partitions are SALT BUCKETS (``xxhash64(doc_id) % buckets``), not the
skewed ``source`` key, so every resume unit is evenly sized no matter how
lopsided the sources are (plans.partitioning).  Cascading tiers are read
back from the parent tier's snapshot — no tier recomputes its ancestors.

Re-running with the same input is a no-op; crashing mid-run and re-running
resumes.  ``--verify-sample K`` re-derives K sampled sequences per tier
through the reference class API (tsdownsample drop-in surface, compat.py)
and asserts token-array equality — the north rule's per-row invariant.

Prints one JSON line with per-tier rows/points, lineage counts, wall time,
rows/sec and tokens/sec.
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
    ap.add_argument("--tiers", default="1024,256,64")
    ap.add_argument("--algo", default="minmax")
    ap.add_argument("--mode", default="auto", choices=["auto", "cascade", "from_raw"])
    ap.add_argument("--buckets", type=int, default=8, help="salt-bucket resume units")
    ap.add_argument("--verify-sample", type=int, default=0)
    ap.add_argument(
        "--pack", action="store_true",
        help="store tier tokens bit-packed (~2x smaller; codecs.encode_tokens)",
    )
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()
    tiers = [int(t) for t in args.tiers.split(",")]

    from pyspark.sql import functions as F

    from tsdownsample_spark.operators.token_retention import downsample_tier, resolve_plan
    from tsdownsample_spark.plans.session import get_spark
    from tsdownsample_spark.plans.shipping import ship_package
    from tsdownsample_spark.sources.tableio import SnapshotTable
    from tsdownsample_spark.streaming.checkpoint import PartitionedJob, input_fingerprint

    t0 = time.time()
    spark = get_spark(
        app_name="token-retention", master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    # post-session import: compress.py's module-level pandas_udf decorators
    # need an active SparkSession
    from tsdownsample_spark.operators.compress import compress_tokens, decompress_tokens

    raw = spark.read.parquet(args.input)
    # params folded in: a resume record from a run with a different algo /
    # ladder / bucketing must not match (its tables hold other semantics)
    fingerprint = input_fingerprint(
        args.input,
        {"tiers": tiers, "algo": args.algo, "mode": args.mode,
         "buckets": args.buckets, "pack": args.pack},
    )
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(args.buckets))
    parts = [str(b) for b in range(args.buckets)]

    try:
        plan = resolve_plan(tiers, args.algo, args.mode)
    except ValueError as e:
        raise SystemExit(str(e))

    report: dict = {
        "input": args.input, "algo": args.algo, "buckets": args.buckets,
        "plan": [{"n_out": n, "from": parent or "raw"} for n, parent in plan],
        "tiers": {},
    }
    tables: dict[int, SnapshotTable] = {}
    for n_out, parent in plan:
        table = SnapshotTable(os.path.join(args.output, f"tier_{n_out}"))
        job = PartitionedJob(f"token_tier_{n_out}", table)

        def process(part: str, n_out=n_out, parent=parent):
            src = raw if parent is None else tables[parent].read(spark)
            if parent is not None and args.pack:
                src = decompress_tokens(src)  # cascade reads packed parents
            sub = src.filter(salt == int(part))
            out = downsample_tier(sub, n_out, algo=args.algo)
            return compress_tokens(out) if args.pack else out

        tier_fp = fingerprint
        if parent is not None:
            tier_fp = f"{fingerprint}:{tables[parent].current_snapshot_id()}"
        summary = job.run(parts, process, input_fingerprint=tier_fp)
        rows = sum(r["rows"] for r in job.lineage() if r["job"] == f"token_tier_{n_out}")
        stored = table.read(spark)
        if args.pack:
            stored = decompress_tokens(stored)
        pts = (
            stored
            .agg(F.sum(F.when(F.col("tokens").isNotNull(), F.size("tokens")).otherwise(0)))
            .collect()[0][0]
            or 0
        )
        report["tiers"][str(n_out)] = {
            "processed": len(summary["processed"]),
            "skipped": len(summary["skipped"]),
            "rows": rows,
            "points": int(pts),
            "wall_s": summary["wall_s"],
        }
        tables[n_out] = table

    if args.verify_sample:
        report["invariant"] = _verify_invariant(
            spark, raw, tables, args.algo, args.verify_sample, pack=args.pack
        )

    report["wall_s"] = round(time.time() - t0, 3)
    total_rows = sum(t["rows"] for t in report["tiers"].values())
    n_tok_expr = (
        F.col("n_tok")
        if "n_tok" in raw.columns
        else F.when(F.col("tokens").isNotNull(), F.size("tokens")).otherwise(0)
    )
    tokens_in = raw.agg(F.sum(n_tok_expr)).collect()[0][0] or 0
    report["rows_per_sec"] = round(total_rows / max(report["wall_s"], 1e-9))
    report["tokens_in"] = int(tokens_in)
    report["tokens_per_sec"] = round(tokens_in / max(report["wall_s"], 1e-9))
    print(json.dumps(report))
    spark.stop()
    if args.verify_sample and not report["invariant"]["ok"]:
        raise SystemExit("invariant check FAILED — see report JSON")


def _verify_invariant(spark, raw, tables, algo: str, k: int, pack: bool = False) -> dict:
    """North-rule per-row invariant: for K sampled sequences, every tier's
    token array equals what the reference (drop-in class API) selects from
    the raw sequence at that tier's n_out."""
    import numpy as np
    from pyspark.sql import functions as F

    from tsdownsample_spark import compat

    cls = {
        "minmax": compat.MinMaxDownsampler,
        "m4": compat.M4Downsampler,
        "lttb": compat.LTTBDownsampler,
        "minmaxlttb": compat.MinMaxLTTBDownsampler,
        "everynth": compat.EveryNthDownsampler,
    }[algo]
    sample = (
        raw.filter(F.col("tokens").isNotNull())
        .orderBy(F.xxhash64("doc_id"))
        .limit(k)
        .select("doc_id", "tokens")
        .collect()
    )
    ids = [r["doc_id"] for r in sample]
    checked, ok = 0, True
    for n_out, table in tables.items():
        stored = table.read(spark)
        if pack:
            from tsdownsample_spark.operators.compress import decompress_tokens

            stored = decompress_tokens(stored)
        got = {
            r["doc_id"]: (list(r["sel_idx"]), list(r["tokens"]))
            for r in stored.filter(F.col("doc_id").isin(ids))
            .select("doc_id", "sel_idx", "tokens")
            .collect()
        }
        for r in sample:
            y = np.asarray(r["tokens"], dtype=np.int32)
            exp = (
                np.arange(len(y))
                if len(y) <= n_out
                else np.asarray(cls().downsample(y, n_out=n_out))
            )
            checked += 1
            if got.get(r["doc_id"]) != (list(exp), list(y[exp])):
                ok = False
    return {"sampled_docs": len(ids), "checks": checked, "ok": ok}


if __name__ == "__main__":
    main()
