#!/usr/bin/env python
"""Interleaved A/B of the two impl="jvm" selector formulations on the
bench 'big' token shape (200 M points):

  slice — per bin: slice copy + array_min + array_max + 2 array_position
          (~4 traversals + an allocation per bin)
  fold  — per bin: ONE aggregate() pass over the index sequence
          (argmin/argmax fold, no copy, no rescans)

plus the jvm_scan_only roofline probe in the same rounds.  Min-of-rounds,
same session — the BENCH/BASELINE.md methodology.  Bit-parity of the two
forms is pytest-pinned (tests/test_jvm_selectors.py); this decides which
form the default should be.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))
N_OUT = 2000


def main() -> None:
    from scaling import memory_bandwidth_ceiling

    import bench as B
    from pyspark.sql import functions as F
    from tsdownsample_spark.operators.downsample import downsample_tokens
    from tsdownsample_spark.plans.session import get_spark

    path, total_points = B.bench_tokens_path(160, 1_250_000)  # the 'big' shape
    spark = get_spark(
        app_name="tsds-ab-jvmform",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path)
    df.select(F.sum(F.size("tokens"))).collect()  # warm page cache

    def run(algo: str, form: str):
        out = downsample_tokens(df, N_OUT, algo=algo, impl="jvm", jvm_form=form)
        out.select(F.sum(F.size("sel_idx"))).collect()

    variants = {
        "minmax_slice": lambda: run("minmax", "slice"),
        "minmax_fold": lambda: run("minmax", "fold"),
        "m4_slice": lambda: run("m4", "slice"),
        "m4_fold": lambda: run("m4", "fold"),
        "jvm_scan_only": lambda: df.select(F.sum(F.size("tokens"))).collect(),
    }
    walls: dict[str, list[float]] = {v: [] for v in variants}
    probes = {"start": memory_bandwidth_ceiling()}
    # House rule (BENCH/BASELINE.md "Post-fix adjudication"): randomize the
    # within-round order; fixed order taxes the first variant on short runs.
    import random as _random

    _random.seed(20260818)
    for rnd in range(ROUNDS + 1):  # round 0 = warm-up
        _order = list(variants.items())
        _random.shuffle(_order)
        for name, fn in _order:
            t0 = time.time()
            fn()
            w = time.time() - t0
            if rnd > 0:
                walls[name].append(round(w, 3))
    spark.stop()
    probes["end"] = memory_bandwidth_ceiling()

    mins = {k: min(v) for k, v in walls.items()}
    out = {
        "metric": "ab_jvm_form",
        "total_points": total_points,
        "cpus": CPUS,
        "rounds": ROUNDS,
        "walls": walls,
        "min": mins,
        "mpts_per_s": {k: round(total_points / v / 1e6, 1) for k, v in mins.items()},
        "fold_speedup": {
            "minmax": round(mins["minmax_slice"] / mins["minmax_fold"], 3),
            "m4": round(mins["m4_slice"] / mins["m4_fold"], 3),
        },
        "probes": probes,
    }
    with open(os.path.join(HERE, "ab_jvm_form.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
