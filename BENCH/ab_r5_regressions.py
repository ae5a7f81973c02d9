#!/usr/bin/env python
"""Round-5 adjudication of the four r4 per-query bench regressions
(VERDICT r4 "what's wrong" #1 / next-round task 2).

Facts first, from git (f46dea3 = r3-HEAD vs HEAD): the executed code of
``q_anomaly``, ``q_downsample_error`` and ``q_rollup_1d`` is IDENTICAL to
round 3 — the query bodies, the shared ``load``/``event_series`` helpers,
and their operators (``rolling_zscore`` frame branch, ``downsample_error``,
``retention_tiers``/``with_derived``) all compare byte-equal; r4's changes
to anomaly.py/rollup.py touched only the NEW prefix impl and the
metadata-only ``continuous_rollup`` cursor walk, neither in these plans.
Only ``q_gapfill_linear``'s plan actually changed: commit 5baebe6 added the
in-plan ``max_buckets`` raise_error guard to ``gap_fill``.

So the A/B proper is guard-on vs guard-off — ``max_buckets=None``
reproduces the r3 plan exactly — interleaved in ONE session, min-of-rounds
(the BENCH/BASELINE.md mapInArrow methodology).  The three code-identical
queries get a calm re-measure in the same interleaving: if their calm walls
return to ~r3 levels, the r4 driver readings were co-tenant throttle.

Launch gate: same double-probe calm gate as calm_watcher.py (the numbers
are meaningless in a throttled window); ceiling probes recorded at start,
mid, and end so the window is legible in the artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))
CALM_CORES = float(os.environ.get("CALM_CORES", "9"))
CALM_SINGLE_S = float(os.environ.get("CALM_SINGLE_S", "0.7"))
POLL_S = int(os.environ.get("CALM_POLL_S", "240"))
ATTEMPTS = int(os.environ.get("CALM_ATTEMPTS", "45"))

R3_WALLS = {  # BENCH_r03.json, the pre-regression driver readings
    "anomaly": 5.25,
    "dserr": 2.18,
    "rollup_1d": 1.22,
    "gapfill_guard": 1.51,
}
R4_WALLS = {"anomaly": 8.0, "dserr": 4.37, "rollup_1d": 2.44, "gapfill_guard": 3.10}


def wait_calm():
    from scaling import memory_bandwidth_ceiling

    for _ in range(ATTEMPTS):
        c = memory_bandwidth_ceiling()
        print(time.strftime("%H:%M:%S"), c, flush=True)
        if (
            c["effective_parallel_cores"] >= CALM_CORES
            and c["single_task_s"] <= CALM_SINGLE_S
        ):
            time.sleep(60)
            c2 = memory_bandwidth_ceiling()
            print("confirm", c2, flush=True)
            if c2["effective_parallel_cores"] >= CALM_CORES - 1:
                return c2
        time.sleep(POLL_S)
    raise SystemExit("no calm window found")


def main() -> None:
    from scaling import memory_bandwidth_ceiling

    probe0 = wait_calm()

    from tsdownsample_spark.plans.session import get_spark

    spark = get_spark(
        app_name="tsds-ab-r5",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    import tsdownsample_spark.operators.gapfill as G
    from tsdownsample_spark.queries import (
        _q_gapfill,
        _q_rollup,
        q_anomaly,
        q_downsample_error,
    )

    _orig_gap_fill = G.gap_fill

    def _gap_fill_r3plan(*a, **k):
        k["max_buckets"] = None  # exactly the pre-5baebe6 plan
        return _orig_gap_fill(*a, **k)

    def run_gapfill(guard: bool):
        G.gap_fill = _orig_gap_fill if guard else _gap_fill_r3plan
        try:
            return _q_gapfill("linear")(spark, SF_DIR)
        finally:
            G.gap_fill = _orig_gap_fill

    variants = {
        "gapfill_guard": lambda: run_gapfill(True),
        "gapfill_r3plan": lambda: run_gapfill(False),
        "rollup_1d": lambda: _q_rollup("1d")(spark, SF_DIR),
        "anomaly": lambda: q_anomaly(spark, SF_DIR),
        "dserr": lambda: q_downsample_error(spark, SF_DIR),
    }

    walls: dict[str, list[float]] = {v: [] for v in variants}
    probes = {"start": probe0}
    # House rule (BENCH/BASELINE.md "Post-fix adjudication"): RANDOMIZE the
    # within-round order — a fixed order taxes the first variant ~1.2x on
    # short queries, and min-of-rounds cannot cancel a fixed position cost.
    import random as _random

    _random.seed(20260818)
    for rnd in range(ROUNDS + 1):  # round 0 = warm-up, discarded
        _order = list(variants.items())
        _random.shuffle(_order)
        for name, fn in _order:
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            if rnd > 0:
                walls[name].append(round(w, 3))
        if rnd == ROUNDS // 2:
            probes["mid"] = memory_bandwidth_ceiling()
    spark.stop()
    probes["end"] = memory_bandwidth_ceiling()

    out = {
        "metric": "ab_r5_regressions",
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "rounds": ROUNDS,
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
        "r3_driver_walls": R3_WALLS,
        "r4_driver_walls": R4_WALLS,
        "guard_overhead_x": round(
            min(walls["gapfill_guard"]) / min(walls["gapfill_r3plan"]), 3
        ),
        "probes": probes,
    }
    with open(os.path.join(HERE, "ab_r5_regressions.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
