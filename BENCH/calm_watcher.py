#!/usr/bin/env python
"""Launch BENCH/scaling.py only inside a verified-calm co-tenancy window.

This sandbox VM's deliverable CPU/bandwidth swings 3-4x minute to minute
(co-tenant bursts).  Scaling-efficiency numbers taken in a throttled
window under-read the engine (see BENCH/BASELINE.md runs M/N/O vs P):
with a measured ceiling of c effective cores, a stream-bound phase cannot
exceed c/2 speedup going 2->8 cores no matter how well the engine scales.

Method (produced run P, pipeline 0.94 / downsample 0.91):
1. probe the memory-bandwidth ceiling (scaling.py's microbenchmark);
2. require effective_parallel_cores >= CALM_CORES and a fast single task;
3. re-probe 60 s later — only a CONFIRMED calm window triggers the run
   (a single calm probe is often the leading edge of a burst);
4. run scaling.py (levels via BENCH_LEVELS, default 2,8 — the N->4N gate)
   and rely on its interleaved min-of-rounds to shed any burst that
   arrives mid-run.

Usage: python BENCH/calm_watcher.py   (polls up to ~3 h, exits after one run)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALM_CORES = float(os.environ.get("CALM_CORES", "9"))
CALM_SINGLE_S = float(os.environ.get("CALM_SINGLE_S", "0.7"))
POLL_S = int(os.environ.get("CALM_POLL_S", "240"))
ATTEMPTS = int(os.environ.get("CALM_ATTEMPTS", "45"))


def main() -> int:
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
            if c2["effective_parallel_cores"] < CALM_CORES - 1:
                continue
            print("CALM WINDOW CONFIRMED - running scaling", flush=True)
            env = dict(os.environ)
            env.setdefault("BENCH_LEVELS", "2,8")
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "scaling.py")],
                env=env,
            )
            return r.returncode
        time.sleep(POLL_S)
    print("no calm window found; not running", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
