#!/usr/bin/env python
"""Per-stage decomposition of the dedup scaling workload, md5 vs xxhash64,
interleaved in one session (VERDICT r4 task 5: find where the dedup
ladder's time actually goes before blaming the hash).

Stages, each timed to a noop-write in isolation (fresh action, warm input):
  sig      — minhash_signatures (shingle + k=16 universal-hash minima)
  pairs    — banded LSH self-join -> candidate pairs
  verify   — exact Jaccard over candidate pairs (set intersect)
  simhash  — 32-bit simhash fold
Interleaved A/B rounds, min-of-rounds per (stage, hash family).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

CORES = int(os.environ.get("PROF_CORES", "8"))
ROUNDS = int(os.environ.get("PROF_ROUNDS", "3"))


def main() -> None:
    from scaling import make_session, synth_docs_path, memory_bandwidth_ceiling

    from pyspark.sql import functions as F
    from tsdownsample_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
    )

    path = synth_docs_path()
    spark = make_session(CORES)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    docs = spark.read.parquet(path).repartition(4 * CORES).cache()
    docs.count()

    def stages(hash_: str):
        sig = minhash_signatures(docs, k=16, hash=hash_).cache()
        pairs = lsh_candidate_pairs(sig, bands=4, rows=4, hash=hash_).cache()

        def run_sig():
            minhash_signatures(docs, k=16, hash=hash_).write.format("noop").mode(
                "overwrite"
            ).save()

        def run_pairs():
            # sig cached: isolates the band explode + self-join + dedup
            lsh_candidate_pairs(sig, bands=4, rows=4, hash=hash_).write.format(
                "noop"
            ).mode("overwrite").save()

        def run_verify():
            # pairs cached: isolates shingle re-derivation + set intersect
            kw = {"hash": hash_} if hash_ != "md5" else {}
            jaccard_pairs(docs, pairs, threshold=0.5, **kw).write.format(
                "noop"
            ).mode("overwrite").save()

        def run_simhash():
            simhash(docs, hash=hash_).write.format("noop").mode("overwrite").save()

        # materialize the caches once, outside any timing
        sig.count()
        pairs.count()
        return {
            "sig": run_sig,
            "pairs": run_pairs,
            "verify": run_verify,
            "simhash": run_simhash,
        }, (sig, pairs)

    fams = {}
    caches = []
    for h in ("md5", "xxhash64"):
        fams[h], cs = stages(h)
        caches.extend(cs)

    walls: dict[str, list[float]] = {
        f"{h}.{s}": [] for h in fams for s in fams[h]
    }
    # House rule (BENCH/BASELINE.md "Post-fix adjudication"): randomize the
    # within-round (hash, stage) order — fixed order taxes early positions.
    import random as _random

    _random.seed(20260818)
    for rnd in range(ROUNDS + 1):
        _cells = [(h, s, fn) for h, st in fams.items() for s, fn in st.items()]
        _random.shuffle(_cells)
        for h, s, fn in _cells:
            t0 = time.time()
            fn()
            w = time.time() - t0
            if rnd > 0:
                walls[f"{h}.{s}"].append(round(w, 3))
    for c in caches:
        c.unpersist()
    spark.stop()

    out = {
        "metric": "dedup_stage_profile",
        "cores": CORES,
        "rounds": ROUNDS,
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
        "ceiling_end": memory_bandwidth_ceiling(),
    }
    with open(os.path.join(HERE, "profile_dedup.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
