"""A/B under xxhash64: duplicate_spans form="window" (hash exchange +
SORT) vs form="join" (hash-agg count, no sort, AQE-broadcast join-back,
derives hashes twice).

The md5 A/B (ab_dup_spans_form.json) picked the window form 1.8x because
md5 hashing dominated and the join form pays it twice.  xxhash64 removed
the hashing wall (run AH: 2x absolute), which leaves the WindowExec sort
as the dominant cost — and sorts are this host's worst scaler (spans
ladder 0.41 calm, scaling_runAI.json).  This harness re-adjudicates the
form at BOTH ladder levels (2 and 8 cores), randomized within-round order,
min-of-rounds, ceiling probes before/after.
"""
import json, random, sys, time, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import make_session, spans_fixture_path, memory_bandwidth_ceiling
from pyspark.sql import functions as F
from tsdownsample_spark.operators.dedup import duplicate_spans

path = spans_fixture_path()
c0 = memory_bandwidth_ceiling()
print("ceiling before:", c0, flush=True)

out = {"metric": "ab_spans_join_xx", "ceiling_before": c0, "levels": {}}
random.seed(29)
for cores in (2, 8):
    spark = make_session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    toks = spark.read.parquet(path).repartition(4 * cores)

    def run(form):
        duplicate_spans(
            toks, window=16, stride=8, hash="xxhash64", form=form
        ).select(F.count("*"), F.sum("n_dup")).collect()

    # semantics equal at this level
    a = duplicate_spans(toks, window=16, stride=8, hash="xxhash64", form="window") \
        .select(F.count("*").alias("n"), F.sum("n_dup").alias("s")).collect()[0]
    b = duplicate_spans(toks, window=16, stride=8, hash="xxhash64", form="join") \
        .select(F.count("*").alias("n"), F.sum("n_dup").alias("s")).collect()[0]
    assert tuple(a) == tuple(b), (cores, tuple(a), tuple(b))

    walls = {"window": [], "join": []}
    for rnd in range(4):  # round 0 = warm-up, discarded
        order = ["window", "join"]
        random.shuffle(order)
        for form in order:
            t0 = time.time()
            run(form)
            w = time.time() - t0
            if rnd > 0:
                walls[form].append(round(w, 3))
    spark.stop()
    out["levels"][str(cores)] = {
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
    }
    print(cores, "cores:", out["levels"][str(cores)]["min"], flush=True)

mins = {c: v["min"] for c, v in out["levels"].items()}
out["join_speedup_x"] = {
    c: round(m["window"] / m["join"], 3) for c, m in mins.items()
}
out["efficiency_2_to_8"] = {
    k: round(mins["2"][k] / (4 * mins["8"][k]), 3) for k in ("window", "join")
}
out["ceiling_after"] = memory_bandwidth_ceiling()
print(json.dumps(out, indent=1))
json.dump(out, open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "ab_spans_join_xx.json"), "w"), indent=1)
