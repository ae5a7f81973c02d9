"""A/B: duplicate_spans groupBy+join-back (derives spans twice) vs a
single window COUNT(*) OVER (PARTITION BY win_hash) (derives once, sorts),
randomized order, 8 cores, scaling spans fixture."""
import json, random, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/BENCH")
from scaling import make_session, spans_fixture_path
from pyspark.sql import functions as F, Window as W
from tsdownsample_spark.operators.dedup import duplicate_spans, window_spans

path = spans_fixture_path()
spark = make_session(8)
spark.sparkContext.setLogLevel("ERROR")
toks = spark.read.parquet(path).repartition(32).cache(); toks.count()

def join_form():
    return duplicate_spans(toks, window=16, stride=8).select(
        F.count("*"), F.sum("n_dup"))

def window_form():
    spans = window_spans(toks, window=16, stride=8)
    out = spans.withColumn(
        "n_dup", F.count("*").over(W.partitionBy("win_hash"))
    ).where(F.col("n_dup") >= 2)
    return out.select(F.count("*"), F.sum("n_dup"))

# same results?
a = join_form().collect()[0]
b = window_form().collect()[0]
assert tuple(a) == tuple(b), (a, b)
print("semantics equal:", tuple(a))

variants = {"join_form": join_form, "window_form": window_form}
random.seed(13)
walls = {k: [] for k in variants}
for rnd in range(5):
    order = list(variants.items()); random.shuffle(order)
    for name, fn in order:
        t0 = time.time(); fn().collect(); w = time.time() - t0
        if rnd > 0: walls[name].append(round(w, 3))
out = {"metric": "ab_dup_spans_form", "cores": 8, "rounds": 4,
       "order": "randomized (seed 13)", "walls": walls,
       "min": {k: min(v) for k, v in walls.items()},
       "speedup_x": round(min(walls["join_form"]) / min(walls["window_form"]), 3)}
print(json.dumps(out, indent=1))
json.dump(out, open("/root/repo/BENCH/ab_dup_spans_form.json", "w"), indent=1)
