import time, json, sys
sys.path.insert(0, "/root/repo")
from tsdownsample_spark.plans.session import get_spark
import tsdownsample_spark.queries as Q
from tsdownsample_spark.operators import gapfill as G

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="guard-diag", master="local[32]",
                  shuffle_partitions=64,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(2*1024*1024)})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

fn = Q._q_gapfill("linear")
orig = G.gap_fill
def r3plan(*a, **k):
    k["max_buckets"] = None
    return orig(*a, **k)

def run(guard):
    G.gap_fill = orig if guard else r3plan
    try:
        t = time.time()
        fn(spark, SF).collect()
        return time.time() - t
    finally:
        G.gap_fill = orig

# also isolate the GRID subplan: spans -> (filter) -> explode -> count
from pyspark.sql import functions as F
def grid_only(guard):
    df = Q.load(spark, SF, "events").select(
        F.col("event_type"), F.date_trunc("minute", "ts").alias("bucket_ts"))
    G.gap_fill = orig if guard else r3plan
    # call gap_fill but count only grid? simpler: rebuild inline
    G.gap_fill = orig
    spans = df.groupBy("event_type").agg(F.min("bucket_ts").alias("_t0"), F.max("bucket_ts").alias("_t1"))
    if guard:
        _base = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
        step_us = F.unix_micros(_base + F.expr("INTERVAL 1 minute")) - F.unix_micros(_base)
        nb = ((F.unix_micros(F.col("_t1")) - F.unix_micros(F.col("_t0"))) / step_us) + F.lit(1)
        spans = spans.where(F.when(nb <= F.lit(10_000_000), F.lit(True)).otherwise(
            F.raise_error(F.lit("boom").cast("string")).cast("boolean")))
    grid = spans.select("event_type", F.explode(F.sequence("_t0","_t1",F.expr("INTERVAL 1 minute"))).alias("bucket_ts"))
    t = time.time()
    n = grid.count()
    return time.time() - t, n

import random
random.seed(7)
walls = {"guard": [], "r3plan": [], "grid_g": [], "grid_n": []}
for r in range(6):
    order = [("guard", lambda: run(True)), ("r3plan", lambda: run(False))]
    random.shuffle(order)
    for name, f in order:
        walls[name].append(round(f(), 3))
    order2 = [("grid_g", lambda: grid_only(True)), ("grid_n", lambda: grid_only(False))]
    random.shuffle(order2)
    for name, f in order2:
        w, n = f()
        walls[name].append(round(w, 3))
out = {k: v for k, v in walls.items()}
out["min"] = {k: min(v) for k, v in walls.items()}
out["ratio_full"] = round(min(walls["guard"])/min(walls["r3plan"]), 3)
out["ratio_grid"] = round(min(walls["grid_g"])/min(walls["grid_n"]), 3)
print(json.dumps(out, indent=1))
