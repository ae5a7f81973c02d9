"""A/B: impl="jvm" slice form vs a prototype explode+hash-agg form on the
200M-pt 'big' shape (160 docs x 1.25M tokens, n_out=2000), randomized order."""
import json, random, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/BENCH")

from bench import bench_tokens_path
from pyspark.sql import functions as F
from tsdownsample_spark.plans.session import get_spark
from tsdownsample_spark.operators.downsample import downsample_tokens

DOCS, NTOK, N_OUT = 160, 1_250_000, 2000
path, total_points = bench_tokens_path(DOCS, NTOK)
spark = get_spark(app_name="ab-jvm-explode", master="local[32]",
                  shuffle_partitions=64,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(8*1024*1024)})
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(path)

def jvm_slice(algo):
    return downsample_tokens(df, N_OUT, algo=algo, impl="jvm").select(
        F.sum(F.size("sel_idx")))

def explode_form(algo):
    # equal-count bins, inverse map with forward-rule fixup; packed-long
    # argmin/argmax for kernel first-occurrence tie parity
    nb = N_OUT // (2 if algo == "minmax" else 4)
    d = df.select("doc_id", F.size("tokens").alias("n"),
                  F.posexplode("tokens").alias("pos", "v"))
    bs = f"((n - 1) / CAST({nb} AS DOUBLE))"
    b0 = f"GREATEST(0, CAST(CEIL(pos / {bs}) AS INT) - 1)"
    hi = lambda b: f"(CAST(FLOOR({bs} * ({b} + 1)) AS INT) + 1)"
    lo = lambda b: f"(CASE WHEN {b} = 0 THEN 0 ELSE CAST(FLOOR({bs} * {b}) AS INT) + 1 END)"
    bexpr = (f"CASE WHEN pos >= {hi(b0)} THEN {b0} + 1 "
             f"WHEN {b0} > 0 AND pos < {lo(b0)} THEN {b0} - 1 "
             f"ELSE {b0} END")
    d = d.withColumn("b", F.expr(bexpr))
    enc_min = "CAST(v AS BIGINT) * 4294967296 + pos"
    enc_max = "CAST(v AS BIGINT) * 4294967296 + (2147483647 - pos)"
    agg = d.groupBy("doc_id", "b").agg(
        F.expr(f"MIN({enc_min})").alias("emin"),
        F.expr(f"MAX({enc_max})").alias("emax"),
        F.min("pos").alias("p0"), F.max("pos").alias("p1"))
    amin = "(emin & 4294967295)"
    amax = "(2147483647 - (emax & 4294967295))"
    if algo == "minmax":
        per = f"array(LEAST({amin},{amax}), GREATEST({amin},{amax}))"
    else:
        per = (f"array(CAST(p0 AS BIGINT), LEAST({amin},{amax}), "
               f"GREATEST({amin},{amax}), CAST(p1 AS BIGINT))")
    out = (agg.groupBy("doc_id")
           .agg(F.expr(f"flatten(transform(array_sort(collect_list(struct(b, {per} AS sel))), s -> s.sel))").alias("sel_idx")))
    return out.select(F.sum(F.size("sel_idx")))

# correctness first, small fixture: compare vs jvm slice (kernel-parity-pinned)
small = spark.createDataFrame(
    [(f"d{i}",) for i in range(4)], "doc_id string").withColumn(
    "tokens", F.expr("transform(sequence(1, 100003), i -> CAST(hash(i, doc_id) % 1000 AS INT))"))
gdf = df
df = small
a = {r.doc_id: r.sel_idx for r in downsample_tokens(small, 96, algo="minmax", impl="jvm").select("doc_id","sel_idx").collect()}
def explode_small(algo, n_out):
    global N_OUT, df
    N_OUT = n_out
    return explode_form(algo)
N_OUT_SAVE = N_OUT
N_OUT = 96
bdf = explode_form("minmax")  # uses df=small, N_OUT=96
# need full rows not sum: rebuild inline
def explode_rows(algo, n_out, src):
    global N_OUT, df
    N_OUT, df = n_out, src
    # copy of explode_form but returning rows
    import types
    nb = n_out // (2 if algo == "minmax" else 4)
    d = src.select("doc_id", F.size("tokens").alias("n"),
                   F.posexplode("tokens").alias("pos", "v"))
    bs = f"((n - 1) / CAST({nb} AS DOUBLE))"
    b0 = f"GREATEST(0, CAST(CEIL(pos / {bs}) AS INT) - 1)"
    hi = lambda b: f"(CAST(FLOOR({bs} * ({b} + 1)) AS INT) + 1)"
    lo = lambda b: f"(CASE WHEN {b} = 0 THEN 0 ELSE CAST(FLOOR({bs} * {b}) AS INT) + 1 END)"
    bexpr = (f"CASE WHEN pos >= {hi(b0)} THEN {b0} + 1 "
             f"WHEN {b0} > 0 AND pos < {lo(b0)} THEN {b0} - 1 "
             f"ELSE {b0} END")
    d = d.withColumn("b", F.expr(bexpr))
    enc_min = "CAST(v AS BIGINT) * 4294967296 + pos"
    enc_max = "CAST(v AS BIGINT) * 4294967296 + (2147483647 - pos)"
    agg = d.groupBy("doc_id", "b").agg(
        F.expr(f"MIN({enc_min})").alias("emin"),
        F.expr(f"MAX({enc_max})").alias("emax"),
        F.min("pos").alias("p0"), F.max("pos").alias("p1"))
    amin = "(emin & 4294967295)"
    amax = "(2147483647 - (emax & 4294967295))"
    if algo == "minmax":
        per = f"array(LEAST({amin},{amax}), GREATEST({amin},{amax}))"
    else:
        per = (f"array(CAST(p0 AS BIGINT), LEAST({amin},{amax}), "
               f"GREATEST({amin},{amax}), CAST(p1 AS BIGINT))")
    return (agg.groupBy("doc_id")
            .agg(F.expr(f"flatten(transform(array_sort(collect_list(struct(b, {per} AS sel))), s -> s.sel))").alias("sel_idx")))

for algo, n_out in (("minmax", 96), ("m4", 96), ("minmax", 2000), ("m4", 2000)):
    ref = {r.doc_id: list(r.sel_idx) for r in downsample_tokens(small, n_out, algo=algo, impl="jvm").select("doc_id","sel_idx").collect()}
    got = {r.doc_id: list(r.sel_idx) for r in explode_rows(algo, n_out, small).collect()}
    ok = ref == got
    print(f"parity {algo} n_out={n_out}: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        k = next(iter(ref))
        print("ref", ref[k][:12]); print("got", got[k][:12]); sys.exit(1)

# timing on the big shape
df, N_OUT = gdf, N_OUT_SAVE
variants = {
    "slice_minmax": lambda: jvm_slice("minmax"),
    "explode_minmax": lambda: explode_form("minmax"),
    "slice_m4": lambda: jvm_slice("m4"),
    "explode_m4": lambda: explode_form("m4"),
    "jvm_scan_only": lambda: df.select(F.sum(F.size("tokens"))),
}
random.seed(5)
walls = {k: [] for k in variants}
for rnd in range(4):  # round 0 warm-up
    order = list(variants.items()); random.shuffle(order)
    for name, fn in order:
        t0 = time.time(); fn().collect(); w = time.time() - t0
        if rnd > 0: walls[name].append(round(w, 3))
out = {"metric": "ab_jvm_explode_form", "cpus": 32, "rounds": 3,
       "order": "randomized (seed 5)", "total_points": total_points,
       "walls": walls, "min": {k: min(v) for k, v in walls.items()},
       "mpts_per_s": {k: round(total_points/min(v)/1e6, 1) for k, v in walls.items()}}
print(json.dumps(out, indent=1))
json.dump(out, open("/root/repo/BENCH/ab_jvm_explode.json", "w"), indent=1)
