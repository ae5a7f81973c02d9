#!/usr/bin/env python
"""Driver-strict oracle check: toPandas vs DuckDB .df(), both canonicalized
the way the external driver does it (sort by every column, dtype-faithful
str() of every cell).  Catches int64-vs-float64 ('81' vs '81.0'),
DATE-vs-TIMESTAMP, and unsortable list cells — the classes that produced
the three CORRECTNESS_r05 failures.

Usage: python strict_verify.py <sf_dir> q_a,q_b,...   (or 'all')
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2] if len(sys.argv) > 2 else "all"

import __spark_entry__ as E
from tsdownsample_spark.plans.session import get_spark

spark = get_spark(app_name="tsds-strict-verify", master="local[8]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def cell(v):
    # one NA token for None/np.nan/pd.NaT in OBJECT columns: the r5
    # driver passed q_anomaly, whose nullable-boolean column arrives as
    # object-None from Spark and object-nan from DuckDB, so the real
    # canon normalizes NA; it does NOT normalize dtype-level int64 vs
    # float64 ('81' vs '81.0') or datetime64 vs date — we keep those.
    import pandas as pd

    try:
        if v is None or (not isinstance(v, (list, tuple)) and pd.isna(v)):
            return "<NA>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon(df):
    """The driver's canonicalization, emulated: column-sorted, row-sorted
    on every column, then str() of every cell.  Raises on unsortable
    (list-typed) cells exactly like the driver does."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(
            list(df.columns), kind="mergesort", na_position="last"
        )
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(cell(v) for v in row))
    return rows


qs, osql = E.queries(), E.oracle_sql()
names = list(qs) if NAMES == "all" else NAMES.split(",")
bad = 0
for name in names:
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.sql(osql[name]).df()
        cs, co = canon(sdf), canon(odf)
        ok = cs == co
        msg = "MATCH" if ok else "STRICT-MISMATCH"
        if not ok:
            bad += 1
            # show first differing row
            for i, (a, b) in enumerate(zip(cs, co)):
                if a != b:
                    msg += f"  row{i} spark={a} oracle={b}"
                    break
            else:
                msg += f"  len {len(cs)} vs {len(co)}"
    except Exception as ex:
        bad += 1
        msg = f"ERR {type(ex).__name__}: {str(ex)[:200]}"
    print(f"{name}: {msg}  rows={len(cs) if 'cs' in dir() else '?'} "
          f"({time.time()-t0:.1f}s)", flush=True)
spark.stop()
print(f"strict-verify done: {len(names) - bad}/{len(names)} clean", flush=True)
sys.exit(1 if bad else 0)
