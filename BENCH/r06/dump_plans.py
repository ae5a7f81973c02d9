#!/usr/bin/env python
"""Dump .explain('formatted') for a list of declared queries into
plans/r06/<query>_<tag>.txt (tag = before/after).  Driver-only work."""
import os
import sys

sys.path.insert(0, "/root/repo")

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else []
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from tsdownsample_spark.plans.session import get_spark
import __spark_entry__ as E

spark = get_spark(app_name="tsds-plans", master="local[4]")
spark.sparkContext.setLogLevel("ERROR")

qs = E.queries()
for name in NAMES:
    fn = qs[name]
    try:
        df = fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as ex:  # streaming rows etc.
        txt = f"EXPLAIN FAILED: {ex}\n"
    out = f"/root/repo/plans/r06/{name}_{TAG}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(name, "->", out, flush=True)
spark.stop()
