#!/usr/bin/env python
"""A/B probe: q_rolling_prefix on impl='grouped' vs the FROZEN prefix
oracle (_ORACLE_ROLLING_PREFIX), strict driver canon + rounding-margin
analysis at each driver-relevant SF.

The oracle replays the JVM prefix arithmetic (raw sum/sumsq differences,
variance identity) rounded at 2dp (sum) / 4dp (std); the grouped kernel
computes the same aggregates exactly (centered longdouble prefixes).
count/min/max are comparison-exact on both sides.  This probe answers:
does the exact kernel round identically to the identity-arithmetic
oracle on the driver's deterministic fixtures, and with how much margin?

Usage: python probe_rolling_prefix_grouped.py <sf_dir>
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import functions as F

from tsdownsample_spark.plans.session import get_spark
from tsdownsample_spark.queries import _ORACLE_ROLLING_PREFIX, load
from tsdownsample_spark.operators.rolling import rolling_time_stats

spark = get_spark(app_name="probe-rp-grouped", master="local[8]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")


def run(impl):
    ev = load(spark, SF, "events")
    if impl == "grouped":
        ev = ev.select("event_id", "event_type", "ts", "value")
    out = rolling_time_stats(
        ev, x_col="ts", y_col="value", by=["event_type"],
        duration="2 hours", min_obs=5, impl=impl,
    )
    return out.select(
        "event_id", "event_type", "ts", "roll_n",
        F.round("roll_sum", 2).alias("roll_sum_r"),
        "roll_min", "roll_max",
        F.round("roll_std", 4).alias("roll_std_r"),
        # unrounded for margin analysis
        F.col("roll_sum").alias("_sum_raw"),
        F.col("roll_std").alias("_std_raw"),
    ).toPandas().sort_values(["event_id"]).reset_index(drop=True)


def cell(v):
    import pandas as pd
    try:
        if v is None or pd.isna(v):
            return "<NA>"
    except (TypeError, ValueError):
        pass
    return str(v)


t0 = time.time()
g = run("grouped")
odf = con.sql(_ORACLE_ROLLING_PREFIX).df().sort_values(
    ["event_id"]).reset_index(drop=True)

cols = ["event_id", "event_type", "ts", "roll_n", "roll_sum_r",
        "roll_min", "roll_max", "roll_std_r"]
bad = 0
for c in cols:
    a = [cell(v) for v in g[c]]
    b = [cell(v) for v in odf[c]]
    n_diff = sum(x != y for x, y in zip(a, b))
    if n_diff or len(a) != len(b):
        bad += 1
        first = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1)
        print(f"  COL {c}: {n_diff} diffs, first at row {first}: "
              f"spark={a[first]} oracle={b[first]}")
print(f"{SF}: {'MATCH' if not bad else 'MISMATCH'} "
      f"rows={len(g)} ({time.time()-t0:.1f}s)")

# margin analysis: distance of each unrounded value to its nearest
# rounding boundary (half-grid offset); small margins = flip hazard
for raw, dp, name in ((g["_sum_raw"], 2, "sum@2dp"),
                      (g["_std_raw"], 4, "std@4dp")):
    v = raw.to_numpy(dtype=float)
    v = v[~np.isnan(v)]
    grid = 10.0 ** (-dp)
    # distance to nearest .5*grid boundary
    frac = np.abs(((v / grid) % 1.0) - 0.5) * grid
    print(f"  margin {name}: min={frac.min():.3e} p1={np.percentile(frac,1):.3e} "
          f"median={np.median(frac):.3e} (grid half-width {grid/2:.0e})")

spark.stop()
sys.exit(1 if bad else 0)
