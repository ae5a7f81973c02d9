#!/usr/bin/env python
"""Recreate the /tmp/sfbench probe fixture (sf1.0-scale, deterministic).

The driver's round-end measurement escalates to sf1.0 (1M events / 50k
documents); the sandbox only ships sf0.1.  This builds a same-shape copy
by replicating sf0.1 x10 with re-jittered event timestamps (so frame
densities match sf1.0: ~10 points per 2h frame -> ~110), keeping the
driver's single-row-group-per-file layout (the scan-split behavior
Change 8 exists for).  Caveat recorded in OPTIMIZATION_r06.md: the x10
document replication makes every doc a 9-way near-duplicate, inflating
pair-based dedup rows quadratically vs the real sf1.0 corpus.

Usage: python make_sfbench.py [/tmp/sfbench]
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbench"
K = 10

os.makedirs(DST, exist_ok=True)
rng = np.random.default_rng(1234)

# events: x10, re-jittered within +-30 min, ids/users offset per copy
ev = pq.read_table(f"{SRC}/events.parquet")
n = ev.num_rows
parts = []
max_id = int(pa.compute.max(ev["event_id"]).as_py()) + 1
max_uid = int(pa.compute.max(ev["user_id"]).as_py()) + 1
ts = ev["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
for i in range(K):
    jit = rng.integers(-1_800_000_000, 1_800_000_000, size=n) if i else np.zeros(n, np.int64)
    parts.append(pa.table({
        "event_id": pa.array(ev["event_id"].to_numpy() + i * max_id),
        "ts": pa.array(ts + jit, type=pa.timestamp("us")),
        "user_id": pa.array(ev["user_id"].to_numpy() + (i % 3) * max_uid),
        "event_type": ev["event_type"],
        "value": ev["value"],
        "props": ev["props"],
    }))
out = pa.concat_tables(parts)
pq.write_table(out, f"{DST}/events.parquet", row_group_size=out.num_rows)

# documents: x10 with offset doc_ids (replicated text -> dup-biased, noted)
dc = pq.read_table(f"{SRC}/documents.parquet")
max_did = int(pa.compute.max(dc["doc_id"]).as_py()) + 1
parts = [
    pa.table({
        "doc_id": pa.array(dc["doc_id"].to_numpy() + i * max_did),
        "text": dc["text"], "lang": dc["lang"], "source": dc["source"],
        "n_chars": dc["n_chars"],
    })
    for i in range(K)
]
out = pa.concat_tables(parts)
pq.write_table(out, f"{DST}/documents.parquet", row_group_size=out.num_rows)

# everything else: copy as-is
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("sfbench at", DST, "events", ev.num_rows * K, "documents", dc.num_rows * K)
