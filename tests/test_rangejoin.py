"""Interval (range) join: semantics + plan shape.

Semantics oracle: a naive driver-side double loop over tiny inputs —
independent of both the chunked engine plan and the DuckDB inequality
join used by the contract query (queries.py::q_interval_join).
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tsdownsample_spark.operators.rangejoin import interval_join

UTC = dt.timezone.utc


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, tzinfo=UTC)


@pytest.fixture(scope="module")
def small(spark):
    points = spark.createDataFrame(
        [Row(pid=i, key=k, ts=_ts(m)) for i, (k, m) in enumerate(
            [("a", 0), ("a", 5), ("a", 10), ("a", 30), ("b", 5), ("b", 59)]
        )]
    )
    ivs = spark.createDataFrame(
        [
            Row(key="a", start=_ts(0), end=_ts(10), tag="a1"),
            Row(key="a", start=_ts(25), end=_ts(40), tag="a2"),
            Row(key="a", start=_ts(28), end=_ts(35), tag="a3"),  # overlaps a2
            Row(key="b", start=_ts(50), end=_ts(59), tag="b1"),
        ]
    )
    return points, ivs


def _naive(points, ivs, closed="left", by=True):
    lo = {"left": lambda t, s: t >= s, "both": lambda t, s: t >= s,
          "right": lambda t, s: t > s, "neither": lambda t, s: t > s}[closed]
    hi = {"left": lambda t, e: t < e, "neither": lambda t, e: t < e,
          "right": lambda t, e: t <= e, "both": lambda t, e: t <= e}[closed]
    out = []
    for p in points:
        for iv in ivs:
            if by and p.key != iv.key:
                continue
            if lo(p.ts, iv.start) and hi(p.ts, iv.end):
                out.append((p.pid, iv.tag))
    return sorted(out)


@pytest.mark.parametrize("closed", ["left", "both", "right", "neither"])
def test_closed_semantics(spark, small, closed):
    points, ivs = small
    got = interval_join(
        points, ivs, on="ts", start_col="start", end_col="end",
        by=["key"], closed=closed, chunk=300,
    ).select("pid", "tag").collect()
    exp = _naive(points.collect(), ivs.collect(), closed=closed)
    assert sorted((r.pid, r.tag) for r in got) == exp


def test_one_to_many_and_left(spark, small):
    points, ivs = small
    # closed="both": a@30 falls in BOTH a2 and a3 -> two rows
    inner = interval_join(
        points, ivs, on="ts", start_col="start", end_col="end",
        by=["key"], closed="both", chunk=60,
    )
    assert sorted(
        (r.pid, r.tag) for r in inner.select("pid", "tag").collect()
    ) == _naive(points.collect(), ivs.collect(), closed="both")
    left = interval_join(
        points, ivs, on="ts", start_col="start", end_col="end",
        by=["key"], how="left", closed="both", chunk=60,
    )
    rows = left.collect()
    # every point appears; only b@5 (pid=4) matches nothing, and it carries
    # NULL for every attached interval column
    assert {r.pid for r in rows} == {0, 1, 2, 3, 4, 5}
    assert {r.pid for r in rows if r.tag is None} == {4}
    nulls = [r for r in rows if r.pid == 4]
    assert len(nulls) == 1
    assert nulls[0].start is None and nulls[0].end is None


def test_numeric_axis_auto_chunk(spark):
    points = spark.createDataFrame([Row(pid=i, x=float(i)) for i in range(20)])
    ivs = spark.createDataFrame(
        [Row(start=2.0, end=5.0, tag="t1"), Row(start=4.0, end=18.0, tag="t2")]
    )
    got = interval_join(
        points, ivs, on="x", start_col="start", end_col="end", chunk="auto"
    ).select("pid", "tag").collect()
    exp = sorted(
        [(i, "t1") for i in range(2, 5)] + [(i, "t2") for i in range(4, 18)]
    )
    assert sorted((r.pid, r.tag) for r in got) == exp


def test_interval_spanning_many_chunks(spark):
    # a 100-unit interval with chunk=1 explodes to ~101 chunk rows; every
    # candidate pair must still appear exactly once (no dedup pass exists)
    points = spark.createDataFrame([Row(pid=i, x=float(i)) for i in range(120)])
    ivs = spark.createDataFrame([Row(start=5.0, end=105.0, tag="big")])
    got = interval_join(
        points, ivs, on="x", start_col="start", end_col="end", chunk=1
    ).collect()
    assert sorted(r.pid for r in got) == list(range(5, 105))


def test_validation(spark, small):
    points, ivs = small
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            points.withColumn("tag", F.lit("x")), ivs,
            on="ts", start_col="start", end_col="end", by=["key"],
        )
    with pytest.raises(ValueError, match="how"):
        interval_join(points, ivs, on="ts", start_col="start",
                      end_col="end", how="outer")
    with pytest.raises(ValueError, match="closed"):
        interval_join(points, ivs, on="ts", start_col="start",
                      end_col="end", closed="open")
    with pytest.raises(ValueError, match="dtype mismatch"):
        interval_join(
            points, ivs.withColumn("start", F.lit(1.0)),
            on="ts", start_col="start", end_col="end", by=["key"],
        )
    with pytest.raises(ValueError, match="positive"):
        interval_join(points, ivs, on="ts", start_col="start",
                      end_col="end", by=["key"], chunk=0)


def test_plan_is_equi_join(spark, small):
    """The whole point: the physical plan must be a shuffle/broadcast HASH
    or sort-merge EQUI join on the chunk key — never a nested-loop /
    cartesian evaluation of the range predicate."""
    points, ivs = small
    plan = interval_join(
        points, ivs, on="ts", start_col="start", end_col="end",
        by=["key"], chunk=300,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert any(k in plan for k in ("SortMergeJoin", "ShuffledHashJoin",
                                   "BroadcastHashJoin"))


def test_auto_chunk_degenerate_median(spark):
    """A corpus of mostly zero-length intervals must not drive the auto
    chunk width to ~1 raw unit: one ordinary multi-minute interval would
    then explode into millions of chunk rows (the sf0.001 sessionize mix
    that OOM'd the contract gate).  The max-length floor caps duplication
    at ~257 rows per interval; semantics are width-independent."""
    import pandas as pd

    from tsdownsample_spark.operators.rangejoin import interval_join

    base = pd.Timestamp("2024-01-01").value // 1000
    # 50 zero-length intervals (median length 0) + one 2-hour interval
    iv_rows = [("k", i * 10_000_000, i * 10_000_000, i) for i in range(50)]
    iv_rows.append(("k", 10**9, 10**9 + 7_200 * 10**6, 99))
    iv = spark.createDataFrame(
        [(k, pd.Timestamp(base + s, unit="us").to_pydatetime(),
          pd.Timestamp(base + e, unit="us").to_pydatetime(), v)
         for k, s, e, v in iv_rows],
        "key string, start timestamp, end timestamp, val long",
    )
    pts = spark.createDataFrame(
        [("k", pd.Timestamp(base + t, unit="us").to_pydatetime())
         for t in (0, 10_000_000, 10**9 + 3_600 * 10**6, 10**9 + 7_200 * 10**6 + 1)],
        "key string, ts timestamp",
    )
    got = sorted(
        (r["ts"], r["val"])
        for r in interval_join(
            pts, iv, by=["key"], value_cols=["val"], closed="left"
        ).collect()
    )
    # chunk-row bound: the exploded interval side stays tiny
    n_chunks = interval_join.__globals__["_MAX_CHUNKS_PER_INTERVAL"]
    assert n_chunks == 256
    exp = []
    for t in (0, 10_000_000, 10**9 + 3_600 * 10**6, 10**9 + 7_200 * 10**6 + 1):
        for k, s, e, v in iv_rows:
            if s <= t < e:
                exp.append((pd.Timestamp(base + t, unit="us").to_pydatetime(), v))
    assert got == sorted(exp) and len(got) == 1  # only the mid-interval point
