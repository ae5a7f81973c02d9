"""Heavy hitters: semantics (vs a driver-side Counter) + plan shape."""

from collections import Counter

import pytest
from pyspark.sql import Row

from tsdownsample_spark.operators.frequency import heavy_hitters

ROWS = [
    ("a", "x", 3), ("a", "x", 1), ("a", "y", 2), ("a", "y", 5),
    ("a", "z", 1), ("a", "w", 1),
    ("b", "x", 10), ("b", "q", 1),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [Row(grp=g, val=v, wt=w) for g, v, w in ROWS]
        + [Row(grp="a", val=None, wt=9)]  # NULL values are dropped
    )


def test_topk_counts(spark, df):
    got = heavy_hitters(df, "val", by=["grp"], k=2).collect()
    exp = {}
    for g in ("a", "b"):
        cnt = Counter(v for gg, v, _ in ROWS if gg == g)
        # ties break by ascending value
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        exp[g] = [(v, c, i + 1) for i, (v, c) in enumerate(ranked)]
    for g in exp:
        rows = sorted(
            [(r.val, r.freq, r.rank) for r in got if r.grp == g],
            key=lambda t: t[2],
        )
        assert rows == exp[g], g


def test_tiebreak_deterministic(spark, df):
    # group a: x=2, y=2, z=1, w=1 -> rank1=x (value asc among freq-2 ties),
    # rank2=y, rank3=w, rank4=z
    got = sorted(
        [(r.val, r.rank) for r in heavy_hitters(df, "val", by=["grp"], k=4)
         .where("grp = 'a'").collect()],
        key=lambda t: t[1],
    )
    assert got == [("x", 1), ("y", 2), ("w", 3), ("z", 4)]


def test_weighted(spark, df):
    # group a weights: x=4, y=7, z=1, w=1 -> top2 = y(7), x(4)
    got = sorted(
        [(r.val, r.freq, r.rank) for r in
         heavy_hitters(df, "val", by=["grp"], k=2, weight_col="wt")
         .where("grp = 'a'").collect()],
        key=lambda t: t[2],
    )
    assert got == [("y", 7, 1), ("x", 4, 2)]


def test_global_no_by(spark, df):
    got = heavy_hitters(df, "val", k=1).collect()
    assert len(got) == 1 and got[0].val == "x" and got[0].freq == 3


def test_validation(spark, df):
    with pytest.raises(ValueError, match="k must"):
        heavy_hitters(df, "val", k=0)
    with pytest.raises(ValueError, match="reserved"):
        heavy_hitters(df.withColumnRenamed("wt", "freq"), "val", by=["freq"])


def test_plan_partial_agg(spark, df):
    """Stage 1 must be a hash aggregate with a partial (map-side) phase —
    the property that caps shuffle volume at distinct cardinality."""
    plan = heavy_hitters(df, "val", by=["grp"], k=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final
