"""asof_join vs pandas.merge_asof (independent reference implementation)."""

import numpy as np
import pandas as pd
import pytest

from tsdownsample_spark.operators.asof import asof_join


def _mk(spark, seed=7, n_left=400, n_right=120, keys=("a", "b", "c")):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.choice(keys, n_left),
            "t": rng.integers(0, 10_000, n_left).astype("int64"),
            "lv": rng.normal(size=n_left),
        }
    )
    left["lid"] = np.arange(n_left, dtype="int64")
    right = pd.DataFrame(
        {
            "k": rng.choice(keys, n_right),
            "t": rng.integers(0, 10_000, n_right).astype("int64"),
            "rv": rng.normal(size=n_right),
        }
    )
    # unique right timestamps per key -> deterministic expected output
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def _expected(left, right, direction, tolerance=None):
    exp = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort").rename(columns={"t": "matched_t"}),
        left_on="t",
        right_on="matched_t",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    return exp.sort_values("lid", ignore_index=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    ldf, rdf, left, right = _mk(spark, seed=11)
    out = (
        asof_join(ldf, rdf, on="t", by=["k"], value_cols=["rv"],
                  direction=direction, matched_col="matched_t")
        .toPandas()
        .sort_values("lid", ignore_index=True)
    )
    exp = _expected(left, right, direction)
    assert np.array_equal(
        out["matched_t"].to_numpy(dtype="float64", na_value=np.nan),
        exp["matched_t"].to_numpy(dtype="float64", na_value=np.nan),
        equal_nan=True,
    )
    assert np.allclose(
        out["rv"].to_numpy(dtype="float64", na_value=np.nan),
        exp["rv"].to_numpy(dtype="float64", na_value=np.nan),
        equal_nan=True,
        rtol=0,
        atol=0,
    )
    # left columns pass through untouched
    assert np.allclose(out["lv"], exp["lv"])


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance(spark, direction):
    ldf, rdf, left, right = _mk(spark, seed=23)
    out = (
        asof_join(ldf, rdf, on="t", by=["k"], value_cols=["rv"],
                  direction=direction, tolerance=250.0, matched_col="matched_t")
        .toPandas()
        .sort_values("lid", ignore_index=True)
    )
    exp = _expected(left, right, direction, tolerance=250)
    assert np.array_equal(
        out["matched_t"].to_numpy(dtype="float64", na_value=np.nan),
        exp["matched_t"].to_numpy(dtype="float64", na_value=np.nan),
        equal_nan=True,
    )


def test_asof_timestamps_and_tolerance_seconds(spark):
    import pyspark.sql.functions as F

    ldf = spark.createDataFrame(
        [("a", "2024-01-01 00:00:05"), ("a", "2024-01-01 00:10:00")],
        "k string, ts_s string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    rdf = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)], "k string, ts_s string, rv double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rv")
    out = (
        asof_join(ldf, rdf, on="ts", by=["k"], value_cols=["rv"], tolerance=60.0)
        .orderBy("ts")
        .collect()
    )
    assert out[0]["rv"] == 1.0  # 5 s away: inside tolerance
    assert out[1]["rv"] is None  # 10 min away: outside
    assert out[1]["matched_ts"] is None


def test_asof_inclusive_equal_ts_and_tiebreak(spark):
    ldf = spark.createDataFrame([("a", 10, 0)], "k string, t long, lid long")
    rdf = spark.createDataFrame(
        [("a", 10, 1.0, 1), ("a", 10, 2.0, 2), ("a", 3, 9.0, 3)],
        "k string, t long, rv double, rid long",
    )
    # backward: equal-ts right row matches (inclusive); max rid wins
    out = asof_join(
        ldf, rdf, on="t", by=["k"], value_cols=["rv"], right_tiebreak="rid"
    ).collect()
    assert out[0]["rv"] == 2.0 and out[0]["matched_ts"] == 10
    # forward: min rid wins
    out = asof_join(
        ldf, rdf, on="t", by=["k"], value_cols=["rv"],
        direction="forward", right_tiebreak="rid",
    ).collect()
    assert out[0]["rv"] == 1.0


def test_asof_null_ts_and_clash_validation(spark):
    ldf = spark.createDataFrame(
        [("a", None, 7), ("a", 5, 8)], "k string, t long, lid long"
    )
    rdf = spark.createDataFrame([("a", 1, 4.5)], "k string, t long, rv double")
    rows = {r["lid"]: r for r in
            asof_join(ldf, rdf, on="t", by=["k"], value_cols=["rv"]).collect()}
    assert rows[7]["rv"] is None and rows[7]["matched_ts"] is None
    assert rows[8]["rv"] == 4.5
    with pytest.raises(ValueError, match="collide"):
        asof_join(ldf, rdf.withColumnRenamed("rv", "lid"), on="t", by=["k"],
                  value_cols=["lid"])
    with pytest.raises(ValueError, match="backward"):
        asof_join(ldf, rdf, on="t", by=["k"], direction="nearest")


def test_asof_null_payload_field_is_preserved(spark):
    """A matched right row whose payload field is NULL must yield NULL —
    not fall through to an older right row's value (the payload rides in
    one atomic struct, so partial fall-through is impossible)."""
    ldf = spark.createDataFrame([("a", 20, 0)], "k string, t long, lid long")
    rdf = spark.createDataFrame(
        [("a", 5, 1.0, 111), ("a", 10, None, None)],
        "k string, t long, rv double, rw long",
    )
    out = asof_join(ldf, rdf, on="t", by=["k"], value_cols=["rv", "rw"]).collect()[0]
    assert out["matched_ts"] == 10
    assert out["rv"] is None and out["rw"] is None


def test_asof_randomized_sweep_vs_pandas(spark):
    """Randomized parity sweep: duplicate right timestamps (tiebroken), NULL
    payload values, both directions, with/without tolerance — one spark
    session, many shapes.  pandas.merge_asof picks the last sorted row among
    equal backward matches / first among forward, so pre-sorting right by
    (t, rid) makes its tie rule identical to right_tiebreak='rid'."""
    for seed in (101, 202, 303):
        rng = np.random.default_rng(seed)
        nl, nr = 250, 90
        left = pd.DataFrame(
            {
                "k": rng.choice(["a", "b"], nl),
                "t": rng.integers(0, 2_000, nl).astype("int64"),
            }
        )
        left["lid"] = np.arange(nl, dtype="int64")
        right = pd.DataFrame(
            {
                "k": rng.choice(["a", "b"], nr),
                # small range -> plenty of duplicate (k, t) pairs
                "t": rng.integers(0, 2_000, nr).astype("int64") // 50 * 50,
                "rv": rng.normal(size=nr),
            }
        )
        right.loc[rng.random(nr) < 0.2, "rv"] = np.nan  # NULL payloads
        right["rid"] = np.arange(nr, dtype="int64")
        rdf_pd = right.sort_values(["t", "rid"], kind="mergesort")
        for direction in ("backward", "forward"):
            for tol in (None, 300.0):
                out = (
                    asof_join(
                        spark.createDataFrame(left),
                        spark.createDataFrame(right),
                        on="t", by=["k"], value_cols=["rv"],
                        direction=direction, tolerance=tol,
                        matched_col="matched_t", right_tiebreak="rid",
                    )
                    .toPandas()
                    .sort_values("lid", ignore_index=True)
                )
                exp = pd.merge_asof(
                    left.sort_values("t", kind="mergesort"),
                    rdf_pd.rename(columns={"t": "matched_t"}),
                    left_on="t", right_on="matched_t", by="k",
                    direction=direction,
                    tolerance=None if tol is None else int(tol),
                ).sort_values("lid", ignore_index=True)
                ctx = (seed, direction, tol)
                assert np.array_equal(
                    out["matched_t"].to_numpy("float64", na_value=np.nan),
                    exp["matched_t"].to_numpy("float64", na_value=np.nan),
                    equal_nan=True,
                ), ctx
                # NULL payload in the matched row must surface as NULL/NaN,
                # not an older row's value
                assert np.array_equal(
                    out["rv"].to_numpy("float64", na_value=np.nan),
                    exp["rv"].to_numpy("float64", na_value=np.nan),
                    equal_nan=True,
                ), ctx


def test_asof_plan_single_exchange(spark):
    """The union+window formulation shuffles ONCE (on the series key) —
    no BroadcastNestedLoopJoin / CartesianProduct a range join would plan."""
    ldf, rdf, *_ = _mk(spark, seed=3)
    out = asof_join(ldf, rdf, on="t", by=["k"], value_cols=["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # one per input branch of the union


# ---------------------------------------------------------------- snapshot


def test_snapshot_latest_per_key(spark):
    from tsdownsample_spark.operators.asof import asof_snapshot

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0, 100),
            ("a", 5, 50.0, 101),
            ("a", 9, 90.0, 102),   # after the cutoff
            ("b", 2, 20.0, 103),
            ("c", 9, 99.0, 104),   # group entirely after cutoff -> absent
        ],
        "k string, t long, v double, rid long",
    )
    got = {
        r["k"]: r
        for r in asof_snapshot(df, 6, x_col="t", by=["k"]).collect()
    }
    assert set(got) == {"a", "b"}
    assert got["a"]["t"] == 5 and got["a"]["v"] == 50.0
    assert got["b"]["t"] == 2 and got["b"]["v"] == 20.0


def test_snapshot_tiebreak_deterministic(spark):
    from tsdownsample_spark.operators.asof import asof_snapshot

    rows = [("a", 5, float(v), rid) for v, rid in ((1, 7), (2, 9), (3, 8))]
    df = spark.createDataFrame(rows, "k string, t long, v double, rid long")
    got = asof_snapshot(df, 5, x_col="t", by=["k"], tiebreak=["rid"]).collect()
    assert len(got) == 1
    # max (t, rid) = (5, 9) -> v = 2.0, regardless of input order
    assert got[0]["rid"] == 9 and got[0]["v"] == 2.0


def test_snapshot_timestamp_axis(spark):
    import datetime as dt

    from tsdownsample_spark.operators.asof import asof_snapshot

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, 1.0), ("a", t0 + dt.timedelta(days=2), 2.0)],
        "k string, ts timestamp, v double",
    )
    got = asof_snapshot(
        df, "2024-01-02 00:00:00", x_col="ts", by=["k"]
    ).collect()
    assert len(got) == 1 and got[0]["v"] == 1.0


def test_snapshot_validation_and_plan(spark):
    import pytest as _pytest

    from tsdownsample_spark.operators.asof import asof_snapshot

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t long, v double")
    with _pytest.raises(ValueError, match="at least one"):
        asof_snapshot(df, 1, x_col="t", by=[])
    out = asof_snapshot(df, 1, x_col="t", by=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # aggregate shape, not a per-group ranking window, no Python.  The
    # struct ordering key forces SortAggregate rather than HashAggregate,
    # but the scale property is the MAP-SIDE PARTIAL combine: one
    # candidate row per group per task crosses the exchange.
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_max_by" in plan
