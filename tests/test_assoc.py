"""session_association_rules: session derivation (boundary convention ==
sessionize), pair counting, support/confidence/lift arithmetic, tie
determinism, and the plan shape."""

import datetime as dt

import pytest

from tsdownsample_spark.operators.assoc import session_association_rules

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "u string, ts timestamp, item string")


def test_rules_arithmetic(spark):
    rows = [
        # u1 session 1: {A, B}   (gap 60s)
        ("u1", _ts(0), "A"), ("u1", _ts(10), "B"),
        # u1 session 2: {A}      (200s later)
        ("u1", _ts(300), "A"),
        # u2 session 1: {A, B, C}
        ("u2", _ts(0), "A"), ("u2", _ts(5), "B"), ("u2", _ts(9), "C"),
        # u2 session 2: {B}
        ("u2", _ts(500), "B"),
    ]
    got = {
        (r["item_a"], r["item_b"]): r
        for r in session_association_rules(
            _mk(spark, rows), x_col="ts", item_col="item", by=["u"],
            gap="1 minute",
        ).collect()
    }
    # 4 sessions total; A in 3, B in 3, C in 1; {A,B} in 2; {A,C},{B,C} in 1
    ab = got[("A", "B")]
    assert ab["n_sessions"] == 4 and ab["n_a"] == 3 and ab["n_b"] == 3
    assert ab["n_both"] == 2
    assert ab["support"] == pytest.approx(0.5)
    assert ab["confidence_a_to_b"] == pytest.approx(2 / 3)
    assert ab["lift"] == pytest.approx(2 * 4 / (3 * 3))
    assert got[("A", "C")]["n_both"] == 1
    assert got[("B", "C")]["lift"] == pytest.approx(1 * 4 / (3 * 1))


def test_boundary_exactly_gap_extends(spark):
    rows = [
        ("u", _ts(0), "A"),
        ("u", _ts(60), "B"),    # exactly gap -> SAME session
        ("u", _ts(121), "C"),   # 61s -> new session
    ]
    got = session_association_rules(
        _mk(spark, rows), x_col="ts", item_col="item", by=["u"],
        gap="1 minute",
    ).collect()
    pairs = {(r["item_a"], r["item_b"]): r["n_both"] for r in got}
    assert pairs == {("A", "B"): 1}


def test_duplicate_ts_deterministic_same_session(spark):
    """Peers at one instant share the peer-inclusive running-sum frame, so
    their session id is deterministic whatever the lag order."""
    rows = [
        ("u", _ts(0), "A"),
        ("u", _ts(120), "B"),  # breaks (gap 60)
        ("u", _ts(120), "C"),  # same instant -> same (new) session as B
    ]
    got = session_association_rules(
        _mk(spark, rows), x_col="ts", item_col="item", by=["u"],
        gap="1 minute",
    ).collect()
    pairs = {(r["item_a"], r["item_b"]): r for r in got}
    assert set(pairs) == {("B", "C")}
    assert pairs[("B", "C")]["n_sessions"] == 2


def test_min_sessions_gate_and_validation(spark):
    rows = [("u", _ts(0), "A"), ("u", _ts(1), "B")]
    df = _mk(spark, rows)
    assert (
        session_association_rules(
            df, x_col="ts", item_col="item", by=["u"], min_sessions=2
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="min_sessions"):
        session_association_rules(df, by=["u"], min_sessions=0)


def test_plan_no_cartesian_no_python(spark):
    rows = [("u", _ts(0), "A"), ("u", _ts(1), "B")]
    out = session_association_rules(
        _mk(spark, rows), x_col="ts", item_col="item", by=["u"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only nested-loop is the 1-row total-sessions broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1