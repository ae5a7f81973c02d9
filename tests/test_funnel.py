"""Ordered funnel + retention cohorts (operators/funnel.py)."""

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.funnel import funnel, retention_cohorts


class TestFunnel:
    def _events(self, spark):
        # u1: view(0) click(10) buy(20)      -> completes in order
        # u2: view(0) click(5)               -> stops at click
        # u3: click(0) view(10) buy(20)      -> click BEFORE first view:
        #                                       counts view only, then buy?
        #                                       no click after view -> stops
        #                                       after step 1 (strict order)
        # u4: view(0) view(3) click(1)       -> click at t=1 AFTER first
        #                                       view(0) -> converts (first-
        #                                       touch, not last-touch)
        # u5: buy(0)                         -> never enters (no view)
        rows = [
            (1, "view", 0), (1, "click", 10), (1, "buy", 20),
            (2, "view", 0), (2, "click", 5),
            (3, "click", 0), (3, "view", 10), (3, "buy", 20),
            (4, "view", 0), (4, "view", 3), (4, "click", 1),
            (5, "buy", 0),
        ]
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts long"
        )

    def test_strict_order_and_first_touch(self, spark):
        out = {
            r.step_idx: r
            for r in funnel(
                self._events(spark), ["view", "click", "buy"]
            ).collect()
        }
        assert (out[1].step, out[1].n_users) == ("view", 4)   # u1 u2 u3 u4
        assert (out[2].step, out[2].n_users) == ("click", 3)  # u1 u2 u4
        assert (out[3].step, out[3].n_users) == ("buy", 1)    # u1
        assert out[1].frac_first == pytest.approx(1.0)
        assert out[3].frac_first == pytest.approx(0.25)

    def test_empty_first_step_gives_null_frac(self, spark):
        out = funnel(self._events(spark), ["signup", "view"]).collect()
        by_idx = {r.step_idx: r for r in out}
        assert by_idx[1].n_users == 0 and by_idx[1].frac_first is None

    def test_validation(self, spark):
        df = self._events(spark)
        with pytest.raises(ValueError, match="2 steps"):
            funnel(df, ["view"])
        with pytest.raises(ValueError, match="distinct"):
            funnel(df, ["view", "view"])

    def test_plan_python_free(self, spark):
        plan = (
            funnel(self._events(spark), ["view", "click", "buy"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestRetentionCohorts:
    def test_triangle(self, spark):
        rows = [
            # cohort day 1: u1 active d1,d2,d3; u2 active d1,d3 (twice a day
            # must count once)
            (1, "2024-01-01 10:00:00"), (1, "2024-01-02 10:00:00"),
            (1, "2024-01-03 10:00:00"),
            (2, "2024-01-01 11:00:00"), (2, "2024-01-03 09:00:00"),
            (2, "2024-01-03 23:00:00"),
            # cohort day 2: u3 active d2 only
            (3, "2024-01-02 08:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id",
            F.to_timestamp("ts_s").alias("ts"),
        )
        out = {
            (str(r.cohort_day), r.offset_days): r
            for r in retention_cohorts(df).collect()
        }
        c1 = "2024-01-01"
        assert out[(c1, 0)].n_users == 2 and out[(c1, 0)].retention == 1.0
        assert out[(c1, 1)].n_users == 1
        assert out[(c1, 1)].retention == pytest.approx(0.5)
        assert out[(c1, 2)].n_users == 2       # both back on day 3
        assert out[("2024-01-02", 0)].n_users == 1
        assert ("2024-01-02", 1) not in out    # u3 never returns

    def test_plan_python_free(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "user_id long, ts_s string"
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
        plan = (
            retention_cohorts(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestTransitionMatrix:
    def test_counts_and_row_normalization(self, spark):
        from tsdownsample_spark.operators.funnel import transition_matrix

        rows = [
            # u1: a -> b -> a -> c   => (a,b) (b,a) (a,c)
            (1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
            # u2: a -> b             => (a,b)
            (2, 0, "a"), (2, 1, "b"),
            # u3: single event, no transition
            (3, 0, "c"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
        out = {(r.from_type, r.to_type): r
               for r in transition_matrix(df, x_col="ts").collect()}
        assert out[("a", "b")].n == 2 and out[("a", "c")].n == 1
        assert out[("a", "b")].p == pytest.approx(2 / 3)
        assert out[("b", "a")].p == pytest.approx(1.0)   # b row: 1 of 1
        assert ("c", "a") not in out                     # sparse: no row
        # no cross-user pair: u1's last 'c' never chains into u2's 'a'
        assert sum(r.n for r in out.values()) == 4

    def test_tie_order_deterministic_via_tiebreak(self, spark):
        from tsdownsample_spark.operators.funnel import transition_matrix

        # two events at the SAME ts: tiebreak column decides the sequence
        rows = [(1, 0, 10, "a"), (1, 0, 11, "b"), (1, 1, 12, "c")]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_id long, event_type string"
        )
        out = {(r.from_type, r.to_type)
               for r in transition_matrix(df, x_col="ts", tiebreak=["event_id"]).collect()}
        assert out == {("a", "b"), ("b", "c")}

    def test_plan_python_free(self, spark):
        from tsdownsample_spark.operators.funnel import transition_matrix

        df = spark.createDataFrame(
            [(1, 0, "a"), (1, 1, "b")], "user_id long, ts long, event_type string"
        )
        plan = (
            transition_matrix(df, x_col="ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
