"""Column data-quality profile (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.profile import profile_columns


@pytest.fixture()
def df(spark):
    rows = [
        (1, "a", 10.5, None),
        (2, "b", -3.0, None),
        (3, "a", None, None),
        (4, None, 2.0, None),
        (5, "c", 10.5, None),
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, v double, dead string"
    )


def test_exact_profile_values(spark, df):
    out = {r.column: r for r in profile_columns(df, exact=True).collect()}
    assert set(out) == {"id", "cat", "v", "dead"}
    assert all(r.n_rows == 5 for r in out.values())
    assert (out["id"].n_nonnull, out["id"].n_distinct) == (5, 5)
    assert (out["cat"].n_nonnull, out["cat"].n_distinct) == (4, 3)
    assert out["cat"].null_frac == pytest.approx(0.2)
    # numeric min/max ordered numerically (min is -3.0, not "10.5" lexically)
    assert (out["v"].min_str, out["v"].max_str) == ("-3.0", "10.5")
    assert (out["v"].n_nonnull, out["v"].n_distinct) == (4, 3)
    # NULL-only column: 0 distinct, NULL bounds, null_frac 1
    assert (out["dead"].n_nonnull, out["dead"].n_distinct) == (0, 0)
    assert out["dead"].min_str is None and out["dead"].null_frac == 1.0


def test_column_subset_and_validation(spark, df):
    out = profile_columns(df, cols=["id", "v"], exact=True).collect()
    assert sorted(r.column for r in out) == ["id", "v"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(df, cols=[])


def test_approx_mode_close_and_plan_python_free(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 97).alias("mod")
    )
    out = {r.column: r for r in profile_columns(df, rsd=0.02).collect()}
    assert out["mod"].n_distinct == pytest.approx(97, rel=0.1)
    assert out["id"].n_distinct == pytest.approx(5000, rel=0.1)
    plan = (
        profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # approx mode must NOT pay the exact-distinct EXPAND blowup
    assert "Expand" not in plan
