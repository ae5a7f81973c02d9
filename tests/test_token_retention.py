"""Token-table retention tiers (operators/token_retention.py).

Three claims under test:

1. **Cascade == from-raw** for MinMax/M4 with power-of-two tier ratios —
   the hierarchical equal-count bin decomposition (module docstring proof),
   over lengths that hit identity, small-bin and deep branches.
2. **Edge-nesting rule** at the NumPy level: pow-2 ratios nest for every
   n; non-pow-2 ratios provably do NOT (so cascade_plan must refuse them).
3. **Per-row north-rule invariant**: every tier's token array equals what
   the reference class API selects from the raw sequence at that n_out,
   with sel_idx carrying raw-index provenance through the cascade.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsdownsample_spark.kernels import selectors as K
from tsdownsample_spark.kernels.binning import equal_count_bins
from tsdownsample_spark.operators.token_retention import (
    cascade_plan,
    downsample_tier,
    token_tier_cascade,
)

LENGTHS = [1, 2, 3, 15, 16, 17, 63, 64, 65, 100, 129, 257, 1000, 4095, 4097]


@pytest.fixture(scope="module")
def token_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i, ln in enumerate(LENGTHS):
        rows.append(
            (
                f"d{i:03d}",
                rng.integers(0, 50_257, ln).astype(np.int32).tolist(),
                ln,
                ["web", "code"][i % 2],
            )
        )
    rows.append(("dnull", None, 0, "web"))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


# ------------------------------------------------------------ cascade_plan


def test_cascade_plan_rules():
    assert cascade_plan([1024, 256, 64], "minmax") == [
        (1024, None),
        (256, 1024),
        (64, 256),
    ]
    # non-pow2 ratio -> from raw
    assert cascade_plan([640, 128], "minmax") == [(640, None), (128, None)]
    # non-divisible -> from raw
    assert cascade_plan([100, 64], "m4") == [(100, None), (64, None)]
    # LTTB-family selectors never cascade
    assert cascade_plan([1024, 256], "lttb") == [(1024, None), (256, None)]
    with pytest.raises(ValueError):
        cascade_plan([64, 256], "minmax")
    with pytest.raises(ValueError):
        token_tier_cascade(None, [1024, 320], algo="minmax", mode="cascade")


def test_equal_count_edges_nest_iff_pow2_ratio():
    """The FP claim behind cascade eligibility, swept at the NumPy level."""

    def nests(n, m1, m2):
        c = m1 // m2
        _, e1 = equal_count_bins(n, m1)
        _, e2 = equal_count_bins(n, m2)
        return np.array_equal(e1[c - 1 :: c], e2)

    ns = range(34, 50_000, 11)
    assert all(nests(n, 32, 8) for n in ns)
    assert all(nests(n, 512, 32) for n in ns)
    assert all(nests(n, 48, 12) for n in ns)  # pow2 ratio, non-pow2 bins
    # non-pow2 ratio (c=5) genuinely diverges — the rule is load-bearing
    assert not all(nests(n, 30, 6) for n in ns)


# property-level cascade equality at the kernel layer: heavy-tie inputs
# (token-like small alphabets) stress exactly the first-occurrence rules the
# docstring proof leans on; hypothesis shrinks any violation to a minimal n
_tok_ys = st.lists(
    st.integers(min_value=0, max_value=7).map(float), min_size=1, max_size=600
)
_ladder = st.sampled_from([(64, 16), (32, 8), (128, 16), (16, 8)])


@settings(max_examples=200, deadline=None)
@given(_tok_ys, _ladder)
def test_minmax_cascade_property(ys, ladder):
    n1, n2 = ladder
    y = np.asarray(ys, dtype=np.float64)
    sel1 = K.minmax(y, n1)
    sel2 = sel1[K.minmax(y[sel1], n2)]
    np.testing.assert_array_equal(sel2, K.minmax(y, n2))


@settings(max_examples=200, deadline=None)
@given(_tok_ys, _ladder)
def test_m4_cascade_property(ys, ladder):
    n1, n2 = ladder
    y = np.asarray(ys, dtype=np.float64)
    sel1 = K.m4(y, n1)
    sel2 = sel1[K.m4(y[sel1], n2)]
    np.testing.assert_array_equal(sel2, K.m4(y, n2))


# ------------------------------------------------- cascade == from_raw


@pytest.mark.parametrize("algo", ["minmax", "m4"])
def test_cascade_equals_from_raw(spark, token_df, algo):
    casc = token_tier_cascade(token_df, [64, 16, 8], algo=algo, mode="cascade")
    raw = token_tier_cascade(token_df, [64, 16, 8], algo=algo, mode="from_raw")
    for t in (64, 16, 8):
        a = {r["doc_id"]: (r["sel_idx"], r["tokens"]) for r in casc[t].collect()}
        b = {r["doc_id"]: (r["sel_idx"], r["tokens"]) for r in raw[t].collect()}
        assert a == b, (algo, t)
        assert a["dnull"] == (None, None)


def test_tier_invariant_vs_reference_classes(spark, token_df):
    """North-rule per-row invariant: tier tokens == reference selection from
    raw at that tier's n_out; sel_idx carries RAW indices through cascades."""
    from tsdownsample_spark.compat import M4Downsampler, MinMaxDownsampler

    for algo, cls in (("minmax", MinMaxDownsampler), ("m4", M4Downsampler)):
        tiers = token_tier_cascade(token_df, [64, 16], algo=algo, mode="cascade")
        raw_rows = {
            r["doc_id"]: r["tokens"] for r in token_df.collect() if r["tokens"]
        }
        for n_out in (64, 16):
            got = {
                r["doc_id"]: (list(r["sel_idx"]), list(r["tokens"]))
                for r in tiers[n_out].collect()
                if r["sel_idx"] is not None
            }
            for doc, toks in raw_rows.items():
                y = np.asarray(toks, dtype=np.int32)
                exp = (
                    np.arange(len(y))
                    if len(y) <= n_out
                    else np.asarray(cls().downsample(y, n_out=n_out))
                )
                assert got[doc] == (list(exp), list(y[exp])), (algo, n_out, doc)


def test_lttb_ladder_falls_back_to_from_raw(spark, token_df):
    """mode='auto' with a non-decomposable selector: every tier comes from
    raw, and each still satisfies the reference invariant."""
    from tsdownsample_spark.compat import LTTBDownsampler

    tiers = token_tier_cascade(token_df, [64, 16], algo="lttb", mode="auto")
    raw_rows = {r["doc_id"]: r["tokens"] for r in token_df.collect() if r["tokens"]}
    for n_out in (64, 16):
        got = {
            r["doc_id"]: (list(r["sel_idx"]), list(r["tokens"]))
            for r in tiers[n_out].collect()
            if r["sel_idx"] is not None
        }
        for doc, toks in raw_rows.items():
            y = np.asarray(toks, dtype=np.int32)
            exp = (
                np.arange(len(y))
                if len(y) <= n_out
                else np.asarray(LTTBDownsampler().downsample(y, n_out=n_out))
            )
            assert got[doc] == (list(exp), list(y[exp])), (n_out, doc)


def test_salt_buckets_are_even(spark):
    """The pipeline's resume units are salt buckets, not the skewed source
    key: over the deterministic token table (~half 'web') every bucket must
    hold a comparable share of docs."""
    import sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from tsdownsample_spark.queries import token_table_path

    df = spark.read.parquet(token_table_path())
    counts = [
        r["count"]
        for r in df.groupBy(F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("b"))
        .count()
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) / (sum(counts) / len(counts)) < 1.6
    # while the source key itself is badly skewed (the reason buckets exist)
    src = {r["source"]: r["count"] for r in df.groupBy("source").count().collect()}
    assert src["web"] / sum(src.values()) > 0.4


def test_tier_schema_and_provenance(spark, token_df):
    out = downsample_tier(token_df, 16, algo="minmax")
    assert out.columns == ["doc_id", "tokens", "n_tok", "source", "sel_idx", "tier_n_out"]
    second = downsample_tier(out, 8, algo="minmax")
    assert second.columns == out.columns
    row = {r["doc_id"]: r for r in second.collect()}["d012"]  # ln=1000
    # n_tok still the RAW length; sel_idx raw-positioned
    assert row["n_tok"] == 1000
    assert len(row["sel_idx"]) == 8 and max(row["sel_idx"]) < 1000
    assert sorted(row["sel_idx"]) == list(row["sel_idx"])


def test_ladder_single_pass_equals_cascade(spark):
    """One-job full-ladder build == the per-tier cascade, every tier
    (raw indices AND tier tokens), and the plan is a single MapInArrow."""
    import numpy as np

    from tsdownsample_spark.operators.token_retention import (
        ladder_single_pass,
        tier_view,
        token_tier_cascade,
    )
    from tsdownsample_spark.sources.synth import synth_token_table

    df = synth_token_table(spark, n_docs=120, seed=5)
    tiers = (256, 64, 16)
    ladder = ladder_single_pass(df, tiers, algo="minmax")
    plan = ladder._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and plan.count("MapInArrow") == 1
    cascade = token_tier_cascade(df, tiers, algo="minmax", mode="auto")
    for n in tiers:
        got = {
            r["doc_id"]: r
            for r in tier_view(ladder, n).collect()
        }
        exp = {r["doc_id"]: r for r in cascade[n].collect()}
        assert set(got) == set(exp) and len(got) > 0
        for doc, er in exp.items():
            gr = got[doc]
            assert gr["tier_n_out"] == er["tier_n_out"] == n
            if er["sel_idx"] is None:
                assert gr["sel_idx"] is None
                continue
            assert np.array_equal(gr["sel_idx"], er["sel_idx"]), (n, doc)
            assert np.array_equal(gr["tokens"], er["tokens"]), (n, doc)


def test_ladder_single_pass_rejects_non_raw(spark):
    import pytest as _pytest

    from tsdownsample_spark.operators.token_retention import (
        downsample_tier,
        ladder_single_pass,
    )
    from tsdownsample_spark.sources.synth import synth_token_table

    df = synth_token_table(spark, n_docs=10, seed=5)
    t = downsample_tier(df, 64)
    with _pytest.raises(ValueError, match="RAW token table"):
        ladder_single_pass(t, (16, 8))
