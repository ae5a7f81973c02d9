"""Series-diagnostics operators (operators/stats.py).

The contract rows (q_autocorr / q_cusum / q_winsorize) are oracle-compared
against DuckDB by test_entry_contract.py; these tests pin the pieces an
oracle can't see:

* the CUSUM closed form (prefix sum minus running min) against the
  LITERAL textbook recursion ``S_t = max(0, S_{t-1} + dev_t)`` in NumPy;
* plan audits: zero Python in any of the three plans, and cusum/winsorize
  derive their per-series stats via groupBy+join (no whole-partition
  unbounded window buffering).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.stats import (
    autocorr,
    burstiness,
    ks_drift,
    mad_outliers,
    xcorr,
    cusum,
    ewma,
    seasonal_strength,
    seasonal_zscore,
    spearman,
    trend,
    value_histogram,
    winsorize,
)


def _series_df(spark, n=400, series=3, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(series):
        vals = rng.normal(10.0, 2.0, size=n)
        # plant a level shift so CUSUM has a real alarm to find
        if s == 0:
            vals[n // 2 :] += 4.0
        for i, v in enumerate(vals):
            rows.append((f"s{s}", i, float(v)))
    return spark.createDataFrame(rows, "key string, t long, value double")


def test_cusum_matches_literal_recursion(spark):
    df = _series_df(spark)
    out = (
        cusum(df, x_col="t", y_col="value", by=["key"], k=0.5, h=5.0)
        .orderBy("key", "t")
        .collect()
    )
    pdf = df.toPandas().sort_values(["key", "t"])
    got = {(r["key"], r["t"]): r["cusum_s"] for r in out}
    for key, grp in pdf.groupby("key"):
        v = grp["value"].to_numpy()
        z = (v - v.mean()) / v.std(ddof=1)
        s = 0.0
        for t, zt in enumerate(z):
            s = max(0.0, s + (zt - 0.5))
            assert got[(key, t)] == pytest.approx(s, abs=1e-9), (key, t)


def test_cusum_alarm_fires_on_shifted_series_only(spark):
    df = _series_df(spark)
    alarms = (
        cusum(df, x_col="t", y_col="value", by=["key"], k=0.5, h=8.0)
        .where("alarm")
        .groupBy("key")
        .count()
        .collect()
    )
    fired = {r["key"] for r in alarms}
    # with this seed the in-control series peak at S=6.9 and S=4.4 while
    # the shifted series tops 50 — h=8 separates them deterministically
    assert fired == {"s0"}


def test_autocorr_matches_numpy(spark):
    df = _series_df(spark, series=2)
    out = {
        r["key"]: (r["acf"], r["n_pairs"])
        for r in autocorr(df, x_col="t", y_col="value", by=["key"], lag=2).collect()
    }
    pdf = df.toPandas().sort_values(["key", "t"])
    for key, grp in pdf.groupby("key"):
        v = grp["value"].to_numpy()
        expect = np.corrcoef(v[2:], v[:-2])[0, 1]
        acf, n_pairs = out[key]
        assert n_pairs == len(v) - 2
        assert acf == pytest.approx(expect, abs=1e-9)


def test_autocorr_rejects_bad_lag(spark):
    df = _series_df(spark, n=10, series=1)
    with pytest.raises(ValueError, match="lag"):
        autocorr(df, x_col="t", y_col="value", by=["key"], lag=0)


def test_winsorize_bounds_and_interior_identity(spark):
    df = _series_df(spark, series=2)
    out = winsorize(df, y_col="value", by=["key"], lower=0.10, upper=0.90)
    rows = out.collect()
    pdf = df.toPandas()
    for key, grp in pdf.groupby("key"):
        lo = np.quantile(grp["value"], 0.10)  # numpy default = linear interp
        hi = np.quantile(grp["value"], 0.90)
        mine = [r for r in rows if r["key"] == key]
        assert mine[0]["p_lo"] == pytest.approx(lo, abs=1e-12)
        assert mine[0]["p_hi"] == pytest.approx(hi, abs=1e-12)
        for r in mine:
            assert lo - 1e-12 <= r["value_w"] <= hi + 1e-12
            if lo < r["value"] < hi:
                assert r["value_w"] == r["value"]


def test_ewma_matches_pandas_full_series(spark):
    """Full-series EWMA vs pandas ewm(adjust=False) — the contract row
    restarts daily only to keep the oracle recursion shallow; this pins
    the unsegmented semantics (at float tolerance: pandas divides by
    old_wt+new_wt, which is ~1 ulp off the textbook form we compute)."""
    import pandas as pd

    df = _series_df(spark, n=500, series=2)
    out = {
        (r["key"], r["t"]): r["ewma"]
        for r in ewma(df, x_col="t", y_col="value", by=["key"], alpha=0.25).collect()
    }
    pdf = df.toPandas().sort_values(["key", "t"])
    for key, grp in pdf.groupby("key"):
        exp = grp["value"].ewm(alpha=0.25, adjust=False).mean().to_numpy()
        for t, e in zip(grp["t"], exp):
            assert out[(key, t)] == pytest.approx(e, rel=1e-12), (key, t)


def test_ewma_first_point_identity_and_alpha_one(spark):
    df = _series_df(spark, n=20, series=1)
    rows = sorted(
        ewma(df, x_col="t", y_col="value", by=["key"], alpha=1.0).collect(),
        key=lambda r: r["t"],
    )
    for r in rows:  # alpha=1 -> no smoothing at all
        assert r["ewma"] == pytest.approx(r["value"], abs=0.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, x_col="t", y_col="value", by=["key"], alpha=0.0)


def test_seasonal_zscore_profile(spark):
    # two "hours" with different baselines; z must use each row's own slot
    rows = []
    for day in range(30):
        rows.append(("a", f"2024-01-{day+1:02d} 03:00:00", 10.0 + (day % 3)))
        rows.append(("a", f"2024-01-{day+1:02d} 15:00:00", 100.0 + (day % 3)))
    df = spark.createDataFrame(rows, "key string, ts string, value double").select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = seasonal_zscore(df, x_col="ts", y_col="value", by=["key"]).collect()
    mus = {r["season_slot"]: r["season_mu"] for r in out}
    assert mus[3] == pytest.approx(11.0)
    assert mus[15] == pytest.approx(101.0)
    for r in out:  # identical residual pattern in both slots -> same |z| range
        assert abs(r["z_seasonal"]) < 1.5
    with pytest.raises(ValueError, match="season"):
        seasonal_zscore(df, by=["key"], season="fortnight")


def test_trend_matches_polyfit(spark):
    """Known slope recovered exactly; r2 = 1 for a noiseless line.  trend()
    takes timestamps, so build one point per hour: slope 2.0/day."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = [
        ("a", (base + pd.Timedelta(hours=i)).to_pydatetime(), 5.0 + 2.0 * i / 24.0)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    r = trend(df, x_col="ts", y_col="value", by=["key"]).collect()[0]
    assert r["slope_per_day"] == pytest.approx(2.0, rel=1e-12)
    assert r["intercept"] == pytest.approx(5.0, rel=1e-12)
    assert r["r2"] == pytest.approx(1.0, abs=1e-12)
    assert r["n"] == 100


def test_spearman_fractional_ranks_with_ties(spark):
    """Hand-checkable tied fixture: values with ties get AVERAGE ranks
    (the standard definition), verified against a NumPy re-derivation."""
    vals = [3.0, 1.0, 2.0, 2.0, 5.0, 2.0, 4.0, 1.0]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, t long, value double")
    r = spearman(df, x_col="t", y_col="value", by=["key"]).collect()[0]
    v = np.asarray(vals)
    # average ranks: mean of 1-based positions each tied value occupies
    order = np.argsort(v, kind="stable")
    pos = np.empty(len(v))
    pos[order] = np.arange(1, len(v) + 1)
    ry = np.array([pos[v == x].mean() for x in v])
    rx = np.arange(1, len(v) + 1)
    expect = np.corrcoef(rx, ry)[0, 1]
    assert r["n"] == len(v)
    assert r["rho"] == pytest.approx(expect, abs=1e-12)


def test_spearman_perfect_monotone_is_one(spark):
    rows = [("a", i, float(i * i)) for i in range(50)]  # nonlinear but monotone
    df = spark.createDataFrame(rows, "key string, t long, value double")
    r = spearman(df, x_col="t", y_col="value", by=["key"]).collect()[0]
    assert r["rho"] == pytest.approx(1.0, abs=1e-12)


def test_value_histogram_counts_and_edges(spark):
    # values 0..99 in 10 bins of width 9.9: v=99 (the max) clamps to bin 9
    rows = [("a", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, t long, value double")
    out = {
        r["bucket"]: r for r in value_histogram(df, by=["key"], bins=10).collect()
    }
    assert sum(r["cnt"] for r in out.values()) == 100
    assert set(out) == set(range(10))
    assert out[9]["cnt"] == 10 and out[0]["lo"] == 0.0 and out[0]["hi"] == 99.0
    # NumPy cross-check with the same edge convention (right edge closed)
    np_cnt, _ = np.histogram([float(i) for i in range(100)], bins=10, range=(0, 99))
    assert [out[b]["cnt"] for b in range(10)] == list(np_cnt)


def test_value_histogram_constant_series_single_bucket(spark):
    rows = [("a", i, 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, "key string, t long, value double")
    out = value_histogram(df, by=["key"], bins=10).collect()
    assert len(out) == 1 and out[0]["bucket"] == 0 and out[0]["cnt"] == 5
    with pytest.raises(ValueError, match="bins"):
        value_histogram(df, by=["key"], bins=0)


def test_seasonal_strength_separates_diurnal_from_noise(spark):
    import pandas as pd

    rng = np.random.default_rng(3)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(24 * 30):
        ts = (base + pd.Timedelta(hours=i)).to_pydatetime()
        rows.append(("diurnal", ts, float(10.0 + 5.0 * (i % 24 == 12))))
        rows.append(("noise", ts, float(rng.normal(10, 2))))
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {
        r["key"]: r["strength"]
        for r in seasonal_strength(df, by=["key"]).collect()
    }
    # diurnal value is a pure function of hour -> SS_within = 0 -> R² = 1
    assert out["diurnal"] == pytest.approx(1.0, abs=1e-12)
    # hour explains ~nothing of iid noise: E[R²] ≈ 23/719; bound loosely
    assert out["noise"] < 0.15
    with pytest.raises(ValueError, match="season"):
        seasonal_strength(df, by=["key"], season="lunar")


def test_winsorize_rejects_bad_bounds(spark):
    df = _series_df(spark, n=10, series=1)
    with pytest.raises(ValueError, match="lower"):
        winsorize(df, y_col="value", by=["key"], lower=0.9, upper=0.1)


@pytest.mark.parametrize(
    "build",
    [
        lambda df: autocorr(df, x_col="t", y_col="value", by=["key"], lag=1),
        lambda df: cusum(df, x_col="t", y_col="value", by=["key"]),
        lambda df: winsorize(df, y_col="value", by=["key"]),
        lambda df: trend(df, x_col="t", y_col="value", by=["key"]),
        lambda df: spearman(df, x_col="t", y_col="value", by=["key"]),
        lambda df: ks_drift(df, x_col="t", y_col="value", by=["key"]),
        lambda df: xcorr(df, x_col="t", y_col="value", by="key", lag=1),
        lambda df: mad_outliers(df, y_col="value", by=["key"]),
        lambda df: burstiness(df, x_col="t", by=["key"]),
    ],
    ids=["autocorr", "cusum", "winsorize", "trend", "spearman", "ks_drift",
         "xcorr", "mad_outliers", "burstiness"],
)
def test_plans_have_no_python(spark, build):
    df = _series_df(spark, n=50, series=2)
    plan = build(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker
    # stats come from groupBy+join, not an unbounded window over the fact
    # side: the only Window in the cusum plan is the cumulative ROWS pair
    if "cusum" in str(build):
        assert "Join" in plan


def _ks_truth(t, v):
    """Exact two-sample KS between the halves split at the time-range
    midpoint, CDFs stepped per distinct value (ties move both CDFs)."""
    t = np.asarray(t)
    v = np.asarray(v)
    mid = (int(t.min()) + int(t.max())) // 2
    a, b = np.sort(v[t <= mid]), np.sort(v[t > mid])
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(fa - fb))), len(a), len(b)


def test_ks_drift_matches_numpy_truth(spark):
    df = _series_df(spark)
    out = {
        r["key"]: r
        for r in ks_drift(df, x_col="t", y_col="value", by=["key"]).collect()
    }
    pdf = df.toPandas()
    for key, grp in pdf.groupby("key"):
        d, n0, n1 = _ks_truth(grp["t"], grp["value"])
        assert out[key]["d"] == pytest.approx(d, abs=1e-12), key
        assert (out[key]["n_early"], out[key]["n_late"]) == (n0, n1)
    # the planted level shift in s0 must dominate the in-control series
    assert out["s0"]["d"] > 2 * max(out["s1"]["d"], out["s2"]["d"])


def test_ks_drift_identical_halves_is_zero_and_disjoint_is_one(spark):
    rows = [("same", t, float(t % 10)) for t in range(40)]
    rows += [("shift", t, float(t >= 20)) for t in range(40)]
    df = spark.createDataFrame(rows, "key string, t long, value double")
    out = {
        r["key"]: r["d"]
        for r in ks_drift(df, x_col="t", y_col="value", by=["key"]).collect()
    }
    # identical value multisets in both halves -> D = 0 exactly
    assert out["same"] == 0.0
    # disjoint supports -> D = 1 exactly
    assert out["shift"] == 1.0


class TestXcorr:
    def _panel_df(self, spark):
        # two series over 60 "minutes" on a long x (micros): b = a shifted
        # by one bucket plus a constant; c = anti-correlated with a
        rows = []
        base = [float((i * 37) % 11) for i in range(61)]
        for i in range(60):
            t = i * 60_000_000
            rows.append(("a", t, base[i]))
            rows.append(("b", t, base[i - 1] + 5.0 if i else 0.0))
            rows.append(("c", t, -base[i]))
        return spark.createDataFrame(rows, "key string, t long, value double")

    def test_lagged_twin_and_anticorrelation(self, spark):
        from tsdownsample_spark.operators.stats import xcorr

        df = self._panel_df(spark)
        out = {
            (r.key_a, r.key_b): r
            for r in xcorr(
                df, x_col="t", y_col="value", by="key", every="minute", lag=1
            ).collect()
        }
        # b IS a delayed one bucket (plus a constant, which corr ignores):
        # at lag=1, corr(a_t, b_{t-1}) pairs b's copy of a_{t-2}... the
        # clean identity is the pair (b, a): b_t vs a_{t-1} = exactly equal
        # shifted values -> r = 1
        assert out[("b", "a")].r == pytest.approx(1.0, abs=1e-9)
        assert out[("c", "a")].r is not None
        # n_buckets: 59 overlapping (t>=1 joined against t<=58 shifted)
        assert out[("b", "a")].n_buckets == 59
        # anti-correlated pair at lag 0
        out0 = {
            (r.key_a, r.key_b): r
            for r in xcorr(
                df, x_col="t", y_col="value", by="key", every="minute", lag=0
            ).collect()
        }
        assert out0[("c", "a")].r == pytest.approx(-1.0, abs=1e-9)
        assert out0[("a", "c")].r == pytest.approx(-1.0, abs=1e-9)

    def test_bucket_means_not_raw_points(self, spark):
        from tsdownsample_spark.operators.stats import xcorr

        # two points per bucket whose MEAN is constant for x but raw values
        # vary: corr against any series must be NULL (zero variance) —
        # proving bucket means, not raw points, enter the fold
        rows = []
        for i in range(20):
            t = i * 60_000_000
            rows.append(("x", t, 10.0 + i))
            rows.append(("x", t + 1_000_000, 10.0 - i))   # mean always 10
            rows.append(("y", t, float(i)))
        df = spark.createDataFrame(rows, "key string, t long, value double")
        out = {
            (r.key_a, r.key_b): r
            for r in xcorr(
                df, x_col="t", y_col="value", by="key", every="minute", lag=0
            ).collect()
        }
        assert out[("x", "y")].r is None
        assert out[("x", "y")].n_buckets == 20

    def test_rejects_unknown_granularity(self, spark):
        from tsdownsample_spark.operators.stats import xcorr

        df = self._panel_df(spark)
        with pytest.raises(ValueError, match="every"):
            xcorr(df, x_col="t", y_col="value", by="key", every="5 minutes")


class TestMadOutliers:
    def test_flags_spike_not_fat_mean(self, spark):
        from tsdownsample_spark.operators.stats import mad_outliers

        # 50 quiet points around 10 plus one huge spike: classic z-score
        # would be dragged by the spike's own effect on std; MAD must flag
        # exactly the spike
        rows = [("s", i, 10.0 + (i % 5) * 0.1) for i in range(50)]
        rows.append(("s", 50, 500.0))
        df = spark.createDataFrame(rows, "key string, t long, value double")
        out = mad_outliers(df, y_col="value", by=["key"], k=3.5).collect()
        flagged = [r for r in out if r.outlier]
        assert len(flagged) == 1 and flagged[0].value == 500.0
        assert abs(flagged[0].rz) > 100  # spike is enormous in MAD units

    def test_constant_series_yields_null_not_all_flagged(self, spark):
        from tsdownsample_spark.operators.stats import mad_outliers

        df = spark.createDataFrame(
            [("c", i, 7.0) for i in range(20)],
            "key string, t long, value double",
        )
        out = mad_outliers(df, y_col="value", by=["key"]).collect()
        assert all(r.rz is None for r in out)
        assert not any(r.outlier for r in out if r.outlier is not None)

    def test_matches_numpy_median_mad(self, spark):
        import numpy as np

        from tsdownsample_spark.operators.stats import mad_outliers

        vals = [float((i * 17) % 23) for i in range(40)]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "key string, t long, value double",
        )
        med = float(np.median(vals))
        mad = float(np.median(np.abs(np.array(vals) - med)))
        out = {r.t: r.rz for r in mad_outliers(df, y_col="value", by=["key"]).collect()}
        for i, v in enumerate(vals):
            assert out[i] == pytest.approx(
                (v - med) / (1.4826022185056018 * mad), rel=1e-12
            )


class TestBurstiness:
    def test_metronome_poissonish_and_bursty(self, spark):
        from tsdownsample_spark.operators.stats import burstiness

        rows = []
        # metronome: constant gap -> cv = 0, b = -1
        for i in range(30):
            rows.append(("tick", i * 1_000_000))
        # bursty: 10 tight clusters separated by long silences -> cv > 1
        t = 0
        for c in range(10):
            for j in range(5):
                rows.append(("burst", t)); t += 1_000
            t += 10_000_000
        df = spark.createDataFrame(rows, "key string, ts long")
        out = {r.key: r for r in burstiness(df, x_col="ts", by=["key"]).collect()}
        assert out["tick"].cv == pytest.approx(0.0, abs=1e-12)
        assert out["tick"].b == pytest.approx(-1.0, abs=1e-12)
        assert out["burst"].cv > 1.0 and out["burst"].b > 0.0
        assert out["tick"].n_gaps == 29
        assert out["burst"].n_gaps == 49

    def test_short_series_yields_null_cv(self, spark):
        from tsdownsample_spark.operators.stats import burstiness

        df = spark.createDataFrame(
            [("one", 0), ("one", 5), ("lone", 3)], "key string, ts long"
        )
        out = {r.key: r for r in burstiness(df, x_col="ts", by=["key"]).collect()}
        assert out["one"].cv is None          # a single gap has no sample std
        assert "lone" not in out              # no gaps at all -> no row


class TestPsiDrift:
    def test_identical_halves_near_zero_and_shift_large(self, spark):
        from tsdownsample_spark.operators.stats import psi_drift

        rows = []
        # 'same': value pattern repeats identically in both halves
        for i in range(200):
            rows.append(("same", i, float(i % 10)))
        # 'shift': first half in [0,10), second half in [50,60)
        for i in range(100):
            rows.append(("shift", i, float(i % 10)))
        for i in range(100, 200):
            rows.append(("shift", i, 50.0 + (i % 10)))
        df = spark.createDataFrame(rows, "key string, t long, value double")
        out = {r.key: r for r in
               psi_drift(df, x_col="t", y_col="value", by=["key"]).collect()}
        assert abs(out["same"].psi) < 0.01          # only smoothing residue
        assert out["shift"].psi > 1.0               # disjoint supports
        assert out["same"].n_early + out["same"].n_late == 200

    def test_matches_hand_psi(self, spark):
        import math

        from tsdownsample_spark.operators.stats import psi_drift

        # 2 bins over [0, 1]: early = 3x0.0 1x1.0, late = 1x0.0 3x1.0
        # t range 0..7 -> mid = 3 -> early t<=3, late t>3
        vals = [0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "key string, t long, value double",
        )
        out = psi_drift(df, x_col="t", y_col="value", by=["key"], bins=2).collect()[0]
        def p(c, n): return (c + 0.5) / (n + 0.5 * 2)
        exp = sum(
            (p(ce, 4) - p(cl, 4)) * math.log(p(ce, 4) / p(cl, 4))
            for ce, cl in [(3, 1), (1, 3)]
        )
        assert out.psi == pytest.approx(exp, rel=1e-12)

    def test_validation(self, spark):
        from tsdownsample_spark.operators.stats import psi_drift

        df = spark.createDataFrame([("k", 0, 1.0)], "key string, t long, value double")
        with pytest.raises(ValueError, match="bins"):
            psi_drift(df, x_col="t", y_col="value", by=["key"], bins=1)
