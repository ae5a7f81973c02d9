"""Golden-vector tests: expected outputs hand-pinned from the reference's own
unit tests (cited per case), run against our vectorized kernels.
"""

import numpy as np
import pytest

from tsdownsample_spark.kernels import selectors as K


def arange_f32(n=100):
    return np.arange(n, dtype=np.float32)


class TestMinMax:
    def test_without_x(self):
        # downsample_rs/src/minmax.rs:294-312
        idx = K.minmax(arange_f32(), 10)
        assert idx.tolist() == [0, 19, 20, 39, 40, 59, 60, 79, 80, 99]

    def test_with_x(self):
        # minmax.rs:335-353
        x = np.arange(100, dtype=np.int32)
        idx = K.minmax(arange_f32(), 10, x=x)
        assert idx.tolist() == [0, 19, 20, 39, 40, 59, 60, 79, 80, 99]

    def test_with_x_gap(self):
        # minmax.rs:376-395 — one full gap -> 8 indices
        x = np.array([i + 50 if i > 50 else i for i in range(100)], dtype=np.int32)
        idx = K.minmax(arange_f32(), 10, x=x)
        assert idx.tolist() == [0, 29, 30, 50, 51, 69, 70, 99]

        # second gap -> 9 indices (gap bin with a single value)
        x2 = np.array([v + 50 if v > 101 else v for v in x], dtype=np.int32)
        idx = K.minmax(arange_f32(), 10, x=x2)
        assert idx.tolist() == [0, 39, 40, 50, 51, 52, 59, 60, 99]

    def test_short_input_identity(self):
        # minmax.rs:105-107: n_out >= n -> all indices
        idx = K.minmax(arange_f32(10), 20)
        assert idx.tolist() == list(range(10))

    def test_n_out_validation(self):
        with pytest.raises(ValueError):
            K.minmax(arange_f32(), 9)


class TestM4:
    def test_without_x(self):
        # m4.rs:310-328 — duplicates retained
        idx = K.m4(arange_f32(), 12)
        assert idx.tolist() == [0, 0, 33, 33, 34, 34, 66, 66, 67, 67, 99, 99]

    def test_with_x(self):
        # m4.rs:350-369
        x = np.arange(100, dtype=np.int32)
        idx = K.m4(arange_f32(), 12, x=x)
        assert idx.tolist() == [0, 0, 33, 33, 34, 34, 66, 66, 67, 67, 99, 99]

    def test_with_x_gap(self):
        # m4.rs:392-413
        x = np.array([i + 50 if i > 50 else i for i in range(100)], dtype=np.int32)
        idx = K.m4(arange_f32(), 20, x=x)
        assert idx.tolist() == [0, 0, 29, 29, 30, 30, 50, 50, 51, 51, 69, 69, 70, 70, 99, 99]

        x2 = np.array([v + 50 if v > 101 else v for v in x], dtype=np.int32)
        idx = K.m4(arange_f32(), 20, x=x2)
        assert idx.tolist() == [0, 0, 39, 39, 40, 40, 50, 50, 51, 52, 52, 59, 59, 60, 60, 99, 99]

    def test_n_out_validation(self):
        with pytest.raises(ValueError):
            K.m4(arange_f32(), 10)


class TestLTTB:
    def test_with_x(self):
        # lttb.rs:190-196
        x = np.arange(10, dtype=np.int64)
        y = np.arange(10, dtype=np.float64)
        assert K.lttb(y, 4, x=x).tolist() == [0, 1, 5, 9]

    def test_without_x(self):
        # lttb.rs:198-203
        y = np.arange(10, dtype=np.float64)
        assert K.lttb(y, 4).tolist() == [0, 1, 5, 9]

    def test_with_x_equals_without_x_random(self):
        # lttb.rs:205-215
        rng = np.random.default_rng(7)
        for _ in range(10):
            y = rng.uniform(-1e6, 1e6, size=5000).astype(np.float32)
            x = np.arange(5000, dtype=np.int32)
            np.testing.assert_array_equal(K.lttb(y, 200, x=x), K.lttb(y, 200))


class TestEquidistantBins:
    def test_matches_linspace_searchsorted(self):
        # searchsorted.rs:224-237: 0..9999 into 4 bins of 2500
        from tsdownsample_spark.kernels.binning import equidistant_bins

        x = np.arange(10_000, dtype=np.uint32)
        starts, ends = equidistant_bins(x, 4)
        assert starts.tolist() == [0, 2500, 5000, 7500]
        assert ends.tolist() == [2500, 5000, 7500, 10000]

    def test_bin_starts_small(self):
        # searchsorted.rs:274-289: arr 1..=10 into 3 bins -> starts [0, 4, 7]
        from tsdownsample_spark.kernels.binning import equidistant_bins

        x = np.arange(1, 11, dtype=np.int64)
        starts, ends = equidistant_bins(x, 3)
        nonempty = [int(s) for s, e in zip(starts, ends) if e > s]
        assert nonempty == [0, 4, 7]

    def test_int_edge_trailing_point_dropped(self):
        # searchsorted.rs:112-118: a point sitting exactly on a truncated
        # integer edge makes its bin empty (x[start] >= search_value) — here
        # the LAST point: [0,1,2,3,10] into 2 bins, edges trunc to (5, 10);
        # bin 1 starts at x=10 == edge 10 -> empty, trailing point DROPPED.
        from tsdownsample_spark.kernels.binning import equidistant_bins

        x = np.array([0, 1, 2, 3, 10], dtype=np.int64)
        starts, ends = equidistant_bins(x, 2)
        assert starts.tolist() == [0, 4]
        assert ends.tolist() == [4, 4]  # second bin empty -> x=10 nowhere

    def test_int_edge_point_pushed_to_next_bin(self):
        # [4,4,9] into 2 bins: edges trunc to (6, 9); bin 1 starts at x=9
        # == edge -> empty; the reference pushes/drops rather than keeping
        # the edge-equal point in the current bin.
        from tsdownsample_spark.kernels.binning import equidistant_bins

        x = np.array([4, 4, 9], dtype=np.int64)
        starts, ends = equidistant_bins(x, 2)
        assert (starts.tolist(), ends.tolist()) == ([0, 2], [2, 2])

    def test_int64_beyond_float53_matches_naive(self):
        # edges are cast into the x dtype before comparison (T::from_f64);
        # a pure-float64 searchsorted can misplace >2^53 neighbors
        from tsdownsample_spark.kernels.binning import equidistant_bins

        from naive_oracle import naive_equidistant_bins

        base = np.int64(1) << np.int64(60)
        x = base + np.cumsum(
            np.random.default_rng(5).integers(1, 7, size=500, dtype=np.int64)
        )
        starts, ends = equidistant_bins(x, 16)
        got = [(int(s), int(e)) for s, e in zip(starts, ends) if e > s]
        exp = [b for b in naive_equidistant_bins(x, 16) if b is not None]
        assert got == [(int(a), int(b)) for a, b in exp]



class TestEveryNth:
    def test_goldens(self):
        # tests/test_tsdownsample.py:120-126: arange(10_000), n_out=100
        y = np.arange(10_000)
        idx = K.everynth(y, 100)
        assert idx[0] == 0
        assert idx[-1] == 9_900
        assert len(idx) == 100

    def test_short(self):
        # step = max(1, n/n_out) -> identity when n <= n_out
        assert K.everynth(np.arange(5), 100).tolist() == [0, 1, 2, 3, 4]


class TestAPIInvariants:
    def test_first_last_invariant(self):
        # tests/test_tsdownsample.py:100-106 (datapoints = arange(10_000))
        y = np.arange(10_000)
        for algo in ("minmax", "m4", "lttb", "minmaxlttb"):
            idx = K.downsample_array(y, 100, algo=algo)
            assert idx[0] == 0
            assert idx[-1] == len(y) - 1

    def test_nan_index_surfacing(self):
        # tests/test_tsdownsample.py:109-117: NaNs at 0 and 9960 surface
        y = np.arange(10_000, dtype=np.float64)
        y[0] = np.nan
        y[9960] = np.nan
        for algo in ("nanminmax", "nanm4", "nanminmaxlttb"):
            idx = K.downsample_array(y, 100, algo=algo)
            assert idx[0] == 0
            assert idx[-2] == 9960 or 9960 in idx

    def test_nan_every_5th(self):
        # tests/test_tsdownsample.py:337-362: y[::5]=NaN -> NaNMinMax picks
        # only NaN positions; NaNM4 has NaNs at slots 1,2 mod 4.
        rng = np.random.default_rng(0)
        y = rng.standard_normal(50_000)
        y[::5] = np.nan
        idx = K.minmax(y, 100, nan="return")
        assert np.all(np.isnan(y[idx]))
        idx4 = K.m4(y, 100, nan="return")
        vals = y[idx4]
        assert np.all(np.isnan(vals[1::4]))
        assert np.all(np.isnan(vals[2::4]))

    def test_gap_cardinality(self):
        # tests/test_tsdownsample.py:158-171: one large x gap -> 66..100 idx
        rng = np.random.default_rng(1)
        y = rng.standard_normal(10_000).astype(np.float32)
        x = np.arange(10_000)
        x[:5_000] += 5_000
        x.sort()
        for algo in ("minmax", "m4", "minmaxlttb"):
            idx = K.downsample_array(y, 100, algo=algo, x=x)
            assert 66 <= len(idx) <= 100

    def test_datetime_x(self):
        y = np.arange(1000, dtype=np.float64)
        x = np.arange("2024-01-01", "2024-01-01T00:16:40", dtype="datetime64[s]")
        assert len(x) == 1000
        idx = K.minmax(y, 10, x=x)
        np.testing.assert_array_equal(idx, K.minmax(y, 10, x=np.arange(1000)))
