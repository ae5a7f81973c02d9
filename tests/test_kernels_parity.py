"""Randomized parity grid: vectorized kernels vs the independent naive oracle.

Mirrors the reference's Python<->Rust compliance suite
(tests/test_algos_python_compliance.py:20-69): n in {10_000, 10_032, 20_321,
23_489} x n_out in {100, 200, 252}, with and without x, plus NaN sweeps.
Trimmed sizes keep the naive (pure-Python-loop) oracle affordable; the full
grid runs through the Spark layer in test_spark_downsample.py against these
same kernels.
"""

import numpy as np
import pytest

import naive_oracle as O
from tsdownsample_spark.kernels import selectors as K

NS = [1_000, 10_032, 2_321]
N_OUTS = [100, 200, 252]


def _data(n, seed, dtype=np.float64):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 1e3).astype(dtype)


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("n_out", N_OUTS)
def test_minmax_parity(n, n_out):
    y = _data(n, n)
    np.testing.assert_array_equal(K.minmax(y, n_out), O.naive_minmax(y, n_out))


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("n_out", N_OUTS)
def test_m4_parity(n, n_out):
    y = _data(n, n + 1)
    np.testing.assert_array_equal(K.m4(y, n_out), O.naive_m4(y, n_out))


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("n_out", N_OUTS)
def test_lttb_parity(n, n_out):
    y = _data(n, n + 2)
    np.testing.assert_array_equal(K.lttb(y, n_out), O.naive_lttb(y, n_out))


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("n_out", [100, 200])
def test_minmaxlttb_parity(n, n_out):
    y = _data(n, n + 3)
    np.testing.assert_array_equal(
        K.minmaxlttb(y, n_out, minmax_ratio=4), O.naive_minmaxlttb(y, n_out, minmax_ratio=4)
    )


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("n_out", N_OUTS)
def test_with_x_parity_nonuniform(n, n_out):
    """Non-equidistant x (sorted random walk) exercises the searchsorted rule."""
    rng = np.random.default_rng(n * 7 + n_out)
    x = np.cumsum(rng.integers(1, 10, size=n)).astype(np.int64)
    y = _data(n, n + 4)
    np.testing.assert_array_equal(K.minmax(y, n_out, x=x), O.naive_minmax(y, n_out, x=x))
    np.testing.assert_array_equal(K.m4(y, n_out, x=x), O.naive_m4(y, n_out, x=x))
    np.testing.assert_array_equal(K.lttb(y, n_out, x=x), O.naive_lttb(y, n_out, x=x))
    np.testing.assert_array_equal(
        K.minmaxlttb(y, n_out, x=x), O.naive_minmaxlttb(y, n_out, x=x)
    )


@pytest.mark.parametrize("n", [1_000, 10_032])
@pytest.mark.parametrize("n_nans", [10, 100, 500])
def test_nan_parity(n, n_nans):
    rng = np.random.default_rng(n + n_nans)
    y = _data(n, n + 5)
    y[rng.choice(n, size=n_nans, replace=False)] = np.nan
    for n_out in (100, 200):
        np.testing.assert_array_equal(
            K.minmax(y, n_out, nan="return"), O.naive_minmax(y, n_out, nan="return")
        )
        np.testing.assert_array_equal(
            K.minmax(y, n_out, nan="ignore"), O.naive_minmax(y, n_out, nan="ignore")
        )
        np.testing.assert_array_equal(
            K.m4(y, n_out, nan="return"), O.naive_m4(y, n_out, nan="return")
        )
        np.testing.assert_array_equal(
            K.m4(y, n_out, nan="ignore"), O.naive_m4(y, n_out, nan="ignore")
        )


@pytest.mark.parametrize("n", [1_000, 2_321])
def test_gap_parity(n):
    """Large x-gap (FIXTURES.md F2 pattern) — empty bins emit nothing."""
    rng = np.random.default_rng(n)
    y = rng.standard_normal(n).astype(np.float32)
    x = np.arange(n)
    x[: n // 2] += n // 2
    x.sort()
    for n_out in (100, 200):
        np.testing.assert_array_equal(K.minmax(y, n_out, x=x), O.naive_minmax(y, n_out, x=x))
        np.testing.assert_array_equal(K.m4(y, n_out, x=x), O.naive_m4(y, n_out, x=x))


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.int64, np.uint32])
def test_dtype_parity(dtype):
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.integer):
        y = rng.integers(0, 10_000, size=5_000).astype(dtype)
    else:
        y = (rng.standard_normal(5_000) * 100).astype(dtype)
    np.testing.assert_array_equal(K.minmax(y, 100), O.naive_minmax(y, 100))
    np.testing.assert_array_equal(K.m4(y, 100), O.naive_m4(y, 100))
    np.testing.assert_array_equal(K.lttb(y, 100), O.naive_lttb(y, 100))


@pytest.mark.parametrize("n", [500, 1_000, 9_999])
@pytest.mark.parametrize("n_out", [97, 100, 256])
def test_everynth_parity(n, n_out):
    y = np.arange(n)
    np.testing.assert_array_equal(K.everynth(y, n_out), O.naive_everynth(y, n_out))


def test_minmaxlttb_below_ratio_falls_back_to_lttb():
    # minmaxlttb.rs:136/182: activation guard n//n_out > ratio
    y = _data(1_000, 9)
    np.testing.assert_array_equal(
        K.minmaxlttb(y, 300, minmax_ratio=4), K.lttb(y, 300)
    )


def test_constant_series_duplicate_indices():
    """Constant bins: argmin == argmax -> the same index twice (the reference
    keeps duplicates, m4.rs:92-96)."""
    y = np.zeros(1_000)
    idx = K.minmax(y, 10)
    assert len(idx) == 10
    np.testing.assert_array_equal(K.minmax(y, 10), O.naive_minmax(y, 10))
    np.testing.assert_array_equal(K.m4(y, 12), O.naive_m4(y, 12))


def test_flat_lttb_adaptive_route_identical():
    """The few-huge-series route (per-series kernel) and the lockstep route
    select IDENTICAL indices — the threshold is purely physical."""
    from tsdownsample_spark.kernels import flat as FL

    rng = np.random.default_rng(31)
    # shape on the per-series side of the threshold (bucket ~ 3000 pts)
    ys = [rng.standard_normal(300_000) for _ in range(3)]
    values = np.concatenate(ys)
    offsets = np.int64([0, 300_000, 600_000, 900_000])
    a_flat, a_off = FL._flat_lttb(values, offsets, 100)
    # force the lockstep route for the same input
    old = FL._LTTB_PER_SERIES_BUCKET
    FL._LTTB_PER_SERIES_BUCKET = 10**12
    try:
        b_flat, b_off = FL._flat_lttb(values, offsets, 100)
    finally:
        FL._LTTB_PER_SERIES_BUCKET = old
    np.testing.assert_array_equal(a_off, b_off)
    np.testing.assert_array_equal(a_flat, b_flat)
    # mixed identity + big series keeps order on the per-series route
    values2 = np.concatenate([ys[0], np.arange(5.0)])
    offsets2 = np.int64([0, 300_000, 300_005])
    f2, o2 = FL._flat_lttb(values2, offsets2, 100)
    assert o2.tolist() == [0, 100, 105]
    np.testing.assert_array_equal(f2[100:], np.arange(5))
