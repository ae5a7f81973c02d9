"""float16 parity evidence (compat.py _prepare_f16):

* comparison-only selectors (minmax, m4) on NaN-free f16 now take the
  reference's ordinal-i16 reinterpretation VERBATIM (README.md:37-43;
  argminmax PR #1 'symmetrical ordinal mapping from f16 to i16') — full
  bit parity, including the +-0 tie where the ordinal view ranks -0.0
  strictly below +0.0 (closed per r4 ADVICE);
* everything else (value-dependent LTTB area ranking; NaN-bearing data,
  since i16 cannot carry NaN through the kernels' isnan paths) upcasts to
  f32, which these tests prove order-isomorphic to the ordinal mapping
  over the FULL 65536-pattern grid with exactly that one +-0 exception;
* end-to-end, the f32-cast kernel selects the same indices as an
  independent direct-f64 derivation on crafted f16 data (subnormals,
  zeros, NaN payloads) across the selector family and the compat classes.
"""

import numpy as np
import pytest

from tsdownsample_spark.compat import (
    M4Downsampler,
    MinMaxDownsampler,
    MinMaxLTTBDownsampler,
    NaNM4Downsampler,
    NaNMinMaxDownsampler,
)
from tsdownsample_spark.kernels.selectors import downsample_array


def _ordinal_i16(bits: np.ndarray) -> np.ndarray:
    """The argminmax trick: reinterpret f16 bits as i16, then flip the
    magnitude bits of negatives so the integer order matches float order."""
    v = bits.astype(np.uint16).view(np.int16)
    return np.where(v < 0, np.int16(-0x8000) - 1 - v, v).astype(np.int16)


def test_f32_cast_is_order_isomorphic_to_ordinal_i16_full_grid():
    bits = np.arange(65536, dtype=np.uint16)
    f16 = bits.view(np.float16)
    finite = np.isfinite(f16)
    # include the infinities too — they are comparable; exclude only NaN
    comparable = ~np.isnan(f16)
    vals = f16[comparable].astype(np.float32)
    ords = _ordinal_i16(bits[comparable])
    order = np.argsort(ords, kind="stable")
    sv = vals[order]
    # ordinal order never contradicts float order
    assert np.all(np.diff(sv) >= 0)
    # and refines it everywhere except the single +-0 pair: every float
    # value maps to a unique ordinal except 0.0 which has two (+0/-0)
    eq = np.diff(sv) == 0
    assert eq.sum() == 1
    assert sv[np.where(eq)[0][0]] == 0.0
    # sanity: the grid really was the full one
    assert finite.sum() + np.isnan(f16).sum() + 2 == 65536


def _crafted_f16(rng, n, with_nan):
    pool = np.concatenate(
        [
            rng.standard_normal(n // 2).astype(np.float16),
            # subnormals, zeros, extremes
            np.array([6e-8, -6e-8, 0.0, -0.0, 65504.0, -65504.0], dtype=np.float16),
            rng.uniform(-1e-4, 1e-4, n // 4).astype(np.float16),
        ]
    )
    y = rng.choice(pool, size=n).astype(np.float16)
    if with_nan:
        y[rng.integers(0, n, size=n // 37)] = np.float16("nan")
    return y


@pytest.mark.parametrize(
    "algo,n_out,with_nan",
    [
        ("minmax", 100, False),
        ("m4", 100, False),
        ("lttb", 101, False),
        ("minmaxlttb", 100, False),
        ("everynth", 100, False),
        ("nanminmax", 100, True),
        ("nanm4", 100, True),
        ("nanminmaxlttb", 100, True),
    ],
)
def test_f16_upcast_selects_identical_indices(algo, n_out, with_nan):
    """f16 -> f32 -> kernel == f16 -> f64 -> kernel: both casts are exact
    (every f16 is representable in f32 and f64), so index selection is
    identical; this pins that no kernel step narrows back down."""
    rng = np.random.default_rng(19)
    for n in (757, 5_000):
        y = _crafted_f16(rng, n, with_nan)
        a = downsample_array(y.astype(np.float32), n_out, algo=algo)
        b = downsample_array(y.astype(np.float64), n_out, algo=algo)
        np.testing.assert_array_equal(a, b)


def test_f16_through_compat_classes_matches_f64():
    rng = np.random.default_rng(23)
    y = _crafted_f16(rng, 4_000, with_nan=False)
    yn = _crafted_f16(rng, 4_000, with_nan=True)
    for cls, data, n_out in [
        (MinMaxLTTBDownsampler, y, 100),
        (NaNMinMaxDownsampler, yn, 100),
        (NaNM4Downsampler, yn, 100),
    ]:
        got = cls().downsample(data, n_out=n_out)
        exp = cls().downsample(data.astype(np.float64), n_out=n_out)
        np.testing.assert_array_equal(got, exp)


def test_f16_minmax_m4_take_reference_ordinal_path():
    """NaN-free f16 through the comparison-only classes equals running the
    kernel on the reference's ordinal-i16 view bit for bit (compat.py
    _prepare_f16) — i.e. FULL reference parity, +-0 ties included; and the
    selected VALUES still agree with the f64 path everywhere."""
    rng = np.random.default_rng(23)
    y = _crafted_f16(rng, 4_000, with_nan=False)
    ords = _ordinal_i16(y.view(np.uint16))
    for cls, algo in [
        (MinMaxDownsampler, "minmax"),
        (M4Downsampler, "m4"),
        # NaN variants on NaN-free data are comparison-only too and take
        # the same ordinal path (compat.py _ORDER_ONLY_ALGOS)
        (NaNMinMaxDownsampler, "nanminmax"),
        (NaNM4Downsampler, "nanm4"),
    ]:
        got = cls().downsample(y, n_out=100)
        ref = downsample_array(ords, 100, algo=algo)
        np.testing.assert_array_equal(got.astype(np.int64), ref)
        exp = cls().downsample(y.astype(np.float64), n_out=100)
        # index sets may differ only where +-0 tie; values always agree
        np.testing.assert_array_equal(
            y[got.astype(np.int64)].astype(np.float64),
            y[exp.astype(np.int64)].astype(np.float64),
        )


def test_f16_pm0_tie_selects_reference_index():
    """The one documented r4 parity gap, now closed: when +0.0 (earlier)
    and -0.0 (later) tie for a bin's minimum, the reference's ordinal view
    ranks -0.0 strictly lower and picks ITS index; the old plain-f32 upcast
    tied them and picked the first zero."""
    y = np.ones(40, dtype=np.float16)
    y[5] = np.float16(0.0)
    y[20] = np.float16(-0.0)
    got = MinMaxDownsampler().downsample(y, n_out=2).astype(np.int64)
    assert 20 in got and 5 not in got
    got4 = M4Downsampler().downsample(y, n_out=4).astype(np.int64)
    assert 20 in got4 and 5 not in got4
    gotn2 = NaNMinMaxDownsampler().downsample(y, n_out=2).astype(np.int64)
    assert 20 in gotn2 and 5 not in gotn2
    # NaN present -> i16 cannot carry it; falls back to the documented
    # f32 upcast (first-occurring zero wins the tie again)
    yn = y.copy()
    yn[30] = np.float16("nan")
    gotn = MinMaxDownsampler().downsample(yn, n_out=2).astype(np.int64)
    assert 5 in gotn and 20 not in gotn
