"""float16 parity evidence: the engine upcasts f16 y to f32 before the
kernel (compat.py) instead of the reference's ordinal-i16 reinterpretation
(README.md:37-43; argminmax PR #1 'symmetrical ordinal mapping from f16 to
i16').  These tests prove the upcast is selection-equivalent over the FULL
reference grid (every f16 bit pattern):

* the f32 cast is order-isomorphic to the ordinal i16 mapping across all
  finite f16 values — comparison-based selection (argmin/argmax, M4
  extremes, LTTB area ranking after the exact f64 widen) cannot differ —
  with exactly ONE documented exception: the ordinal view ranks -0.0
  strictly below +0.0 while IEEE comparison ties them, so when both zeros
  tie for a bin's minimum the reference's f16 path picks the -0.0 and the
  upcast path picks the first-occurring zero;
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
        (MinMaxDownsampler, y, 100),
        (M4Downsampler, y, 100),
        (MinMaxLTTBDownsampler, y, 100),
        (NaNMinMaxDownsampler, yn, 100),
        (NaNM4Downsampler, yn, 100),
    ]:
        got = cls().downsample(data, n_out=n_out)
        exp = cls().downsample(data.astype(np.float64), n_out=n_out)
        np.testing.assert_array_equal(got, exp)
