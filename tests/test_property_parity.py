"""Property-based parity: for ANY y (ties, NaNs, constants, tiny/huge n) and
ANY gappy x, the vectorized kernels must equal the loop-based naive oracle
(which is an independent transcription of the reference Rust).

Hypothesis shrinks failures to minimal counterexamples, which is exactly
what bit-parity debugging needs.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import naive_oracle as O  # noqa: E402
from tsdownsample_spark.kernels import selectors as K  # noqa: E402

_ys = st.lists(
    st.one_of(
        st.integers(min_value=-100, max_value=100).map(float),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.just(float("nan")),
    ),
    min_size=1,
    max_size=400,
)

_n_out_even = st.integers(min_value=1, max_value=60).map(lambda k: 2 * k)
_n_out_quad = st.integers(min_value=1, max_value=30).map(lambda k: 4 * k)


@settings(max_examples=150, deadline=None)
@given(_ys, _n_out_even)
def test_minmax_property(ys, n_out):
    y = np.asarray(ys, dtype=np.float64)
    np.testing.assert_array_equal(
        K.minmax(y, n_out), O.naive_minmax(y, n_out)
    )
    np.testing.assert_array_equal(
        K.minmax(y, n_out, nan="return"), O.naive_minmax(y, n_out, nan="return")
    )


@settings(max_examples=150, deadline=None)
@given(_ys, _n_out_quad)
def test_m4_property(ys, n_out):
    y = np.asarray(ys, dtype=np.float64)
    np.testing.assert_array_equal(K.m4(y, n_out), O.naive_m4(y, n_out))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=3, max_size=300),
    st.integers(min_value=3, max_value=50),
)
def test_lttb_property(ys, n_out):
    y = np.asarray(ys, dtype=np.float64)
    np.testing.assert_array_equal(K.lttb(y, n_out), O.naive_lttb(y, n_out))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=300),
    st.integers(min_value=1, max_value=40).map(lambda k: 2 * k),
)
def test_minmax_with_int_x_property(xs, n_out):
    """Gappy, duplicate-laden integer x — the edge-rule minefield (trunc'd
    edges, edge-equal points, trailing drops)."""
    x = np.sort(np.asarray(xs, dtype=np.int64))
    y = np.arange(len(x), dtype=np.float64) * 0.5
    np.testing.assert_array_equal(
        K.minmax(y, n_out, x=x), O.naive_minmax(y, n_out, x=x)
    )


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=300),
)
def test_everynth_property(n, n_out):
    y = np.arange(n, dtype=np.float64)
    got = K.everynth(y, n_out)
    exp = O.naive_everynth(y, n_out)
    np.testing.assert_array_equal(got, exp)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=3, max_size=600),
    st.integers(min_value=3, max_value=40),
    st.integers(min_value=2, max_value=6),
)
def test_minmaxlttb_property(ys, n_out, ratio):
    from hypothesis import assume

    # odd n_out*ratio panics in the reference too (the prefetch hits
    # minmax.rs's assert_eq!(n_out % 2, 0)); only even products are defined
    assume((n_out * ratio) % 2 == 0)
    y = np.asarray(ys, dtype=np.float64)
    np.testing.assert_array_equal(
        K.minmaxlttb(y, n_out, minmax_ratio=ratio),
        O.naive_minmaxlttb(y, n_out, minmax_ratio=ratio),
    )
