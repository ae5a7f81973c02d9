"""Drop-in class API mirroring the reference's public surface.

A user of ``tsdownsample`` calls e.g. ``MinMaxDownsampler().downsample([x,]
y, n_out=..., parallel=...)`` and gets selected indices back
(tsdownsample/downsampling_interface.py:104-135, downsamplers.py).  This
module reproduces that call surface 1:1 on our kernels so existing code can
switch imports; the same selector names drive the Spark operators via
``downsample_tokens(df, algo=...)`` for distributed use.

Validation parity (cited against the reference):
* 1 or 2 positional args, 1-D, equal length (downsampling_interface.py:56-84)
* x dtype allowlist excludes <=8-bit ints (:143-156); y additionally allows
  f16/int8/uint8/bool (:157)
* ``n_out`` must be int > 0; MinMax multiple of 2, M4 multiple of 4
  (downsamplers.py:27-31,64-68)
* ``parallel=True`` is accepted everywhere; LTTB warns that no parallel
  implementation exists and falls back (:349-356) — in Spark, parallelism
  lives in task scheduling, so the flag is a no-op hint here
* downsamplers are copy/deepcopy/pickle-safe (tests/test_tsdownsample.py:70-97)
"""

from __future__ import annotations

import warnings

import numpy as np

from tsdownsample_spark.kernels.selectors import downsample_array, everynth

_X_DTYPES = "fiuMm"  # float, int, uint, datetime64, timedelta64
_Y_EXTRA = {np.dtype(np.float16), np.dtype(np.int8), np.dtype(np.uint8), np.dtype(bool)}


def _check_arrays(args, check_contiguous: bool = True):
    """Reference-exact arg validation incl. error MESSAGES — the reference's
    own test suite asserts on the text (_check_valid_downsample_args,
    downsampling_interface.py:56-84; contiguity :28-38, which the Rust layer
    requires because it takes as_slice())."""
    if len(args) == 2:
        x, y = np.asarray(args[0]), np.asarray(args[1])
    elif len(args) == 1:
        x, y = None, np.asarray(args[0])
    else:
        raise ValueError(
            "downsample() takes 1 or 2 positional arguments but "
            f"{len(args)} were given"
        )
    if y.ndim != 1:
        raise ValueError("y must be 1D array")
    if x is not None:
        if x.ndim != 1:
            raise ValueError("x must be 1D array")
        if len(x) != len(y):
            raise ValueError("x and y must have the same length")
    if check_contiguous:
        if not y.flags["C_CONTIGUOUS"]:
            raise ValueError("y array must be contiguous.")
        if x is not None and not x.flags["C_CONTIGUOUS"]:
            raise ValueError("x array must be contiguous.")
    return x, y


def _check_x_dtype(x: np.ndarray) -> None:
    # reference x allowlist (_rust_dtypes, downsampling_interface.py:143-156):
    # no <=8-bit ints and no float16 (f16 is y-only there)
    if (
        x.dtype.kind not in _X_DTYPES
        or (x.dtype.kind in "iu" and x.dtype.itemsize == 1)
        or (x.dtype.kind == "f" and x.dtype.itemsize == 2)
    ):
        raise ValueError(f"unsupported x dtype {x.dtype} (reference allowlist)")


def _check_y_dtype(y: np.ndarray) -> None:
    if y.dtype.kind in _X_DTYPES or y.dtype in _Y_EXTRA:
        return
    raise ValueError(f"unsupported y dtype {y.dtype}")


# Selectors whose result depends ONLY on the comparison order of y (never
# on its arithmetic values) — for these the reference's ordinal-i16 view of
# f16 can substitute for the values verbatim.  The NaN variants qualify
# too: _prepare_f16 only routes them here when the data is NaN-FREE, and
# on NaN-free data their selection is pure comparison order as well.
_ORDER_ONLY_ALGOS = {"minmax", "m4", "nanminmax", "nanm4"}


def _f16_ordinal_i16(y: np.ndarray) -> np.ndarray:
    """The reference's f16 handling (README.md:37-43; argminmax's
    'symmetrical ordinal mapping from f16 to i16'): reinterpret the bits as
    i16 and flip the magnitude bits of negatives so integer order matches
    float order — with -0.0 ranked STRICTLY below +0.0."""
    v = y.view(np.int16)
    return np.where(v < 0, np.int16(-0x8000) - 1 - v, v).astype(np.int16)


def _prepare_f16(y: np.ndarray, algo: str) -> np.ndarray:
    """f16 input handling, bit-parity first (ADVICE r4 / README.md:37-43).

    Comparison-only selectors (minmax, m4) on NaN-free data take the
    reference's ordinal-i16 view exactly, so even the +-0 tie selects the
    reference's index (-0.0 strictly below +0.0).  Everything else — value-
    dependent selectors (LTTB's areas) and NaN-bearing data (i16 cannot
    carry NaN through the kernels' isnan paths) — upcasts to f32, which
    tests/test_f16_parity.py proves order-isomorphic to the ordinal view
    over the full 65536-pattern grid except that one +-0 tie."""
    if algo in _ORDER_ONLY_ALGOS and not np.isnan(y).any():
        return _f16_ordinal_i16(y)
    return y.astype(np.float32)


class AbstractDownsampler:
    _algo: str = ""
    _has_parallel = True

    def _check_n_out(self, n_out: int) -> None:
        if not isinstance(n_out, (int, np.integer)):
            raise TypeError("n_out must be an int")
        if n_out <= 0:
            # reference message (downsampling_interface.py:86-89)
            raise ValueError("n_out must be greater than 0")

    def downsample(self, *args, n_out: int, parallel: bool = False, **kwargs):
        self._check_n_out(n_out)
        x, y = _check_arrays(args)
        _check_y_dtype(y)
        if x is not None:
            _check_x_dtype(x)
        if parallel and not self._has_parallel:
            warnings.warn(
                f"No parallel implementation of {type(self).__name__} exists; "
                "falling back to the sequential implementation"
            )
        y16 = _prepare_f16(y, self._algo) if y.dtype == np.float16 else y
        idx = downsample_array(y16, int(n_out), algo=self._algo, x=x, **kwargs)
        return idx.astype(np.uint64)


class MinMaxDownsampler(AbstractDownsampler):
    _algo = "minmax"

    def _check_n_out(self, n_out):
        super()._check_n_out(n_out)
        if n_out % 2 != 0:
            raise ValueError("n_out must be even")  # downsamplers.py:31


class NaNMinMaxDownsampler(MinMaxDownsampler):
    _algo = "nanminmax"


class M4Downsampler(AbstractDownsampler):
    _algo = "m4"

    def _check_n_out(self, n_out):
        super()._check_n_out(n_out)
        if n_out % 4 != 0:
            raise ValueError("n_out must be a multiple of 4")


class NaNM4Downsampler(M4Downsampler):
    _algo = "nanm4"


class LTTBDownsampler(AbstractDownsampler):
    _algo = "lttb"
    _has_parallel = False


class MinMaxLTTBDownsampler(AbstractDownsampler):
    _algo = "minmaxlttb"

    def downsample(self, *args, n_out: int, minmax_ratio: int = 4, parallel=False):
        assert minmax_ratio > 0, "minmax_ratio must be greater than 0"
        return super().downsample(
            *args, n_out=n_out, parallel=parallel, minmax_ratio=minmax_ratio
        )


class NaNMinMaxLTTBDownsampler(MinMaxLTTBDownsampler):
    _algo = "nanminmaxlttb"


class EveryNthDownsampler(AbstractDownsampler):
    _algo = "everynth"

    def downsample(self, *args, n_out: int, parallel: bool = False, **kwargs):
        self._check_n_out(n_out)
        # pure-Python selector: the reference does NOT require contiguity
        # here (check_contiguous=False, downsamplers.py:141-147)
        x, y = _check_arrays(args, check_contiguous=False)
        if x is not None:
            warnings.warn(
                "x is passed to downsample method of EveryNthDownsampler, but is "
                "not taken into account by the current implementation"
            )
        return everynth(np.asarray(y), int(n_out)).astype(np.uint64)
