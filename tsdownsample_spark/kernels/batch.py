"""Arrow-batch kernels: downsample MANY series in one vectorized pass.

A pandas UDF receives a whole Arrow batch of series (one array per row).
Calling the per-series kernel row by row would pay Python dispatch per
series; instead, for the binned selectors (MinMax / M4 and NaN variants,
"no x" mode) we concatenate the batch into one buffer, lay every series'
bins out globally (they tile the concatenated buffer exactly), and run a
single grouped argmin/argmax over it — cost is O(total points) with a few
NumPy passes, independent of how many series the batch holds.  This is the
Spark-shaped analogue of the reference's Rayon fan-out
(downsample_rs/src/lib.rs:22-35): their threads split one series, our tasks
and batches split many.

LTTB-family selectors are sequential per series by construction
(lttb.rs:57-85) and fall back to the per-series kernel; MinMaxLTTB's
dominant phase-1 prefetch is still batched here.
"""

from __future__ import annotations

import numpy as np

from tsdownsample_spark.kernels.selectors import (
    _grouped_argminmax,
    _as_float_view,
    downsample_array,
    everynth,
    lttb,
)

__all__ = ["batch_downsample"]


def _batch_binned(arrays, n_out: int, k: int, nan_return: bool):
    """Batched equal-count binned argmin/argmax (MinMax k=2, M4 k=4)."""
    m = n_out // k
    out: list = [None] * len(arrays)
    big: list[int] = []
    for i, a in enumerate(arrays):
        if a is None:
            continue
        if n_out >= len(a):
            out[i] = np.arange(len(a), dtype=np.int64)
        else:
            big.append(i)
    if not big:
        return out

    ns = np.array([len(arrays[i]) for i in big], dtype=np.int64)

    # Per-series equal-count bin edges, all at once: ends[s, j] =
    # floor(block_size_s * (j+1)) + 1  (minmax.rs:110-119).  The last bin's
    # end can fall one short of n_s when the float product rounds down —
    # exactly like the reference — so each series only contributes its
    # *covered* prefix [0, ends[s, -1]) to the concatenated buffer, keeping
    # the global bin tiling exact for reduceat.
    bs = (ns - 1).astype(np.float64) / m
    ends_rel = (bs[:, None] * np.arange(1, m + 1, dtype=np.float64)[None, :]).astype(np.int64) + 1
    cov = ends_rel[:, -1]
    offs = np.zeros(len(big), dtype=np.int64)
    np.cumsum(cov[:-1], out=offs[1:])
    y_all = np.concatenate(
        [_as_float_view(np.asarray(arrays[i]))[: cov[s]] for s, i in enumerate(big)]
    )
    ends = ends_rel + offs[:, None]
    starts = np.empty_like(ends)
    starts[:, 0] = offs
    starts[:, 1:] = ends[:, :-1]

    _, _, argmins, argmaxs = _grouped_argminmax(
        y_all, starts.ravel(), ends.ravel(), nan_return
    )
    argmins = argmins.reshape(len(big), m)
    argmaxs = argmaxs.reshape(len(big), m)
    lo = np.minimum(argmins, argmaxs)
    hi = np.maximum(argmins, argmaxs)

    if k == 2:
        emitted = np.empty((len(big), m * k), dtype=np.int64)
        emitted[:, 0::2] = lo
        emitted[:, 1::2] = hi
    else:
        emitted = np.empty((len(big), m * k), dtype=np.int64)
        emitted[:, 0::4] = starts
        emitted[:, 1::4] = lo
        emitted[:, 2::4] = hi
        emitted[:, 3::4] = ends - 1
    emitted -= offs[:, None]
    for row, i in enumerate(big):
        out[i] = emitted[row]
    return out


def _batch_minmaxlttb(arrays, n_out: int, ratio: int, nan_return: bool):
    """MinMaxLTTB with the phase-1 prefetch batched across the whole batch.

    Mirrors minmaxlttb.rs:173-207: prefetch over the interior [1, n-1),
    shift +1, add endpoints, LTTB over the candidates with their original
    indices as x, map back.
    """
    nan = "return" if nan_return else "ignore"
    out: list = [None] * len(arrays)
    active: list[int] = []
    for i, a in enumerate(arrays):
        if a is None:
            continue
        n = len(a)
        if n_out >= n:
            out[i] = np.arange(n, dtype=np.int64)
        elif n // n_out > ratio:
            active.append(i)
        else:
            out[i] = lttb(np.asarray(a), n_out)
    if not active:
        return out
    interiors = [np.asarray(arrays[i])[1:-1] for i in active]
    prefetch = _batch_binned(interiors, n_out * ratio, 2, nan_return)
    for row, i in enumerate(active):
        a = np.asarray(arrays[i])
        n = len(a)
        inner = prefetch[row]
        index = np.empty(len(inner) + 2, dtype=np.int64)
        index[0] = 0
        index[1:-1] = inner + 1
        index[-1] = n - 1
        sel = lttb(a[index], n_out, x=index.astype(np.float64))
        out[i] = index[sel]
    return out


def batch_downsample(arrays, n_out: int, algo: str = "minmax", **kw):
    """Downsample a batch of series ("no x" mode). ``arrays`` is a sequence of
    1-D arrays (or None for SQL NULL); returns a list of int64 index arrays
    aligned with the input (None stays None)."""
    if algo == "minmax":
        return _batch_binned(arrays, n_out, 2, nan_return=False)
    if algo == "nanminmax":
        return _batch_binned(arrays, n_out, 2, nan_return=True)
    if algo == "m4":
        return _batch_binned(arrays, n_out, 4, nan_return=False)
    if algo == "nanm4":
        return _batch_binned(arrays, n_out, 4, nan_return=True)
    if algo == "minmaxlttb":
        return _batch_minmaxlttb(arrays, n_out, int(kw.get("minmax_ratio", 4)), False)
    if algo == "nanminmaxlttb":
        return _batch_minmaxlttb(arrays, n_out, int(kw.get("minmax_ratio", 4)), True)
    if algo == "everynth":
        return [None if a is None else everynth(np.asarray(a), n_out) for a in arrays]
    # generic per-series fallback (lttb)
    return [
        None if a is None else downsample_array(np.asarray(a), n_out, algo=algo, **kw)
        for a in arrays
    ]
