"""Independent, deliberately-naive reference implementations used ONLY to
cross-check the vectorized kernels in tsdownsample_spark.kernels.

These follow the reference semantics (predict-idlab/tsdownsample, Rust
kernels under downsample_rs/src/) step by step with plain Python loops —
slow, but an independent derivation: any bug would have to be made twice,
in two very different shapes, to slip through the parity tests.
"""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-12


def _view(arr: np.ndarray) -> np.ndarray:
    if arr.dtype.kind in ("M", "m"):
        return arr.view(np.int64)
    if arr.dtype == np.bool_:
        return arr.view(np.int8)
    return arr


def naive_equal_count_bins(n: int, m: int):
    bs = (n - 1) / m
    bins = []
    start = 0
    for i in range(m):
        end = int(bs * (i + 1)) + 1
        bins.append((start, end))
        start = end
    return bins


def naive_equidistant_bins(x: np.ndarray, m: int):
    """Rust get_equidistant_bin_idx_iterator, searchsorted.rs:92-129."""
    x = _view(np.asarray(x))
    n = len(x)
    x0 = float(x[0])
    step = float(x[-1]) / m - x0 / m
    is_int = np.issubdtype(x.dtype, np.integer)
    is_f32 = x.dtype == np.float32
    bins = []
    idx = 0
    for i in range(m):
        half = (i + 1) / 2.0
        sv = x0 + step * half + step * half + EPS
        if is_int:
            sv = math.trunc(sv)
        elif is_f32:
            sv = np.float32(sv)
        start = idx
        if start >= n or x[start] >= sv:
            bins.append(None)
            continue
        # the reference's binary_search (searchsorted.rs:19-37): a lower
        # bound over [start, n-1] plus a single +1 adjustment when
        # arr[pos] <= sv.  It assumes duplicate-free x, so when duplicates
        # equal the edge exactly only the FIRST one stays in this bin
        # (plain bisect_right would take them all — NOT what the Rust does).
        lo, hi = start, n - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if x[mid] < sv:
                lo = mid + 1
            else:
                hi = mid
        idx = lo + 1 if x[lo] <= sv else lo
        bins.append((start, idx))
    return bins


def _argminmax_seg(y, s, e, nan_return):
    seg = y[s:e]
    if seg.dtype.kind == "f":
        if nan_return:
            mn = mx = None
            nan_at = None
            best_min = best_max = None
            for j, v in enumerate(seg):
                if math.isnan(v):
                    nan_at = j
                    break
            if nan_at is not None:
                return s + nan_at, s + nan_at
        else:
            # ignore NaNs; all-NaN bin -> first NaN index for both
            non_nan = [(j, v) for j, v in enumerate(seg) if not math.isnan(v)]
            if not non_nan:
                first_nan = next(j for j, v in enumerate(seg) if math.isnan(v))
                return s + first_nan, s + first_nan
            mn = min(non_nan, key=lambda t: (t[1], t[0]))[0]
            mx = max(non_nan, key=lambda t: (t[1], -t[0]))[0]
            return s + mn, s + mx
    mn = 0
    mx = 0
    for j in range(1, len(seg)):
        if seg[j] < seg[mn]:
            mn = j
        if seg[j] > seg[mx]:
            mx = j
    return s + mn, s + mx


def naive_minmax(y, n_out, x=None, nan="ignore"):
    y = _view(np.asarray(y))
    n = len(y)
    assert n_out % 2 == 0
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    nr = nan == "return"
    out = []
    if x is None:
        for s, e in naive_equal_count_bins(n, n_out // 2):
            mn, mx = _argminmax_seg(y, s, e, nr)
            out.extend(sorted((mn, mx)) if mn != mx else [mn, mx])
    else:
        for b in naive_equidistant_bins(np.asarray(x), n_out // 2):
            if b is None:
                continue
            s, e = b
            if e - s <= 2:
                out.extend(range(s, e))
            else:
                mn, mx = _argminmax_seg(y, s, e, nr)
                out.extend(sorted((mn, mx)) if mn != mx else [mn, mx])
    return np.array(out, dtype=np.int64)


def naive_m4(y, n_out, x=None, nan="ignore"):
    y = _view(np.asarray(y))
    n = len(y)
    assert n_out % 4 == 0
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    nr = nan == "return"
    out = []
    if x is None:
        for s, e in naive_equal_count_bins(n, n_out // 4):
            mn, mx = _argminmax_seg(y, s, e, nr)
            out.append(s)
            out.extend(sorted((mn, mx)) if mn != mx else [mn, mx])
            out.append(e - 1)
    else:
        for b in naive_equidistant_bins(np.asarray(x), n_out // 4):
            if b is None:
                continue
            s, e = b
            if e - s <= 4:
                out.extend(range(s, e))
            else:
                mn, mx = _argminmax_seg(y, s, e, nr)
                out.append(s)
                out.extend(sorted((mn, mx)) if mn != mx else [mn, mx])
                out.append(e - 1)
    return np.array(out, dtype=np.int64)


def _bits(v: float) -> int:
    """|v| through its IEEE bit pattern (rust lttb.rs:6-11 transmute trick)."""
    import struct

    (b,) = struct.unpack("<q", struct.pack("<d", abs(v)))
    return b & 0x7FFF_FFFF_FFFF_FFFF


def naive_lttb(y, n_out, x=None):
    y = _view(np.asarray(y)).astype(np.float64)
    n = len(y)
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    assert n_out >= 3
    xf = _view(np.asarray(x)).astype(np.float64) if x is not None else None
    every = (n - 2) / (n_out - 2)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0
    for i in range(n_out - 2):
        avg_start = int(every * (i + 1)) + 1
        avg_end = min(int(every * (i + 2)) + 1, n)
        # sequential f64 fold, exactly like rust helpers.rs:30-32
        acc = 0.0
        for v in y[avg_start:avg_end]:
            acc += float(v)
        avg_y = acc / (avg_end - avg_start)
        ro = int(every * i) + 1
        rt = avg_start
        ay = float(y[a])
        if xf is None:
            avg_x = (avg_start + avg_end - 1) / 2.0
            ax = float(a)
        else:
            avg_x = (xf[avg_end - 1] + xf[avg_start]) / 2.0
            ax = float(xf[a])
        d1 = ax - avg_x
        d2 = avg_y - ay
        best = -1
        best_j = a
        for j in range(ro, rt):
            if xf is None:
                area = d1 * float(y[j]) - (ax - ro - (j - ro)) * d2 - d1 * ay
            else:
                area = d1 * float(y[j]) + d2 * float(xf[j]) - (d1 * ay + d2 * ax)
            ab = _bits(area)
            if ab > best:
                best = ab
                best_j = j
        a = best_j
        out[i + 1] = a
    return out


def naive_minmaxlttb(y, n_out, x=None, minmax_ratio=4, nan="ignore"):
    y = _view(np.asarray(y))
    n = len(y)
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    if n // n_out > minmax_ratio:
        if x is None:
            inner = naive_minmax(y[1 : n - 1], n_out * minmax_ratio, nan=nan)
        else:
            x = _view(np.asarray(x))
            inner = naive_minmax(y[1 : n - 1], n_out * minmax_ratio, x=x[1 : n - 1], nan=nan)
        index = np.concatenate(([0], inner + 1, [n - 1])).astype(np.int64)
        if x is None:
            sel = naive_lttb(y[index], n_out, x=index.astype(np.float64))
        else:
            sel = naive_lttb(y[index], n_out, x=x[index])
        return index[sel]
    return naive_lttb(y, n_out, x=x)


def naive_everynth(y, n_out):
    # reference: np.arange(0, n - 0.1, step) (downsamplers.py:157) — arange
    # fills float ranges by MULTIPLY (start + k*step), not accumulation;
    # v += step drifts off it at FP boundaries (hypothesis-found)
    n = len(y)
    step = max(1.0, n / n_out)
    out = []
    k = 0
    while k * step < n - 0.1:
        out.append(int(k * step))
        k += 1
    return np.array(out, dtype=np.int64)
