"""Bucketing rules of the reference, reproduced bit-exactly in NumPy.

Two binning regimes exist in the reference:

* **equal-count** (no x axis): ``block_size = (n-1)/m`` with bin ``i`` ending
  at ``floor(block_size*(i+1)) + 1`` — multiplication, not accumulation, to
  control FP drift (reference: downsample_rs/src/minmax.rs:110-119,
  m4.rs:114-123).
* **equidistant x-value** (with x axis): ``m`` equal-width bins over
  ``[x[0], x[-1]]``; bin edges are searched with bisect-right semantics and an
  ``EPSILON = 1e-12`` safety margin; an *empty bin emits nothing* — this is
  the gap behavior (reference: downsample_rs/src/searchsorted.rs:8,80-129).

Both return ``(starts, ends)`` int64 arrays; bin ``i`` is ``[starts[i],
ends[i])`` and is empty iff ``ends[i] <= starts[i]``.  Non-empty bins always
tile a contiguous prefix-free range (``starts[i] == ends[i-1]``), which the
vectorized selectors rely on for ``ufunc.reduceat``.
"""

from __future__ import annotations

import numpy as np

_EPSILON = 1e-12


def equal_count_bins(n: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Equal-count bins for the "no x" mode.

    Reference rule (downsample_rs/src/minmax.rs:110-119): bin ``i`` spans
    ``[prev_end, floor(block_size*(i+1)) + 1)`` with ``block_size =
    (n-1)/m`` computed in float64 and the product truncated toward zero.
    """
    if m <= 0:
        raise ValueError("number of bins must be positive")
    block_size = (n - 1) / m
    ends = (block_size * np.arange(1, m + 1, dtype=np.float64)).astype(np.int64) + 1
    starts = np.empty(m, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1]
    return starts, ends


def equidistant_bins(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Equidistant *x-value* bins for the "with x" mode.

    Reference rule (downsample_rs/src/searchsorted.rs:92-129): the step is
    computed overflow-safely as ``x[-1]/m - x[0]/m``; the i-th search value is
    ``x0 + step*(i+1)/2 + step*(i+1)/2 + EPSILON`` (halved add to survive
    extreme ranges) and is *cast to the x dtype* before comparison (float64 ->
    integer truncates toward zero, matching Rust ``T::from_f64``).  Bin ends
    are the bisect-right insertion points; starts chain from the previous end.

    ``x`` must be sorted ascending (non-strict monotone, no NaN).  datetime64
    / timedelta64 should be viewed as int64 by the caller.
    """
    if m < 1:
        raise ValueError("number of bins must be >= 1")
    n = len(x)
    x0 = float(x[0])
    step = float(x[-1]) / m - x0 / m
    half = np.arange(1, m + 1, dtype=np.float64) / 2.0
    edges = x0 + step * half + step * half + _EPSILON
    if np.issubdtype(x.dtype, np.integer):
        # Rust casts the f64 search value into the integer x dtype
        # (T::from_f64 truncates toward zero) and compares in T — cast so
        # >2^53 values and exact-equality cases compare like the reference.
        edges = np.trunc(edges).astype(x.dtype)
    elif x.dtype == np.float32:
        edges = edges.astype(np.float32)

    # Reference rule (searchsorted.rs:112-127), replicated exactly:
    #   start = previous end; the bin is EMPTY (emits nothing, end stays) if
    #   x[start] >= search_value — so a point exactly on a truncated edge is
    #   pushed to the NEXT bin, and a trailing point can be dropped entirely;
    #   otherwise end = bisect_right clamped to [start, n-1]: the insertion
    #   point after the FIRST element equal to the edge (the reference
    #   assumes duplicate-free x), or n when everything remaining is < edge.
    lb = np.searchsorted(x, edges, side="left").astype(np.int64)
    lbc = np.minimum(lb, n - 1)
    cand = np.where(lb < n, np.where(x[lbc] == edges, lb + 1, lb), n)
    starts = np.empty(m, dtype=np.int64)
    ends = np.empty(m, dtype=np.int64)
    prev = 0
    for i in range(m):  # O(m) — m = n_out/k, tiny next to the data passes
        starts[i] = prev
        if prev >= n or prev >= lb[i]:
            ends[i] = prev  # empty bin
        else:
            prev = int(cand[i])
            ends[i] = prev
    return starts, ends
