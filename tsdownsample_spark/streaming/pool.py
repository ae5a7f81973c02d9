"""Shared stateful scaffold for trailing-time-window streaming twins
(stream_rolling.py, stream_distinct.py): per-key state is the recent
(ts, value) observations, each micro-batch pools them with its own rows,
and every arriving row's frame ``[t - span, t]`` becomes a ``[lo, hi)``
slice of the pooled, time-sorted arrays.

Retention horizon is **2 x span**, which is what makes the late-data
guarantee true (and not merely approximate): a row scored while within
``span`` of the CURRENT frontier has its frame start at
``>= frontier - 2*span``, and the pool never evicts above that line —
so every such row (in-order or late) sees its COMPLETE frame over all
observations that have arrived.  Only rows older than
``frontier - span`` can be under-filled (their frame reaches below the
horizon); bound that disorder with the source watermark.  The frontier
itself never regresses: an entirely-late micro-batch can only add
observations, never evict live ones.

State cost: O(points per 2 x duration) per series — a sampling-density
property, not a data-size one, so any series cardinality streams through
the state store.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["POOL_STATE_SCHEMA", "pooled_frames", "prep_stream"]

POOL_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_val", ArrayType(DoubleType())),
    ]
)


def pooled_frames(state, pdfs: Iterator[pd.DataFrame], y_col: str, span: int):
    """Load carried state, pool it with this batch, compute every row's
    ``[lo, hi)`` frame slice, and persist the trimmed pool.

    Returns ``(pdf, ts, vals, isnull, pool_ts, pool_vals, lo, hi)`` where
    ``pdf`` is the batch sorted by ``ts_us``; ``vals`` has NULL lanes
    masked to 0.0 (``isnull`` marks them); ``pool_ts``/``pool_vals`` are
    the time-sorted non-null observation pool (carry + batch); and
    ``lo``/``hi`` index the peer-inclusive ``[t - span, t]`` frame of each
    batch row within the pool (both non-decreasing).
    """
    import numpy as np

    if state.exists:
        last_ts, buf_ts, buf_val = state.get
        carry_t = np.asarray(buf_ts, dtype=np.int64)
        carry_v = np.asarray(buf_val, dtype=np.float64)
    else:
        last_ts = None
        carry_t = np.empty(0, dtype=np.int64)
        carry_v = np.empty(0, dtype=np.float64)
    chunks = list(pdfs)
    pdf = (
        pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    ).sort_values("ts_us", kind="mergesort", ignore_index=True)
    ts = pdf["ts_us"].to_numpy(dtype="int64")
    isnull = pdf["_isnull"].to_numpy(dtype=bool)
    vals = pdf[y_col].astype("float64").to_numpy()
    vals = np.where(isnull, 0.0, vals)  # masked lanes must stay finite

    # pool = carried in-horizon buffer + this batch's non-null rows,
    # time-sorted (each side sorted -> one mergesort of the concat)
    bt, bv = ts[~isnull], vals[~isnull]
    ct = np.concatenate([carry_t, bt])
    cv = np.concatenate([carry_v, bv])
    order = np.argsort(ct, kind="mergesort")
    ct, cv = ct[order], cv[order]

    # frame of a row at time t = pool indices with ts in [t - span, t],
    # peer-inclusive on both ends like the batch RANGE frame
    lo = np.searchsorted(ct, ts - span, side="left")
    hi = np.searchsorted(ct, ts, side="right")

    # frontier never regresses; retention keeps 2 x span below it (the
    # module docstring's completeness guarantee for in-span late rows)
    new_last = int(ts[-1]) if last_ts is None else max(int(ts[-1]), int(last_ts))
    keep = ct >= new_last - 2 * span
    state.update(
        (new_last, [int(x) for x in ct[keep]], [float(x) for x in cv[keep]])
    )
    return pdf, ts, vals, isnull, ct, cv, lo, hi


def prep_stream(stream_df, x_col: str, y_col: str, by):
    """The shared pre-projection: key columns + integer-microsecond time +
    double-cast value + its NULL mask, NULL timestamps dropped."""
    return stream_df.where(f"{x_col} IS NOT NULL").selectExpr(
        *by,
        f"unix_micros(CAST({x_col} AS TIMESTAMP)) AS ts_us",
        f"CAST({y_col} AS DOUBLE) AS {y_col}",
        f"({y_col} IS NULL) AS _isnull",
    )
