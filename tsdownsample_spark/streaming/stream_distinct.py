"""Stateful streaming trailing-window distinct count: the live twin of
operators/rolling.py:rolling_time_distinct — for each arriving point, how
many DISTINCT non-null values its series saw in the last ``duration`` of
wall time, across micro-batch boundaries.

State per key mirrors stream_rolling.py: the (ts, value) observations
within ``duration`` of the carried frontier — bounded by sampling density
x value width, not data size.

Algorithm (exact, O((m + q) log m) per batch where m = pool size and
q = new rows): the classic offline last-occurrence sweep.  Pool
observations sorted by time; sweep a right cursor over them, maintaining a
Fenwick tree where position p holds 1 iff the value at p has no LATER
occurrence seen so far (the value's current last occurrence).  For each
query row (new rows, right endpoints non-decreasing), first advance the
sweep to its frame end, then ``distinct = BIT.sum(lo, hi)`` — inside any
frame, counting last-occurrences counts each distinct value exactly once.
The tree is rebuilt per batch over the pooled window (cheap: the pool is
span-bounded); only the raw observations persist in state.

Late-data semantics identical to stream_rolling.py: in-span late rows are
scored against the pool AND buffered for later frames; the frontier never
regresses; rows older than ``frontier - duration`` see an under-filled
frame (bound disorder with the source watermark).
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from tsdownsample_spark.operators.rolling import duration_to_micros

__all__ = ["stream_rolling_time_distinct"]


def _sliding_distinct(ts, vals, q_lo, q_hi):
    """distinct(vals[q_lo[i]:q_hi[i]]) for non-decreasing q_lo/q_hi via the
    last-occurrence Fenwick sweep.  ``ts`` sorted ascending; q_hi
    non-decreasing because queries are time-sorted."""
    import numpy as np

    m = len(ts)
    out = np.zeros(len(q_lo), dtype=np.int64)
    if m == 0:
        return out
    bit = np.zeros(m + 1, dtype=np.int64)

    def bit_add(i, d):
        i += 1
        while i <= m:
            bit[i] += d
            i += i & (-i)

    def bit_sum(i):  # prefix sum of [0, i)
        s = 0
        while i > 0:
            s += bit[i]
            i -= i & (-i)
        return s

    last_pos: dict = {}
    swept = 0
    for qi in range(len(q_lo)):
        hi = q_hi[qi]
        while swept < hi:
            v = vals[swept]
            p = last_pos.get(v)
            if p is not None:
                bit_add(p, -1)
            bit_add(swept, 1)
            last_pos[v] = swept
            swept += 1
        lo = q_lo[qi]
        out[qi] = bit_sum(hi) - bit_sum(lo)
    return out


def stream_rolling_time_distinct(
    stream_df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    duration: str = "5 minutes",
) -> DataFrame:
    """Append trailing-``duration`` ``roll_distinct`` on a stream.

    Returns (keys..., ts_us, <y_col>, roll_distinct).  NULL ``y`` rows are
    scored but never counted, like the batch operator.  Values are
    compared as float64 — exact for integer ids below 2^53 and any float
    column; a string-identity variant would carry the values verbatim in
    state at higher cost (YAGNI until a caller needs it).
    """
    span = duration_to_micros(duration)
    by = list(by)
    key_fields = [stream_df.schema[c] for c in by]
    out_schema = StructType(
        key_fields
        + [
            StructField("ts_us", LongType()),
            StructField(y_col, DoubleType()),
            StructField("roll_distinct", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts", LongType()),
            StructField("buf_ts", ArrayType(LongType())),
            StructField("buf_val", ArrayType(DoubleType())),
        ]
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
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
        vals = np.where(isnull, 0.0, vals)

        bt, bv = ts[~isnull], vals[~isnull]
        ct = np.concatenate([carry_t, bt])
        cv = np.concatenate([carry_v, bv])
        order = np.argsort(ct, kind="mergesort")
        ct, cv = ct[order], cv[order]

        lo = np.searchsorted(ct, ts - span, side="left")
        hi = np.searchsorted(ct, ts, side="right")
        dn = _sliding_distinct(ct, cv, lo, hi)

        new_last = (
            int(ts[-1]) if last_ts is None else max(int(ts[-1]), int(last_ts))
        )
        keep = ct >= new_last - span
        state.update(
            (
                new_last,
                [int(x) for x in ct[keep]],
                [float(x) for x in cv[keep]],
            )
        )
        out = pd.DataFrame({col: pdf[col] for col in by})
        out["ts_us"] = pdf["ts_us"]
        out[y_col] = pd.arrays.FloatingArray(vals, isnull)
        out["roll_distinct"] = dn
        yield out

    prepped = stream_df.where(f"{x_col} IS NOT NULL").selectExpr(
        *by,
        f"unix_micros(CAST({x_col} AS TIMESTAMP)) AS ts_us",
        f"CAST({y_col} AS DOUBLE) AS {y_col}",
        f"({y_col} IS NULL) AS _isnull",
    )
    return prepped.groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
