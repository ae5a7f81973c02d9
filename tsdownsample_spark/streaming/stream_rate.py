"""Stateful streaming counter-rate: the per-point increase / per-second
rate (operators/rate.py semantics, PromQL reset rule included) on a live
stream, with the previous observation carried across micro-batches via
``applyInPandasWithState``.

Why stateful: ``delta`` needs each point's PREDECESSOR, and the predecessor
of a micro-batch's first row lives in the previous batch — per-key state
(last_ts_us, last_val) that windowed aggregates cannot express.  State is
O(1) per series (two scalars), so any series cardinality streams through
the state store.

Because the computation is pure per-adjacent-pair arithmetic, the stream
output is EXACTLY equal to the batch operator's (bit-for-bit, no rounding)
when events arrive in order — the equivalence pytest feeds the same rows
through both paths and compares.  Late data caveat (same as every stateful
op here): a row older than the carried state pairs with the newer state,
not its true in-order predecessor; bound disorder with the source
watermark.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["stream_counter_rate"]


def stream_counter_rate(
    stream_df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    handle_resets: bool = True,
) -> DataFrame:
    """Per-point ``delta`` and ``rate_s`` over a stream.

    Returns (keys..., ts_us, <y_col>, delta, rate_s); each series' very
    first point ever has NULL delta/rate (no predecessor), exactly like the
    batch operator; zero/negative time steps never divide.
    """
    by = list(by)
    key_fields = [stream_df.schema[c] for c in by]
    out_schema = StructType(
        key_fields
        + [
            StructField("ts_us", LongType()),
            StructField(y_col, DoubleType()),
            StructField("delta", DoubleType()),
            StructField("rate_s", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_ts", LongType()), StructField("last_val", DoubleType())]
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        last_ts, last_val = state.get if state.exists else (None, None)
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ).sort_values("ts_us", kind="mergesort", ignore_index=True)
        ts = pdf["ts_us"].to_numpy(dtype="int64")
        vals = pdf[y_col].to_numpy(dtype="float64")
        prev_v = np.empty_like(vals)
        prev_t = np.empty_like(ts)
        prev_v[1:] = vals[:-1]
        prev_t[1:] = ts[:-1]
        has_prev = np.ones(len(vals), dtype=bool)
        if last_val is not None:
            prev_v[0] = last_val
            prev_t[0] = last_ts
        else:
            has_prev[0] = False
            prev_v[0] = 0.0  # masked out below; keep the lane finite
            prev_t[0] = ts[0]
        raw = vals - prev_v
        delta = np.where(raw < 0, vals, raw) if handle_resets else raw
        dt = (ts - prev_t) / 1_000_000.0
        pos = dt > 0
        rate = np.where(pos, delta / np.where(pos, dt, 1.0), 0.0)
        mask_delta = ~has_prev  # True -> NULL out
        mask_rate = ~has_prev | ~pos
        state.update((int(ts[-1]), float(vals[-1])))
        out = pd.DataFrame({c: pdf[c] for c in by})
        out["ts_us"] = pdf["ts_us"]
        out[y_col] = vals
        # masked FloatingArray: masks are the NULL lanes; an unmasked NaN
        # (NaN payload) stays a VALUE through Arrow, matching the batch op
        out["delta"] = pd.arrays.FloatingArray(delta, mask_delta)
        out["rate_s"] = pd.arrays.FloatingArray(rate, mask_rate)
        yield out

    prepped = stream_df.selectExpr(
        *by,
        f"unix_micros(CAST({x_col} AS TIMESTAMP)) AS ts_us",
        f"CAST({y_col} AS DOUBLE) AS {y_col}",
    )
    return prepped.groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
