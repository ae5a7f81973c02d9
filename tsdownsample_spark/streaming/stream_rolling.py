"""Stateful streaming trailing time-RANGE rolling stats: the live twin of
operators/rolling.py:rolling_time_stats — score each point against the
last ``duration`` of WALL TIME of its own series, across micro-batch
boundaries, via ``applyInPandasWithState``.

State/pooling/late-data semantics live in streaming/pool.py (shared with
stream_distinct.py): per-key state is the observations within 2 x
``duration`` of the carried frontier, so every row scored while within
``duration`` of the frontier — in-order OR late — sees its COMPLETE
frame over all arrived observations; only rows older than
``frontier - duration`` can be under-filled.  The frontier never
regresses.

Semantics match the batch operator: peer-inclusive ``[t - duration, t]``
frame (duplicate timestamps land together), ``min_obs`` gating every
aggregate except ``roll_n``, NULL ``y`` scored but inert.  Sums agree
with the batch window to float-summation-order tolerance (~1e-9
relative) — the stream re-sums each frame from prefix arrays while the
JVM window accumulates in frame order; count/min/max are exact.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from tsdownsample_spark.operators.rolling import duration_to_micros
from tsdownsample_spark.streaming.pool import (
    POOL_STATE_SCHEMA,
    pooled_frames,
    prep_stream,
)

__all__ = ["stream_rolling_time_stats"]


def _slide_min_max(vals, lo, hi):
    """Min and max of ``vals[lo[i]:hi[i]]`` for non-decreasing lo/hi —
    monotonic-deque sliding extremes, O(n) total.  NaN where the frame
    is empty."""
    import numpy as np

    n = len(lo)
    mn = np.full(n, np.nan)
    mx = np.full(n, np.nan)
    dq_min: deque = deque()
    dq_max: deque = deque()
    j_min = j_max = 0
    for i in range(n):
        while j_min < hi[i]:
            while dq_min and vals[dq_min[-1]] >= vals[j_min]:
                dq_min.pop()
            dq_min.append(j_min)
            j_min += 1
        while dq_min and dq_min[0] < lo[i]:
            dq_min.popleft()
        if dq_min:
            mn[i] = vals[dq_min[0]]
        while j_max < hi[i]:
            while dq_max and vals[dq_max[-1]] <= vals[j_max]:
                dq_max.pop()
            dq_max.append(j_max)
            j_max += 1
        while dq_max and dq_max[0] < lo[i]:
            dq_max.popleft()
        if dq_max:
            mx[i] = vals[dq_max[0]]
    return mn, mx


def stream_rolling_time_stats(
    stream_df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    duration: str = "5 minutes",
    min_obs: int = 1,
) -> DataFrame:
    """Append trailing-``duration`` ``roll_n``/``roll_sum``/``roll_mean``/
    ``roll_min``/``roll_max``/``roll_std`` on a stream.

    Returns (keys..., ts_us, <y_col>, roll_n, roll_sum, roll_mean,
    roll_min, roll_max, roll_std).
    """
    if min_obs < 1:
        raise ValueError(f"min_obs must be >= 1, got {min_obs}")
    span = duration_to_micros(duration)
    by = list(by)
    key_fields = [stream_df.schema[c] for c in by]
    out_schema = StructType(
        key_fields
        + [
            StructField("ts_us", LongType()),
            StructField(y_col, DoubleType()),
            StructField("roll_n", LongType()),
            StructField("roll_sum", DoubleType()),
            StructField("roll_mean", DoubleType()),
            StructField("roll_min", DoubleType()),
            StructField("roll_max", DoubleType()),
            StructField("roll_std", DoubleType()),
        ]
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        pdf, ts, vals, isnull, ct, cv, lo, hi = pooled_frames(
            state, pdfs, y_col, span
        )
        s1 = np.concatenate([[0.0], np.cumsum(cv)])
        s2 = np.concatenate([[0.0], np.cumsum(cv * cv)])
        n = (hi - lo).astype(np.int64)
        fs1 = s1[hi] - s1[lo]
        fs2 = s2[hi] - s2[lo]
        mn, mx = _slide_min_max(cv, lo, hi)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = fs1 / np.where(n > 0, n, 1)
            var = (fs2 - fs1 * fs1 / np.where(n > 0, n, 1)) / np.where(
                n > 1, n - 1, 1
            )
            std = np.sqrt(np.maximum(var, 0.0))
        gated = n < min_obs
        std_null = gated | (n < 2)
        out = pd.DataFrame({col: pdf[col] for col in by})
        out["ts_us"] = pdf["ts_us"]
        out[y_col] = pd.arrays.FloatingArray(vals, isnull)
        out["roll_n"] = n
        out["roll_sum"] = pd.arrays.FloatingArray(fs1, gated)
        out["roll_mean"] = pd.arrays.FloatingArray(mean, gated)
        out["roll_min"] = pd.arrays.FloatingArray(mn, gated | (n < 1))
        out["roll_max"] = pd.arrays.FloatingArray(mx, gated | (n < 1))
        out["roll_std"] = pd.arrays.FloatingArray(std, std_null)
        yield out

    return prep_stream(stream_df, x_col, y_col, by).groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=POOL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
