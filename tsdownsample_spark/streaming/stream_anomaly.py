"""Stateful streaming rolling z-score: the live twin of
operators/anomaly.py — score each point against the trailing ``window``
observations of its own series, across micro-batch boundaries, via
``applyInPandasWithState``.

Why stateful: the trailing ROWS frame of a micro-batch's first rows lives
in the previous batch.  State per key is the last ``window`` observations
(values + their NULL mask) plus the time frontier — O(window) doubles, so
any series cardinality streams through the state store; window=50 is
400 bytes/series.

Semantics match the batch operator's ``impl="prefix"`` path (see
operators/anomaly.py): trailing mean/std from sums of y and y^2 over the
previous ``window`` rows, NULL y occupying a frame position but feeding
neither sum nor count, NULL z until ``min_obs`` prior observations exist
or when the trailing std is zero.  Values agree with the batch operator to
float-summation-order tolerance (~1e-9 relative), not bit-for-bit — the
stream re-sums each frame from the carried tail while batch subtracts
running prefix sums; the equivalence pytest compares at that tolerance.

Late-data caveat (same as every stateful op here): a row older than the
carried frontier scores against the newer tail, not its true in-order
frame; an ENTIRELY-late micro-batch leaves the carried state untouched
(frontier guard — state never regresses); bound disorder with the source
watermark.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["stream_rolling_zscore"]


def stream_rolling_zscore(
    stream_df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    window: int = 50,
    threshold: float = 3.0,
    min_obs: int = 10,
) -> DataFrame:
    """Append ``roll_mean``/``roll_std``/``z``/``is_anomaly`` on a stream.

    Returns (keys..., ts_us, <y_col>, roll_mean, roll_std, z, is_anomaly).
    """
    if window < 2 or min_obs < 2:
        raise ValueError("window and min_obs must be >= 2")
    if min_obs > window:
        raise ValueError(
            f"min_obs ({min_obs}) > window ({window}): the trailing frame "
            "can never satisfy it — every z would be silently NULL"
        )
    by = list(by)
    key_fields = [stream_df.schema[c] for c in by]
    out_schema = StructType(
        key_fields
        + [
            StructField("ts_us", LongType()),
            StructField(y_col, DoubleType()),
            StructField("roll_mean", DoubleType()),
            StructField("roll_std", DoubleType()),
            StructField("z", DoubleType()),
            StructField("is_anomaly", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts", LongType()),
            StructField("tail_vals", ArrayType(DoubleType())),
            StructField("tail_null", ArrayType(BooleanType())),
        ]
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            last_ts, tail_vals, tail_null = state.get
            carry_v = np.asarray(tail_vals, dtype=np.float64)
            carry_m = np.asarray(tail_null, dtype=bool)
        else:
            last_ts = None
            carry_v = np.empty(0, dtype=np.float64)
            carry_m = np.empty(0, dtype=bool)
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ).sort_values("ts_us", kind="mergesort", ignore_index=True)
        ts = pdf["ts_us"].to_numpy(dtype="int64")
        isnull = pdf["_isnull"].to_numpy(dtype=bool)
        vals = pdf[y_col].astype("float64").to_numpy()
        vals = np.where(isnull, 0.0, vals)  # masked lanes must stay finite
        k = len(carry_v)
        v = np.concatenate([carry_v, vals])
        m = np.concatenate([carry_m, isnull])
        ok = np.where(m, 0.0, v)
        # prefix sums over carry+batch; frame of global row j = [j-window, j)
        s1 = np.concatenate([[0.0], np.cumsum(ok)])
        s2 = np.concatenate([[0.0], np.cumsum(ok * ok)])
        c = np.concatenate([[0], np.cumsum(~m)])
        j = np.arange(k, len(v))
        lo = np.maximum(j - window, 0)
        fs1 = s1[j] - s1[lo]
        fs2 = s2[j] - s2[lo]
        cnt = c[j] - c[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = fs1 / cnt
            var = (fs2 - fs1 * fs1 / np.where(cnt > 0, cnt, 1)) / np.where(
                cnt > 1, cnt - 1, 1
            )
            std = np.sqrt(np.maximum(var, 0.0))
            z = (v[j] - mean) / std
        mean_null = cnt < 1
        std_null = cnt < 2
        z_null = (cnt < min_obs) | std_null | ~(std > 0) | m[j]
        # frontier guard: an entirely-late batch leaves state untouched
        if last_ts is None or int(ts[-1]) >= int(last_ts):
            nv = v[-window:]
            nm = m[-window:]
            new_last = int(ts[-1]) if last_ts is None else max(int(ts[-1]), int(last_ts))
            state.update((new_last, [float(x) for x in nv], [bool(x) for x in nm]))
        out = pd.DataFrame({col: pdf[col] for col in by})
        out["ts_us"] = pdf["ts_us"]
        out[y_col] = pd.arrays.FloatingArray(vals, isnull)
        out["roll_mean"] = pd.arrays.FloatingArray(mean, mean_null)
        out["roll_std"] = pd.arrays.FloatingArray(std, std_null)
        out["z"] = pd.arrays.FloatingArray(z, z_null)
        flag = np.abs(z) > threshold
        out["is_anomaly"] = pd.arrays.BooleanArray(
            np.where(z_null, False, flag), z_null
        )
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
