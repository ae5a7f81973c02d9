"""Stateful streaming EWMA: the live twin of operators/stats.py:ewma.

``y'_t = alpha*y_t + (1-alpha)*y'_{t-1}`` carries exactly ONE scalar per
series across micro-batches — the smallest state of any stateful operator
here (the batch operator needs whole-series groups only because a batch
has no carry; the stream is where the recursion's shape is natural).
The recursion is spelled exactly like the batch operator's loop
(``alpha*y + (1-alpha)*prev``), so stream==batch holds bit-for-bit on
in-order data, not just to tolerance.

NULL ``y`` matches batch: the row inherits the running smooth and leaves
state untouched.

Late-data caveat (same as every stateful op here): late rows fold into
the smooth at arrival order; an ENTIRELY-late micro-batch leaves the
carried state untouched (frontier guard); bound disorder with the source
watermark.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["stream_ewma"]


def stream_ewma(
    stream_df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("event_type",),
    alpha: float = 0.3,
) -> DataFrame:
    """Append ``ewma`` on a stream.  Returns (keys..., ts_us, <y_col>, ewma)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    by = list(by)
    a = float(alpha)
    one_minus_a = 1.0 - a
    key_fields = [stream_df.schema[c] for c in by]
    out_schema = StructType(
        key_fields
        + [
            StructField("ts_us", LongType()),
            StructField(y_col, DoubleType()),
            StructField("ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_ts", LongType()), StructField("ew", DoubleType())]
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            last_ts, ew0 = state.get
            ew = float("nan") if ew0 is None else float(ew0)
        else:
            last_ts, ew = None, float("nan")
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ).sort_values("ts_us", kind="mergesort", ignore_index=True)
        ts = pdf["ts_us"].to_numpy(dtype="int64")
        v = pdf[y_col].to_numpy(dtype="float64")  # NULL -> NaN
        sm = np.empty_like(v)
        for i, x in enumerate(v):
            if np.isnan(x):
                sm[i] = ew  # NULL inherits the running smooth
            else:
                ew = x if np.isnan(ew) else a * x + one_minus_a * ew
                sm[i] = ew
        # frontier guard: an entirely-late batch leaves state untouched
        if last_ts is None or int(ts[-1]) >= int(last_ts):
            new_last = int(ts[-1]) if last_ts is None else max(int(ts[-1]), int(last_ts))
            state.update((new_last, None if np.isnan(ew) else float(ew)))
        out = pd.DataFrame({col: pdf[col] for col in by})
        out["ts_us"] = pdf["ts_us"]
        out[y_col] = pdf[y_col]
        out["ewma"] = sm
        yield out

    prepped = stream_df.where(f"{x_col} IS NOT NULL").selectExpr(
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
