"""Rolling z-score anomaly flagging: score each point against the
TRAILING window of its own series (current point excluded, so an outlier
cannot suppress its own score) — the standard first-line monitoring
detector layered on the same per-series windows as rate/gap/rollup.

One shuffle on the series key, O(window) state per row, no UDF; the
window is ROWS-based (last k observations) rather than time-based so
irregular sampling does not change the sample size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_zscore"]


def rolling_zscore(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    window: int = 50,
    threshold: float = 3.0,
    tiebreak: Sequence[str] = (),
    min_obs: int = 10,
) -> DataFrame:
    """Append ``roll_mean``, ``roll_std``, ``z`` and ``is_anomaly``.

    ``z = (y - mean) / std`` over the previous ``window`` observations
    (rows ``-window .. -1``); NULL until ``min_obs`` prior points exist or
    when the trailing std is zero (a constant window scores nothing —
    avoids division blow-ups on flatlines).  ``threshold`` is in sigmas;
    ``is_anomaly`` is strictly-greater on |z|.
    """
    if window < 2 or min_obs < 2:
        raise ValueError("window and min_obs must be >= 2")
    if min_obs > window:
        raise ValueError(
            f"min_obs ({min_obs}) > window ({window}): the trailing frame "
            "can never satisfy it — every z would be silently NULL"
        )
    by = list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(x_col, *tiebreak)
        .rowsBetween(-window, -1)
    )
    mean = F.avg(y_col).over(w)
    std = F.stddev_samp(y_col).over(w)
    cnt = F.count(y_col).over(w)
    z = F.when(
        (cnt >= F.lit(min_obs)) & (std > 0), (F.col(y_col) - mean) / std
    )
    # true append: every input column passes through (callers join flags
    # back to source rows by their own id columns)
    return df.select(
        "*",
        mean.alias("roll_mean"),
        std.alias("roll_std"),
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(threshold)).alias("is_anomaly"),
    )
