"""Downsample-quality evaluation: how faithfully does a selected subset
reconstruct the raw series under linear interpolation?

tsdownsample picks WHICH points survive; this operator quantifies what that
choice costs — the visual-fidelity question (MinMax vs LTTB vs EveryNth at
a given n_out) asked over real data instead of folklore.  For every raw
point, the reconstruction is the straight line between the nearest selected
points on either side; the error profile per series is the aggregate of
|raw - reconstruction|.

Spark-first: everything is windows over the x-ordered series — a running
``last(..., ignorenulls)`` carries the previous selected point forward and
(via the descending-order trick gapfill.py uses, O(n) not O(n^2)) the next
selected point backward; the interpolation and error are plain column
arithmetic.  One shuffle on the series key, O(1) running state, no UDF.

Error definition at the edges: points before the first / after the last
selected point have no bracketing pair; they clamp to the nearest selected
value (LOCF/NOCB), the same convention plotting reconstruction uses.
Selected points themselves reconstruct exactly (error 0) by construction —
the interpolation at px==x collapses to py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["downsample_error"]


def downsample_error(
    ranked: DataFrame,
    selected: DataFrame,
    by: Sequence[str] = ("series_key",),
    x_col: str = "rn",
    y_col: str = "value",
    sel_idx_col: str = "sel_idx",
    per_point: bool = False,
) -> DataFrame:
    """Reconstruction error of ``selected`` against the raw series.

    Parameters
    ----------
    ranked : the raw series, one row per point: ``by + x_col + y_col``.
        ``x_col`` is any numeric position (a rank, an integer x, a
        unix-micros column — pre-convert timestamps).
    selected : the selection, ``by + sel_idx_col`` holding x-positions that
        survive (the long-form selectors' output shape).
    per_point : return per-point rows (debugging) instead of the per-series
        aggregate.

    Returns per series: ``n`` points, ``n_sel`` selected, ``max_abs_err``
    (order-insensitive, bit-stable) and ``mean_abs_err_r`` (rounded to 6
    decimals — float-sum fold).
    """
    by = list(by)
    # explicit aliases: `selected` is typically DERIVED from `ranked` (the
    # selector ran on the same frame), so bare column refs would be an
    # ambiguous self-join
    l = ranked.alias("_ds_l")
    r = (
        selected.select(
            *by, F.col(sel_idx_col).alias("_sel_x"), F.lit(True).alias("_is_sel")
        )
        .dropDuplicates(by + ["_sel_x"])
        .alias("_ds_r")
    )
    cond = [F.col(f"_ds_l.{c}") == F.col(f"_ds_r.{c}") for c in by] + [
        F.col(f"_ds_l.{x_col}") == F.col("_ds_r._sel_x")
    ]
    j = l.join(r, on=cond, how="left").select(
        *[F.col(f"_ds_l.{c}").alias(c) for c in by],
        F.col(f"_ds_l.{x_col}").alias("_x"),
        F.col(f"_ds_l.{y_col}").alias("_y"),
        F.coalesce(F.col("_ds_r._is_sel"), F.lit(False)).alias("_is_sel"),
    )
    xd = F.col("_x").cast("double")
    sel_x = F.when(F.col("_is_sel"), xd)
    sel_y = F.when(F.col("_is_sel"), F.col("_y").cast("double"))
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_x").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward-looking neighbors via the DESCENDING running frame — O(n),
    # same trick as gapfill.py's linear strategy
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col("_x").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = j.select(
        *by,
        "_x",
        "_y",
        "_is_sel",
        F.last(sel_x, ignorenulls=True).over(wf).alias("_px"),
        F.last(sel_y, ignorenulls=True).over(wf).alias("_py"),
        F.last(sel_x, ignorenulls=True).over(wb).alias("_nx"),
        F.last(sel_y, ignorenulls=True).over(wb).alias("_ny"),
    )
    px, py = F.col("_px"), F.col("_py")
    nx, ny = F.col("_nx"), F.col("_ny")
    recon = (
        F.when(px.isNull(), ny)  # before first selected: clamp forward
        .when(nx.isNull(), py)  # after last selected: clamp backward
        .when(nx == px, py)  # on a selected point (or degenerate bracket)
        .otherwise(py + (ny - py) * (xd - px) / (nx - px))
    )
    err = F.abs(F.col("_y").cast("double") - recon)
    per = pts.select(*by, "_x", "_y", "_is_sel", recon.alias("recon"),
                     err.alias("abs_err"))
    if per_point:
        return per
    return per.groupBy(*by).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("_is_sel").cast("long")).alias("n_sel"),
        F.max("abs_err").alias("max_abs_err"),
        F.round(F.sum("abs_err") / F.count("*"), 6).alias("mean_abs_err_r"),
    )
