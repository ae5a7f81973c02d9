"""Per-series statistical diagnostics: autocorrelation, CUSUM change
detection, winsorization.

These extend the engine past the reference's selector surface
(tsdownsample has no analytics beyond downsampling; these are the
series-health diagnostics a retention pipeline runs next to the tiers —
the same family as TimescaleDB toolkit's ``stats_agg``/changepoint
hyperfunctions, re-expressed as Catalyst plans).

Spark-first notes (100 TB shapes):

* ``autocorr`` — one lag window + one map-side-combinable groupBy; shuffle
  cardinality = series count, never points.
* ``cusum`` — the textbook recursion ``S_t = max(0, S_{t-1} + dev_t)`` is
  NOT window-expressible as written, but has the closed form
  ``S_t = P_t - min(0, min_{j<=t} P_j)`` with ``P`` the running sum of
  deviations, so it becomes two ROWS-frame windows (prefix sum + running
  min) — O(n) per series, zero Python, parallel across series exactly like
  the rolling z-score (anomaly.py).  Per-series mean/std come from a
  groupBy + join back (AQE broadcasts the tiny stats side) instead of an
  unbounded window, so no whole-partition buffering.
* ``winsorize`` — exact interpolated percentiles per series (map-side
  partial ``percentile``), joined back and clipped; one narrow join, no
  second scan of the fact side beyond the clip projection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["autocorr", "cusum", "winsorize"]


def _order_cols(x_col: str, tiebreak: Sequence[str]) -> list[Column]:
    return [F.col(x_col)] + [F.col(c) for c in tiebreak]


def autocorr(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    lag: int = 1,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Lag-``k`` autocorrelation of ``y_col`` per series.

    Pearson correlation between the series and itself shifted by ``lag``
    points (the ACF at one lag — run once per lag of interest).  Sum-based,
    so cross-engine comparison needs rounding (the 6-decimal convention).
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    by = list(by)
    w = Window.partitionBy(*by).orderBy(*_order_cols(x_col, tiebreak))
    return (
        df.withColumn("_pv", F.lag(y_col, lag).over(w))
        .groupBy(*by)
        .agg(
            F.corr(y_col, "_pv").alias("acf"),
            F.count("_pv").alias("n_pairs"),
        )
    )


def cusum(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    k: float = 0.5,
    h: float = 5.0,
    tiebreak: Sequence[str] = (),
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """One-sided (positive-shift) CUSUM change detection per series.

    Standardizes each point against the series' own mean/std (sample), then
    runs ``S_t = max(0, S_{t-1} + (z_t - k))`` and flags ``S_t > h``.

    The recursion is rewritten as ``S_t = P_t - least(min_{j<=t} P_j, 0)``
    (``P`` = prefix sum of ``z - k``): the max-with-zero clamp is exactly
    "distance above the running minimum of the prefix sums", which two
    cumulative ROWS windows compute in one pass per series.  Output columns:
    ``cusum_s`` (the statistic) and ``alarm``.

    ``stats_df`` (optional): a precomputed calibration table
    ``(by..., _mu, _sd)`` to standardize against instead of the input's own
    mean/std — the production mode (calibrate on an in-control reference
    period, monitor everything after) and the contract the streaming twin
    (streaming/stream_cusum.py) shares, since a stream cannot know its
    future mean.
    """
    by = list(by)
    stats = (
        stats_df
        if stats_df is not None
        else df.groupBy(*by).agg(
            F.avg(y_col).alias("_mu"), F.stddev_samp(y_col).alias("_sd")
        )
    )
    order = _order_cols(x_col, tiebreak)
    cum = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = (F.col(y_col) - F.col("_mu")) / F.col("_sd") - F.lit(float(k))
    pfx = F.sum(dev).over(cum)
    return (
        df.join(stats, on=by, how="inner")
        .withColumn("_pfx", pfx)
        .withColumn("_runmin", F.min("_pfx").over(cum))
        .withColumn("cusum_s", F.col("_pfx") - F.least(F.col("_runmin"), F.lit(0.0)))
        .withColumn("alarm", F.round("cusum_s", 6) > F.lit(float(h)))
        .drop("_mu", "_sd", "_pfx", "_runmin")
    )


def winsorize(
    df: DataFrame,
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Clip ``y_col`` to its per-series exact interpolated percentiles.

    Uses Spark's exact ``percentile`` aggregate (linear interpolation — the
    same definition as ANSI ``percentile_cont`` / DuckDB ``quantile_cont``),
    NOT ``approx_percentile``: outlier capping that itself drifts between
    runs would poison downstream training statistics.  Exact percentile is
    a sort-based partial aggregate; for very hot series swap in
    ``approx_percentile`` explicitly and accept the documented error.
    Adds ``{y_col}_w`` (clipped value), ``p_lo``, ``p_hi``.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    by = list(by)
    bounds = df.groupBy(*by).agg(
        F.expr(f"percentile({y_col}, {lower!r})").alias("p_lo"),
        F.expr(f"percentile({y_col}, {upper!r})").alias("p_hi"),
    )
    return df.join(bounds, on=by, how="inner").withColumn(
        f"{y_col}_w",
        F.least(F.greatest(F.col(y_col), F.col("p_lo")), F.col("p_hi")),
    )
