"""Trailing time-RANGE rolling statistics: per-series aggregates over
the last ``duration`` of WALL TIME ending at each observation — the
"requests in the last 5 minutes" / "rolling 1-hour mean" primitive.

The ROWS-frame detectors (operators/anomaly.py) hold the SAMPLE size
fixed; under irregular sampling their time horizon stretches and
shrinks.  This operator holds the TIME horizon fixed instead — the shape
monitoring SLOs and rate limits are defined in.  A RANGE frame is also
tie-proof by construction: all peers sharing a timestamp land in every
frame that includes that instant, so no tiebreak column is needed and
the result is deterministic under duplicate timestamps (reference
parity note: tsdownsample's kernels are pure index-space and have no
time-window notion — this is engine surface layered on the same
per-series model as rate.py/gaps.py).

Scale shape: ONE shuffle on the series key, no UDF, no join.  Spark
evaluates a sliding RANGE frame with two ordered cursors per partition
(frame endpoints only move forward), so cost is O(n + total frame
overlap) per series — at 100 TB the plan is a single window stage whose
parallelism is the series-key cardinality, same as rollup/rate.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rolling_time_stats",
    "rolling_time_quantile",
    "rolling_time_distinct",
    "rolling_time_regr",
    "duration_to_micros",
]

_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def duration_to_micros(duration: str) -> int:
    """Parse ``"5 minutes"`` / ``"1 hour"`` / ``"30 seconds"`` into exact
    integer microseconds.  Fixed-length units only — months/years are
    calendar arithmetic, which a linear RANGE frame cannot express."""
    m = re.fullmatch(
        r"\s*(\d+)\s*(microsecond|millisecond|second|minute|hour|day)s?\s*",
        str(duration).lower(),
    )
    if not m:
        raise ValueError(
            f"unsupported duration {duration!r}: expected '<n> "
            "<microsecond|millisecond|second|minute|hour|day>[s]'"
        )
    n = int(m.group(1))
    if n <= 0:
        raise ValueError(f"duration must be positive, got {duration!r}")
    return n * _UNIT_US[m.group(2)]


def _range_window(
    df: DataFrame,
    x_col: str,
    by: Sequence[str],
    duration: str,
    include_current: bool,
):
    """Shared trailing-RANGE frame builder: ``[t - duration, t]`` (or
    ``[t - duration, t)`` when ``include_current`` is False) ordered by
    integer microseconds for timestamps or the raw value for numeric x."""
    t_dtype = dict(df.dtypes)[x_col]
    if t_dtype.startswith("timestamp"):
        order = F.unix_micros(F.col(x_col).cast("timestamp"))
        span = duration_to_micros(duration)
    else:
        if not include_current and t_dtype not in (
            "tinyint", "smallint", "int", "bigint",
        ):
            # the strictly-earlier frame is expressed as an upper bound of
            # -1 in the order column's own units — exact for integer axes
            # (and for timestamps, where the unit is one microsecond), but
            # on a fractional axis it would silently exclude everything in
            # (t-1, t), not just the current instant
            raise ValueError(
                "include_current=False needs an exact integer x axis "
                f"(timestamp or integral numeric); {x_col!r} is {t_dtype}"
            )
        order = F.col(x_col).cast("double")
        span = float(duration)
        if span <= 0:
            raise ValueError(f"duration must be positive, got {duration!r}")
        if span != int(span):
            # the pyspark Window API only takes integer frame bounds;
            # rescale the x axis upstream for sub-unit spans
            raise ValueError(
                f"numeric x_col needs an integral duration, got {duration!r}"
            )
        span = int(span)
    hi = 0 if include_current else -1
    return Window.partitionBy(*by).orderBy(order).rangeBetween(-span, hi)


def rolling_time_stats(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    duration: str = "5 minutes",
    min_obs: int = 1,
    include_current: bool = True,
    impl: str = "frame",
) -> DataFrame:
    """Append ``roll_n``, ``roll_sum``, ``roll_mean``, ``roll_min``,
    ``roll_max``, ``roll_std`` over the trailing ``[t - duration, t]``
    frame of each row's series.

    ``include_current=False`` shifts the frame to ``[t - duration, t)``
    (strictly earlier observations, at microsecond resolution) — the
    self-exclusive form detectors want; note it also excludes PEERS at
    the exact same timestamp, which is what makes it deterministic.

    Aggregates with fewer than ``min_obs`` non-null observations are
    NULL (``roll_n`` itself always reports the true count).  ``roll_std``
    is sample stddev and NULL for single-point frames.  NULL ``y`` rows
    get a frame score like any other row but contribute nothing to any
    aggregate.  ``x_col`` may be a timestamp (trailing window in wall
    time, exact integer-microsecond arithmetic) or numeric (``duration``
    then must be a plain number string, in the column's own units).

    ``impl`` picks the physical strategy (same split as
    operators/anomaly.py):

    * ``"frame"`` (default) — one sliding RANGE frame per aggregate.
      Spark re-aggregates each frame buffer (SlidingWindowFunctionFrame
      has no incremental subtract), so cost is O(n x points-per-frame)
      per series; values are bit-exactly the frame aggregation order.
    * ``"prefix"`` — the 100 TB path for the sum family: n/sum/mean/std
      come from DIFFERENCES of two GROWING frames (UNBOUNDED PRECEDING
      up to now, and up to just-before the frame start), which Spark
      evaluates incrementally — O(n) per series regardless of frame
      density.  min/max keep the sliding frame (no subtractive form
      exists; they are comparison-only).  Sums agree with ``"frame"`` to
      float-summation-order tolerance (~1e-9 relative), not bit-for-bit.
      Requires an exact integer time axis (timestamp, or an integral
      numeric dtype) because the just-before bound is ``-(span + 1)`` in
      integer units.
    """
    if min_obs < 1:
        raise ValueError(f"min_obs must be >= 1, got {min_obs}")
    if impl not in ("frame", "prefix"):
        raise ValueError(f"impl must be 'frame' or 'prefix', got {impl!r}")
    by = list(by)
    w = _range_window(df, x_col, by, duration, include_current)
    y = F.col(y_col).cast("double")

    if impl == "prefix":
        t_dtype = dict(df.dtypes)[x_col]
        if t_dtype.startswith("timestamp"):
            order = F.unix_micros(F.col(x_col).cast("timestamp"))
            span = duration_to_micros(duration)
        elif t_dtype in ("tinyint", "smallint", "int", "bigint"):
            order = F.col(x_col).cast("long")
            span = int(duration)
            if span <= 0:
                raise ValueError(f"duration must be positive, got {duration!r}")
        else:
            raise ValueError(
                "impl='prefix' needs an exact integer time axis "
                f"(timestamp or integral numeric); {x_col!r} is {t_dtype}"
            )
        hi_now = 0 if include_current else -1
        base = Window.partitionBy(*by).orderBy(order)
        w_now = base.rangeBetween(Window.unboundedPreceding, hi_now)
        w_old = base.rangeBetween(Window.unboundedPreceding, -span - 1)
        c1, c0 = F.count(y).over(w_now), F.count(y).over(w_old)
        s1, s0 = F.sum(y).over(w_now), F.sum(y).over(w_old)
        q1 = F.sum(y * y).over(w_now)
        q0 = F.sum(y * y).over(w_old)
        n = (c1 - c0).cast("long")
        fsum = F.coalesce(s1, F.lit(0.0)) - F.coalesce(s0, F.lit(0.0))
        fsq = F.coalesce(q1, F.lit(0.0)) - F.coalesce(q0, F.lit(0.0))
        gate = lambda c: F.when(n >= min_obs, c)  # noqa: E731
        mean = F.when(n > 0, fsum / n)
        var = F.when(
            n > 1, F.greatest(fsq - fsum * fsum / n, F.lit(0.0)) / (n - 1)
        )
        return (
            df.withColumn("roll_n", n)
            .withColumn("roll_sum", gate(F.when(n > 0, fsum)))
            .withColumn("roll_mean", gate(mean))
            .withColumn("roll_min", gate(F.min(y).over(w)))
            .withColumn("roll_max", gate(F.max(y).over(w)))
            .withColumn("roll_std", gate(F.sqrt(var)))
        )

    n = F.count(y).over(w)
    gate = lambda c: F.when(n >= min_obs, c)  # noqa: E731
    return (
        df.withColumn("roll_n", n)
        .withColumn("roll_sum", gate(F.sum(y).over(w)))
        .withColumn("roll_mean", gate(F.avg(y).over(w)))
        .withColumn("roll_min", gate(F.min(y).over(w)))
        .withColumn("roll_max", gate(F.max(y).over(w)))
        .withColumn("roll_std", gate(F.stddev_samp(y).over(w)))
    )


def rolling_time_quantile(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    duration: str = "5 minutes",
    qs: Sequence[float] = (0.5,),
    min_obs: int = 1,
    include_current: bool = True,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Append ``roll_q50``-style trailing time-window quantiles: for each
    row, the ``q``-quantile (linear interpolation, the QUANTILE_CONT /
    numpy 'linear' rule) of its series' observations in the last
    ``duration`` of wall time.  One output column per entry in ``qs``,
    named ``roll_q{100q:g}`` with any dot swapped for an underscore
    (``roll_q50``, ``roll_q99``, ``roll_q99_9``) — a dotted name would
    read as a struct-field access in string column references.

    ``exact=True`` uses Spark's ``percentile`` aggregate — it buffers the
    frame's values per evaluation, so per-series frame cardinality (points
    per ``duration``) must fit in executor memory; that is a property of
    the data's sampling rate, not its total size, so the plan scales with
    series count like every other window here.  ``exact=False`` switches
    to ``approx_percentile`` (bounded-memory KLL-style sketch, tunable
    ``accuracy``) for extreme-density series — no DuckDB-exact oracle for
    that path, so contract rows use the exact form.

    NULL ``y`` rows are scored but contribute nothing; frames with fewer
    than ``min_obs`` observations yield NULL quantiles.
    """
    if min_obs < 1:
        raise ValueError(f"min_obs must be >= 1, got {min_obs}")
    if not qs:
        raise ValueError("qs must name at least one quantile")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
    by = list(by)
    w = _range_window(df, x_col, by, duration, include_current)
    y = F.col(y_col).cast("double")
    n = F.count(y).over(w)
    out = df
    for q in qs:
        fn = (
            F.expr(f"percentile(`{y_col}`, {q!r})")
            if exact
            else F.expr(f"approx_percentile(`{y_col}`, {q!r}, {accuracy})")
        )
        name = f"roll_q{q * 100:g}".replace(".", "_")
        out = out.withColumn(name, F.when(n >= min_obs, fn.over(w)))
    return out


def rolling_time_distinct(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    duration: str = "5 minutes",
    include_current: bool = True,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Append ``roll_distinct``: how many DISTINCT non-null ``y_col``
    values the row's series saw in the last ``duration`` of wall time —
    the 'unique users in the past hour' sliding-cardinality primitive.

    ``exact=True`` materialises the frame's value set per evaluation
    (``collect_set`` over the RANGE frame), so the cap is distinct values
    per ``duration`` per series — again a data-density property, not a
    data-size one.  ``exact=False`` uses ``approx_count_distinct``
    (HyperLogLog++, ``rsd`` relative error, constant memory) for
    high-cardinality frames; contract rows use the exact form for the
    DuckDB ``COUNT(DISTINCT ...) OVER`` oracle.
    """
    by = list(by)
    w = _range_window(df, x_col, by, duration, include_current)
    cnt = (
        F.size(F.collect_set(y_col).over(w)).cast("long")
        if exact
        else F.approx_count_distinct(y_col, rsd).over(w)
    )
    return df.withColumn("roll_distinct", cnt)


def rolling_time_regr(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    duration: str = "5 minutes",
    min_obs: int = 3,
    include_current: bool = True,
) -> DataFrame:
    """Append ``roll_slope``, ``roll_intercept``, ``roll_r2``: the
    least-squares trend of each row's series over its trailing
    ``[t - duration, t]`` frame — "is this series rising over the last N
    hours, and how linearly" — the windowed form of stats.py's
    whole-series trend, computed with the same ANSI ``regr_*``
    aggregates.

    The regressor is elapsed SECONDS since the series' first observation
    (``roll_slope`` is y-units per second).  Centering on the series
    start matters numerically: raw epoch microseconds are ~1.7e15, and
    the regr aggregates' sum-of-squares arithmetic at that magnitude
    loses ~1e-4 absolute to cancellation — centered, x spans only the
    series' own length and the aggregates stay exact to float precision.
    The center is ONE whole-partition min (no ordering subtleties, same
    shuffle), and because slope/r2 are translation-invariant in x the
    choice of center does not change the result, only its conditioning.

    Frames with fewer than ``min_obs`` observations are NULL; both
    engines already return NULL slope for single-point or zero-variance
    frames (the gate makes that explicit).  One shuffle on the series
    key, zero Python — the sliding-frame cost profile of
    ``rolling_time_stats(impl="frame")``.
    """
    if min_obs < 2:
        raise ValueError(f"min_obs must be >= 2, got {min_obs}")
    by = list(by)
    w = _range_window(df, x_col, by, duration, include_current)
    t_dtype = dict(df.dtypes)[x_col]
    if t_dtype.startswith("timestamp"):
        tu = F.unix_micros(F.col(x_col).cast("timestamp"))
    else:
        tu = F.col(x_col).cast("double")
    wp = Window.partitionBy(*by)
    xs = (tu - F.min(tu).over(wp)) / F.lit(1_000_000.0 if t_dtype.startswith("timestamp") else 1.0)
    base = df.withColumn("_xs", xs)
    y = F.col(y_col).cast("double")
    n = F.count(F.when(y.isNotNull() & F.col("_xs").isNotNull(), 1)).over(w)
    gate = lambda c: F.when(n >= min_obs, c)  # noqa: E731
    out = (
        base.withColumn("roll_slope", gate(F.expr(f"regr_slope({y_col}, _xs)").over(w)))
        .withColumn(
            "roll_intercept", gate(F.expr(f"regr_intercept({y_col}, _xs)").over(w))
        )
        .withColumn("roll_r2", gate(F.expr(f"regr_r2({y_col}, _xs)").over(w)))
    )
    return out.drop("_xs")
