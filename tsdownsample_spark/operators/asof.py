"""As-of (point-in-time) join: match each left row to the most recent right
row at-or-before it (``backward``, default) or the earliest at-or-after it
(``forward``), per series key.

The reference is a downsampling kernel library and has no join operators;
an as-of join is the canonical time-series lookup every TS engine pairs
with rollup tiers (match an event to the tier bucket in force at its
timestamp), so it belongs in this engine's retention layer.

Spark-first design — **union + one window, not a range join**.  The naive
formulation (``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + max) is a
non-equi join: Catalyst plans it as a broadcast-nested-loop or a per-key
cartesian, O(|L|·|R|) per key — a scale-killer.  Instead:

1. project both sides onto a shared schema, tag ``_asof_side`` (right=0,
   left=1 so right rows sort first at equal timestamps — the inclusive
   match the asof contract requires);
2. ``unionByName`` them (a zero-shuffle concat);
3. one window ``partitionBy(key).orderBy(ts, _asof_side)`` with a running
   ``last(payload, ignorenulls=True)`` carries each right row's payload
   forward onto the left rows that follow it — exactly the LOCF kernel
   gap-fill already uses (operators/gapfill.py);
4. keep the left rows.

Cost: ONE shuffle on the series key (both inputs, map-side concatenated)
+ a per-partition sort, O((|L|+|R|) log) — the same plan shape as any
windowed aggregate, and on a source pre-bucketed by key the exchange
vanishes entirely (see operators/sql_selectors.py's zero-exchange audit).
State per task is O(1) (the running payload), so the join survives any
series length.  ``forward`` is the same plan with a descending sort.

DuckDB's ``ASOF JOIN`` provides an independent oracle (queries.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_snapshot"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("series_key",),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    matched_col: str = "matched_ts",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join ``right``'s ``value_cols`` onto ``left``.

    Parameters
    ----------
    on : timestamp (or any orderable numeric) column present on BOTH sides.
    by : equality keys (the series identity); the single shuffle key.
    value_cols : right payload columns to attach; must not collide with
        left column names.  Defaults to every right column not in
        ``by`` / ``on``.
    direction : ``backward`` (right.ts <= left.ts, most recent wins) or
        ``forward`` (right.ts >= left.ts, earliest wins); both inclusive,
        matching ``pandas.merge_asof`` and DuckDB ``ASOF JOIN`` semantics.
    tolerance : optional maximum |left.on - right.on| in SECONDS for
        timestamp ``on`` (in raw units for numeric ``on``); matches
        outside it are nulled (left row kept — left-join semantics).
    matched_col : output column holding the matched right timestamp
        (null when no match).
    right_tiebreak : optional right column ordering ties when several
        right rows share one timestamp (the LAST in this order wins for
        ``backward``, the FIRST for ``forward``, i.e. always the row
        "closest" to the left row in the sort).  Without it, equal-ts
        right rows resolve arbitrarily (same caveat as pandas).

    Right rows with a NULL ``on`` are dropped (nothing can match them);
    left rows with a NULL ``on`` are kept with a null match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    for c in (matched_col, "_asof_side", "_asof_t", "_asof_tb", "_asof_payload",
              "_asof_hit"):
        if c in left.columns:
            raise ValueError(f"left already has reserved column {c!r}")
    if "_t" in value_cols:
        raise ValueError("value_cols may not contain the reserved name '_t'")

    # the matched timestamp + ALL payload columns ride in ONE struct, so the
    # running last() picks the matched right row ATOMICALLY: a NULL payload
    # field inside the matched row stays NULL (it must not fall through to
    # an older row's value), and no two output columns can come from
    # different right rows.
    r = right.where(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        *([F.col(right_tiebreak).alias("_asof_tb")] if right_tiebreak else []),
        F.struct(
            F.col(on).alias("_t"), *[F.col(c) for c in value_cols]
        ).alias("_asof_payload"),
    )
    l = left.select(
        "*",
        F.col(on).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    asc = direction == "backward"
    order = [
        F.col("_asof_t").asc_nulls_first() if asc else F.col("_asof_t").desc_nulls_first(),
        F.col("_asof_side").asc(),
    ]
    if right_tiebreak:
        # right rows tying on _asof_t: the window's running last() keeps the
        # final one in sort order — ascending tiebreak makes that the max
        # (backward); forward flips the tiebreak so the min wins instead.
        # after _asof_side: it orders right rows among themselves; left rows
        # (null tiebreak) must still sort after every equal-ts right row.
        order.append(
            F.col("_asof_tb").asc_nulls_first()
            if asc
            else F.col("_asof_tb").desc_nulls_first()
        )
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    matched = u.select(
        "*",
        F.last("_asof_payload", ignorenulls=True).over(w).alias("_asof_hit"),
    ).where(F.col("_asof_side") == 1)

    hit = F.col("_asof_hit")
    if tolerance is not None:
        from tsdownsample_spark.operators.timeutil import seconds_between

        t_dtype = dict(left.dtypes)[on]
        delta = (
            seconds_between(F.col("_asof_t"), hit["_t"], t_dtype)
            if asc
            else seconds_between(hit["_t"], F.col("_asof_t"), t_dtype)
        )
        hit = F.when(delta <= F.lit(tolerance), F.col("_asof_hit"))

    keep = [F.col(c) for c in left.columns] + [hit["_t"].alias(matched_col)] + [
        hit[c].alias(c) for c in value_cols
    ]
    return matched.select(*keep)


def asof_snapshot(
    df: DataFrame,
    at,
    x_col: str = "ts",
    by: Sequence[str] = ("series_key",),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Point-in-time snapshot: the LATEST row of each ``by`` group with
    ``x_col <= at`` — "the state of every series as of T", the read-side
    primitive of slowly-changing state (SCD-2 current rows, last sensor
    reading at report time, the as-of self-lookup of a rollup tier).

    Spark-first shape: ``filter`` + ONE ``max_by`` hash aggregate — a
    map-side-combinable partial agg, so each executor ships exactly one
    candidate row per group it saw, never a per-group sort.  (The window
    ``row_number() = 1`` formulation — which the DuckDB oracle uses — is
    plan-shaped like a sort per group; the aggregate form is the 100 TB
    path and must produce the identical row, which is what the oracle
    row proves.)

    Determinism under duplicate timestamps: ``max_by`` alone breaks ties
    arbitrarily, so the ordering key is ``struct(x_col, *tiebreak)``
    (lexicographic struct comparison).  Pass a unique column (an event
    id) in ``tiebreak`` whenever ``(by, x_col)`` is not unique, exactly
    like the deterministic-ordering rules elsewhere in this engine.

    Returns one row per group present at-or-before ``at``, with the
    original columns of ``df``.  ``at=None`` skips the time filter —
    "the CURRENT state of every series", which is also the read-side
    merge of streaming/stream_snapshot.py's per-batch argmax partials
    (argmax is decomposable: the max-ordering row of appended partials
    is the max-ordering row of everything ingested).
    """
    by = list(by)
    if not by:
        raise ValueError("by must name at least one group column")
    tiebreak = list(tiebreak)
    if at is None:
        live = df
    else:
        t_dtype = dict(df.dtypes)[x_col]
        at_lit = (
            F.lit(at).cast("timestamp")
            if t_dtype.startswith("timestamp")
            else F.lit(at)
        )
        live = df.where(F.col(x_col) <= at_lit)
    payload = F.struct(*[F.col(c) for c in df.columns if c not in by])
    order = F.struct(F.col(x_col), *[F.col(c) for c in tiebreak])
    snap = live.groupBy(*by).agg(F.max_by(payload, order).alias("_snap"))
    keep = [F.col(c) for c in by] + [
        F.col("_snap")[c].alias(c) for c in df.columns if c not in by
    ]
    return snap.select(*keep)
