"""Column data-quality profiling: one-pass null/distinct/min-max summary.

The first question a 100 TB ingest asks of a new table — before dedup,
before curation — is "what is actually in these columns?": null fractions
(broken extractors), distinct cardinalities (is this an id, an enum, or a
constant?), min/max (range sanity, epoch-zero timestamps).  The reference
engine has no relational surface at all; this is the standard
profiling layer every warehouse grows (same family as Deequ/Great
Expectations profilers, re-expressed as one Catalyst aggregate).

Spark-first shape: ONE full-scan aggregate producing a single row with
every column's statistics side by side, then an in-plan ``stack`` unpivot
of that one row into one output row per column — no second scan, no
shuffle beyond the aggregate's own partial-combine tree.

Distinct counts: the default is ``approx_count_distinct`` (HyperLogLog++,
one pass, mergeable sketch — the only sane answer at 10^12 rows).
``exact=True`` switches to ``count_distinct``, which Catalyst plans via
EXPAND — the input is replicated once per distinct-aggregate column, so
profiling c columns exactly costs a c-fold map-side blowup before partial
aggregation collapses it.  Exact mode exists because audits and oracle
checks need it; the docstring is the warning label.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: every column) in one scan.

    Output: one row per column —
    ``(column, n_rows, n_nonnull, null_frac, n_distinct, min_str, max_str)``
    with ``n_distinct`` exact or HLL-approximate per ``exact`` and
    ``min_str``/``max_str`` the native-type min/max cast to string AFTER
    the fold (so numeric columns order numerically, not lexically).
    NULL-only columns yield NULL min/max and n_distinct 0.
    """
    names = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not names:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(names):
        aggs += [
            F.count(c).alias(f"_nn{i}"),
            F.min(c).cast("string").alias(f"_mn{i}"),
            F.max(c).cast("string").alias(f"_mx{i}"),
        ]
        if not exact:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"_d{i}"))
    one = df.agg(*aggs)
    if exact:
        # r6: one single-distinct aggregate per column, cross-joined as
        # 1-row broadcasts, instead of c distinct aggregates in ONE
        # aggregate — Catalyst plans the latter via EXPAND, replicating
        # the whole input c+1 times before partial aggregation (13.3 s at
        # sf1.0 -> ~3 s).  Each subtree scans ONLY its own column
        # (parquet column pruning per scan) and plans as a plain
        # two-level distinct; the independent stages run concurrently
        # inside the one job.
        for i, c in enumerate(names):
            d_i = df.select(c).agg(F.count_distinct(F.col(c)).alias(f"_d{i}"))
            one = one.join(F.broadcast(d_i))
    # stack the single stats row into one row per column, still in-plan
    parts = ", ".join(
        f"'{c}', _nn{i}, _d{i}, _mn{i}, _mx{i}" for i, c in enumerate(names)
    )
    return one.select(
        F.expr(
            f"stack({len(names)}, {parts}) AS "
            "(column, n_nonnull, n_distinct, min_str, max_str)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        "n_nonnull",
        (1.0 - F.col("n_nonnull") / F.col("n_rows")).alias("null_frac"),
        "n_distinct",
        "min_str",
        "max_str",
    )
