"""Deterministic sampling / splitting for training-data pipelines.

All three operators key on a stable hash of an id column (md5 prefix →
uint32), so results are reproducible across runs, clusters, and engines —
the property that makes train/test splits auditable.  None of them uses
Spark's ``sample()`` (seed-dependent per-partition RNG, not stable under
repartitioning).

``hash_sample``
    Keep rows whose hash falls below ``fraction`` of the hash space.
    Pure projection + filter: NO shuffle, pushes down past column pruning,
    and the same row set is selected no matter how the data is
    partitioned — the 100 TB way to cut a corpus down.

``split_assign``
    Label every row train/val/test (arbitrary named weights) by hash
    range.  Pure projection; a row's split never changes when the corpus
    grows (hash ranges are fixed), which is exactly what leakage audits
    require.

``quota_sample``
    Exactly ``quota`` rows per group (e.g. per source), chosen as the
    lowest-hash rows — deterministic "mixture sampling" for dataset
    recipes.  One window shuffle on the group key; ties broken by the id
    itself so the result is total-order stable.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32


def _hash32(key_col: str, seed: str) -> F.Column:
    """Stable uint32 from md5 — the same arithmetic is expressible in any
    engine with md5/substr/conv (DuckDB oracle uses CAST('0x'||... )."""
    s = F.concat(F.col(key_col).cast("string"), F.lit(":"), F.lit(seed))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def hash_sample(
    df: DataFrame, fraction: float, key: str = "doc_id", seed: str = "0"
) -> DataFrame:
    """Deterministic ~``fraction`` subsample: keep rows with
    ``hash32(key) < fraction * 2^32``.  Shuffle-free."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _HASH_SPACE)
    return df.where(_hash32(key, seed) < F.lit(threshold))


def split_assign(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    key: str = "doc_id",
    seed: str = "0",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` assigning each row to a named split by fixed
    hash ranges.  Weight order is the mapping's iteration order; integer
    thresholds are precomputed so both engines compare exactly."""
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hash32(key, seed)
    acc = 0.0
    names = list(weights)
    col = F.lit(names[-1])  # last split takes the hash-space remainder
    # build CASE from the end so the first matching range wins
    cases = []
    for name in names[:-1]:
        acc += weights[name] / total
        cases.append((int(acc * _HASH_SPACE), name))
    for threshold, name in reversed(cases):
        col = F.when(h < F.lit(threshold), F.lit(name)).otherwise(col)
    return df.withColumn(split_col, col)


def quota_sample(
    df: DataFrame,
    quota: int,
    by: str = "source",
    key: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Exactly ``min(quota, group size)`` rows per group: the lowest-hash
    rows, ties broken by ``key``.  One window shuffle on ``by``."""
    if quota < 0:
        raise ValueError(f"quota must be non-negative, got {quota}")
    w = Window.partitionBy(by).orderBy(_hash32(key, seed), F.col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int | Mapping[str, int],
    by: str = "source",
    weight: str = "n_tok",
    key: str = "doc_id",
    seed: str = "0",
    cum_col: str = "cum_w",
) -> DataFrame:
    """Mixture sampling by TOKEN budget, not row count: per group (``by``),
    keep the longest deterministic hash-ordered prefix whose cumulative
    ``weight`` stays within the group's budget — how a dataset recipe
    ("30 B tokens of web, 5 B of code") is actually filled, since document
    lengths vary by orders of magnitude and a row quota cannot hit a token
    target.

    ``budget`` is one int for every group or a mapping group -> budget
    (groups absent from the mapping contribute nothing).  Selection is a
    strict PREFIX rule: rows ordered by (hash32(key), key), kept while the
    running total INCLUDING the row stays <= budget — never overshoots,
    stops at the first row that would; deterministic and engine-portable
    like the other samplers here (no Spark sample(), no RNG).  The output
    carries ``cum_col`` (the running total) for auditability.

    Scale shape: ONE window shuffle on the group key (same as
    :func:`quota_sample`); the prefix sum is a running aggregate, state
    O(1) per task.  Mixtures with very few groups and 10^12 rows should
    salt the group key upstream or pre-aggregate per (group, hash-bucket)
    — the same skew note as any per-source window.
    """
    if isinstance(budget, Mapping):
        b = F.lit(None).cast("long")
        for name, v in budget.items():
            if v < 0:
                raise ValueError(f"budget must be non-negative, got {v} for {name!r}")
            b = F.when(F.col(by) == F.lit(name), F.lit(int(v))).otherwise(b)
        b = F.coalesce(b, F.lit(0))
    else:
        if budget < 0:
            raise ValueError(f"budget must be non-negative, got {budget}")
        b = F.lit(int(budget))
    w = (
        Window.partitionBy(by)
        .orderBy(_hash32(key, seed), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(cum_col, F.sum(F.col(weight)).over(w))
        .where(F.col(cum_col) <= b)
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    by: str = "source",
    key: str = "doc_id",
    seed: str = "0",
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-flattened source mixture (the multilingual-LM sampling
    recipe: raise each source's share ``p_s`` to ``alpha`` < 1 and
    renormalize, so small sources are upweighted relative to their size
    without duplication).

    Per-source keep-rate ``r_s = min(1, target_frac * N * q_s / n_s)``
    with ``q_s = n_s^alpha / sum(n^alpha)``; each row kept by the same
    deterministic hash rule as :func:`hash_sample` (engine-portable,
    repartition-stable).  The min(1, .) cap is the standard single-pass
    compromise: a source whose temperature share exceeds its actual size
    keeps everything (sampling cannot exceed 1x without duplication), so
    the realized total undershoots ``target_frac * N`` when caps bind —
    callers wanting exact totals renormalize over the uncapped sources or
    duplicate (epoch) the capped ones.

    Scale shape: ONE tiny groupBy on the source key; the rates side
    (|sources| rows) broadcast-joins back; the keep decision is a pure
    projection + filter on the fact side — no fact-side shuffle at all.
    Adds ``keep_rate`` for auditability.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 < target_frac <= 1.0):
        raise ValueError(f"target_frac must be in (0, 1], got {target_frac}")
    counts = df.groupBy(by).agg(F.count("*").alias("_n"))
    # global sums via an empty-partition window over the TINY counts side
    # (|sources| rows — one single-partition exchange of a dimension, not a
    # fact-side shuffle; also avoids the counts-joined-with-agg-of-counts
    # self-join attribute ambiguity).  Names must differ by more than case:
    # Spark resolution is case-insensitive, so "_N" would OVERWRITE "_n".
    w_all = Window.partitionBy()
    pw = F.pow(F.col("_n").cast("double"), F.lit(alpha))
    rates = (
        counts.withColumn("_tot_n", F.sum("_n").over(w_all))
        .withColumn("_tot_z", F.sum(pw).over(w_all))
        .withColumn("_q", pw / F.col("_tot_z"))
        .withColumn(
            "keep_rate",
            F.least(
                F.lit(1.0),
                F.lit(target_frac) * F.col("_tot_n") * F.col("_q") / F.col("_n"),
            ),
        )
        .select(by, "keep_rate")
    )
    thr = F.floor(F.col("keep_rate") * F.lit(float(_HASH_SPACE))).cast("bigint")
    return df.join(F.broadcast(rates), on=by, how="inner").where(
        _hash32(key, seed) < thr
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key: str = "doc_id",
    by: str | None = None,
    seed: str = "0",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: top-``k`` rows
    (per ``by`` stratum, or global) by the Efraimidis–Spirakis exponential
    key ``ln(u) / w`` with ``u = (hash32(key) + 0.5) / 2^32`` — each row's
    inclusion probability is proportional to its weight, exactly the A-ES
    reservoir scheme (Efraimidis & Spirakis 2006, public) with the random
    draw replaced by the engine's stable md5 hash, so re-runs, engines,
    and retries all agree row for row.  The quality-weighted subcorpus
    draw ("sample 1M docs ∝ quality score") that follows curation.

    100 TB shape: scoring is a shuffle-free narrow map.  The global form
    goes through ``orderBy(...).limit(k)`` — Spark plans
    TakeOrderedAndProject, a map-side partial top-k per partition merged
    on ONE k-sized heap, never a full sort.  The stratified form uses a
    per-stratum rank window (shuffle keyed on the stratum).  The sample
    key is rounded to 6 decimals BEFORE ranking (the tfidf convention) so
    cross-engine ln() ulp noise cannot flip an ordering; ties break on
    the id.  Rows with NULL or non-positive weight are excluded (they
    have zero inclusion probability by definition).

    Output: input columns + ``samp_key`` (the rounded sort key).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if "samp_key" in df.columns:
        raise ValueError("reserved output column name 'samp_key' in input")
    u = (_hash32(key, seed) + F.lit(0.5)) / F.lit(float(_HASH_SPACE))
    skey = F.round(F.log(u) / F.col(weight_col), 6)
    scored = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("samp_key", skey)
    )
    if by is None:
        return scored.orderBy(
            F.col("samp_key").desc(), F.col(key).asc()
        ).limit(k)
    w = Window.partitionBy(by).orderBy(
        F.col("samp_key").desc(), F.col(key).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
