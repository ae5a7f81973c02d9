"""Distribution divergence between corpus slices: pairwise Jensen–Shannon.

Training-data work constantly compares token distributions — is this
crawl snapshot drifting from the last one, how far is source A's unigram
mix from source B's, did the dedup pass change the mixture.  JS
divergence is the standard symmetric, bounded ([0, ln 2]) answer.

Scale shape: the only corpus-sized stage is the map-side-combined
``(dist, term)`` count.  Per-distribution probabilities need each term's
count over the distribution's total — the totals table is k rows (one
per distribution), an explicit broadcast.  The pairwise stage joins the
probability table to itself ON THE TERM KEY — work ∝ vocab x k², never
corpus size, and the term key spreads the vocabulary across the cluster
(no per-pair repartition).  Terms present in one distribution but not
the other NEVER materialize as zero-filled rows (a dense dist x vocab
grid is exactly what does not scale): their closed-form contribution is
``(1 - shared_mass) * ln2 / 2``, recovered from the inner join's shared
masses — the identity

    JS(P, Q) = [ Σ_shared p·ln(2p/(p+q)) + q·ln(2q/(p+q))
                 + (1 - Σ_shared p)·ln2 + (1 - Σ_shared q)·ln2 ] / 2

(a term with q=0 contributes p·ln(2p/p) = p·ln2, and vice versa).

The DuckDB oracle (queries_text.py) deliberately evaluates the OTHER
formulation — the dense COALESCE-zero grid over dist x vocab — so the
two engines agree on the number through genuinely different algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["js_divergence"]


def js_divergence(
    df: DataFrame,
    dist_col: str,
    term_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (natural log) between the
    ``term_col`` distributions of every two values of ``dist_col``.

    Input is the exploded occurrence shape (one row per term occurrence;
    ``weight_col`` switches to weighted mass).  Returns one row per
    unordered pair: ``dist_a, dist_b, js_div, n_shared_terms`` with
    ``dist_a < dist_b``, ``js_div`` rounded to 6 decimals.  NULL terms
    are dropped; pairs with no shared terms read exactly ``round(ln 2,
    6)``.
    """
    for c in ("dist_a", "dist_b", "js_div", "n_shared_terms"):
        if c in (dist_col, term_col):
            raise ValueError(f"reserved output column name {c!r} in input")
    w = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).alias("c")
    counts = (
        df.where(F.col(term_col).isNotNull())
        .groupBy(dist_col, term_col)
        .agg(w)
    )
    totals = counts.groupBy(dist_col).agg(F.sum("c").alias("tot"))
    p = counts.join(F.broadcast(totals), dist_col).select(
        F.col(dist_col).alias("d"),
        F.col(term_col).alias("t"),
        (F.col("c").cast("double") / F.col("tot")).alias("p"),
    )
    a, b = p.alias("a"), p.alias("b")
    shared = a.join(
        b,
        (F.col("a.t") == F.col("b.t")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.d").alias("dist_a"),
        F.col("b.d").alias("dist_b"),
        F.col("a.p").alias("pa"),
        F.col("b.p").alias("pb"),
    )
    m2 = F.col("pa") + F.col("pb")  # 2m
    agg = shared.groupBy("dist_a", "dist_b").agg(
        F.sum(
            F.col("pa") * F.log(F.lit(2.0) * F.col("pa") / m2)
            + F.col("pb") * F.log(F.lit(2.0) * F.col("pb") / m2)
        ).alias("shared_sum"),
        F.sum("pa").alias("mass_a"),
        F.sum("pb").alias("mass_b"),
        F.count(F.lit(1)).alias("n_shared_terms"),
    )
    # every unordered pair, so disjoint-vocabulary pairs still get a row
    # (k² rows — tiny; no broadcast hint: Spark can't broadcast-build the
    # streamed left side of a left join, and AQE right-sizes this anyway)
    ta = totals.select(F.col(dist_col).alias("dist_a"))
    tb = totals.select(F.col(dist_col).alias("dist_b"))
    all_pairs = ta.join(tb, F.col("dist_a") < F.col("dist_b"))
    ln2 = F.log(F.lit(2.0))
    js = (
        F.coalesce(F.col("shared_sum"), F.lit(0.0))
        + (F.lit(1.0) - F.coalesce(F.col("mass_a"), F.lit(0.0))) * ln2
        + (F.lit(1.0) - F.coalesce(F.col("mass_b"), F.lit(0.0))) * ln2
    ) / F.lit(2.0)
    return (
        all_pairs.join(agg, ["dist_a", "dist_b"], "left")
        .select(
            "dist_a",
            "dist_b",
            F.round(js, 6).alias("js_div"),
            F.coalesce(F.col("n_shared_terms"), F.lit(0)).cast("long")
                .alias("n_shared_terms"),
        )
    )
