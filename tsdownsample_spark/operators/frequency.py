"""Heavy hitters: exact top-k most frequent values of a column per group.

A 100 TB training-data pipeline asks this constantly — most frequent
tokens / n-grams / domains / fingerprints per source or language — and it
is the corpus-statistics dual of the dedup family (operators/dedup.py
finds repeated DOCUMENTS; this finds repeated VALUES).

Spark-first shape, two stages both of which Catalyst executes with
map-side partial aggregation:

1. ``groupBy(by + value).count()`` — the heavy stage.  Whole-stage
   codegen hash aggregation with partial combine, so each executor ships
   one row per DISTINCT (group, value) it saw, not one per occurrence;
   the shuffle volume is the distinct cardinality, not the corpus size.
2. ``row_number`` over ``partitionBy(by).orderBy(count desc, value asc)``
   filtered to ``<= k`` — runs on the (already aggregated) distinct rows
   only.  The deterministic value tiebreak makes top-k reproducible under
   ties, which the DuckDB oracle requires and a re-run audit appreciates.

For group cardinalities so hot that even distinct values of one group
overwhelm a partition (the Zipf head of a web corpus), AQE's skew
handling splits stage 1; stage 2's window is bounded by distinct values
per group.  An approximate path (count-min / ``freqItems``) deliberately
does not live here: the exact form is oracle-checkable and the partial
agg already removes the scale pressure the sketch would address.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsdownsample_spark.plans.materialize import materialize_shared

__all__ = [
    "heavy_hitters",
    "tfidf_topk",
    "bigram_pairs",
    "lm_crossentropy",
    "ngram_novelty",
    "pmi_collocations",
    "unigram_entropy",
    "zipf_slope",
]


def heavy_hitters(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    k: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-``k`` most frequent ``col`` values per ``by`` group.

    Returns ``by + [col, freq, rank]`` with ``rank`` 1-based in frequency
    order (ties broken by ascending value — deterministic).  ``weight_col``
    switches from row counting to summing a weight (e.g. ``n_tok`` to rank
    by token mass instead of document count); NULL weights count as 0 via
    sum semantics, NULL values of ``col`` are dropped (a "most frequent
    NULL" is a data-quality question, not a frequency one).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    by = list(by)
    for c in ("freq", "rank"):
        if c in (*by, col):
            raise ValueError(f"reserved output column name {c!r} in input")
    freq = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).alias("freq")
    counts = (
        df.where(F.col(col).isNotNull()).groupBy(*by, col).agg(freq)
    )
    w = Window.partitionBy(*by).orderBy(F.col("freq").desc(), F.col(col).asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def tfidf_topk(
    df: DataFrame,
    doc_col: str,
    term_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    Input is the exploded (document, term) shape — one row per term
    OCCURRENCE.  Output: ``doc_col, term_col, tf, doc_freq, score, rank``
    with ``score = tf * (ln((N+1)/(doc_freq+1)) + 1)`` (sklearn's
    ``smooth_idf``; N = distinct documents), rounded to 6 decimals, and
    ``rank`` tie-broken by ascending term.  NULL terms are dropped.

    Plan shape at scale: the occurrence stream collapses FIRST via a
    map-side-combined ``groupBy(doc, term).count()`` — everything after
    runs on distinct (doc, term) cardinality, never corpus size.
    ``doc_freq`` is a second partial-agg over those distinct rows keyed by
    term, joined back on the term key (both sides already
    distinct-cardinality; AQE broadcasts it while the vocabulary is small
    and falls back to a hash join on the term key when it is not — a web
    corpus vocabulary can itself be billions of rows, so this join is NOT
    hard-wired broadcast).  N rides in as a broadcast 1-row cross join,
    staying inside the plan — no driver-side collect.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for c in ("tf", "doc_freq", "score", "rank", "n_docs"):
        if c in (doc_col, term_col):
            raise ValueError(f"reserved output column name {c!r} in input")
    occ = df.where(F.col(term_col).isNotNull()).select(doc_col, term_col)
    # tf (distinct doc-term cardinality) feeds dfreq, n_docs and the score
    # join; materialized once so the occurrence explode runs a single time.
    # n_docs over tf equals n_docs over occ by construction (a doc appears
    # in tf iff it has >= 1 non-null term occurrence).
    tf = materialize_shared(
        occ.groupBy(doc_col, term_col).agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy(term_col).agg(F.count(F.lit(1)).alias("doc_freq"))
    ndocs = tf.agg(F.countDistinct(doc_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, term_col)
        .join(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1))
                        / (F.col("doc_freq") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(doc_col).orderBy(
        F.col("score").desc(), F.col(term_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(doc_col, term_col, "tf", "doc_freq", "score", "rank")
    )


def bigram_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One ``(<id_col>, w1, w2)`` row per adjacent word pair — the shared
    derivation under the bigram LM table and :func:`lm_crossentropy`.
    The pair structs are built INSIDE one expression per doc row; only
    (w1, w2) pairs explode, never the word array itself."""
    # words bound ONCE via the single-element transform lambda: HOF bodies
    # are interpreted per element, so an inline split would re-tokenize the
    # doc per pair — O(words^2) per row (the r6 bigram walls, 23 s -> ~6 s
    # at sf1.0 from this binding alone)
    pairs_expr = (
        f"element_at(transform(array(split({text_col}, ' ')), ws -> "
        f"CASE WHEN size(ws) < 2 THEN array() "
        f"ELSE transform(sequence(1, size(ws) - 1), "
        f"i -> struct(element_at(ws, i) AS w1, "
        f"element_at(ws, i + 1) AS w2)) END), 1)"
    )
    return df.select(F.col(id_col), F.explode(F.expr(pairs_expr)).alias("bg")).select(
        id_col, "bg.w1", "bg.w2"
    )


def lm_crossentropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-alpha bigram
    LM — the classic perplexity-style quality signal (low = templated /
    repetitive, high = out-of-distribution noise; both tails are what a
    curation pass inspects).

    P(w2|w1) = (c(w1,w2) + alpha) / (c(w1,·) + alpha·V), V = distinct
    successor vocabulary; xent(doc) = -mean log P over its bigrams.
    Documents with < 2 words get ``n_bigrams = 0`` and NULL ``xent``.

    Scale shape: the LM is a partial-agg groupBy of the SAME exploded
    bigram rows (shuffle ∝ distinct bigrams, the heavy-hitters shape);
    scoring meets the LM in one equi-join on the (w1, w2) key and the
    head totals on w1 — both plain shuffle joins AQE can skew-split on
    the Zipf head, never a corpus broadcast.  V is a one-row aggregate
    cross-joined in (bounded, broadcast).  No Python in the plan.
    """
    bg = bigram_pairs(df, text_col=text_col, id_col=id_col)
    lm = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    heads = lm.groupBy("w1").agg(F.sum("c").alias("tot"))
    vocab = bg.agg(F.countDistinct("w2").alias("v"))
    p = (F.col("c") + F.lit(alpha)) / (F.col("tot") + F.lit(alpha) * F.col("v"))
    scored = (
        bg.join(lm, ["w1", "w2"])  # every doc bigram exists in the LM
        .join(heads, "w1")
        .crossJoin(vocab)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg(F.log(p)), 6).alias("xent"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "xent",
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 100,
    shingle: int = 3,
) -> DataFrame:
    """Novelty curve of a growing corpus: bucket documents into ingest
    batches (``batch = id div batch_size`` — deterministic ingestion
    order) and report, per batch, what fraction of its DISTINCT word
    k-gram shingles have never been seen in any earlier batch.  This is
    the diminishing-returns diagnostic of corpus growth (each crawl
    snapshot contributes fewer new n-grams than the last) and the
    batch-granular twin of train/eval decontamination: a batch whose
    novelty collapses toward 0 is re-crawling what the corpus already
    holds.

    100 TB shape: explode -> groupBy(shingle, batch) distinct pairs (the
    ONLY corpus-sized stage, map-side combinable, shuffle ∝ distinct
    (shingle, batch) — bounded by vocabulary growth, not tokens); the
    first-seen batch is a min() window partitioned BY SHINGLE (tiny
    partitions — one row per batch the shingle appears in), then one
    batch-cardinality groupBy.  No joins, zero Python.
    Output: (batch, n_shingles, n_new, novelty) — novelty = n_new/n_shingles.
    """
    from tsdownsample_spark.operators.text import _shingles_expr

    pairs = (
        df.select(
            F.expr(f"cast({id_col} as long) div {int(batch_size)}").alias(
                "batch"
            ),
            F.explode(F.expr(_shingles_expr(text_col, shingle))).alias("sh"),
        )
        .groupBy("sh", "batch")
        .agg(F.lit(1).alias("_one"))
    )
    first = pairs.withColumn(
        "_first", F.min("batch").over(Window.partitionBy("sh"))
    )
    return (
        first.groupBy("batch")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("batch") == F.col("_first")).cast("long")).alias(
                "n_new"
            ),
        )
        .withColumn("novelty", F.col("n_new") / F.col("n_shingles"))
        .select("batch", "n_shingles", "n_new", "novelty")
    )


def unigram_entropy(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Shannon entropy (bits) of the value distribution of ``col`` per
    ``by`` group — for token columns, the unigram entropy that corpus
    curation tracks per source/language: collapsing diversity (entropy
    drop) flags template spam or a scraper stuck in a loop, and the
    entropy-per-token budget feeds mixture design next to q_temp_mix's
    n^alpha rates.

    100 TB shape: ONE distinct-count groupBy (map-side partial combine —
    shuffle is the distinct (group, value) cardinality, never occurrences),
    then the per-group fold via the identity
    ``H = log2(N) - (1/N) * sum(c * log2(c))`` — algebraically equal to
    ``-sum(p log2 p)`` but computable from raw counts in one aggregation
    without materializing probabilities (no second pass for N, no join).
    Zero Python.  NULL values are excluded (their mass is a data-quality
    question, not a distribution one).

    Output: ``by + (n_values, n_distinct, entropy_bits)``; a single-valued
    group yields exactly 0.0.
    """
    by = list(by)
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(*by, col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    n = F.sum("_c")
    return counts.groupBy(*by).agg(
        n.alias("n_values"),
        F.count(F.lit(1)).alias("n_distinct"),
        (
            F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n
        ).alias("entropy_bits"),
    )


def zipf_slope(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    max_rank: int | None = None,
) -> DataFrame:
    """Zipf rank-frequency fit per group: least-squares slope/intercept/R²
    of ``ln(freq)`` against ``ln(rank)`` over the frequency-ranked distinct
    values of ``col``.  Natural text sits near slope -1 (Zipf's law,
    public); machine-generated or deduplicated-to-death corpora drift
    flat (slope -> 0) or cliff off — a one-number corpus-health check per
    source that pairs with unigram_entropy.

    100 TB shape: the same ONE distinct-count groupBy as heavy_hitters
    (shuffle = distinct cardinality), a rank window over the already
    aggregated distinct rows (count desc, value asc — deterministic under
    ties), then ANSI ``regr_slope/regr_intercept/regr_r2`` folds.
    ``max_rank`` truncates the fit to the head (the classic practice:
    the tail bends below the power law) with a plain filter.  Zero Python.

    Output: ``by + (slope, intercept, r2, n_ranks)``.
    """
    by = list(by)
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(*by, col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy(*by).orderBy(F.col("freq").desc(), F.col(col).asc())
    ranked = counts.withColumn("rank", F.row_number().over(w))
    if max_rank is not None:
        if max_rank < 3:
            raise ValueError(f"max_rank must be >= 3, got {max_rank}")
        ranked = ranked.where(F.col("rank") <= max_rank)
    return ranked.groupBy(*by).agg(
        F.expr("regr_slope(ln(cast(freq as double)), ln(cast(rank as double)))").alias("slope"),
        F.expr("regr_intercept(ln(cast(freq as double)), ln(cast(rank as double)))").alias("intercept"),
        F.expr("regr_r2(ln(cast(freq as double)), ln(cast(rank as double)))").alias("r2"),
        F.count(F.lit(1)).alias("n_ranks"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    by: str | None = None,
    min_count: int = 5,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` collocations per group by pointwise mutual information:
    ``pmi = ln(c_ab * N / (c_a * c_b))`` with ``c_ab`` adjacent-pair
    counts, ``c_a``/``c_b`` the word's occurrences as left/right member of
    any pair, and ``N`` total pairs — the contingency-table PMI (Church &
    Hanks 1990, public).  The phrase detector used to promote "new york" /
    "machine learning" to single tokens before BPE training; ``min_count``
    kills the PMI-of-rare-words artifact (two hapaxes adjacent once score
    arbitrarily high).

    100 TB shape: pairs never materialize per word — one in-expression
    struct build per doc row (:func:`bigram_pairs`), then THREE
    distinct-cardinality groupBys (pairs, left margins, right margins) and
    two equi-joins of margins ONTO the min_count-filtered pair table
    (margins are vocabulary-sized — AQE broadcasts); N folds map-side.
    Rank is a window over the already-filtered pair counts.  Zero Python.

    Output: ``([by] + w1, w2, c_ab, pmi, rank)``.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    grp = [by] if by is not None else []
    pairs = bigram_pairs(
        df.select(*grp, text_col) if by else df, text_col=text_col,
        id_col=by if by else df.columns[0],
    )
    if not by:
        pairs = pairs.select("w1", "w2")
    # cab feeds FOUR consumers (totals, left, right, the scored base) and
    # Catalyst re-runs the doc scan + bigram explode + count per consumer;
    # materialize it once per invocation (plans/materialize.py) — it is
    # distinct-bigram cardinality, never corpus size
    cab = materialize_shared(
        pairs.groupBy(*grp, "w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    )
    totals = cab.groupBy(*grp).agg(F.sum("c_ab").alias("_n"))
    left = cab.groupBy(*grp, "w1").agg(F.sum("c_ab").alias("_ca"))
    right = cab.groupBy(*grp, "w2").agg(F.sum("c_ab").alias("_cb"))
    scored = (
        cab.where(F.col("c_ab") >= min_count)
        .join(left, on=grp + ["w1"], how="inner")
        .join(right, on=grp + ["w2"], how="inner")
        .join(totals, on=grp, how="inner") if grp else
        cab.where(F.col("c_ab") >= min_count)
        .join(left, on=["w1"], how="inner")
        .join(right, on=["w2"], how="inner")
        .crossJoin(F.broadcast(totals))
    )
    scored = scored.withColumn(
        "pmi",
        F.log(
            F.col("c_ab").cast("double") * F.col("_n")
            / (F.col("_ca").cast("double") * F.col("_cb"))
        ),
    )
    w = Window.partitionBy(*grp).orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(*grp, "w1", "w2", "c_ab", "pmi", "rank")
    )
