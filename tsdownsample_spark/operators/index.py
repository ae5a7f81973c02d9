"""Inverted index: term -> sorted postings list of document ids.

The retrieval-side companion to the corpus statistics in
``operators/frequency.py`` — BM25/boolean search, contamination lookup,
and "which documents contain this token" debugging all start from this
structure.

Scale shape (the ORDER of stages is the whole design):

1. ``(doc, term)`` occurrences collapse to DISTINCT pairs first —
   map-side-combined, shuffle volume ∝ distinct pairs, never corpus
   occurrences.
2. ``doc_freq`` per term is counted on those distinct pairs (a second
   partial agg keyed by term).
3. The df gate (``min_df``/``max_df``) filters TERMS before any postings
   list is materialized.  This matters: a stopword's postings list at
   100 TB is itself ~#docs long, and building it only to drop it would
   shuffle and hold the single largest rows in the job.  The kept-terms
   set joins back onto the distinct pairs (AQE broadcasts it when small).
4. Only then ``collect_list`` builds postings, sorted for determinism.

``max_df``/``min_df`` accept an int (absolute document count) or a float
in (0, 1] (fraction of total documents, sklearn-style — scale-free, the
form a pipeline should use).  The fraction resolves against an in-plan
broadcast scalar count, no driver-side collect.

Per-term postings are bounded by ``max_df`` after the gate, so the
collect_list rows are bounded too; the term-key shuffle skew that remains
(moderately-common terms) is AQE territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdownsample_spark.plans.materialize import materialize_shared

__all__ = ["inverted_index"]


def inverted_index(
    df: DataFrame,
    doc_col: str,
    term_col: str,
    min_df: "int | float" = 1,
    max_df: "int | float | None" = None,
) -> DataFrame:
    """Build ``term_col, doc_freq, postings`` from exploded occurrences.

    ``postings`` is the ascending-sorted array of distinct ``doc_col``
    values containing the term; ``doc_freq`` its length.  NULL terms are
    dropped.  ``min_df``/``max_df`` bound doc_freq inclusively — ints are
    absolute counts, floats are fractions of the total distinct document
    count (resolved in-plan).
    """
    for c in ("doc_freq", "postings", "n_docs_"):
        if c in (doc_col, term_col):
            raise ValueError(f"reserved output column name {c!r} in input")
    for name, v in (("min_df", min_df), ("max_df", max_df)):
        if v is not None and isinstance(v, float) and not 0.0 < v <= 1.0:
            raise ValueError(f"fractional {name} must be in (0, 1], got {v}")
    # distinct (doc, term) feeds the frequency gate, the optional n_docs
    # scalar and the postings join; materialize once per invocation so the
    # occurrence stream collapses a single time (plans/materialize.py)
    pairs = materialize_shared(
        df.where(F.col(term_col).isNotNull())
        .select(doc_col, term_col)
        .distinct()
    )
    freq = pairs.groupBy(term_col).agg(F.count(F.lit(1)).alias("doc_freq"))
    needs_n = isinstance(min_df, float) or isinstance(max_df, float)
    if needs_n:
        ndocs = pairs.agg(
            F.countDistinct(doc_col).cast("double").alias("n_docs_")
        )
        freq = freq.join(F.broadcast(ndocs))

    def bound(v):
        return (
            F.ceil(F.lit(float(v)) * F.col("n_docs_")).cast("long")
            if isinstance(v, float)
            else F.lit(int(v))
        )

    kept = freq.where(F.col("doc_freq") >= bound(min_df))
    if max_df is not None:
        kept = kept.where(F.col("doc_freq") <= bound(max_df))
    kept = kept.select(term_col, "doc_freq")
    return (
        pairs.join(kept, term_col)
        .groupBy(term_col, "doc_freq")
        .agg(F.sort_array(F.collect_list(doc_col)).alias("postings"))
        .select(term_col, "doc_freq", "postings")
    )
