"""Text-analysis operators for training-data pipelines.

All computed with native Spark SQL expressions (JVM-side, whole-stage
codegen; no Python in the hot path) and deliberately built from primitives
with exact ANSI-SQL mirrors (split/length/replace/md5) so every operator is
oracle-checkable in DuckDB.

Heuristics are intentionally simple-and-deterministic (this layer feeds
100 TB bulk filtering, not benchmarks): counting stopword markers for
language ID, length/punctuation/stopword ratios for quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# occurrence markers per language, fixed priority order for ties
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}

STOPWORDS = [" the ", " a ", " and ", " of ", " to ", " in "]


def _occurrences(col: Column, marker: str) -> Column:
    """Non-overlapping occurrence count via length arithmetic (mirrors in any
    SQL dialect: (len(s) - len(replace(s, m, ''))) / len(m))."""
    return (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit("")))) / len(
        marker
    )


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_words, token_count (BPE-ish: ceil(len/4) per word), punct/stopword
    ratios, avg word length, and a deterministic quality score."""
    t = F.col(text_col)
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_occ = None
    for m in STOPWORDS:
        occ = _occurrences(padded, m)
        stop_occ = occ if stop_occ is None else stop_occ + occ
    out = (
        df.withColumn("n_chars_c", F.length(t))
        .withColumn("words", F.split(t, " "))
        .withColumn("n_words", F.size("words"))
        .withColumn(
            "token_count",
            F.expr(
                f"aggregate(split({text_col}, ' '), 0L,"
                " (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))"
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                (
                    F.length(t)
                    - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
                )
                / F.greatest(F.length(t), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(stop_occ / F.greatest(F.col("n_words"), F.lit(1)), 6),
        )
        .withColumn(
            "avg_word_len",
            F.round(
                (F.col("n_chars_c") - (F.col("n_words") - 1))
                / F.greatest(F.col("n_words"), F.lit(1)),
                6,
            ),
        )
    )
    quality = (
        F.lit(0.3) * (F.lit(1.0) - F.col("punct_ratio"))
        + F.lit(0.4) * F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
        + F.lit(0.3)
        * F.least(F.col("n_words").cast("double") / 64.0, F.lit(1.0))
    )
    return out.withColumn("quality_score", F.round(quality, 6)).drop("words")


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: count per-language marker hits in the
    lower-cased, space-padded text; highest count wins, fixed order breaks
    ties, zero hits -> 'und' (undetermined)."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (_occurrences(padded, m) for m in markers), start=F.lit(0.0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    df2 = df
    for lang, c in scores.items():
        df2 = df2.withColumn(f"score_{lang}", c)
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0.0)
    # iterate in REVERSE priority so earlier langs win ties (strict >)
    for lang in reversed(langs):
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return df2.withColumn(out_col, best).drop(*[f"score_{lang}" for lang in langs])


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two deterministic fingerprints: content hash prefix (exact identity)
    and a rolling min-shingle hash (MinHash with k=1; near-identity)."""
    shingles = _shingles_expr(text_col, 3)
    return df.withColumn(
        "fp_exact", F.substring(F.md5(F.lower(F.col(text_col))), 1, 16)
    ).withColumn(
        "fp_shingle",
        F.substring(F.expr(f"array_min(transform({shingles}, s -> md5(s)))"), 1, 16),
    )


def _shingles_expr(text_col: str, k: int) -> str:
    """SQL expression producing word k-gram shingles (whole text when the
    doc has fewer than k words).

    The word array is BOUND ONCE via a single-element transform lambda
    (``transform(array(split(..)), ws -> ..)``): higher-order-function
    bodies are interpreted per element, so the previous form re-ran
    ``split`` for every shingle — O(words^2) string work per document
    (r6 bench: 13-30 s walls at sf1.0 on every shingle consumer, 2-4x
    cut by this binding).  Same output, expression-only change."""
    return (
        f"element_at(transform(array(split({text_col}, ' ')), ws -> "
        f"CASE WHEN size(ws) < {k} THEN array({text_col}) "
        f"ELSE transform(sequence(0, size(ws) - {k}), "
        f"i -> concat_ws(' ', slice(ws, i + 1, {k}))) END), 1)"
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition metrics — the Gopher-rule family
    (Rae et al. 2021 §A1.1: repetitious documents are low-quality and
    over-weight n-grams during training).

    Adds per document:

    * ``dup_word_ratio``  = 1 - distinct_words / n_words
    * ``dup_2gram_ratio`` / ``dup_3gram_ratio`` — same over word n-grams
    * ``top_word_ratio``  = count of the most frequent word / n_words

    Zero shuffle — a narrow map in the same scan as the other quality
    gates.  r6 shape: the COUNTING (word/2-gram/3-gram distinct set
    sizes, top-word frequency) runs in a ``mapInPandas`` batch kernel
    (guide section 4.2 — Python hash sets over whole Arrow batches beat
    the interpreted JVM higher-order-function folds ~4x: 27.7 s -> ~7 s
    at sf1.0), while the RATIOS stay Catalyst expressions on the exact
    integer counts, so division and HALF_UP rounding are bit-identical
    to the previous JVM form and to the SQL oracle.  Docs with fewer
    than n words have exactly one n-gram (the whole text), so their dup
    ratio is 0 by construction; joining k-grams on ' ' is injective
    because split-on-' ' words cannot contain ' '.
    """
    t = text_col
    from pyspark.sql.types import LongType, StructField, StructType

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n_w, d1, d2, d3, topw = [], [], [], [], []
            for s in pdf[t]:
                if s is None:
                    n_w.append(None)
                    d1.append(None)
                    d2.append(None)
                    d3.append(None)
                    topw.append(None)
                    continue
                words = s.split(" ")
                n = len(words)
                n_w.append(n)
                d1.append(len(set(words)))
                d2.append(
                    len(set(zip(words, words[1:]))) if n >= 2 else 1
                )
                d3.append(
                    len(set(zip(words, words[1:], words[2:]))) if n >= 3 else 1
                )
                counts: dict = {}
                best = 0
                for w in words:
                    v = counts.get(w, 0) + 1
                    counts[w] = v
                    if v > best:
                        best = v
                topw.append(best)
            yield pdf.assign(
                _nw=pd.array(n_w, dtype="Int64"),
                _d1=pd.array(d1, dtype="Int64"),
                _d2=pd.array(d2, dtype="Int64"),
                _d3=pd.array(d3, dtype="Int64"),
                _topw=pd.array(topw, dtype="Int64"),
            )

    schema = StructType(
        list(df.schema.fields)
        + [StructField(c, LongType()) for c in ("_nw", "_d1", "_d2", "_d3", "_topw")]
    )
    counted = df.mapInPandas(kernel, schema)

    def ratio(d: str, denom) -> Column:
        return F.round(F.lit(1.0) - F.col(d) / denom, 6)

    # n-gram counts: a doc with fewer than k words has ONE k-gram (the
    # whole text), so the denominators mirror the gram-list lengths
    g2 = F.greatest(F.col("_nw") - 1, F.lit(1))
    g3 = F.greatest(F.col("_nw") - 2, F.lit(1))
    return (
        counted.withColumn("n_words", F.col("_nw").cast("int"))
        .withColumn("dup_word_ratio", ratio("_d1", F.col("_nw")))
        .withColumn("dup_2gram_ratio", ratio("_d2", g2))
        .withColumn("dup_3gram_ratio", ratio("_d3", g3))
        .withColumn(
            "top_word_ratio",
            F.round(
                F.col("_topw") / F.greatest(F.col("_nw"), F.lit(1)), 6
            ),
        )
        .drop("_nw", "_d1", "_d2", "_d3", "_topw")
    )


# PII patterns in the Java-regex ∩ RE2 portable subset (char classes,
# bounded repeats, ASCII \b) so the SAME pattern string runs unchanged in
# Spark (java.util.regex) and the DuckDB oracle (RE2).  Dict order IS the
# redaction order — earlier patterns see the original text, later ones see
# prior placeholders — and both engines must apply it identically.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII from ``text_col`` and count what was redacted.

    Adds ``out_col`` (default: replaces ``text_col``) with every pattern
    substituted by its placeholder, plus one ``n_<name>`` int column per
    pattern counting the matches that pattern actually redacted (counted
    on the text as it stood when that pattern ran — after earlier
    patterns' replacements, so overlapping patterns never double-count).

    Pure JVM expressions (chained ``regexp_replace`` +
    ``regexp_extract_all``) — whole-stage codegen, no Python in the plan;
    a narrow map with zero shuffle, which is the only acceptable cost for
    a full-corpus scrub pass at 100 TB.  SSN runs before the more general
    phone pattern; both run before IPv4 (dotted digit groups).
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or text_col
    for name in patterns:
        if f"n_{name}" in df.columns:
            raise ValueError(f"output column n_{name} already present")
    cur = F.col(text_col)
    counts = []
    for name, (pat, repl) in patterns.items():
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    keep = [c for c in df.columns if c != out_col]
    return df.select(*keep, cur.alias(out_col), *counts)
