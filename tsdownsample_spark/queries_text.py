"""Training-data-pipeline queries (text analysis, dedup, similarity,
tokenization) + exact DuckDB oracles.

The Spark side always runs the engine operators (operators/text.py,
dedup.py, similarity.py); the oracle re-derives the same result in ANSI
SQL from the md5/split/length primitives both engines share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdownsample_spark.operators.dedup import (
    dedup_exact,
    containment_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_clusters,
    simhash,
)
from tsdownsample_spark.operators.similarity import (
    bucket_expr,
    cosine_topk,
    lsh_ann_topk,
    lsh_planes,
)
from tsdownsample_spark.operators.text import lang_id, text_features

# ---------------------------------------------------------------- helpers

_DUCK_SHINGLES = (
    "CASE WHEN len(string_split(text, ' ')) < 3 THEN [text] "
    "ELSE list_transform(range(len(string_split(text, ' ')) - 2), "
    "i -> array_to_string(string_split(text, ' ')[i + 1 : i + 3], ' ')) END"
)


def _load(spark, sf_dir, name):
    from tsdownsample_spark.queries import load

    return load(spark, sf_dir, name)


def _load_wide(spark, sf_dir, name):
    """Like _load, but spread rows across cores: these tables are tiny in
    bytes yet md5/expression-heavy per row, so byte-based scan splitting
    would hand all the CPU work to one task."""
    df = _load(spark, sf_dir, name)
    return df.repartition(2 * spark.sparkContext.defaultParallelism)


# ------------------------------------------------------------ text features


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    return text_features(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "token_count",
        "punct_ratio",
        "stopword_ratio",
        "avg_word_len",
        "quality_score",
    )


_ORACLE_TEXT_FEATURES = """
WITH base AS (
    SELECT doc_id, text,
           length(text) AS n_chars_c,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           ' ' || lower(text) || ' ' AS padded
    FROM documents
),
feat AS (
    SELECT doc_id, n_words,
        -- DuckDB list_sum materializes as HUGEINT/double; pin to BIGINT so
        -- the driver's value-hash sees '3', not '3.0' (CORRECTNESS_r01 fix)
        CAST(list_sum(list_transform(string_split(text, ' '),
                 w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS token_count,
        ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
              / greatest(length(text), 1), 6) AS punct_ratio,
        ROUND((
            (length(padded) - length(replace(padded, ' the ', ''))) / 5.0
          + (length(padded) - length(replace(padded, ' a ', ''))) / 3.0
          + (length(padded) - length(replace(padded, ' and ', ''))) / 5.0
          + (length(padded) - length(replace(padded, ' of ', ''))) / 4.0
          + (length(padded) - length(replace(padded, ' to ', ''))) / 4.0
          + (length(padded) - length(replace(padded, ' in ', ''))) / 4.0
        ) / greatest(n_words, 1), 6) AS stopword_ratio,
        ROUND((n_chars_c - (n_words - 1)) / greatest(n_words, 1), 6) AS avg_word_len
    FROM base
)
SELECT doc_id, n_words, token_count, punct_ratio, stopword_ratio, avg_word_len,
       ROUND(0.3 * (1.0 - punct_ratio)
           + 0.4 * least(stopword_ratio * 4.0, 1.0)
           + 0.3 * least(CAST(n_words AS DOUBLE) / 64.0, 1.0), 6) AS quality_score
FROM feat
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    return lang_id(docs).select("doc_id", "lang_pred")


def _occ(m: str) -> str:
    return f"(length(padded) - length(replace(padded, '{m}', ''))) / {len(m)}.0"


_ORACLE_LANG_ID = f"""
WITH s AS (
    SELECT doc_id, ' ' || lower(text) || ' ' AS padded FROM documents
),
sc AS (
    SELECT doc_id,
        {_occ(' the ')} + {_occ(' and ')} + {_occ(' of ')} AS s_en,
        {_occ(' der ')} + {_occ(' und ')} + {_occ(' die ')} AS s_de,
        {_occ(' le ')} + {_occ(' et ')} + {_occ(' les ')} AS s_fr,
        {_occ(' el ')} + {_occ(' y ')} + {_occ(' los ')} AS s_es
    FROM s
)
SELECT doc_id,
    CASE WHEN s_es > 0 AND s_es >= greatest(s_fr, s_de, s_en) THEN 'es'
         WHEN s_fr > 0 AND s_fr >= greatest(s_de, s_en) THEN 'fr'
         WHEN s_de > 0 AND s_de >= s_en THEN 'de'
         WHEN s_en > 0 THEN 'en'
         ELSE 'und' END AS lang_pred
FROM sc
"""


# ------------------------------------------------------------------- dedup


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    return dedup_exact(docs)


_ORACLE_DEDUP_EXACT = """
SELECT doc_id, md5(text) AS content_hash,
       COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
FROM documents
"""

def _duck_sig(k: int = 16) -> str:
    """Mirror of minhash_signatures: one md5 -> 32-bit base, k universal
    hashes (same A/B/P constants as the Spark operator)."""
    from tsdownsample_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = (
        "list_transform(" + _DUCK_SHINGLES + ", s -> "
        "CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT))"
    )
    mins = ", ".join(
        f"list_min(list_transform(_b, b -> ({MINHASH_A[j]} * b + {MINHASH_B[j]}) % {MINHASH_P}))"
        for j in range(k)
    )
    return base, mins


_DUCK_BASE, _DUCK_MINS = _duck_sig(16)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    sig = minhash_signatures(docs, k=16)
    return lsh_candidate_pairs(sig, bands=4, rows=4)


_ORACLE_MINHASH_LSH = f"""
WITH bases AS (
    SELECT doc_id, {_DUCK_BASE} AS _b FROM documents
),
sig AS (
    SELECT doc_id, [{_DUCK_MINS}] AS sig FROM bases
),
banded AS (
    SELECT doc_id, b AS band_idx,
           md5(array_to_string(sig[b * 4 + 1 : b * 4 + 4], '|')) AS band_hash
    FROM sig, UNNEST(range(4)) AS t(b)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    sig = minhash_signatures(docs, k=16)
    pairs = lsh_candidate_pairs(sig, bands=4, rows=4)
    return jaccard_pairs(docs, pairs)


_ORACLE_JACCARD = f"""
WITH bases AS (
    SELECT doc_id, {_DUCK_BASE} AS _b FROM documents
),
sig AS (
    SELECT doc_id, [{_DUCK_MINS}] AS sig FROM bases
),
banded AS (
    SELECT doc_id, b AS band_idx,
           md5(array_to_string(sig[b * 4 + 1 : b * 4 + 4], '|')) AS band_hash
    FROM sig, UNNEST(range(4)) AS t(b)
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
sh AS (
    SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS sh FROM documents
)
SELECT p.id_a, p.id_b,
       ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE
             / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
FROM pairs p
JOIN sh x ON x.doc_id = p.id_a
JOIN sh y ON y.doc_id = p.id_b
"""


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set-containment verification of LSH candidate pairs
    (operators/dedup.py:containment_pairs) — catches subsumption near-dups
    (short doc embedded in a long one) that Jaccard under-scores.  Same
    candidate derivation as q_jaccard_pairs; oracle recomputes
    |A∩B|/|A| and /|B| over distinct shingle lists."""
    docs = _load_wide(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    sig = minhash_signatures(docs, k=16)
    pairs = lsh_candidate_pairs(sig, bands=4, rows=4)
    return containment_pairs(docs, pairs)


_ORACLE_CONTAINMENT = f"""
WITH bases AS (
    SELECT doc_id, {_DUCK_BASE} AS _b FROM documents
),
sig AS (
    SELECT doc_id, [{_DUCK_MINS}] AS sig FROM bases
),
banded AS (
    SELECT doc_id, b AS band_idx,
           md5(array_to_string(sig[b * 4 + 1 : b * 4 + 4], '|')) AS band_hash
    FROM sig, UNNEST(range(4)) AS t(b)
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
sh AS (
    SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS sh FROM documents
),
scored AS (
    SELECT p.id_a, p.id_b,
           ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE / len(x.sh), 6) AS c_a,
           ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE / len(y.sh), 6) AS c_b
    FROM pairs p
    JOIN sh x ON x.doc_id = p.id_a
    JOIN sh y ON y.doc_id = p.id_b
)
SELECT id_a, id_b, c_a, c_b, GREATEST(c_a, c_b) AS containment FROM scored
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-growth novelty curve (operators/frequency.py:ngram_novelty):
    per 100-doc ingest batch (deterministic doc_id order), the fraction of
    its distinct 3-gram shingles never seen in an earlier batch.  Counts
    are integers; only the final ratio rounds."""
    from tsdownsample_spark.operators.frequency import ngram_novelty

    docs = _load_wide(spark, sf_dir, "documents")
    out = ngram_novelty(docs, batch_size=100, shingle=3)
    return out.select(
        "batch",
        "n_shingles",
        "n_new",
        F.round("novelty", 6).alias("novelty_r"),
    )


_ORACLE_NGRAM_NOVELTY = f"""
WITH pairs AS (
    SELECT DISTINCT doc_id // 100 AS batch, t.sh
    FROM documents, UNNEST({_DUCK_SHINGLES}) AS t(sh)
),
f AS (
    SELECT batch, MIN(batch) OVER (PARTITION BY sh) AS first_batch
    FROM pairs
)
SELECT batch,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN batch = first_batch THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       ROUND(SUM(CASE WHEN batch = first_batch THEN 1 ELSE 0 END)::DOUBLE
             / COUNT(*), 6) AS novelty_r
FROM f GROUP BY 1
"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under the corpus's own add-1 bigram LM
    (operators/frequency.lm_crossentropy) — the perplexity-style quality
    signal.  Oracle re-derives bigram counts, head totals, successor
    vocabulary, and -mean ln P in SQL."""
    from tsdownsample_spark.operators.frequency import lm_crossentropy

    docs = _load_wide(spark, sf_dir, "documents")
    return lm_crossentropy(docs)


_ORACLE_LM_SCORE = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
bg AS (
    SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
    FROM w, unnest(range(1, len(words))) AS t(i)
    WHERE len(words) >= 2
),
lm AS (
    SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
),
heads AS (
    SELECT w1, SUM(c) AS tot FROM lm GROUP BY w1
),
vocab AS (
    SELECT COUNT(DISTINCT w2) AS v FROM bg
),
scored AS (
    SELECT bg.doc_id, COUNT(*) AS n_bigrams,
           round(-AVG(ln((lm.c + 1.0) / (heads.tot + 1.0 * vocab.v))), 6)
             AS xent
    FROM bg JOIN lm USING (w1, w2) JOIN heads USING (w1), vocab
    GROUP BY bg.doc_id
)
SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams, s.xent
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pairs -> connected components -> total per-doc cluster assignment:
    the last stage of the dedup pipeline (keep one doc per near-dup
    cluster), with transitive closure over the LSH pair graph."""
    docs = _load_wide(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    sig = minhash_signatures(docs, k=16)
    pairs = lsh_candidate_pairs(sig, bands=4, rows=4)
    return neardup_clusters(docs, pairs)


# Oracle: same pair derivation as _ORACLE_MINHASH_LSH, then transitive
# closure as a recursive CTE — walk(node, lbl) enumerates, per node, the
# label of every node reachable over the symmetrized pair graph (UNION
# dedups, so it terminates); min reachable label == component minimum.
_ORACLE_DEDUP_CLUSTER = f"""
WITH RECURSIVE bases AS (
    SELECT doc_id, {_DUCK_BASE} AS _b FROM documents
),
sig AS (
    SELECT doc_id, [{_DUCK_MINS}] AS sig FROM bases
),
banded AS (
    SELECT doc_id, b AS band_idx,
           md5(array_to_string(sig[b * 4 + 1 : b * 4 + 4], '|')) AS band_hash
    FROM sig, UNNEST(range(4)) AS t(b)
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
walk(node, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.node
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id, (MIN(lbl) = node) AS keep
FROM walk GROUP BY node
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    return simhash(docs, bits=32)


_ORACLE_SIMHASH = """
WITH w AS (
    SELECT doc_id,
           list_transform(string_split(text, ' '),
               w -> CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)) AS hs
    FROM documents
)
SELECT doc_id,
    -- CAST: list_sum yields HUGEINT/double; Spark emits BIGINT
    CAST(list_sum(list_transform(range(32), j ->
        CASE WHEN list_sum(list_transform(hs,
                 h -> 2 * ((h // CAST(pow(2, j) AS BIGINT)) % 2) - 1)) >= 0
             THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
FROM w
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdownsample_spark.operators.text import doc_fingerprint

    docs = _load_wide(spark, sf_dir, "documents")
    return doc_fingerprint(docs).select("doc_id", "fp_exact", "fp_shingle")


_ORACLE_FINGERPRINT = f"""
SELECT doc_id,
       substr(md5(lower(text)), 1, 16) AS fp_exact,
       substr(list_min(list_transform({_DUCK_SHINGLES}, s -> md5(s))), 1, 16) AS fp_shingle
FROM documents
"""


# -------------------------------------------------------------- similarity

_DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)


def _duck_cos(a: str, b: str) -> str:
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, probes, k=10)


_ORACLE_ANN_TOPK = f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 8),
scored AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id,
           ROUND({_duck_cos('p.pe', 'e.embedding')}, 6) AS cos_r
    FROM p, embeddings e
    WHERE e.vec_id != p.probe_id
),
ranked AS (
    SELECT probe_id, neighbor_id, cos_r,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_r DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT probe_id, rank, neighbor_id, cos_r FROM ranked WHERE rank <= 10
"""


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (threshold tuned to the
    synthetic embedding distribution: random normals peak near cos ~0.3),
    via the BLOCKED all-pairs verifier: block-pair tasks with bounded state
    and a NumPy fold that is bit-identical to the SQL dot product."""
    from tsdownsample_spark.operators.similarity import near_dup_pairs_blocked

    emb = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return near_dup_pairs_blocked(emb, threshold=0.28, n_blocks=8)


_ORACLE_EMBED_NEARDUP = f"""
WITH norms AS (
    SELECT vec_id, embedding,
           sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS nrm
    FROM embeddings WHERE vec_id < 1000
),
scored AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_DUCK_DOT.format(a='a.embedding', b='b.embedding')}
                 / (a.nrm * b.nrm), 6) AS cos_r
    FROM norms a JOIN norms b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos_r FROM scored WHERE cos_r >= 0.28
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composition (operators/similarity.semantic_dedup):
    k-means cells -> within-cell exact cosine pairs -> connected
    components -> per-vector keep verdict."""
    from tsdownsample_spark.operators.similarity import semantic_dedup

    emb = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return semantic_dedup(emb, threshold=0.28, n_cells=8, dim=64, seed=11)


def _oracle_semantic_dedup() -> str:
    from tsdownsample_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(64, 8, 11)
    dots = []
    for c in cents:
        arr = "[" + ",".join(f"CAST({v} AS DOUBLE)" for v in c) + "]"
        dots.append(_DUCK_DOT.format(a="embedding", b=arr))
    dcols = ", ".join(f"{d} AS d{i}" for i, d in enumerate(dots))
    m = "greatest(" + ", ".join(f"d{i}" for i in range(len(cents))) + ")"
    cell = (
        "CASE "
        + " ".join(f"WHEN d{i} = m THEN {i}" for i in range(len(cents)))
        + " END"
    )
    return f"""
WITH RECURSIVE base AS (
    SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
),
d AS (SELECT vec_id, embedding, {dcols} FROM base),
e AS (
    SELECT vec_id, embedding, {cell} AS cell
    FROM (SELECT *, {m} AS m FROM d)
),
norms AS (
    SELECT vec_id, embedding, cell,
           sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS nrm
    FROM e
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM norms a JOIN norms b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE ROUND({_DUCK_DOT.format(a='a.embedding', b='b.embedding')}
                / (a.nrm * b.nrm), 6) >= 0.28
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
walk(node, lbl) AS (
    SELECT vec_id, vec_id FROM base
    UNION
    SELECT e2.v, w.lbl FROM walk w JOIN edges e2 ON e2.u = w.node
)
SELECT node AS vec_id, MIN(lbl) AS cluster_id, (MIN(lbl) = node) AS keep
FROM walk GROUP BY node
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdownsample_spark.operators.similarity import ivf_ann_topk

    emb = _load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    return ivf_ann_topk(emb, probes, k=10, n_cells=8, dim=64, seed=11)


def _oracle_ann_ivf() -> str:
    from tsdownsample_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(64, 8, 11)
    dots = []
    for c in cents:
        arr = "[" + ",".join(f"CAST({v} AS DOUBLE)" for v in c) + "]"
        dots.append(_DUCK_DOT.format(a="embedding", b=arr))
    dcols = ", ".join(f"{d} AS d{i}" for i, d in enumerate(dots))
    m = "greatest(" + ", ".join(f"d{i}" for i in range(len(cents))) + ")"
    # first index equal to the max = lowest-index tie, same as the Spark fold
    cell = (
        "CASE "
        + " ".join(f"WHEN d{i} = m THEN {i}" for i in range(len(cents)))
        + " END"
    )
    return f"""
WITH d AS (SELECT vec_id, embedding, {dcols} FROM embeddings),
e AS (
    SELECT vec_id, embedding, {cell} AS cell
    FROM (SELECT *, {m} AS m FROM d)
),
p AS (SELECT vec_id AS probe_id, embedding AS pe, cell FROM e WHERE vec_id < 8),
scored AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id, e.cell,
           ROUND({_duck_cos('p.pe', 'e.embedding')}, 6) AS cos_r
    FROM p JOIN e ON e.cell = p.cell AND e.vec_id != p.probe_id
),
ranked AS (
    SELECT probe_id, neighbor_id, cell, cos_r,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_r DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT probe_id, rank, neighbor_id, cos_r, cell FROM ranked WHERE rank <= 10
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    return lsh_ann_topk(emb, probes, k=10, n_planes=4, dim=64, seed=7)


def _oracle_ann_lsh() -> str:
    planes = lsh_planes(64, 4, 7)
    terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ",".join(f"CAST({v} AS DOUBLE)" for v in plane) + "]"
        dot = _DUCK_DOT.format(a="{v}", b=arr)
        terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END")
    bucket = "(" + " + ".join(terms) + ")"
    return f"""
WITH e AS (
    SELECT vec_id, embedding, {bucket.format(v="embedding")} AS bucket
    FROM embeddings
),
p AS (SELECT vec_id AS probe_id, embedding AS pe, bucket FROM e WHERE vec_id < 8),
scored AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id, e.bucket,
           ROUND({_duck_cos('p.pe', 'e.embedding')}, 6) AS cos_r
    FROM p JOIN e ON e.bucket = p.bucket AND e.vec_id != p.probe_id
),
ranked AS (
    SELECT probe_id, neighbor_id, bucket, cos_r,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_r DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT probe_id, rank, neighbor_id, cos_r, bucket FROM ranked WHERE rank <= 10
"""


def q_ann_lsh_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with 1-step MULTIPROBE (nprobe=2): each probe also searches
    the bucket reached by flipping its smallest-|margin| hyperplane sign.
    Oracle-checks the margin sort (+ lowest-plane tie rule) and the XOR
    bucket derivation end-to-end."""
    emb = _load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    return lsh_ann_topk(emb, probes, k=10, n_planes=4, dim=64, seed=7, nprobe=2)


def _oracle_ann_lsh_mp() -> str:
    planes = lsh_planes(64, 4, 7)
    P = len(planes)
    dots = []
    for plane in planes:
        arr = "[" + ",".join(f"CAST({v} AS DOUBLE)" for v in plane) + "]"
        dots.append(_DUCK_DOT.format(a="embedding", b=arr))
    dcols = ", ".join(f"{d} AS d{j}" for j, d in enumerate(dots))
    bucket = (
        "("
        + " + ".join(f"CASE WHEN d{j} >= 0 THEN {1 << j} ELSE 0 END" for j in range(P))
        + ")"
    )
    minabs = "least(" + ", ".join(f"abs(d{j})" for j in range(P)) + ")"
    # smallest |margin| plane, lowest index on ties — probe_buckets_expr's
    # array_sort((a=abs(d), j)) ascending order
    flip = (
        "CASE "
        + " ".join(f"WHEN abs(d{j}) = minabs THEN {1 << j}" for j in range(P))
        + " END"
    )
    return f"""
WITH d AS (SELECT vec_id, embedding, {dcols} FROM embeddings),
e AS (SELECT vec_id, embedding, {bucket} AS bucket, d0, d1, d2, d3 FROM d),
p2 AS (
    SELECT vec_id, embedding, bucket, xor(bucket, {flip}) AS bucket2
    FROM (SELECT *, {minabs} AS minabs FROM e)
    WHERE vec_id < 8
),
p AS (
    SELECT vec_id AS probe_id, embedding AS pe, bucket FROM p2
    UNION ALL
    SELECT vec_id AS probe_id, embedding AS pe, bucket2 AS bucket FROM p2
),
scored AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id, e.bucket,
           ROUND({_duck_cos('p.pe', 'e.embedding')}, 6) AS cos_r
    FROM p JOIN e ON e.bucket = p.bucket AND e.vec_id != p.probe_id
),
ranked AS (
    SELECT probe_id, neighbor_id, bucket, cos_r,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_r DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT probe_id, rank, neighbor_id, cos_r, bucket FROM ranked WHERE rank <= 10
"""


def q_ann_ivf_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with MULTIPROBE (nprobe=2): each probe searches its two
    nearest coarse cells.  Oracle-checks the multiprobe candidate
    expansion end-to-end (cell ranking incl. the lowest-index tie rule,
    probe-side-only explode, unchanged scoring)."""
    from tsdownsample_spark.operators.similarity import ivf_ann_topk

    emb = _load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    return ivf_ann_topk(emb, probes, k=10, n_cells=8, dim=64, seed=11, nprobe=2)


def _oracle_ann_ivf_mp() -> str:
    from tsdownsample_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(64, 8, 11)
    n = len(cents)
    dots = []
    for c in cents:
        arr = "[" + ",".join(f"CAST({v} AS DOUBLE)" for v in c) + "]"
        dots.append(_DUCK_DOT.format(a="embedding", b=arr))
    dcols = ", ".join(f"{d} AS d{i}" for i, d in enumerate(dots))
    m = "greatest(" + ", ".join(f"d{i}" for i in range(n)) + ")"
    cell = (
        "CASE " + " ".join(f"WHEN d{i} = m THEN {i}" for i in range(n)) + " END"
    )
    # second-nearest cell: max dot over i != cell, lowest index on ties —
    # the same (-dot, index) ascending order probe_cells_expr sorts by
    m2 = (
        "greatest("
        + ", ".join(f"CASE WHEN {i} = cell THEN -1e308 ELSE d{i} END" for i in range(n))
        + ")"
    )
    cell2 = (
        "CASE "
        + " ".join(f"WHEN {i} != cell AND d{i} = m2 THEN {i}" for i in range(n))
        + " END"
    )
    return f"""
WITH d AS (SELECT vec_id, embedding, {dcols} FROM embeddings),
e AS (
    SELECT vec_id, embedding, {cell} AS cell,
           d0, d1, d2, d3, d4, d5, d6, d7
    FROM (SELECT *, {m} AS m FROM d)
),
p2 AS (
    SELECT vec_id, embedding, cell, {cell2} AS cell2
    FROM (SELECT *, {m2} AS m2 FROM e)
    WHERE vec_id < 8
),
p AS (
    SELECT vec_id AS probe_id, embedding AS pe, cell FROM p2
    UNION ALL
    SELECT vec_id AS probe_id, embedding AS pe, cell2 AS cell FROM p2
),
scored AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id, e.cell,
           ROUND({_duck_cos('p.pe', 'e.embedding')}, 6) AS cos_r
    FROM p JOIN e ON e.cell = p.cell AND e.vec_id != p.probe_id
),
ranked AS (
    SELECT probe_id, neighbor_id, cell, cos_r,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_r DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT probe_id, rank, neighbor_id, cos_r, cell FROM ranked WHERE rank <= 10
"""


# ------------------------------------------------------------ tokenization

_TOKENIZE = (
    "transform(split(text, ' '), "
    "w -> CAST(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % 50257 AS INT))"
)

_DUCK_TOKENIZE = (
    "list_transform(string_split(text, ' '), "
    "w -> CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 50257 AS INT))"
)


def tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents -> the engine's token-table shape (BASELINE input_hint)."""
    docs = _load_wide(spark, sf_dir, "documents")
    # n_tok from size(split(..)) — identical to size(tokens) since the
    # per-word transform preserves length, but it does NOT reference the
    # tokens column, so consumers that only need counts (q_pack_greedy)
    # let Catalyst prune the 50257-way md5 token transform entirely.
    # (The old single-projection size(F.expr(_TOKENIZE)) form also
    # evaluated that md5 transform TWICE for every consumer.)
    return docs.select(
        "doc_id",
        F.expr(_TOKENIZE).alias("tokens"),
        F.size(F.split("text", " ")).cast("int").alias("n_tok"),
        "source",
    )


def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract projection of tokenize_docs: the raw array<int> column breaks
    the driver's canonicalizer (pandas can't sort list cells), so the checked
    shape is a content hash of the token array + its length — equally strong
    as a correctness signal (any token or order difference flips the md5)."""
    toks = tokenize_docs(spark, sf_dir)
    return toks.select(
        "doc_id",
        F.md5(F.expr("array_join(transform(tokens, t -> CAST(t AS STRING)), ',')")).alias(
            "tok_hash"
        ),
        "n_tok",
        "source",
    )


_ORACLE_TOKENIZE = f"""
SELECT doc_id,
       md5(array_to_string({_DUCK_TOKENIZE}, ',')) AS tok_hash,
       CAST(len({_DUCK_TOKENIZE}) AS INTEGER) AS n_tok, source
FROM documents
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent token ids per source — corpus heavy hitters
    (operators/frequency.py: partial-agg count shuffles only distinct
    (source, token) rows; deterministic value tiebreak).  Oracle: DuckDB
    unnest + COUNT + ROW_NUMBER, the same semantics evaluated by an
    independent engine."""
    from tsdownsample_spark.operators.frequency import heavy_hitters

    toks = tokenize_docs(spark, sf_dir)
    ex = toks.select("source", F.explode("tokens").alias("token"))
    return heavy_hitters(ex, "token", by=["source"], k=10)


_ORACLE_HEAVY_HITTERS = f"""
WITH tok AS (
    SELECT source, unnest({_DUCK_TOKENIZE}) AS token FROM documents
),
c AS (
    SELECT source, token, COUNT(*) AS freq FROM tok GROUP BY 1, 2
)
SELECT source, token, freq,
       ROW_NUMBER() OVER (PARTITION BY source
                          ORDER BY freq DESC, token ASC) AS rank
FROM c
QUALIFY rank <= 10
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram entropy (operators/frequency.py:unigram_entropy):
    one distinct-count groupBy, then H = log2(N) - sum(c*log2(c))/N in a
    single fold.  The counts are exact integers on both engines; the log
    fold is float — round 6."""
    from tsdownsample_spark.operators.frequency import unigram_entropy

    toks = tokenize_docs(spark, sf_dir)
    ex = toks.select("source", F.explode("tokens").alias("token"))
    out = unigram_entropy(ex, "token", by=["source"])
    # n_values as DOUBLE: the oracle's SUM(c) is a DuckDB HUGEINT ->
    # pandas float64; match the dtype Spark-side for the driver's
    # str()-canon (latent hazard flagged in the r5 verdict; n_distinct
    # is a COUNT -> BIGINT on both sides and stays long)
    return out.select(
        "source",
        F.col("n_values").cast("double").alias("n_values"),
        "n_distinct",
        F.round("entropy_bits", 6).alias("entropy_bits_r"),
    )


_ORACLE_TOKEN_ENTROPY = f"""
WITH tok AS (
    SELECT source, unnest({_DUCK_TOKENIZE}) AS token FROM documents
),
c AS (
    SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
)
SELECT source, SUM(c) AS n_values, COUNT(*) AS n_distinct,
       ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS entropy_bits_r
FROM c GROUP BY 1
"""


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf rank-frequency fit (operators/frequency.py:
    zipf_slope): heavy-hitters distinct-count groupBy, deterministic rank
    window (freq desc, token asc), ANSI regr_slope/intercept/r2 over
    ln(freq) vs ln(rank), truncated to the head (max_rank=500) where the
    power law lives.  Ranks and freqs are exact integers on both engines;
    the regression folds are float — round 6."""
    from tsdownsample_spark.operators.frequency import zipf_slope

    toks = tokenize_docs(spark, sf_dir)
    ex = toks.select("source", F.explode("tokens").alias("token"))
    out = zipf_slope(ex, "token", by=["source"], max_rank=500)
    return out.select(
        "source",
        F.round("slope", 6).alias("slope_r"),
        F.round("intercept", 6).alias("intercept_r"),
        F.round("r2", 6).alias("r2_r"),
        "n_ranks",
    )


_ORACLE_ZIPF_SLOPE = f"""
WITH tok AS (
    SELECT source, unnest({_DUCK_TOKENIZE}) AS token FROM documents
),
c AS (
    SELECT source, token, COUNT(*) AS freq FROM tok GROUP BY 1, 2
),
r AS (
    SELECT source, freq,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY freq DESC, token ASC) AS rank
    FROM c
)
SELECT source,
       ROUND(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS slope_r,
       ROUND(regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS intercept_r,
       ROUND(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS r2_r,
       COUNT(*) AS n_ranks
FROM r WHERE rank <= 500 GROUP BY 1
"""


def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations per source (operators/frequency.py:
    pmi_collocations): contingency-table PMI over adjacent word pairs,
    min_count=5.  The checked shape is EVERY gated pair with its rounded
    PMI (k set above the gated-pair count) rather than the top-k rank
    column: rank order on raw-double PMI could flip across engines on a
    1-ulp ln() difference, while the VALUES round-trip stably at 6
    decimals — the unit tests pin the ranking semantics."""
    from tsdownsample_spark.operators.frequency import pmi_collocations

    docs = _load_wide(spark, sf_dir, "documents")
    out = pmi_collocations(docs, by="source", min_count=5, k=10**6)
    return out.select(
        "source", "w1", "w2", "c_ab", F.round("pmi", 6).alias("pmi_r")
    )


_ORACLE_PMI = """
WITH p AS (
    SELECT source,
           unnest(list_transform(range(1, len(string_split(text, ' '))),
                  i -> struct_pack(w1 := string_split(text, ' ')[i],
                                   w2 := string_split(text, ' ')[i+1]))) AS bg
    FROM documents
),
cab AS (
    SELECT source, bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c_ab
    FROM p GROUP BY 1, 2, 3
),
tot AS (SELECT source, SUM(c_ab) AS n FROM cab GROUP BY 1),
l AS (SELECT source, w1, SUM(c_ab) AS ca FROM cab GROUP BY 1, 2),
r AS (SELECT source, w2, SUM(c_ab) AS cb FROM cab GROUP BY 1, 2)
SELECT cab.source, cab.w1, cab.w2, cab.c_ab,
       ROUND(ln(CAST(cab.c_ab AS DOUBLE) * tot.n
                / (CAST(l.ca AS DOUBLE) * r.cb)), 6) AS pmi_r
FROM cab
JOIN l USING (source, w1)
JOIN r USING (source, w2)
JOIN tot USING (source)
WHERE cab.c_ab >= 5
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction sweep (operators/text.py:scrub_pii — chained JVM
    regexp_replace, zero shuffle).  The synthetic corpus is digit-free, so
    both engines first salt it with DETERMINISTIC doc_id-derived PII
    (email / phone / SSN / IPv4 on different modulus classes, so docs
    carry 0-4 hits in every combination); the checked shape is the four
    per-pattern redaction counts + hash and length of the scrubbed text —
    any count, placement, or placeholder difference flips the hash.
    Patterns live in the Java-regex ∩ RE2 subset so the SAME strings run
    in Spark and the DuckDB oracle."""
    from tsdownsample_spark.operators.text import scrub_pii

    docs = _load_wide(spark, sf_dir, "documents")
    sid = F.col("doc_id")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                sid % 3 == 0,
                F.concat(F.lit(" contact user"), sid.cast("string"),
                         F.lit("@mail.example.com")),
            ).otherwise(F.lit("")),
            F.when(
                sid % 4 == 0,
                F.concat(F.lit(" call 555-123-"),
                         F.lpad((sid % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(sid % 5 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
            F.when(
                sid % 7 == 0,
                F.concat(F.lit(" from 10.0.0."), (sid % 256).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = scrub_pii(salted, "text")
    return out.select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4",
        F.md5("text").alias("scrub_hash"),
        F.length("text").alias("scrub_len"),
    )


_ORACLE_PII_SCRUB = r"""
WITH salted AS (
    SELECT doc_id, text
        || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                || CAST(doc_id AS VARCHAR) || '@mail.example.com'
           ELSE '' END
        || CASE WHEN doc_id % 4 = 0 THEN ' call 555-123-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.0.'
                || CAST(doc_id % 256 AS VARCHAR)
           ELSE '' END AS t
    FROM documents
),
s1 AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
               AS n_email,
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g') AS t
    FROM salted
),
s2 AS (
    SELECT doc_id, n_email,
           CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS INTEGER)
               AS n_ssn,
           regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t
    FROM s1
),
s3 AS (
    SELECT doc_id, n_email, n_ssn,
           CAST(len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
                AS INTEGER) AS n_phone,
           regexp_replace(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t
    FROM s2
)
SELECT doc_id, n_email, n_ssn, n_phone,
       CAST(len(regexp_extract_all(t,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ipv4,
       md5(regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                          '<IP>', 'g')) AS scrub_hash,
       CAST(len(regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                               '<IP>', 'g')) AS INTEGER) AS scrub_len
FROM s3
"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition metrics
    (operators/text.py:repetition_stats — zero-shuffle JVM array fold; the
    top-word count is a longest-sorted-run aggregate, not an explode).
    Oracle: DuckDB re-derives every ratio from unnest + GROUP BY — a
    genuinely different algorithm (relational mode vs sorted-run fold)
    agreeing on the same numbers."""
    from tsdownsample_spark.operators.text import repetition_stats

    docs = _load_wide(spark, sf_dir, "documents")
    return repetition_stats(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "dup_word_ratio",
        "dup_2gram_ratio",
        "dup_3gram_ratio",
        "top_word_ratio",
    )


_ORACLE_REPETITION = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
    SELECT doc_id, words,
           CASE WHEN len(words) < 2 THEN [array_to_string(words, ' ')]
                ELSE list_transform(range(len(words) - 1),
                     i -> array_to_string(words[i + 1 : i + 2], ' ')) END AS g2,
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE list_transform(range(len(words) - 2),
                     i -> array_to_string(words[i + 1 : i + 3], ' ')) END AS g3
    FROM w
),
mode_w AS (
    SELECT doc_id, MAX(c) AS max_word FROM (
        SELECT doc_id, word, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(words) AS word FROM w)
        GROUP BY doc_id, word
    ) GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(len(g.words) AS BIGINT) AS n_words,
       round(1.0 - len(list_distinct(g.words)) / CAST(len(g.words) AS DOUBLE), 6)
           AS dup_word_ratio,
       round(1.0 - len(list_distinct(g.g2)) / CAST(len(g.g2) AS DOUBLE), 6)
           AS dup_2gram_ratio,
       round(1.0 - len(list_distinct(g.g3)) / CAST(len(g.g3) AS DOUBLE), 6)
           AS dup_3gram_ratio,
       round(m.max_word / CAST(greatest(len(g.words), 1) AS DOUBLE), 6)
           AS top_word_ratio
FROM g JOIN mode_w m USING (doc_id)
"""


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by smoothed TF-IDF
    (operators/frequency.py:tfidf_topk — occurrences collapse via
    map-side-combined (doc, term) count before anything else; doc_freq is
    a second partial agg joined back on the term key; N is an in-plan
    broadcast scalar).  Oracle: DuckDB computes the identical
    tf * (ln((N+1)/(df+1)) + 1) from scratch."""
    from tsdownsample_spark.operators.frequency import tfidf_topk

    docs = _load_wide(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    return tfidf_topk(occ, "doc_id", "term", k=3)


_ORACLE_TFIDF = """
WITH occ AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM occ GROUP BY doc_id, term
),
df_ AS (
    SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
),
n AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs FROM occ
)
SELECT doc_id, term, tf, doc_freq,
       round(tf * (ln((n_docs + 1) / CAST(doc_freq + 1 AS DOUBLE)) + 1.0), 6)
           AS score,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY
           round(tf * (ln((n_docs + 1) / CAST(doc_freq + 1 AS DOUBLE)) + 1.0), 6)
               DESC, term ASC) AS rank
FROM tf JOIN df_ USING (term) CROSS JOIN n
QUALIFY rank <= 3
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the word corpus with a fractional df gate
    (operators/index.py — distinct pairs first, df gate BEFORE postings
    materialize, so stopword-sized lists are never built).  max_df=0.78
    drops the most corpus-wide head terms at sf0.01, proving the gate
    actually cuts.  The sorted postings array is checked as an md5 of its
    comma-join (the driver canonicalizer can't sort list cells — q_tokenize
    precedent), alongside doc_freq and the min/max doc id."""
    from tsdownsample_spark.operators.index import inverted_index

    docs = _load_wide(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    idx = inverted_index(occ, "doc_id", "term", min_df=2, max_df=0.78)
    return idx.select(
        "term",
        "doc_freq",
        F.md5(F.concat_ws(",", F.col("postings").cast("array<string>")))
            .alias("postings_hash"),
        F.element_at("postings", 1).alias("first_doc"),
        F.element_at("postings", -1).alias("last_doc"),
    )


_ORACLE_INVERTED_INDEX = """
WITH occ AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
pairs AS (
    SELECT DISTINCT term, doc_id FROM occ
),
n AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs FROM pairs
),
f AS (
    SELECT term, COUNT(*) AS doc_freq FROM pairs GROUP BY term
)
SELECT p.term,
       f.doc_freq,
       md5(array_to_string(list_sort(list(p.doc_id)), ',')) AS postings_hash,
       MIN(p.doc_id) AS first_doc,
       MAX(p.doc_id) AS last_doc
FROM pairs p JOIN f USING (term) CROSS JOIN n
WHERE f.doc_freq >= 2 AND f.doc_freq <= CAST(ceil(0.78 * n.n_docs) AS BIGINT)
GROUP BY p.term, f.doc_freq
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-slice set overlap: distinct shared word-3-gram
    shingles + Jaccard for every source pair
    (operators/dedup.py:source_overlap_matrix) — the set-MEMBERSHIP
    companion of q_source_divergence's frequency-SHAPE matrix, i.e. the
    "how much does crawl X literally repeat crawl Y" audit before corpus
    mixing.  n_shared/n_a/n_b are exact integers; jaccard is one
    division, rounded 6dp (a ratio of integers — a 1e-16-relative float
    tie would need the true quotient within 1e-10 of a 5e-7 boundary,
    i.e. a denominator over ~10^9 shingles; the fixture has ~10^4)."""
    from tsdownsample_spark.operators.dedup import source_overlap_matrix

    docs = _load_wide(spark, sf_dir, "documents")
    out = source_overlap_matrix(docs, text_col="text", by="source", shingle=3)
    return out.select(
        "source_a",
        "source_b",
        "n_shared",
        "n_a",
        "n_b",
        F.round("jaccard", 6).alias("jaccard_r"),
    )


_ORACLE_SOURCE_OVERLAP = """
WITH s AS (
    SELECT DISTINCT source,
           unnest(CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
                  ELSE list_transform(range(len(string_split(text, ' ')) - 2),
                       i -> array_to_string(string_split(text, ' ')[i + 1 : i + 3], ' '))
                  END) AS shingle
    FROM documents
),
tot AS (SELECT source, COUNT(*) AS n FROM s GROUP BY source),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
    FROM s a JOIN s b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.n_shared, ta.n AS n_a, tb.n AS n_b,
       ROUND(p.n_shared / CAST(ta.n + tb.n - p.n_shared AS DOUBLE), 6)
           AS jaccard_r
FROM pairs p
JOIN tot ta ON ta.source = p.source_a
JOIN tot tb ON tb.source = p.source_b
"""


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources' word
    distributions — data-mixture drift measurement
    (operators/divergence.py: sparse shared-mass identity, zero-filled
    grid rows never materialize).  The DuckDB oracle evaluates the OTHER
    formulation — a dense COALESCE-zero dist x vocab grid — so both
    engines reach the same numbers through different algebra."""
    from tsdownsample_spark.operators.divergence import js_divergence

    docs = _load_wide(spark, sf_dir, "documents")
    occ = docs.select("source", F.explode(F.split("text", " ")).alias("term"))
    return js_divergence(occ, "source", "term")


_ORACLE_SOURCE_DIVERGENCE = """
WITH occ AS (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (
    SELECT source, term, COUNT(*) AS c FROM occ GROUP BY source, term
),
tot AS (
    SELECT source, SUM(c) AS tot FROM c GROUP BY source
),
grid AS (
    SELECT s.source, v.term,
           COALESCE(c.c / CAST(t.tot AS DOUBLE), 0.0) AS p
    FROM (SELECT DISTINCT source FROM occ) s
    CROSS JOIN (SELECT DISTINCT term FROM occ) v
    JOIN tot t ON t.source = s.source
    LEFT JOIN c ON c.source = s.source AND c.term = v.term
),
pairs AS (
    SELECT a.source AS dist_a, b.source AS dist_b, a.term,
           a.p AS pa, b.p AS pb
    FROM grid a JOIN grid b ON a.term = b.term AND a.source < b.source
    WHERE a.p + b.p > 0
)
SELECT dist_a, dist_b,
       round(SUM(
           CASE WHEN pa > 0 THEN pa * ln(2.0 * pa / (pa + pb)) ELSE 0 END
         + CASE WHEN pb > 0 THEN pb * ln(2.0 * pb / (pa + pb)) ELSE 0 END
       ) / 2.0, 6) AS js_div,
       CAST(SUM(CASE WHEN pa > 0 AND pb > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_terms
FROM pairs
GROUP BY dist_a, dist_b
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model table: top-3 successor words per head word
    with conditional probability P(w2|w1).  Pure operator composition —
    adjacent-pair extraction is one JVM transform/explode, ranking reuses
    operators/frequency.py:heavy_hitters (by=w1), and the probability
    denominator is a second partial agg joined back on the head word.
    Oracle: DuckDB re-derives bigrams, counts, and window ranks from
    scratch."""
    from tsdownsample_spark.operators.frequency import bigram_pairs, heavy_hitters

    docs = _load_wide(spark, sf_dir, "documents")
    # r6: reuse the operator's bound-words pair derivation (the inline
    # expression re-ran split per pair — O(words^2) per doc)
    ex = bigram_pairs(docs, text_col="text", id_col="doc_id").select("w1", "w2")
    hh = heavy_hitters(ex, "w2", by=["w1"], k=3)
    tot = ex.groupBy("w1").agg(F.count(F.lit(1)).alias("tot"))
    return (
        hh.join(tot, "w1")
        .select(
            "w1", "w2", "freq", "rank",
            F.round(F.col("freq") / F.col("tot"), 6).alias("prob"),
        )
    )


_ORACLE_BIGRAM_LM = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
bg AS (
    SELECT words[i] AS w1, words[i + 1] AS w2
    FROM w, unnest(range(1, len(words))) AS t(i)
    WHERE len(words) >= 2
),
c AS (
    SELECT w1, w2, COUNT(*) AS freq FROM bg GROUP BY w1, w2
),
tot AS (
    SELECT w1, SUM(freq) AS tot FROM c GROUP BY w1
),
r AS (
    SELECT w1, w2, freq,
           ROW_NUMBER() OVER (PARTITION BY w1
                              ORDER BY freq DESC, w2 ASC) AS rank
    FROM c
)
SELECT r.w1, r.w2, r.freq, r.rank,
       round(r.freq / CAST(t.tot AS DOUBLE), 6) AS prob
FROM r JOIN tot t USING (w1)
WHERE r.rank <= 3
"""


def q_doc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end token-table path on real documents: tokenize -> MinMax
    downsample (n_out=20) -> exploded selected (idx, token)."""
    from tsdownsample_spark.operators.downsample import downsample_tokens

    toks = tokenize_docs(spark, sf_dir)
    out = downsample_tokens(toks, 20, algo="minmax", tokens_col="tokens")
    return (
        out.select("doc_id", "tokens", F.posexplode("sel_idx").alias("pos", "sel_idx"))
        .withColumn("sel_token", F.expr("element_at(tokens, CAST(sel_idx AS INT) + 1)"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "sel_idx", "sel_token")
    )


_ORACLE_DOC_DOWNSAMPLE = f"""
WITH toks AS (
    SELECT doc_id, {_DUCK_TOKENIZE} AS tokens FROM documents
),
long AS (
    SELECT doc_id, tokens[CAST(t.i AS INT) + 1] AS token, t.i AS rn,
           len(tokens) AS n
    FROM toks, UNNEST(range(len(tokens))) AS t(i)
),
bins AS (
    SELECT doc_id, n, UNNEST(range(10)) AS i FROM (SELECT DISTINCT doc_id, n FROM long)
    WHERE n > 20
),
edges AS (
    SELECT doc_id, i,
           CASE WHEN i = 0 THEN 0
                ELSE CAST(FLOOR((n - 1) / 10.0 * i) AS BIGINT) + 1 END AS lo,
           CAST(FLOOR((n - 1) / 10.0 * (i + 1)) AS BIGINT) + 1 AS hi
    FROM bins
),
binned AS (
    SELECT l.doc_id, e.i, l.rn, l.token
    FROM long l JOIN edges e ON l.doc_id = e.doc_id AND l.rn >= e.lo AND l.rn < e.hi
),
mins AS (
    SELECT doc_id, i, rn, token,
           ROW_NUMBER() OVER (PARTITION BY doc_id, i ORDER BY token ASC, rn ASC) AS r
    FROM binned
),
maxs AS (
    SELECT doc_id, i, rn, token,
           ROW_NUMBER() OVER (PARTITION BY doc_id, i ORDER BY token DESC, rn ASC) AS r
    FROM binned
),
pair AS (
    SELECT * FROM mins WHERE r = 1 UNION ALL SELECT * FROM maxs WHERE r = 1
),
numbered AS (
    SELECT doc_id, i, rn, token,
           ROW_NUMBER() OVER (PARTITION BY doc_id, i ORDER BY rn) - 1 AS o
    FROM pair
),
big AS (
    SELECT doc_id, 2 * i + o AS pos, rn AS sel_idx, token AS sel_token FROM numbered
),
small AS (
    SELECT doc_id, rn AS pos, rn AS sel_idx, token AS sel_token FROM long WHERE n <= 20
)
SELECT * FROM big UNION ALL SELECT * FROM small
"""


_PACK_WINDOW = 256


def q_pack_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/pack.py:pack_concat):
    per-source token streams cut into fixed 256-token training rows; the
    checked shape is the per-document placement (offset + window span).
    Pure prefix-sum plan — one Exchange, no Python."""
    from tsdownsample_spark.operators.pack import pack_concat

    toks = tokenize_docs(spark, sf_dir)
    return pack_concat(toks, window=_PACK_WINDOW, by="source", order="doc_id")


_ORACLE_PACK_CONCAT = f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(len({_DUCK_TOKENIZE}) AS BIGINT) AS n_tok
    FROM documents WHERE text IS NOT NULL
),
placed AS (
    SELECT doc_id, source, n_tok,
           -- SUM() widens to HUGEINT (float64 in pandas); pin to BIGINT so
           -- the driver's value-hash sees '32', not '32.0'
           CAST(COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_off
    FROM toks WHERE n_tok > 0
)
SELECT doc_id, source, n_tok, tok_off,
       CAST(FLOOR(tok_off / {_PACK_WINDOW}.0) AS BIGINT) AS first_win,
       CAST(FLOOR((tok_off + n_tok - 1) / {_PACK_WINDOW}.0) AS BIGINT) AS last_win,
       CAST(FLOOR((tok_off + n_tok - 1) / {_PACK_WINDOW}.0) AS BIGINT)
         - CAST(FLOOR(tok_off / {_PACK_WINDOW}.0) AS BIGINT) + 1 AS n_windows
FROM placed
"""


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit no-split packing (operators/pack.py:pack_greedy):
    per-source applyInPandas recurrence; oracle replays the same
    recurrence as a recursive CTE."""
    from tsdownsample_spark.operators.pack import pack_greedy

    toks = tokenize_docs(spark, sf_dir)
    return pack_greedy(toks, window=_PACK_WINDOW, by="source", order="doc_id")


_ORACLE_PACK_GREEDY = f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, source,
           CAST(len({_DUCK_TOKENIZE}) AS BIGINT) AS n_tok
    FROM documents WHERE text IS NOT NULL
),
t AS (
    SELECT doc_id, source, n_tok,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM toks WHERE n_tok > 0
),
p AS (
    SELECT doc_id, source, n_tok, rn,
           CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_off,
           n_tok AS fill
    FROM t WHERE rn = 1
    UNION ALL
    SELECT t.doc_id, t.source, t.n_tok, t.rn,
           CASE WHEN p.fill > 0 AND p.fill + t.n_tok > {_PACK_WINDOW}
                THEN p.pack_id + 1 ELSE p.pack_id END,
           CASE WHEN p.fill > 0 AND p.fill + t.n_tok > {_PACK_WINDOW}
                THEN CAST(0 AS BIGINT) ELSE p.fill END,
           CASE WHEN p.fill > 0 AND p.fill + t.n_tok > {_PACK_WINDOW}
                THEN t.n_tok ELSE p.fill + t.n_tok END
    FROM t JOIN p ON t.source = p.source AND t.rn = p.rn + 1
)
SELECT doc_id, source, n_tok, pack_id, pack_off FROM p
"""


_DUCK_HASH32 = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 8)) AS BIGINT)"
)


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by fixed hash ranges
    (operators/sample.py:split_assign) — pure projection, no shuffle."""
    from tsdownsample_spark.operators.sample import split_assign

    docs = _load(spark, sf_dir, "documents")
    return split_assign(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, seed="r4"
    ).select("doc_id", "source", "split")


_ORACLE_SPLIT_ASSIGN = f"""
WITH h AS (
    SELECT doc_id, source, {_DUCK_HASH32.format(seed="r4")} AS h32 FROM documents
)
SELECT doc_id, source,
       CASE WHEN h32 < {int(0.9 * (1 << 32))} THEN 'train'
            WHEN h32 < {int(0.95 * (1 << 32))} THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


def q_temp_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (operators/sample.py:
    temperature_resample, alpha=0.5): per-source keep-rates from the
    n^alpha recipe, rows kept by the shared deterministic hash rule —
    rates broadcast back, zero fact-side shuffle.  keep_rate is a pow/
    divide fold, so both sides round it to 6; the KEEP DECISION itself
    compares the raw rate against a 32-bit hash, where a 1-ulp pow
    divergence moves the threshold by ~1e-7 of one hash bucket."""
    from tsdownsample_spark.operators.sample import temperature_resample

    docs = _load(spark, sf_dir, "documents")
    out = temperature_resample(
        docs, alpha=0.5, by="source", seed="r5", target_frac=0.5
    )
    return out.select(
        "doc_id", "source", F.round("keep_rate", 6).alias("rate_r")
    )


_ORACLE_TEMP_MIX = f"""
WITH c AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
), t AS (
    SELECT SUM(n) AS N, SUM(POWER(CAST(n AS DOUBLE), 0.5)) AS Z FROM c
), r AS (
    SELECT c.source,
           LEAST(1.0, 0.5 * t.N * (POWER(CAST(c.n AS DOUBLE), 0.5) / t.Z) / c.n)
               AS keep_rate
    FROM c, t
)
SELECT d.doc_id, d.source, ROUND(r.keep_rate, 6) AS rate_r
FROM documents d JOIN r USING (source)
WHERE {_DUCK_HASH32.format(seed="r5")}
      < CAST(FLOOR(r.keep_rate * 4294967296.0) AS BIGINT)
"""


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: exactly 10 lowest-hash docs per
    source (operators/sample.py:quota_sample)."""
    from tsdownsample_spark.operators.sample import quota_sample

    docs = _load(spark, sf_dir, "documents")
    return quota_sample(docs, 10, by="source", seed="r4").select("doc_id", "source")


_ORACLE_QUOTA_SAMPLE = f"""
WITH h AS (
    SELECT doc_id, source, {_DUCK_HASH32.format(seed="r4")} AS h32 FROM documents
),
rk AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h32, doc_id) AS r
    FROM h
)
SELECT doc_id, source FROM rk WHERE r <= 10
"""


_TB_BUDGETS = {"src0": 3000, "src1": 1200, "src2": 8000, "src3": 450}


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling by token budget (operators/sample.py:
    token_budget_sample): per-source hash-ordered prefix whose cumulative
    n_chars stays within each source's budget; sources outside the recipe
    contribute nothing."""
    from tsdownsample_spark.operators.sample import token_budget_sample

    docs = _load(spark, sf_dir, "documents")
    out = token_budget_sample(
        docs, _TB_BUDGETS, by="source", weight="n_chars", seed="r5"
    )
    # cum_w as DOUBLE: the oracle's SUM(n_chars) is a DuckDB HUGEINT,
    # which pandas renders as float64 ('562.0'); a Spark bigint prints
    # '562' and fails the driver's str()-canon (CORRECTNESS_r05).  The
    # oracle is frozen, so the Spark side emits the matching dtype —
    # values are exact small integers either way.
    return out.select(
        "doc_id", "source", "n_chars",
        F.col("cum_w").cast("double").alias("cum_w"),
    )


def _oracle_token_budget() -> str:
    cases = " ".join(
        f"WHEN source = '{k}' THEN {v}" for k, v in _TB_BUDGETS.items()
    )
    return f"""
WITH h AS (
    SELECT doc_id, source, n_chars,
           {_DUCK_HASH32.format(seed="r5")} AS h32,
           CASE {cases} ELSE 0 END AS b
    FROM documents
),
c AS (
    SELECT doc_id, source, n_chars, b,
           SUM(n_chars) OVER (PARTITION BY source ORDER BY h32, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_w
    FROM h
)
SELECT doc_id, source, n_chars, cum_w FROM c WHERE cum_w <= b
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-free ~25% subsample
    (operators/sample.py:hash_sample)."""
    from tsdownsample_spark.operators.sample import hash_sample

    docs = _load(spark, sf_dir, "documents")
    return hash_sample(docs, 0.25, seed="r4").select("doc_id", "source")


_ORACLE_HASH_SAMPLE = f"""
SELECT doc_id, source FROM documents
WHERE {_DUCK_HASH32.format(seed="r4")} < {int(0.25 * (1 << 32))}
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sample (operators/sample.py:
    weighted_sample): Efraimidis-Spirakis exponential keys ln(u)/w with
    the md5-uniform u, w = n_chars, global top-50 via
    TakeOrderedAndProject.  The key rounds to 6 before ranking (the tfidf
    convention) so ln() ulp noise can't flip an order; doc_id breaks
    ties."""
    from tsdownsample_spark.operators.sample import weighted_sample

    docs = _load(spark, sf_dir, "documents")
    out = weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        k=50,
        weight_col="n_chars",
        key="doc_id",
        seed="r5",
    )
    return out.select("doc_id", "source", "samp_key")


_ORACLE_WEIGHTED_SAMPLE = f"""
WITH s AS (
    SELECT doc_id, source,
           ROUND(ln(({_DUCK_HASH32.format(seed="r5")} + 0.5) / 4294967296.0)
                 / n_chars, 6) AS samp_key
    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, source, samp_key FROM s
ORDER BY samp_key DESC, doc_id ASC
LIMIT 50
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination sweep (operators/dedup.py:
    cross_contamination): the eval side is a deterministic 10% hash
    sample, the train side the remainder; report pairs sharing >= 2
    distinct 3-gram shingles."""
    from tsdownsample_spark.operators.dedup import cross_contamination
    from tsdownsample_spark.operators.sample import _hash32, hash_sample

    docs = _load_wide(spark, sf_dir, "documents")
    eval_set = hash_sample(docs, 0.1, seed="eval")
    train = docs.where(~(_hash32("doc_id", "eval") < int(0.1 * (1 << 32))))
    return cross_contamination(train, eval_set, min_overlap=2)


_ORACLE_DECONTAMINATE = f"""
WITH h AS (
    SELECT doc_id, text, {_DUCK_HASH32.format(seed="eval")} AS h32 FROM documents
),
tsh AS (
    SELECT doc_id AS train_doc, UNNEST(list_distinct({_DUCK_SHINGLES})) AS shingle
    FROM h WHERE h32 >= {int(0.1 * (1 << 32))}
),
esh AS (
    SELECT doc_id AS eval_doc, UNNEST(list_distinct({_DUCK_SHINGLES})) AS shingle
    FROM h WHERE h32 < {int(0.1 * (1 << 32))}
)
SELECT train_doc, eval_doc, CAST(COUNT(*) AS BIGINT) AS n_common
FROM tsh JOIN esh USING (shingle)
GROUP BY train_doc, eval_doc
HAVING COUNT(*) >= 2
"""


def q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation verdict (operators/curate.py): dup > language >
    too_short > low_quality gate cascade, one scan + one window."""
    from tsdownsample_spark.operators.curate import curate_documents

    docs = _load_wide(spark, sf_dir, "documents")
    return curate_documents(docs, min_quality=0.45, langs=("en",), min_words=8)


_ORACLE_CURATE = f"""
WITH feats AS ({_ORACLE_TEXT_FEATURES}),
lang AS ({_ORACLE_LANG_ID}),
uniq AS (
    SELECT doc_id, text IS NULL AS no_text,
           doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_uniq
    FROM documents
),
verdict AS (
    SELECT f.doc_id,
           CASE WHEN u.no_text THEN 'no_text'
                WHEN NOT u.is_uniq THEN 'duplicate'
                WHEN l.lang_pred <> 'en' THEN 'language'
                WHEN f.n_words < 8 THEN 'too_short'
                WHEN f.quality_score < 0.45 THEN 'low_quality'
                ELSE 'ok' END AS reason
    FROM feats f
    JOIN lang l USING (doc_id)
    JOIN uniq u USING (doc_id)
)
SELECT doc_id, reason = 'ok' AS keep, reason FROM verdict
"""


def queries() -> dict:
    return {
        "q_text_features": q_text_features,
        "q_lang_id": q_lang_id,
        "q_curate": q_curate,
        "q_dedup_exact": q_dedup_exact,
        "q_minhash_lsh": q_minhash_lsh,
        "q_jaccard_pairs": q_jaccard_pairs,
        "q_containment": q_containment,
        "q_ngram_novelty": q_ngram_novelty,
        "q_dedup_cluster": q_dedup_cluster,
        "q_lm_score": q_lm_score,
        "q_simhash": q_simhash,
        "q_ann_topk": q_ann_topk,
        "q_ann_lsh": q_ann_lsh,
        "q_ann_ivf": q_ann_ivf,
        "q_ann_ivf_mp": q_ann_ivf_mp,
        "q_ann_lsh_mp": q_ann_lsh_mp,
        "q_embed_neardup": q_embed_neardup,
        "q_semantic_dedup": q_semantic_dedup,
        "q_tokenize": q_tokenize,
        "q_heavy_hitters": q_heavy_hitters,
        "q_token_entropy": q_token_entropy,
        "q_zipf_slope": q_zipf_slope,
        "q_pmi": q_pmi,
        "q_pii_scrub": q_pii_scrub,
        "q_repetition": q_repetition,
        "q_tfidf": q_tfidf,
        "q_inverted_index": q_inverted_index,
        "q_source_divergence": q_source_divergence,
        "q_source_overlap": q_source_overlap,
        "q_doc_downsample": q_doc_downsample,
        "q_fingerprint": q_fingerprint,
        "q_pack_concat": q_pack_concat,
        "q_pack_greedy": q_pack_greedy,
        "q_split_assign": q_split_assign,
        "q_quota_sample": q_quota_sample,
        "q_token_budget": q_token_budget,
        "q_temp_mix": q_temp_mix,
        "q_hash_sample": q_hash_sample,
        "q_weighted_sample": q_weighted_sample,
        "q_decontaminate": q_decontaminate,
    }


def oracle_sql() -> dict:
    return {
        "q_text_features": _ORACLE_TEXT_FEATURES,
        "q_lang_id": _ORACLE_LANG_ID,
        "q_curate": _ORACLE_CURATE,
        "q_dedup_exact": _ORACLE_DEDUP_EXACT,
        "q_minhash_lsh": _ORACLE_MINHASH_LSH,
        "q_jaccard_pairs": _ORACLE_JACCARD,
        "q_containment": _ORACLE_CONTAINMENT,
        "q_ngram_novelty": _ORACLE_NGRAM_NOVELTY,
        "q_dedup_cluster": _ORACLE_DEDUP_CLUSTER,
        "q_lm_score": _ORACLE_LM_SCORE,
        "q_simhash": _ORACLE_SIMHASH,
        "q_ann_topk": _ORACLE_ANN_TOPK,
        "q_ann_lsh": _oracle_ann_lsh(),
        "q_ann_ivf": _oracle_ann_ivf(),
        "q_ann_ivf_mp": _oracle_ann_ivf_mp(),
        "q_ann_lsh_mp": _oracle_ann_lsh_mp(),
        "q_embed_neardup": _ORACLE_EMBED_NEARDUP,
        "q_semantic_dedup": _oracle_semantic_dedup(),
        "q_tokenize": _ORACLE_TOKENIZE,
        "q_heavy_hitters": _ORACLE_HEAVY_HITTERS,
        "q_token_entropy": _ORACLE_TOKEN_ENTROPY,
        "q_zipf_slope": _ORACLE_ZIPF_SLOPE,
        "q_pmi": _ORACLE_PMI,
        "q_pii_scrub": _ORACLE_PII_SCRUB,
        "q_repetition": _ORACLE_REPETITION,
        "q_tfidf": _ORACLE_TFIDF,
        "q_inverted_index": _ORACLE_INVERTED_INDEX,
        "q_source_divergence": _ORACLE_SOURCE_DIVERGENCE,
        "q_source_overlap": _ORACLE_SOURCE_OVERLAP,
        # q_bigram_lm registers in queries.py's TAIL block (keeps the
        # driver's 50-row window composition unchanged)
        "q_bigram_lm": _ORACLE_BIGRAM_LM,
        "q_doc_downsample": _ORACLE_DOC_DOWNSAMPLE,
        "q_fingerprint": _ORACLE_FINGERPRINT,
        "q_pack_concat": _ORACLE_PACK_CONCAT,
        "q_pack_greedy": _ORACLE_PACK_GREEDY,
        "q_split_assign": _ORACLE_SPLIT_ASSIGN,
        "q_quota_sample": _ORACLE_QUOTA_SAMPLE,
        "q_token_budget": _oracle_token_budget(),
        "q_temp_mix": _ORACLE_TEMP_MIX,
        "q_hash_sample": _ORACLE_HASH_SAMPLE,
        "q_weighted_sample": _ORACLE_WEIGHTED_SAMPLE,
        "q_decontaminate": _ORACLE_DECONTAMINATE,
    }
