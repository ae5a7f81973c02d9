"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute force: broadcast the (small) probe set
  against all vectors; the dot/norm math is a native higher-order-function
  expression (JVM, codegen) — no UDF.  This is the baseline and the
  verifier for approximate variants.
* ``lsh_ann_topk`` — random-hyperplane LSH: vectors hash to a sign-pattern
  bucket over ``n_planes`` fixed hyperplanes (deterministic, seeded; the
  planes are plain literals so ANY engine can reproduce the bucketing);
  probes search only their own bucket.  The scale path: the bucket id is a
  shuffle/partition key, so each query touches 1/2^planes of the corpus.

At 100 TB the brute-force side stays a broadcast join (probes are small);
the LSH variant's bucket column doubles as a partition/bucketing key for
the stored table, turning ANN into partition-pruned scans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    expr = f"{_dot_expr(a, b)} / ({_norm_expr(a)} * {_norm_expr(b)})"
    return df.withColumn(out, F.expr(expr))


def cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (self excluded).

    Deterministic ranking: (round(cosine, 6) desc, vec_id asc).
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    joined = vectors.join(F.broadcast(p), F.col(id_col) != F.col("probe_id"))
    scored = with_cosine(joined, "probe_vec", vec_col, "cosine").withColumn(
        "cos_r", F.round("cosine", 6)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_r"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", F.col(id_col).alias("neighbor_id"), "cos_r")
    )


def near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    Without ``candidates`` this is the exact O(n^2) pass (fine for probe
    sets / small corpora; the verifier for approximate paths).  At scale,
    pass LSH-bucketed candidate pairs (same shape as lsh_candidate_pairs)
    to restrict the comparison set.
    """
    # precompute per-vector norms once; each pair then costs one dot product
    normed = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.expr(_norm_expr(vec_col)).alias("nrm"),
    )
    a = normed.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    if candidates is not None:
        # shuffle-join the pairs against the semi-joined subset of vectors
        # appearing in candidates — NOT a broadcast of the full vector table
        # (unbounded at scale); AQE may still pick broadcast when small.
        ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .union(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        needed = normed.join(ids, id_col, "left_semi")
        a = needed.select(
            F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
        )
        b = needed.select(
            F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
        )
        joined = candidates.join(a, "id_a").join(b, "id_b")
    else:
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn(
            "cos_r",
            F.round(F.expr(_dot_expr("va", "vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos_r") >= threshold)
        .select("id_a", "id_b", "cos_r")
    )


def near_dup_pairs_blocked(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine near-dups via BLOCKED comparison — the scalable
    form of the O(n^2) verifier: vectors are hashed into ``n_blocks`` blocks,
    each unordered block pair (bi <= bj) becomes one task that compares two
    bounded vector blocks with vectorized NumPy.

    Cost model: every vector is replicated n_blocks times (the standard
    blocked cross-join trade: replication O(n*B) vs task state O((n/B)^2));
    per-task memory is two blocks, never the corpus.

    Numeric parity: the dot product is accumulated SEQUENTIALLY over the
    dimensions (vectorized across pairs) — the same left-to-right float64
    fold as the SQL `aggregate(zip_with(...))` expression and the DuckDB
    oracle, so cos_r is bit-identical to `near_dup_pairs`, not merely close
    (a BLAS matmul would differ in the last ulp and flip round() boundaries).
    """
    import pandas as pd

    B = int(n_blocks)
    id_type = vectors.schema[id_col].dataType.simpleString()
    blk = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("_b"),
    )
    # replicate each row to every block pair it participates in
    rep = blk.select(
        "_id", "_v", "_b",
        F.explode(F.expr(f"sequence(0, {B - 1})")).alias("_o"),
    ).select(
        "_id", "_v", "_b",
        F.least("_b", "_o").alias("bi"),
        F.greatest("_b", "_o").alias("bj"),
    ).dropDuplicates(["_id", "bi", "bj"])

    thr = float(threshold)

    def _compare(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        same = bi == bj
        a = pdf[pdf["_b"] == bi]
        b = pdf[pdf["_b"] == bj] if not same else a
        if a.empty or b.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        ida = a["_id"].to_numpy()
        idb = b["_id"].to_numpy()
        va = np.stack(a["_v"].to_numpy()).astype(np.float64)
        vb = np.stack(b["_v"].to_numpy()).astype(np.float64)
        dim = va.shape[1]
        # sequential fold over dims (the SQL aggregate's exact add order),
        # vectorized across the pair matrix — bit-identical doubles
        dot = np.zeros((len(va), len(vb)))
        na = np.zeros(len(va))
        nb = np.zeros(len(vb))
        for d in range(dim):
            dot += va[:, d][:, None] * vb[None, :, d]
            na += va[:, d] * va[:, d]
            nb += vb[:, d] * vb[:, d]
        cos = dot / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])
        # slack prefilter only — the contract-grade round+threshold happens
        # Spark-side with the same round() as the unblocked operator.  The
        # slack must exceed HALF THE ROUNDING QUANTUM (0.5e-6): a raw cos of
        # thr - 4e-7 still rounds UP to thr and must survive the prefilter.
        mask = cos >= thr - 5.1e-7
        if same:
            mask &= np.tri(len(va), len(vb), k=-1, dtype=bool).T  # i < j positions
        ii, jj = np.where(mask)
        lo = np.minimum(ida[ii], idb[jj])
        hi = np.maximum(ida[ii], idb[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": cos[ii, jj]})

    pairs = rep.groupBy("bi", "bj").applyInPandas(
        _compare, f"id_a {id_type}, id_b {id_type}, cos double"
    )
    return (
        pairs.withColumn("cos_r", F.round("cos", 6))
        .filter(F.col("cos_r") >= thr)
        .select("id_a", "id_b", "cos_r")
    )


def lsh_planes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic hyperplanes, rounded so they serialize exactly in SQL."""
    rng = np.random.default_rng(seed)
    return [
        [round(float(v), 6) for v in rng.standard_normal(dim)]
        for _ in range(n_planes)
    ]


def bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    """SQL expression for the sign-pattern bucket id of ``vec_col``."""
    terms = []
    for j, plane in enumerate(planes):
        arr = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in plane) + ")"
        terms.append(
            f"CASE WHEN {_dot_expr(vec_col, arr)} >= 0 THEN {1 << j} ELSE 0 END"
        )
    return " + ".join(terms)


def ivf_centroids(dim: int, n_cells: int, seed: int = 11) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids (seeded, rounded so they
    serialize exactly into SQL on any engine).  A trained quantizer would
    come from k-means over a sample; the *plumbing* — cell assignment,
    partition-pruned probe, in-cell ranking — is identical and is what the
    engine owns."""
    rng = np.random.default_rng(seed)
    return [
        [round(float(v), 6) for v in rng.standard_normal(dim)]
        for _ in range(n_cells)
    ]


def cell_expr(vec_col: str, centroids: list[list[float]]) -> str:
    """SQL expression: index of the nearest centroid by dot product (cosine
    against unit-ish random centroids; deterministic ties -> lowest index)."""
    dots = []
    for c in centroids:
        arr = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in c) + ")"
        dots.append(_dot_expr(vec_col, arr))
    scored = ", ".join(f"named_struct('d', {d}, 'i', {i})" for i, d in enumerate(dots))
    # max over (d, -i): highest dot, lowest index on ties
    return (
        f"aggregate(array({scored}), named_struct('d', CAST('-Infinity' AS DOUBLE), 'i', -1), "
        "(acc, s) -> IF(s.d > acc.d, s, acc)).i"
    )


def ivf_ann_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """IVF-style approximate top-k: vectors are bucketed by nearest coarse
    centroid; each probe searches only its own cell (nprobe=1).

    Scale shape: ``cell`` is a partition/bucketing key for the stored
    table, so a probe is a partition-pruned scan of ~1/n_cells of the
    corpus; the probe side broadcasts (small by contract).
    """
    ce = cell_expr(vec_col, ivf_centroids(dim, n_cells, seed))
    v = vectors.withColumn("cell", F.expr(ce))
    p = probes.withColumn("cell", F.expr(ce)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec"), "cell"
    )
    joined = v.alias("v").join(
        F.broadcast(p).alias("p"),
        (F.col("v.cell") == F.col("p.cell"))
        & (F.col(f"v.{id_col}") != F.col("p.probe_id")),
    )
    scored = with_cosine(joined, "probe_vec", f"v.{vec_col}", "cosine").withColumn(
        "cos_r", F.round("cosine", 6)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_r"), F.asc(f"v.{id_col}"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "rank",
            F.col(f"v.{id_col}").alias("neighbor_id"),
            "cos_r",
            F.col("v.cell").alias("cell"),
        )
    )


def lsh_ann_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates limited to the probe's LSH bucket."""
    planes = lsh_planes(dim, n_planes, seed)
    be = bucket_expr(vec_col, planes)
    v = vectors.withColumn("bucket", F.expr(be))
    p = (
        probes.withColumn("bucket", F.expr(be))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            "bucket",
        )
    )
    joined = v.alias("v").join(
        F.broadcast(p).alias("p"),
        (F.col("v.bucket") == F.col("p.bucket"))
        & (F.col(f"v.{id_col}") != F.col("p.probe_id")),
    )
    scored = with_cosine(joined, "probe_vec", f"v.{vec_col}", "cosine").withColumn(
        "cos_r", F.round("cosine", 6)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_r"), F.asc(f"v.{id_col}"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "rank",
            F.col(f"v.{id_col}").alias("neighbor_id"),
            "cos_r",
            F.col("v.bucket").alias("bucket"),
        )
    )
