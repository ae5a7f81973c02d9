"""Deterministic synthetic token table (BASELINE input_hint shape).

Schema: (doc_id string, tokens array<int>, n_tok int, source string).
Seeded NumPy; per-doc lengths drawn from the reference parity-grid lengths
(tests/test_algos_python_compliance.py:31) plus edge lengths, skewed so one
source holds ~half the docs (FIXTURES.md F1) to exercise salting.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TOKEN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

PARITY_LENGTHS = (10_000, 10_032, 20_321, 23_489)
EDGE_LENGTHS = (1, 2, 3, 99, 100, 101, 2_001, 10_001)
SOURCES = ("web", "books", "code", "wiki")


def synth_token_rows(
    n_docs: int,
    seed: int = 42,
    lengths=PARITY_LENGTHS,
    include_edges: bool = True,
    vocab: int = 50_257,
):
    """Yield (doc_id, tokens int32 ndarray, n_tok, source) deterministically."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        if include_edges and i < len(EDGE_LENGTHS):
            n = EDGE_LENGTHS[i]
        else:
            n = int(rng.choice(lengths))
        # Skew: source 0 holds ~50% of docs.
        src = SOURCES[0] if rng.random() < 0.5 else SOURCES[1 + int(rng.integers(0, 3))]
        toks = rng.integers(0, vocab, size=n, dtype=np.int32)
        rows.append((f"{src}-{i:08d}", toks, n, src))
    return rows


def synth_token_table(
    spark: SparkSession,
    n_docs: int = 200,
    seed: int = 42,
    partitions: int | None = None,
    **kw,
) -> DataFrame:
    rows = [
        (doc_id, toks.tolist(), n, src)
        for doc_id, toks, n, src in synth_token_rows(n_docs, seed=seed, **kw)
    ]
    df = spark.createDataFrame(rows, TOKEN_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df
