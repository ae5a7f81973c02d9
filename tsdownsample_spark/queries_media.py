"""Multimodal contract queries: the Spark side parses opaque binary payloads
(header decode via mapInPandas — operators/multimodal.py); the oracle states
the expected metadata from the generator parameters, so the byte-parsing
path under test is independent of the expected values.

The synthetic media table is generated in-session (deterministic, seeded) —
the driver's testdata has no binary-media table, and writing one is outside
the sandbox contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdownsample_spark.operators.multimodal import (
    KINDS,
    byte_histogram,
    decode_media,
    media_params,
    synth_media,
)

N_MEDIA = 64
SEED = 42


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode typed metadata from binary media payloads + a feature-vector
    checksum from the byte-histogram extractor (both mapInPandas batches)."""
    from tsdownsample_spark.plans.shipping import ship_package

    ship_package(spark)
    media = synth_media(spark, n=N_MEDIA, seed=SEED)
    decoded = decode_media(media)
    feats = byte_histogram(decoded, bins=16)
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        "channels",
        "n_bytes",
        # histogram fractions sum to 1 by construction; checked vs an
        # oracle-side exact recomputation (bincount over the same payload)
        F.round(F.expr("aggregate(features, CAST(0.0 AS DOUBLE), (a, v) -> a + v)"), 6).alias(
            "hist_sum"
        ),
        F.round(F.element_at("features", 1), 6).alias("hist_b0"),
    )


def _oracle_media_meta() -> str:
    import numpy as np

    rows = []
    for mid, kind, w, h, c, payload in media_params(N_MEDIA, SEED):
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr // 16, minlength=16).astype(np.float64)
        total = hist.sum()
        b0 = round(float(hist[0] / total) if total else float(hist[0]), 6)
        hsum = round(float((hist / total).sum()) if total else 0.0, 6)
        rows.append(
            f"('{mid}', '{KINDS[kind]}', {w}, {h}, {c}, "
            f"CAST({len(payload)} AS BIGINT), "
            # CAST: bare literals become DECIMAL in DuckDB ('1.0' != '1')
            f"CAST({hsum} AS DOUBLE), CAST({b0} AS DOUBLE))"
        )
    values = ",\n".join(rows)
    return f"""
SELECT * FROM (VALUES
{values}
) AS t(media_id, kind, width, height, channels, n_bytes, hist_sum, hist_b0)
"""


def queries() -> dict:
    return {"q_media_meta": q_media_meta}


def oracle_sql() -> dict:
    return {"q_media_meta": _oracle_media_meta()}
