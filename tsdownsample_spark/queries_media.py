"""Multimodal contract query: the Spark side parses opaque binary payloads
(header decode + byte-histogram features via mapInPandas —
operators/multimodal.py); the oracle INDEPENDENTLY re-derives everything in
DuckDB SQL from the same parquet bytes — little-endian header fields via
hex()+substr byte math, the 16-bin byte histogram via the high nibble of
each payload byte.  Neither side sees the generator parameters.

The synthetic media table is generated once (deterministic, seeded) and
written to a local parquet file so both engines read identical bytes — the
driver's testdata has no binary-media table.

Float fractions are compared as floor(x*1e6 + 0.5) scaled integers computed
with identical double ops on both sides (ROUND half-up vs scaled-double
rounding diverges on exact .5 boundaries, which w*h*c denominators like
3200 can hit).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdownsample_spark.operators.multimodal import (
    MAGIC,
    byte_histogram,
    decode_media,
    media_params,
)

N_MEDIA = 64
SEED = 42


def media_parquet_path(n: int = N_MEDIA, seed: int = SEED) -> str:
    """Write the deterministic media table to parquet (once, atomic) and
    return its path.  Plain pyarrow — no Spark needed, so oracle_sql() can
    materialize it too regardless of driver call order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/tsds_media_{n}_{seed}.parquet"
    if not os.path.exists(path):
        ids, blobs = [], []
        for mid, kind, w, h, c, payload in media_params(n, seed):
            ids.append(mid)
            blobs.append(MAGIC + struct.pack("<BIIB", kind, w, h, c) + payload)
        tbl = pa.table(
            {"media_id": pa.array(ids), "data": pa.array(blobs, type=pa.binary())}
        )
        pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)
    return path


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode typed metadata from binary media payloads + feature-vector
    checksums from the byte-histogram extractor (both mapInPandas batches).
    ``kind`` comes from the parsed header byte, not a stored column."""
    from tsdownsample_spark.plans.shipping import ship_package

    ship_package(spark)
    media = spark.read.parquet(media_parquet_path()).coalesce(8)
    # kind from the header byte (offset 5, 1-indexed), JVM-side
    media = media.withColumn(
        "kind",
        F.expr(
            "element_at(array('image', 'audio', 'video'), "
            "CAST(conv(hex(substring(data, 5, 1)), 16, 10) AS INT) + 1)"
        ),
    )
    decoded = decode_media(media)
    feats = byte_histogram(decoded, bins=16)
    scaled = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        "channels",
        "n_bytes",
        # histogram fractions sum to ~1 by construction; both checksums are
        # re-derived by the oracle from the raw parquet bytes in SQL
        scaled(F.expr("aggregate(features, CAST(0.0 AS DOUBLE), (a, v) -> a + v)")).alias(
            "hist_sum_s"
        ),
        scaled(F.element_at("features", 1)).alias("hist_b0_s"),
    )


def _oracle_media_meta() -> str:
    """Parse the TSDM header and byte histogram from the BLOB in DuckDB:
    hex() the payload, read little-endian uint32 fields by reordering hex
    byte pairs, and bin each payload byte by its high nibble (byte // 16 ==
    first hex char) via UNNEST(range(n_bytes))."""
    path = media_parquet_path()
    # header layout (1-indexed bytes): magic 1-4, kind 5, width 6-9 LE,
    # height 10-13 LE, channels 14, payload 15.. -> hex chars 2*b-1..2*b
    le32 = lambda b: (  # noqa: E731
        f"('0x' || substr(hx, {2 * (b + 3) - 1}, 2) || substr(hx, {2 * (b + 2) - 1}, 2)"
        f" || substr(hx, {2 * (b + 1) - 1}, 2) || substr(hx, {2 * b - 1}, 2))::INTEGER"
    )
    return f"""
WITH hdr AS (
    SELECT media_id, hex(data) AS hx, octet_length(data) AS len
    FROM read_parquet('{path}')
),
meta AS (
    SELECT media_id, hx,
           CASE ('0x' || substr(hx, 9, 2))::INTEGER
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           {le32(6)} AS width,
           {le32(10)} AS height,
           ('0x' || substr(hx, 27, 2))::INTEGER AS channels,
           len - 14 AS n_bytes
    FROM hdr
),
nibs AS (
    SELECT m.media_id, substr(m.hx, 29 + CAST(2 * t.i AS INTEGER), 1) AS nib
    FROM meta m, UNNEST(range(m.n_bytes)) AS t(i)
),
counts AS (
    SELECT media_id, nib, CAST(COUNT(*) AS DOUBLE) AS c FROM nibs GROUP BY 1, 2
),
tot AS (SELECT media_id, SUM(c) AS total FROM counts GROUP BY 1),
hist AS (
    SELECT c.media_id,
           CAST(FLOOR(SUM(c.c / t.total) * 1e6 + 0.5) AS BIGINT) AS hist_sum_s,
           CAST(FLOOR(COALESCE(MAX(CASE WHEN c.nib = '0' THEN c.c END), 0.0)
                 / MAX(t.total) * 1e6 + 0.5) AS BIGINT) AS hist_b0_s
    FROM counts c JOIN tot t USING (media_id)
    GROUP BY c.media_id
)
SELECT m.media_id, m.kind, m.width, m.height, m.channels, m.n_bytes,
       h.hist_sum_s, h.hist_b0_s
FROM meta m JOIN hist h USING (media_id)
"""


def queries() -> dict:
    return {"q_media_meta": q_media_meta}


def oracle_sql() -> dict:
    return {"q_media_meta": _oracle_media_meta()}
