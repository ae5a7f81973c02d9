"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container image has no image/audio codecs (PIL/cv2/ffmpeg), so the
*decode* steps are stubbed exactly as the build spec requires: a real
backend is attempted behind an import-try; otherwise a clearly-marked
deterministic fake parses our own synthetic header format.  Everything
Spark-side — schema, Arrow batch shape, mapInPandas signatures, partition
behavior — is real and tested.

Synthetic payload format (header little-endian):
    magic  4B  = b'TSDM'
    kind   1B  (0=image, 1=audio, 2=video)
    width  4B  uint32 / sample_rate for audio
    height 4B  uint32 / n_samples for audio / n_frames for video
    chans  1B
    payload   width*height*chans bytes (seeded)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"TSDM"
KINDS = ("image", "audio", "video")


def media_params(n: int = 64, seed: int = 42):
    """The deterministic (media_id, kind, w, h, c, payload) stream behind
    synth_media — exposed so an oracle can state expected metadata without
    going through the byte-parsing path under test."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        kind = int(rng.integers(0, 3))
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = int(rng.integers(1, 4))
        payload = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
        yield f"m{i:06d}", kind, w, h, c, payload


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    rows = [
        (mid, KINDS[kind], bytearray(MAGIC + struct.pack("<BIIB", kind, w, h, c) + payload))
        for mid, kind, w, h, c, payload in media_params(n, seed)
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, data binary")
    # a tiny table sliced across every core spawns 2x|cores| Python workers
    # for the two mapInPandas stages — batch a few rows per task instead
    return df.coalesce(max(1, min(8, n // 8)))


def _parse_header(blob: bytes) -> tuple[int, int, int, int]:
    if blob[:4] != MAGIC:
        raise ValueError("not a TSDM payload")
    kind, w, h, c = struct.unpack("<BIIB", blob[4:14])
    return kind, w, h, c


def decode_media(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Attach typed metadata (width/height/channels/n_bytes) parsed from the
    payload header.  A real image decode would go through PIL here — absent
    in this environment, so only the deterministic TSDM header path runs."""
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        real_backend = True
    except ImportError:
        real_backend = False

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf[data_col]:
                b = bytes(blob)
                if real_backend and not b.startswith(MAGIC):  # pragma: no cover
                    raise NotImplementedError(
                        "real image decode requires PIL — not available here"
                    )
                kind, w, h, c = _parse_header(b)
                metas.append((w, h, c, len(b) - 14))
            out = pdf.copy()
            out["width"], out["height"], out["channels"], out["n_bytes"] = zip(*metas)
            yield out

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    return df.mapInPandas(fn, schema)


def byte_histogram(
    df: DataFrame, data_col: str = "data", bins: int = 16, out_col: str = "features"
) -> DataFrame:
    """Feature extraction plumbing: normalized byte histogram of the payload
    as an array<double> embedding (vectorized numpy per Arrow batch)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        width = 256 // bins
        for pdf in batches:
            feats = []
            for blob in pdf[data_col]:
                arr = np.frombuffer(bytes(blob)[14:], dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=bins).astype(np.float64)
                total = hist.sum()
                feats.append(hist / total if total else hist)
            out = pdf.copy()
            out[out_col] = feats
            yield out

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    return df.mapInPandas(fn, schema)


def resize_media(
    df: DataFrame,
    out_w: int,
    out_h: int,
    data_col: str = "data",
    out_col: str = "data_resized",
) -> DataFrame:
    """Nearest-neighbor resize of image payloads to (out_w, out_h).

    The TSDM payload is raw interleaved pixels, so this is a REAL resize
    (numpy index gather per Arrow batch), not a stub — a PIL/cv2 decode
    would only be needed for compressed formats (absent here, see
    decode_media).  The output blob carries an updated header, so resized
    media round-trips through decode_media/byte_histogram unchanged.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs = []
            for blob in pdf[data_col]:
                b = bytes(blob)
                kind, w, h, c = _parse_header(b)
                pix = np.frombuffer(b[14:], dtype=np.uint8)
                pix = pix[: w * h * c].reshape(h, w, c)
                # nearest-neighbor index maps (floor((i+0.5)*src/dst))
                yi = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64)
                xi = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64)
                resized = pix[np.minimum(yi, h - 1)][:, np.minimum(xi, w - 1)]
                nb = (
                    MAGIC
                    + struct.pack("<BIIB", kind, out_w, out_h, c)
                    + resized.tobytes()
                )
                out_blobs.append(bytearray(nb))
            out = pdf.copy()
            out[out_col] = out_blobs
            yield out

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )
    return df.mapInPandas(fn, schema)


def frame_sample(
    df: DataFrame,
    data_col: str = "data",
    n_frames: int = 4,
    out_col: str = "frames",
) -> DataFrame:
    """Video frame sampling stub: EveryNth over the payload interpreted as
    (height) frames of (width*channels) bytes — the same strided-selection
    semantics as the EveryNth downsampler, applied to a binary payload."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tsdownsample_spark.kernels.selectors import everynth

        for pdf in batches:
            frames_col = []
            for blob in pdf[data_col]:
                b = bytes(blob)
                kind, w, h, c = _parse_header(b)
                frame_size = w * c
                payload = b[14:]
                total_frames = len(payload) // frame_size if frame_size else 0
                idx = everynth(np.empty(max(total_frames, 1)), n_frames)
                frames_col.append(
                    [
                        bytearray(payload[i * frame_size : (i + 1) * frame_size])
                        for i in idx.tolist()
                        if i < total_frames
                    ]
                )
            out = pdf.copy()
            out[out_col] = frames_col
            yield out

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.BinaryType()))]
    )
    return df.mapInPandas(fn, schema)
