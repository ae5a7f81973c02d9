"""Lossless round-trip property tests for the delta-of-delta and Gorilla
XOR codecs, plus the Spark compress/decompress operators."""

import numpy as np
import pytest

from tsdownsample_spark.functions.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)


class TestDoD:
    @pytest.mark.parametrize("n", [0, 1, 2, 3, 100, 10_000])
    def test_regular_grid(self, n):
        ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
        np.testing.assert_array_equal(decode_dod(encode_dod(ts)), ts)

    def test_jittered_micros(self):
        rng = np.random.default_rng(1)
        ts = np.cumsum(rng.integers(1, 10_000_000, size=5_000)).astype(np.int64)
        np.testing.assert_array_equal(decode_dod(encode_dod(ts)), ts)

    def test_all_dod_classes(self):
        # craft deltas hitting every control class incl. both escapes
        deltas = np.array(
            [100, 100, 164, 101, 356, 100, 2148, 53, 2**20, 7, 2**40, 1, 100],
            dtype=np.int64,
        )
        ts = np.concatenate(([0], np.cumsum(deltas)))
        np.testing.assert_array_equal(decode_dod(encode_dod(ts)), ts)

    def test_negative_and_nonmonotone(self):
        ts = np.array([50, 10, -500, -499, 10**15, 10**15 + 1], dtype=np.int64)
        np.testing.assert_array_equal(decode_dod(encode_dod(ts)), ts)

    def test_datetime_input(self):
        ts = np.arange("2024-01-01", "2024-01-02", dtype="datetime64[m]").astype(
            "datetime64[us]"
        )
        np.testing.assert_array_equal(decode_dod(encode_dod(ts)), ts.view(np.int64))

    def test_compression_ratio_regular(self):
        ts = np.arange(100_000, dtype=np.int64) * 1_000_000
        blob = encode_dod(ts)
        # regular grid -> ~1 bit per point after the header
        assert len(blob) < 100_000 / 8 + 64


class TestGorilla:
    @pytest.mark.parametrize("n", [0, 1, 2, 100, 10_000])
    def test_random(self, n):
        rng = np.random.default_rng(n)
        v = rng.standard_normal(n)
        np.testing.assert_array_equal(decode_gorilla(encode_gorilla(v)), v)

    def test_constant_and_repeats(self):
        v = np.array([3.14, 3.14, 3.14, 2.0, 2.0, 3.14], dtype=np.float64)
        np.testing.assert_array_equal(decode_gorilla(encode_gorilla(v)), v)
        const = np.full(10_000, 42.0)
        blob = encode_gorilla(const)
        assert len(blob) < 10_000 / 8 + 64
        np.testing.assert_array_equal(decode_gorilla(blob), const)

    def test_special_values(self):
        v = np.array(
            [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1.7e308, -5.5],
            dtype=np.float64,
        )
        out = decode_gorilla(encode_gorilla(v))
        np.testing.assert_array_equal(out.view(np.uint64), v.view(np.uint64))

    def test_slowly_varying(self):
        # Gorilla's sweet spot: near-constant values -> high compression
        rng = np.random.default_rng(3)
        v = 100.0 + np.cumsum(rng.choice([0.0, 0.25, -0.25], size=50_000))
        blob = encode_gorilla(v)
        assert len(blob) < 8 * 50_000 * 0.6
        np.testing.assert_array_equal(decode_gorilla(blob), v)

    def test_int_input_cast(self):
        v = np.arange(100, dtype=np.int32)
        np.testing.assert_array_equal(
            decode_gorilla(encode_gorilla(v)), v.astype(np.float64)
        )


def test_spark_roundtrip(spark):
    import pandas as pd

    from tsdownsample_spark.operators.compress import (
        compress_series,
        decompress_series,
    )

    rng = np.random.default_rng(7)
    frames = []
    for d in range(5):
        n = int(rng.integers(100, 2_000))
        # steps up to ~200 s so every series spans multiple day-chunks
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            np.cumsum(rng.integers(1, 200_000_000, size=n)), "us"
        )
        frames.append(
            pd.DataFrame(
                {"doc_id": f"d{d}", "ts": ts, "value": rng.standard_normal(n)}
            )
        )
    pdf = pd.concat(frames)
    df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=0))
    comp = compress_series(df, x_col="ts", y_col="value", by=["doc_id"])
    rows = comp.collect()
    assert {r.doc_id for r in rows} == {f"d{d}" for d in range(5)}
    # the DEFAULT shape is bounded: day chunks, so chunk_id exists and no
    # row holds a whole multi-day series
    assert "chunk_id" in comp.columns
    assert len(rows) > 5  # more segments than series
    # compressed series should be smaller than raw 16 B/point (summed per
    # series — a 1-point trailing chunk alone can exceed it via headers)
    import collections

    tot = collections.Counter()
    for r in rows:
        tot[r.doc_id] += len(r.ts_blob) + len(r.val_blob) - 16 * r.n
    assert all(v < 0 for v in tot.values())

    # unbounded (one row per series) is an explicit opt-in
    unb = compress_series(
        df, x_col="ts", y_col="value", by=["doc_id"], chunk_span=None
    )
    assert "chunk_id" not in unb.columns
    assert unb.count() == 5
    # 'auto' refuses raw-integer x instead of silently going unbounded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="auto"):
        compress_series(
            df.withColumn("xi", df.ts.cast("long")), x_col="xi", by=["doc_id"]
        )

    back = decompress_series(comp, by=["doc_id"], x_col="ts", y_col="value")
    got = back.toPandas().sort_values(["doc_id", "ts"]).reset_index(drop=True)
    exp = pdf.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "ts", "value"]], exp[["doc_id", "ts", "value"]]
    )


class TestTokenCodec:
    def test_roundtrip_and_width(self):
        import numpy as np

        from tsdownsample_spark.functions.codecs import decode_tokens, encode_tokens

        rng = np.random.default_rng(2)
        for ln in (0, 1, 2, 3, 100, 4096):
            t = rng.integers(0, 50_257, ln).astype(np.int32)
            assert np.array_equal(decode_tokens(encode_tokens(t)), t)
        # width adapts: tiny alphabet packs ~10x denser than int32
        small = rng.integers(0, 4, 10_000).astype(np.int32)
        assert len(encode_tokens(small)) < 10_000 * 4 / 10
        # constant-zero sequence still width >= 1
        z = np.zeros(64, dtype=np.int32)
        assert np.array_equal(decode_tokens(encode_tokens(z)), z)
        # negatives rejected (token ids are unsigned by contract)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            encode_tokens(np.array([-1], dtype=np.int32))

    def test_spark_token_roundtrip(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from tsdownsample_spark.operators.compress import (
            compress_tokens,
            decompress_tokens,
        )

        rng = np.random.default_rng(3)
        rows = [
            (f"d{i}", rng.integers(0, 50_257, int(rng.integers(1, 400))).astype(np.int32).tolist())
            for i in range(50)
        ] + [("dnull", None), ("dempty", [])]
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
        packed = compress_tokens(df)
        assert "tokens" not in packed.columns
        rt = decompress_tokens(packed)
        got = {r["doc_id"]: r["tokens"] for r in rt.collect()}
        assert got == dict(rows)
        # ~2x vs int32 at 50k vocab (17 bits), headers amortized
        sizes = packed.agg(F.sum(F.length("tokens_packed"))).collect()[0][0]
        raw = df.agg(
            F.sum(F.when(F.col("tokens").isNotNull(), 4 * F.size("tokens")).otherwise(0))
        ).collect()[0][0]
        assert sizes < raw * 0.6
