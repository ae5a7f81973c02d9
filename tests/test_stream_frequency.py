"""Streaming heavy hitters == batch: the group-sum of per-batch partial
counts equals counting the full corpus, so heavy_hitters_snapshot after the
stream drains matches the batch operator row for row; redelivered batches
are no-ops via the ledger."""

import pytest
from conftest import make_file_stream
from pyspark.sql import functions as F

from tsdownsample_spark.operators.frequency import heavy_hitters
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_frequency import (
    heavy_hitters_snapshot,
    stream_value_counts,
)


def _exploded_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )


def _run_stream(spark, flat, schema, out_root, ckpt):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_value_counts(
        stream, out_root, "word", by=["source"], checkpoint=ckpt
    )
    assert q.awaitTermination(240)


@pytest.mark.slow
def test_stream_heavy_hitters_equals_batch(spark, tmp_path, sf_dir):
    ex = _exploded_docs(spark, sf_dir)
    flat = make_file_stream(spark, ex, tmp_path)  # 2 micro-batches
    out_root = str(tmp_path / "hh")
    _run_stream(spark, flat, ex.schema, out_root, str(tmp_path / "ckpt1"))

    got = sorted(
        map(tuple, heavy_hitters_snapshot(spark, out_root, "word",
                                          by=["source"], k=5).collect())
    )
    exp = sorted(
        map(tuple, heavy_hitters(ex, "word", by=["source"], k=5).collect())
    )
    assert len(exp) > 0 and got == exp

    # partials accumulated over >1 batch: at least one (source, word) key
    # must appear in BOTH micro-batches, i.e. table rows > distinct keys
    counts = SnapshotTable(f"{out_root}/counts").read(spark)
    assert counts.count() > counts.select("source", "word").distinct().count()

    # redelivery after a lost Spark checkpoint: ledger + self-marking
    # batch_id summaries make every append a no-op
    import shutil

    snaps = len(SnapshotTable(f"{out_root}/counts").history())
    shutil.rmtree(str(tmp_path / "ckpt1"))
    _run_stream(spark, flat, ex.schema, out_root, str(tmp_path / "ckpt1"))
    assert len(SnapshotTable(f"{out_root}/counts").history()) == snaps
    regot = sorted(
        map(tuple, heavy_hitters_snapshot(spark, out_root, "word",
                                          by=["source"], k=5).collect())
    )
    assert regot == exp

    # weighted variant streams too: weight 2 per row == doubled frequencies
    ex2 = ex.withColumn("wt", F.lit(2))
    flat2 = make_file_stream(spark, ex2, tmp_path / "w")
    out2 = str(tmp_path / "hh_w")
    stream = (
        spark.readStream.schema(ex2.schema)
        .option("maxFilesPerTrigger", 1).parquet(flat2)
    )
    q = stream_value_counts(
        stream, out2, "word", by=["source"], weight_col="wt",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    assert q.awaitTermination(240)
    gotw = sorted(
        map(tuple, heavy_hitters_snapshot(spark, out2, "word",
                                          by=["source"], k=5).collect())
    )
    assert gotw == sorted(
        (*t[:2], t[2] * 2, t[3]) for t in exp
    )


@pytest.mark.slow
def test_stream_fractional_weights_equal_batch(spark, tmp_path, sf_dir):
    """Non-integral weight_col: partial sums must keep their native DOUBLE
    type across batches (a per-batch long cast would truncate 0.25 to 0
    every batch and the stream could never equal batch — ADVICE r4)."""
    ex = _exploded_docs(spark, sf_dir).withColumn("wt", F.lit(0.25))
    flat = make_file_stream(spark, ex, tmp_path)  # 2 micro-batches
    out_root = str(tmp_path / "hh_frac")
    stream = (
        spark.readStream.schema(ex.schema)
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    q = stream_value_counts(
        stream, out_root, "word", by=["source"], weight_col="wt",
        checkpoint=str(tmp_path / "ckpt_frac"),
    )
    assert q.awaitTermination(240)
    counts = SnapshotTable(f"{out_root}/counts").read(spark)
    assert dict(counts.dtypes)["freq_partial"] == "double"
    got = sorted(
        map(tuple, heavy_hitters_snapshot(spark, out_root, "word",
                                          by=["source"], k=5).collect())
    )
    exp = sorted(
        map(tuple,
            heavy_hitters(ex, "word", by=["source"], k=5,
                          weight_col="wt").collect())
    )
    assert len(exp) > 0 and got == exp
