"""Snapshot tables, checkpoint/resume, lineage, salting."""

import os

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.plans.partitioning import repartition_by_series, salted, skew_report
from tsdownsample_spark.sources.synth import synth_token_table
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.checkpoint import PartitionedJob


def test_snapshot_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.current_snapshot_id() is None
    df1 = spark.range(10).withColumn("v", F.lit("a"))
    s1 = t.append(df1)
    assert t.read(spark).count() == 10
    df2 = spark.range(5).withColumn("v", F.lit("b"))
    s2 = t.append(df2)
    assert t.read(spark).count() == 15
    # time travel: snapshot s1 still reads exactly the first commit
    assert t.read(spark, s1).count() == 10
    hist = t.history()
    assert [h["snapshot_id"] for h in hist] == [s1, s2]
    assert hist[1]["parent"] == s1


def test_read_empty_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)


def test_checkpoint_resume(spark, tmp_path):
    src = synth_token_table(spark, n_docs=24, seed=1).cache()
    out = SnapshotTable(str(tmp_path / "out"))
    job = PartitionedJob("rollup_demo", out)
    parts = sorted(r.source for r in src.select("source").distinct().collect())

    calls = []
    crash = {"armed": True}

    def process(part):
        calls.append(part)
        if part == parts[2] and crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("simulated executor loss")
        return src.filter(F.col("source") == part).groupBy("source").agg(
            F.count("*").alias("docs"), F.sum("n_tok").alias("toks")
        )

    # first run crashes on the 3rd partition
    with pytest.raises(RuntimeError):
        job.run(parts, process, input_fingerprint="fp1")
    done_first = {r["partition"] for r in job.lineage()}
    assert done_first == set(parts[:2])

    # resume: completed partitions are skipped, the rest run
    calls.clear()
    summary = job.run(parts, process, input_fingerprint="fp1")
    assert summary["skipped"] == parts[:2]
    assert sorted(summary["processed"]) == sorted(parts[2:])
    assert calls == parts[2:]

    # all partitions now present in output
    got = out.read(spark)
    assert got.count() == len(parts)

    # lineage carries metrics
    for r in job.lineage():
        assert r["rows"] >= 1
        assert r["wall_ms"] > 0
        assert r["rows_per_sec"] is None or r["rows_per_sec"] >= 0

    # input advanced -> fingerprints no longer match -> full recompute
    assert job.completed("fp2") == set()


def test_idempotent_rerun_no_duplicates(spark, tmp_path):
    src = synth_token_table(spark, n_docs=12, seed=2).cache()
    out = SnapshotTable(str(tmp_path / "out2"))
    job = PartitionedJob("j", out)
    parts = sorted(r.source for r in src.select("source").distinct().collect())

    def process(part):
        return src.filter(F.col("source") == part).select("doc_id", "source")

    job.run(parts, process, input_fingerprint="fp")
    n1 = out.read(spark).count()
    summary = job.run(parts, process, input_fingerprint="fp")
    assert summary["processed"] == []
    assert out.read(spark).count() == n1  # no duplicate appends


def test_salting_and_skew(spark):
    df = synth_token_table(spark, n_docs=200, seed=42)
    rep = skew_report(df, "source")
    shares = {r["source"]: r["share"] for r in rep if r["source"] != "__imbalance_factor__"}
    assert shares["web"] > 0.35  # the synthetic skew exists
    s = salted(df, "doc_id", buckets=8)
    per_bucket = s.groupBy("source", "salt").count()
    web = per_bucket.filter(F.col("source") == "web").collect()
    assert len(web) == 8  # hot key split into all buckets
    counts = [r["count"] for r in web]
    assert max(counts) <= 3 * min(counts)  # roughly even

    plan = repartition_by_series(df)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower() or "RangePartitioning" in plan
