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


class _RecordingWriter:
    """Stand-in for DataFrameWriterV2 that records the fluent chain."""

    def __init__(self, log):
        self.log = log

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def append(self):
        self.log.append(("append",))


def test_iceberg_seam_write_read(spark, tmp_path, monkeypatch):
    """The format seam must route fmt='iceberg' through writeTo/using/append
    and read.format('iceberg').option('snapshot-id', ...) — verified with a
    recorder since the sandbox has no Iceberg jar — and fall back to the
    SnapshotTable stand-in under fmt='auto'."""
    from tsdownsample_spark.sources.tableio import (
        SnapshotTable,
        iceberg_available,
        read_table,
        write_table,
    )

    df = synth_token_table(spark, n_docs=8, seed=1)
    assert not iceberg_available(spark)  # sandbox: no jar

    # --- iceberg write path (recorded, not executed); patch the CONCRETE
    # class (pyspark 4: pyspark.sql.DataFrame is a facade over .classic)
    log = []
    monkeypatch.setattr(type(df), "writeTo", lambda self, t: (
        log.append(("writeTo", t)) or _RecordingWriter(log)
    ))
    assert write_table(df, "cat.db.tokens", fmt="iceberg") is None
    assert log == [("writeTo", "cat.db.tokens"), ("using", "iceberg"), ("append",)]

    # --- iceberg read path (recorded)
    calls = []

    class _Reader:
        def format(self, fmt):
            calls.append(("format", fmt))
            return self

        def option(self, k, v):
            calls.append(("option", k, v))
            return self

        def load(self, t):
            calls.append(("load", t))
            return "sentinel"

    monkeypatch.setattr(type(spark), "read", property(lambda self: _Reader()))
    out = read_table(spark, "cat.db.tokens", fmt="iceberg", snapshot_id="s1")
    assert out == "sentinel"
    assert calls == [("format", "iceberg"), ("option", "snapshot-id", "s1"),
                     ("load", "cat.db.tokens")]
    monkeypatch.undo()

    # --- auto falls back to the snapshot stand-in end-to-end
    root = str(tmp_path / "tbl")
    sid = write_table(df, root, fmt="auto")
    assert sid is not None and SnapshotTable(root).current_snapshot_id() == sid
    assert read_table(spark, root, fmt="auto").count() == 8


def test_iceberg_branch_executes_into_spark(spark, tmp_path):
    """Jar-less execution proof: fmt='iceberg' must reach Spark's real API
    (not short-circuit inside our seam) — Spark itself rejects the
    unresolved catalog / missing data source, with our calls on the stack."""
    from tsdownsample_spark.sources.tableio import read_table, write_table

    df = synth_token_table(spark, n_docs=2, seed=1)
    with pytest.raises(Exception) as wex:
        write_table(df, "nosuchcat.db.tokens", fmt="iceberg")
    assert "nosuchcat" in str(wex.value) or "catalog" in str(wex.value).lower()
    with pytest.raises(Exception) as rex:
        read_table(spark, "nosuchcat.db.tokens", fmt="iceberg").collect()
    msg = str(rex.value).lower()
    assert "iceberg" in msg or "data source" in msg or "nosuchcat" in msg


def test_compact_preserves_content_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(4):
        t.append(spark.range(i * 10, i * 10 + 10).repartition(3))
    pre = t.current_snapshot_id()
    n_files_pre = len(t.snapshot()["files"])
    assert n_files_pre >= 8
    sid = t.compact(spark, target_rows_per_file=100)
    assert sid is not None
    snap = t.snapshot()
    assert snap["operation"] == "replace"
    assert len(snap["files"]) < n_files_pre
    # identical rows, before and after
    assert sorted(r["id"] for r in t.read(spark).collect()) == list(range(40))
    # time travel to the pre-compaction snapshot still works (files on disk)
    assert t.read(spark, snapshot_id=pre).count() == 40
    # compacting again is a no-op
    assert t.compact(spark, target_rows_per_file=100) is None


def test_expire_snapshots_collects_orphans(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(3):
        t.append(spark.range(i * 5, i * 5 + 5).repartition(2))
    t.compact(spark, target_rows_per_file=1000)
    all_files = {f for s in t.history() for f in s["files"]}
    res = t.expire_snapshots(keep_last=1)
    assert res["expired_snapshots"] == 3 and res["deleted_files"] > 0
    # current still reads the full content; expired files are gone from disk
    assert sorted(r["id"] for r in t.read(spark).collect()) == list(range(15))
    live = set(t.snapshot()["files"])
    for f in all_files - live:
        assert not os.path.exists(f)
    # chain root has no dangling parent
    hist = t.history()
    assert len(hist) == 1 and hist[0]["parent"] is None
    # expiring again: nothing left to do
    assert t.expire_snapshots(keep_last=1) == {
        "expired_snapshots": 0,
        "deleted_files": 0,
    }


def test_continuous_rollup_skips_replace_and_guards_lost_cursor(spark, tmp_path):
    import pandas as pd

    from tsdownsample_spark.operators.rollup import continuous_rollup

    raw = SnapshotTable(str(tmp_path / "raw"))
    tier = SnapshotTable(str(tmp_path / "tier"))
    base = pd.Timestamp("2024-02-01")

    def batch(off, n=60):
        pdf = pd.DataFrame(
            {
                "k": ["a"] * n,
                "ts": [
                    (base + pd.Timedelta(seconds=off * 3600 + i * 30)).to_pydatetime()
                    for i in range(n)
                ],
                "value": [float(off * 1000 + i) for i in range(n)],
            }
        )
        return spark.createDataFrame(pdf)

    raw.append(batch(0))
    continuous_rollup(spark, raw, tier, tier="1m", x_col="ts", y_col="value", by=["k"])
    total_before = tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0]
    # compaction of raw must NOT feed rows back into the tier
    assert raw.compact(spark, target_rows_per_file=10_000, min_files=1) is not None
    assert (
        continuous_rollup(
            spark, raw, tier, tier="1m", x_col="ts", y_col="value", by=["k"]
        )
        is None
    )
    assert (
        tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == total_before == 60
    )
    # a real append after compaction IS consumed
    raw.append(batch(1))
    assert (
        continuous_rollup(
            spark, raw, tier, tier="1m", x_col="ts", y_col="value", by=["k"]
        )
        is not None
    )
    assert tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == 120
    # losing the cursor snapshot (expire past it) fails loudly, not silently
    raw.append(batch(2))
    raw.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="resume cursor"):
        continuous_rollup(
            spark, raw, tier, tier="1m", x_col="ts", y_col="value", by=["k"]
        )


def test_retention_sweep_ages_out_rows_without_disturbing_tiers(spark, tmp_path):
    """rewrite_filtered drops aged rows as a replace commit: newer rows
    intact, time travel to the pre-sweep snapshot intact, and a
    continuous_rollup consumer neither reprocesses nor starves."""
    import pandas as pd

    from tsdownsample_spark.operators.rollup import continuous_rollup

    raw = SnapshotTable(str(tmp_path / "raw"))
    tier = SnapshotTable(str(tmp_path / "tier"))
    base = pd.Timestamp("2024-06-01")

    def batch(day, n=30):
        return spark.createDataFrame(
            [("a", (base + pd.Timedelta(days=day, seconds=30 * i)).to_pydatetime(),
              float(i)) for i in range(n)],
            "k string, ts timestamp, value double",
        )

    raw.append(batch(0))
    raw.append(batch(10))
    continuous_rollup(spark, raw, tier, tier="1m", x_col="ts", y_col="value", by=["k"])
    assert tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == 60
    pre = raw.current_snapshot_id()
    # sweep: keep only day-10 data
    sid = raw.rewrite_filtered(spark, "ts >= timestamp '2024-06-08'")
    assert sid is not None
    assert raw.snapshot()["operation"] == "replace"
    assert raw.read(spark).count() == 30
    assert raw.read(spark).agg(F.min("ts")).collect()[0][0].day == 11
    # pre-sweep snapshot still reads everything (until expiry)
    assert raw.read(spark, snapshot_id=pre).count() == 60
    # the tier consumer sees nothing new (replace skipped, cursor intact)
    assert (
        continuous_rollup(spark, raw, tier, tier="1m", x_col="ts", y_col="value",
                          by=["k"])
        is None
    )
    assert tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == 60
    # and a fresh append after the sweep flows through normally
    raw.append(batch(20))
    assert (
        continuous_rollup(spark, raw, tier, tier="1m", x_col="ts", y_col="value",
                          by=["k"])
        is not None
    )
    assert tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == 90


def test_fresh_consumer_bootstrap_after_compact_expire(spark, tmp_path):
    """A consumer with NO cursor attaching to a replace-rooted chain
    (compact + expire already ran) must consume the full live baseline —
    not silently skip rows whose only surviving home is a replace commit."""
    import pandas as pd

    from tsdownsample_spark.operators.rollup import continuous_rollup

    raw = SnapshotTable(str(tmp_path / "raw"))
    base = pd.Timestamp("2024-03-01")
    for off in range(2):
        raw.append(
            spark.createDataFrame(
                [("a", (base + pd.Timedelta(seconds=off * 3600 + 30 * i)).to_pydatetime(),
                  float(i)) for i in range(30)],
                "k string, ts timestamp, value double",
            )
        )
    assert raw.compact(spark, target_rows_per_file=10_000, min_files=1) is not None
    raw.expire_snapshots(keep_last=1)
    assert raw.snapshot()["operation"] == "replace"  # replace-rooted chain
    tier = SnapshotTable(str(tmp_path / "tier"))
    sid = continuous_rollup(spark, raw, tier, tier="1m", x_col="ts", y_col="value",
                            by=["k"])
    assert sid is not None
    assert tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == 60
    # idempotent after bootstrap: cursor recorded, nothing new -> no commit
    assert continuous_rollup(spark, raw, tier, tier="1m", x_col="ts",
                             y_col="value", by=["k"]) is None
    # new appends flow incrementally, not via another full read
    raw.append(
        spark.createDataFrame(
            [("a", (base + pd.Timedelta(hours=9, seconds=30 * i)).to_pydatetime(),
              float(i)) for i in range(30)],
            "k string, ts timestamp, value double",
        )
    )
    assert continuous_rollup(spark, raw, tier, tier="1m", x_col="ts",
                             y_col="value", by=["k"]) is not None
    assert tier.read(spark).agg(F.sum("agg_cnt")).collect()[0][0] == 90


def test_expire_refuses_past_consumer_cursor(spark, tmp_path):
    """expire_snapshots(min_retained_snapshot_id=...) widens retention to
    cover every consumer cursor, and raises when a cursor is already gone."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    sids = []
    for i in range(4):
        sids.append(tbl.append(spark.range(i * 10, i * 10 + 10).toDF("v")))
    # cursor at the 2nd snapshot: expiry may only drop the 1st
    res = tbl.expire_snapshots(keep_last=1, min_retained_snapshot_id=sids[1])
    assert res["expired_snapshots"] == 1
    hist_ids = [s["snapshot_id"] for s in tbl.history()]
    assert hist_ids == sids[1:]
    # every retained snapshot still reads correctly
    assert tbl.read(spark, snapshot_id=sids[1]).count() == 20
    assert tbl.read(spark).count() == 40
    # a list of cursors retains back to the OLDEST one
    assert tbl.expire_snapshots(
        keep_last=1, min_retained_snapshot_id=[sids[3], sids[1]]
    ) == {"expired_snapshots": 0, "deleted_files": 0}
    # an expired/unknown cursor refuses loudly instead of orphaning data
    with pytest.raises(ValueError, match="consumer cursor"):
        tbl.expire_snapshots(keep_last=1, min_retained_snapshot_id=sids[0])
