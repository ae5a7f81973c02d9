"""Deterministic sampling/splitting tests (operators/sample.py)."""

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.sample import (
    hash_sample,
    quota_sample,
    split_assign,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"s{i % 5}") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


class TestHashSample:
    def test_fraction_approx_and_deterministic(self, spark, corpus):
        a = sorted(r.doc_id for r in hash_sample(corpus, 0.25, seed="x").collect())
        b = sorted(
            r.doc_id
            for r in hash_sample(corpus.repartition(17), 0.25, seed="x").collect()
        )
        assert a == b  # partitioning-independent
        assert 0.18 <= len(a) / 2000 <= 0.32

    def test_stable_under_corpus_growth(self, spark, corpus):
        """A row's membership never changes when other rows are added."""
        half = corpus.where(F.col("doc_id") < 1000)
        in_half = {r.doc_id for r in hash_sample(half, 0.25, seed="x").collect()}
        in_full = {
            r.doc_id
            for r in hash_sample(corpus, 0.25, seed="x").collect()
            if r.doc_id < 1000
        }
        assert in_half == in_full

    def test_seed_changes_selection(self, spark, corpus):
        a = {r.doc_id for r in hash_sample(corpus, 0.25, seed="x").collect()}
        b = {r.doc_id for r in hash_sample(corpus, 0.25, seed="y").collect()}
        assert a != b

    def test_no_shuffle(self, spark, corpus):
        plan = (
            hash_sample(corpus, 0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_bounds(self, spark, corpus):
        assert hash_sample(corpus, 0.0).count() == 0
        assert hash_sample(corpus, 1.0).count() == 2000
        with pytest.raises(ValueError, match="fraction"):
            hash_sample(corpus, 1.5)


class TestSplitAssign:
    def test_partition_of_corpus(self, spark, corpus):
        out = split_assign(corpus, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
        assert len(out) == 2000  # every row labelled, none duplicated
        counts = {}
        for r in out:
            counts[r.split] = counts.get(r.split, 0) + 1
        assert set(counts) == {"train", "val", "test"}
        assert 0.7 <= counts["train"] / 2000 <= 0.9

    def test_assignment_stable_under_growth(self, spark, corpus):
        half = corpus.where(F.col("doc_id") < 1000)
        a = {r.doc_id: r.split for r in split_assign(half).collect()}
        b = {
            r.doc_id: r.split
            for r in split_assign(corpus).collect()
            if r.doc_id < 1000
        }
        assert a == b

    def test_weights_normalized(self, spark, corpus):
        a = {r.doc_id: r.split for r in split_assign(corpus, {"a": 3, "b": 1}).collect()}
        b = {
            r.doc_id: r.split
            for r in split_assign(corpus, {"a": 0.75, "b": 0.25}).collect()
        }
        assert a == b

    def test_no_shuffle(self, spark, corpus):
        plan = split_assign(corpus)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_rejects_bad_weights(self, spark, corpus):
        with pytest.raises(ValueError, match="non-negative"):
            split_assign(corpus, {"a": -1, "b": 2})
        with pytest.raises(ValueError, match="positive"):
            split_assign(corpus, {"a": 0.0})


class TestQuotaSample:
    def test_exact_quota_per_group(self, spark, corpus):
        out = quota_sample(corpus, 7, by="source").groupBy("source").count().collect()
        assert {r.source: r["count"] for r in out} == {f"s{i}": 7 for i in range(5)}

    def test_quota_capped_at_group_size(self, spark, corpus):
        out = quota_sample(corpus, 10_000, by="source")
        assert out.count() == 2000

    def test_deterministic_and_partition_independent(self, spark, corpus):
        a = sorted(r.doc_id for r in quota_sample(corpus, 7).collect())
        b = sorted(r.doc_id for r in quota_sample(corpus.repartition(13), 7).collect())
        assert a == b

    def test_drops_helper_column(self, spark, corpus):
        assert quota_sample(corpus, 7).columns == corpus.columns

    def test_rejects_negative(self, spark, corpus):
        with pytest.raises(ValueError, match="non-negative"):
            quota_sample(corpus, -1)
