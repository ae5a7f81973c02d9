"""cross_contamination (operators/dedup.py): train/eval n-gram overlap."""

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.dedup import cross_contamination


def naive(train, eval_set, k=3, min_overlap=1):
    def sh(t):
        w = t.split(" ")
        return {t} if len(w) < k else {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    out = {}
    for tid, tt in train:
        for eid, et in eval_set:
            n = len(sh(tt) & sh(et))
            if n >= min_overlap:
                out[(tid, eid)] = n
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    train = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "entirely unrelated words appear here only"),
        (2, "the quick brown fox naps all day long"),
        (3, "short text"),  # < k words -> whole-text shingle
        (4, "benchmark question one verbatim leaked into training data"),
    ]
    eval_set = [
        (100, "benchmark question one verbatim leaked into training data"),
        (101, "the quick brown fox is a pangram fragment"),
        (102, "short text"),
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(eval_set, "doc_id long, text string")
    return train, eval_set, tdf, edf


class TestCrossContamination:
    def test_matches_naive(self, spark, corpora):
        train, eval_set, tdf, edf = corpora
        got = {
            (r.train_doc, r.eval_doc): r.n_common
            for r in cross_contamination(tdf, edf).collect()
        }
        assert got == naive(train, eval_set)

    def test_min_overlap_filters(self, spark, corpora):
        train, eval_set, tdf, edf = corpora
        got = {
            (r.train_doc, r.eval_doc): r.n_common
            for r in cross_contamination(tdf, edf, min_overlap=3).collect()
        }
        assert got == naive(train, eval_set, min_overlap=3)
        assert all(v >= 3 for v in got.values())

    def test_verbatim_leak_is_top_hit(self, spark, corpora):
        _, _, tdf, edf = corpora
        rows = cross_contamination(tdf, edf).collect()
        top = max(rows, key=lambda r: r.n_common)
        assert (top.train_doc, top.eval_doc) == (4, 100)

    def test_whole_text_shingle_for_short_docs(self, spark, corpora):
        _, _, tdf, edf = corpora
        got = {
            (r.train_doc, r.eval_doc)
            for r in cross_contamination(tdf, edf).collect()
        }
        assert (3, 102) in got

    def test_clean_corpus_empty_report(self, spark, corpora):
        _, _, tdf, _ = corpora
        clean = spark.createDataFrame(
            [(200, "zzz yyy xxx www vvv")], "doc_id long, text string"
        )
        assert cross_contamination(tdf, clean).count() == 0

    def test_no_cartesian_in_plan(self, spark, corpora):
        _, _, tdf, edf = corpora
        plan = (
            cross_contamination(tdf, edf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
