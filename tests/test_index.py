"""Inverted index: semantics vs a python reference + df-gate staging."""

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.index import inverted_index

DOCS = {
    1: "a b c",
    2: "a b",
    3: "a d",
    4: "a e e",   # duplicate occurrence -> one posting
}


@pytest.fixture(scope="module")
def occ(spark):
    rows = [(d, t) for d, txt in DOCS.items() for t in txt.split(" ")]
    return spark.createDataFrame(rows + [(9, None)], "doc_id long, term string")


def _expected(min_df=1, max_df=None):
    import math

    post = {}
    for d, txt in DOCS.items():
        for t in set(txt.split(" ")):
            post.setdefault(t, set()).add(d)
    n = len({d for s in post.values() for d in s})
    lo = math.ceil(min_df * n) if isinstance(min_df, float) else min_df
    hi = (math.ceil(max_df * n) if isinstance(max_df, float) else max_df) \
        if max_df is not None else None
    return {
        t: sorted(s) for t, s in post.items()
        if len(s) >= lo and (hi is None or len(s) <= hi)
    }


def test_postings_sorted_distinct(spark, occ):
    got = {r.term: (r.doc_freq, r.postings)
           for r in inverted_index(occ, "doc_id", "term").collect()}
    exp = _expected()
    assert {t: p for t, (_, p) in got.items()} == exp
    assert all(f == len(p) for f, p in got.values())
    assert got["e"] == (1, [4])  # within-doc duplicate collapsed


def test_df_gates(spark, occ):
    # absolute: only 'a' (df=4) survives min_df=3
    got = inverted_index(occ, "doc_id", "term", min_df=3).collect()
    assert [(r.term, r.postings) for r in got] == [("a", [1, 2, 3, 4])]
    # fractional max: 0.5 of 4 docs = df <= 2 -> drops 'a', keeps 'b'
    got = {r.term for r in
           inverted_index(occ, "doc_id", "term", max_df=0.5).collect()}
    assert got == set(_expected(max_df=0.5)) and "a" not in got and "b" in got
    with pytest.raises(ValueError, match="fractional"):
        inverted_index(occ, "doc_id", "term", max_df=1.5)
    with pytest.raises(ValueError, match="reserved"):
        inverted_index(occ.withColumnRenamed("term", "postings"),
                       "doc_id", "postings")


def test_gate_before_postings(spark, occ):
    """The df filter must sit below the collect_list aggregate in the plan:
    postings for dropped terms are never materialized."""
    plan = inverted_index(occ, "doc_id", "term", max_df=0.5)._jdf \
        .queryExecution().optimizedPlan().toString()
    agg_pos = plan.find("collect_list")
    filt_pos = plan.find("doc_freq#", agg_pos)
    assert agg_pos != -1 and filt_pos != -1  # gate join feeds the aggregate
