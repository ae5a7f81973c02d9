"""Connected-components cluster assignment (dedup pipeline last stage).

Reference scope note: the tsdownsample reference has no dedup layer; this
operator family is part of the training-data-pipeline surface (pairs ->
transitive clusters -> canonical keeper), validated against brute-force
union-find on the driver.
"""

from __future__ import annotations

import pytest

from tsdownsample_spark.operators.dedup import connected_components, neardup_clusters


def _brute_components(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_path_graph_collapses_to_min(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(19)], ["id_a", "id_b"])
    got = {
        (r.node, r.component) for r in connected_components(pairs).collect()
    }
    assert got == {(i, 0) for i in range(1, 20)}


def test_matches_brute_union_find_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(200))
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(120)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    expect = _brute_components(pairs, nodes)
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    for n in nodes:
        assert got.get(n, n) == expect[n]


def test_string_ids_lexicographic(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("y", "x")], ["id_a", "id_b"]
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {("b", "a"), ("c", "a"), ("y", "x")}


def test_self_loops_and_duplicate_edges_ignored(spark):
    pairs = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)], ["id_a", "id_b"]
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {(2, 1)}


def test_neardup_clusters_total_assignment(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame([(5, 6), (6, 7)], ["id_a", "id_b"])
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in
            neardup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    for i in range(5):
        assert rows[i] == (i, True)
    assert rows[5] == (5, True)
    assert rows[6] == (5, False) and rows[7] == (5, False)


def test_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in
            neardup_clusters(docs, pairs).collect()}
    assert rows == {1: (1, True), 2: (2, True)}


def test_max_iter_guard(spark):
    # a 64-node path needs ~log rounds; max_iter=1 must not loop forever
    # and still returns a valid (if unconverged) edge orientation
    pairs = spark.createDataFrame([(i, i + 1) for i in range(63)], ["id_a", "id_b"])
    out = connected_components(pairs, max_iter=1).collect()
    assert all(r.component < r.node for r in out)
