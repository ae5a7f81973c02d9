"""Sequence-packing operator tests (operators/pack.py).

A pure-Python naive packer is the reference; the Spark operators must
reproduce it exactly on random corpora, handle the documented edge rules
(oversize docs, null/zero token counts), and keep the concat path a
single-Exchange JVM-only plan.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.pack import (
    pack_concat,
    pack_concat_stats,
    pack_greedy,
    pack_greedy_stats,
)


def naive_concat(rows, window):
    """rows: list of (doc_id, group, n_tok) -> dict doc_id -> placement."""
    out = {}
    by_group = {}
    for doc_id, grp, n in sorted(rows):
        by_group.setdefault(grp, []).append((doc_id, n))
    for grp, docs in by_group.items():
        off = 0
        for doc_id, n in sorted(docs):
            if n and n > 0:
                out[doc_id] = (
                    grp,
                    n,
                    off,
                    off // window,
                    (off + n - 1) // window,
                )
                off += n
    return out


def naive_greedy(rows, window):
    out = {}
    by_group = {}
    for doc_id, grp, n in sorted(rows):
        by_group.setdefault(grp, []).append((doc_id, n))
    for grp, docs in by_group.items():
        pack_id, fill = 0, 0
        for doc_id, n in sorted(docs):
            if not n or n <= 0:
                continue
            if fill > 0 and fill + n > window:
                pack_id += 1
                fill = 0
            out[doc_id] = (grp, n, pack_id, fill)
            fill += n
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(400):
        grp = f"s{int(rng.integers(0, 7))}"
        n = int(rng.integers(1, 120))
        rows.append((i, grp, n))
    # edge rows: oversize doc, zero tokens, null tokens
    rows += [(400, "s0", 999), (401, "s0", 0), (402, "s1", None)]
    df = spark.createDataFrame(
        [(d, g, n) for d, g, n in rows],
        "doc_id long, source string, n_tok int",
    )
    return rows, df


class TestPackConcat:
    def test_matches_naive(self, spark, corpus):
        rows, df = corpus
        want = naive_concat([(d, g, n) for d, g, n in rows], 128)
        got = {
            r.doc_id: (r.source, r.n_tok, r.tok_off, r.first_win, r.last_win)
            for r in pack_concat(df, 128).collect()
        }
        assert got == want

    def test_drops_null_and_zero(self, spark, corpus):
        _, df = corpus
        ids = {r.doc_id for r in pack_concat(df, 128).collect()}
        assert 401 not in ids and 402 not in ids and 400 in ids

    def test_stream_is_contiguous(self, spark, corpus):
        """Within each group the placements tile the token stream exactly:
        sorted offsets are the running sum of n_tok with no holes."""
        _, df = corpus
        res = pack_concat(df, 64).collect()
        by_grp = {}
        for r in res:
            by_grp.setdefault(r.source, []).append(r)
        for grp, rs in by_grp.items():
            rs.sort(key=lambda r: r.doc_id)
            off = 0
            for r in rs:
                assert r.tok_off == off
                assert r.n_windows == r.last_win - r.first_win + 1
                off += r.n_tok

    def test_plan_single_exchange_no_python(self, spark, corpus):
        _, df = corpus
        plan = pack_concat(df, 128)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
            assert marker not in plan

    def test_stats_closed_form(self, spark, corpus):
        rows, df = corpus
        res = {r.source: r for r in pack_concat_stats(df, 128).collect()}
        want = naive_concat([(d, g, n) for d, g, n in rows], 128)
        for grp in res:
            tot = sum(n for _, (g, n, *_rest) in want.items() if g == grp)
            n_win = -(-tot // 128)
            assert res[grp].total_tok == tot
            assert res[grp].n_windows == n_win
            assert res[grp].waste_ratio == pytest.approx(
                (n_win * 128 - tot) / (n_win * 128), abs=1e-6
            )

    def test_rejects_bad_window(self, spark, corpus):
        _, df = corpus
        with pytest.raises(ValueError, match="window must be positive"):
            pack_concat(df, 0)


class TestPackGreedy:
    def test_matches_naive(self, spark, corpus):
        rows, df = corpus
        want = naive_greedy([(d, g, n) for d, g, n in rows], 128)
        got = {
            r.doc_id: (r.source, r.n_tok, r.pack_id, r.pack_off)
            for r in pack_greedy(df, 128).collect()
        }
        assert got == want

    def test_no_pack_overflows_except_oversize(self, spark, corpus):
        _, df = corpus
        stats = pack_greedy_stats(df, 128).collect()
        for r in stats:
            assert r.pack_tok <= 128 or r.n_docs == 1

    def test_oversize_doc_isolated(self, spark, corpus):
        """Doc 400 (999 tokens > window) must sit alone in its pack."""
        _, df = corpus
        packed = pack_greedy(df, 128).collect()
        target = next(r for r in packed if r.doc_id == 400)
        mates = [
            r
            for r in packed
            if r.source == target.source
            and r.pack_id == target.pack_id
            and r.doc_id != 400
        ]
        assert target.pack_off == 0 and mates == []

    def test_order_is_deterministic(self, spark, corpus):
        _, df = corpus
        a = sorted(map(tuple, pack_greedy(df, 96).collect()))
        b = sorted(map(tuple, pack_greedy(df.repartition(13), 96).collect()))
        assert a == b

    def test_rejects_bad_window(self, spark, corpus):
        _, df = corpus
        with pytest.raises(ValueError, match="window must be positive"):
            pack_greedy(df, -5)

    def test_string_ids_and_custom_names(self, spark, corpus):
        """Output schema follows the caller's order/by names AND types:
        string doc ids round-trip, no coercion to int64 (ADVICE r4)."""
        rows, _ = corpus
        df = spark.createDataFrame(
            [(f"d{d:04d}", g, n) for d, g, n in rows],
            "uri string, shard string, n_tok int",
        )
        got = pack_greedy(df, 128, by="shard", order="uri")
        assert got.columns == ["uri", "shard", "n_tok", "pack_id", "pack_off"]
        assert dict(got.dtypes)["uri"] == "string"
        want = naive_greedy([(f"d{d:04d}", g, n) for d, g, n in rows], 128)
        res = {r.uri: (r.shard, r.n_tok, r.pack_id, r.pack_off) for r in got.collect()}
        assert res == want
