"""Heavy hitters: semantics (vs a driver-side Counter) + plan shape."""

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tsdownsample_spark.operators.frequency import heavy_hitters

ROWS = [
    ("a", "x", 3), ("a", "x", 1), ("a", "y", 2), ("a", "y", 5),
    ("a", "z", 1), ("a", "w", 1),
    ("b", "x", 10), ("b", "q", 1),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [Row(grp=g, val=v, wt=w) for g, v, w in ROWS]
        + [Row(grp="a", val=None, wt=9)]  # NULL values are dropped
    )


def test_topk_counts(spark, df):
    got = heavy_hitters(df, "val", by=["grp"], k=2).collect()
    exp = {}
    for g in ("a", "b"):
        cnt = Counter(v for gg, v, _ in ROWS if gg == g)
        # ties break by ascending value
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        exp[g] = [(v, c, i + 1) for i, (v, c) in enumerate(ranked)]
    for g in exp:
        rows = sorted(
            [(r.val, r.freq, r.rank) for r in got if r.grp == g],
            key=lambda t: t[2],
        )
        assert rows == exp[g], g


def test_tiebreak_deterministic(spark, df):
    # group a: x=2, y=2, z=1, w=1 -> rank1=x (value asc among freq-2 ties),
    # rank2=y, rank3=w, rank4=z
    got = sorted(
        [(r.val, r.rank) for r in heavy_hitters(df, "val", by=["grp"], k=4)
         .where("grp = 'a'").collect()],
        key=lambda t: t[1],
    )
    assert got == [("x", 1), ("y", 2), ("w", 3), ("z", 4)]


def test_weighted(spark, df):
    # group a weights: x=4, y=7, z=1, w=1 -> top2 = y(7), x(4)
    got = sorted(
        [(r.val, r.freq, r.rank) for r in
         heavy_hitters(df, "val", by=["grp"], k=2, weight_col="wt")
         .where("grp = 'a'").collect()],
        key=lambda t: t[2],
    )
    assert got == [("y", 7, 1), ("x", 4, 2)]


def test_global_no_by(spark, df):
    got = heavy_hitters(df, "val", k=1).collect()
    assert len(got) == 1 and got[0].val == "x" and got[0].freq == 3


def test_validation(spark, df):
    with pytest.raises(ValueError, match="k must"):
        heavy_hitters(df, "val", k=0)
    with pytest.raises(ValueError, match="reserved"):
        heavy_hitters(df.withColumnRenamed("wt", "freq"), "val", by=["freq"])


def test_plan_partial_agg(spark, df):
    """Stage 1 must be a hash aggregate with a partial (map-side) phase —
    the property that caps shuffle volume at distinct cardinality."""
    plan = heavy_hitters(df, "val", by=["grp"], k=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final


# ------------------------------------------------------------- tfidf_topk


def test_tfidf_scores_and_ranks(spark):
    import math

    corpus = {
        1: "apple banana apple cherry",
        2: "banana banana durian",
        3: "cherry durian elder elder elder",
    }
    occ = spark.createDataFrame(
        [(d, t) for d, txt in corpus.items() for t in txt.split(" ")],
        "doc_id long, term string",
    )
    from tsdownsample_spark.operators.frequency import tfidf_topk

    got = tfidf_topk(occ, "doc_id", "term", k=2).collect()
    # reference: plain python
    tf = {}
    for d, txt in corpus.items():
        for t in txt.split(" "):
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfreq = {}
    for (_, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    n = len(corpus)
    exp = {}
    for d in corpus:
        scored = sorted(
            (
                (round(c * (math.log((n + 1) / (dfreq[t] + 1)) + 1.0), 6), t)
                for (dd, t), c in tf.items() if dd == d
            ),
            key=lambda st: (-st[0], st[1]),
        )[:2]
        exp[d] = [(t, s, i + 1) for i, (s, t) in enumerate(scored)]
    for d in exp:
        rows = sorted(
            [(r.term, r.score, r.rank) for r in got if r.doc_id == d],
            key=lambda t: t[2],
        )
        assert rows == pytest.approx(exp[d]) or rows == exp[d], (d, rows, exp[d])
    # NULL terms dropped, not counted toward doc_freq or N
    occ_null = occ.union(spark.createDataFrame([(1, None)], occ.schema))
    assert sorted(map(tuple, tfidf_topk(occ_null, "doc_id", "term", k=2)
                  .collect())) == sorted(map(tuple, got))
    with pytest.raises(ValueError, match="k must"):
        tfidf_topk(occ, "doc_id", "term", k=0)
    with pytest.raises(ValueError, match="reserved"):
        tfidf_topk(occ.withColumnRenamed("term", "score"), "doc_id", "score")


def test_tfidf_plan_no_cartesian(spark):
    """The 1-row N join must be a broadcast, never a real cartesian; the
    doc_freq join must not be a nested loop."""
    occ = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "doc_id long, term string"
    )
    from tsdownsample_spark.operators.frequency import tfidf_topk

    plan = tfidf_topk(occ, "doc_id", "term")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------- js_divergence


def test_js_divergence_vs_python(spark):
    import math

    corpora = {
        "A": "a a b c".split(),
        "B": "a b b d d".split(),
        "C": "e e".split(),        # disjoint from A and B
    }
    rows = [(d, t) for d, ts in corpora.items() for t in ts]
    df = spark.createDataFrame(rows + [("A", None)], "src string, term string")
    from tsdownsample_spark.operators.divergence import js_divergence

    got = {(r.dist_a, r.dist_b): (r.js_div, r.n_shared_terms)
           for r in js_divergence(df, "src", "term").collect()}

    def dist(ts):
        n = len(ts)
        out = {}
        for t in ts:
            out[t] = out.get(t, 0) + 1 / n
        return out

    def js(p, q):
        terms = set(p) | set(q)
        s = 0.0
        for t in terms:
            pp, qq = p.get(t, 0.0), q.get(t, 0.0)
            m = (pp + qq) / 2
            if pp > 0:
                s += pp * math.log(pp / m)
            if qq > 0:
                s += qq * math.log(qq / m)
        return s / 2

    for (x, y) in [("A", "B"), ("A", "C"), ("B", "C")]:
        exp = round(js(dist(corpora[x]), dist(corpora[y])), 6)
        assert got[(x, y)][0] == pytest.approx(exp, abs=2e-6), (x, y)
    # disjoint pair: exactly ln 2, zero shared terms — and the pair row
    # exists even though the inner join produced nothing for it
    import math as _m
    assert got[("A", "C")] == (round(_m.log(2), 6), 0)
    assert got[("A", "B")][1] == 2  # shared terms a, b
    # weighted: doubling every weight leaves distributions unchanged
    dfw = df.where("term is not null").withColumn("wt", F.lit(2))
    from tsdownsample_spark.operators.divergence import js_divergence as jsd
    goww = {(r.dist_a, r.dist_b): r.js_div
            for r in jsd(dfw, "src", "term", weight_col="wt").collect()}
    assert goww == {k: v[0] for k, v in got.items()}
    with pytest.raises(ValueError, match="reserved"):
        jsd(df.withColumnRenamed("term", "js_div"), "src", "js_div")


class TestLMCrossentropy:
    """Bigram-LM quality scoring (operators/frequency.lm_crossentropy;
    oracle twin = q_lm_score)."""

    def test_hand_computed_two_docs(self, spark):
        import math

        from tsdownsample_spark.operators.frequency import lm_crossentropy

        # corpus bigrams: (a,b) x2, (b,a) x1, (b,c) x1 ; V = {b,a,c} = 3
        df = spark.createDataFrame(
            [("d1", "a b a b"), ("d2", "b c")],
            "doc_id string, text string",
        )
        got = {r.doc_id: (r.n_bigrams, r.xent)
               for r in lm_crossentropy(df, alpha=1.0).collect()}
        p_ab = (2 + 1) / (2 + 3)      # c(a,b)=2, tot(a)=2
        p_ba = (1 + 1) / (2 + 3)      # c(b,a)=1, tot(b)=2
        p_bc = (1 + 1) / (2 + 3)
        x1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
        x2 = -math.log(p_bc)
        assert got["d1"][0] == 3 and abs(got["d1"][1] - round(x1, 6)) < 1e-9
        assert got["d2"][0] == 1 and abs(got["d2"][1] - round(x2, 6)) < 1e-9

    def test_short_docs_null_xent(self, spark):
        from tsdownsample_spark.operators.frequency import lm_crossentropy

        df = spark.createDataFrame(
            [("s", "one"), ("t", "a b")], "doc_id string, text string"
        )
        got = {r.doc_id: (r.n_bigrams, r.xent)
               for r in lm_crossentropy(df).collect()}
        assert got["s"] == (0, None)
        assert got["t"][0] == 1

    def test_plan_is_python_free(self, spark):
        from tsdownsample_spark.operators.frequency import lm_crossentropy

        df = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
        plan = (
            lm_crossentropy(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestNgramNovelty:
    def _docs(self, spark):
        # batch 0 = docs 0-1, batch 1 = docs 2-3 (batch_size=2)
        rows = [
            (0, "a b c d"),            # shingles: 'a b c', 'b c d'
            (1, "a b c e"),            # 'a b c' (dup in-batch), 'b c e'
            (2, "a b c d"),            # all seen in batch 0
            (3, "x y z w"),            # 'x y z', 'y z w' both new
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_curve(self, spark):
        from tsdownsample_spark.operators.frequency import ngram_novelty

        out = {
            r.batch: r
            for r in ngram_novelty(
                self._docs(spark), batch_size=2, shingle=3
            ).collect()
        }
        # batch 0: distinct {'a b c','b c d','b c e'} all first seen -> 1.0
        assert (out[0].n_shingles, out[0].n_new) == (3, 3)
        assert out[0].novelty == 1.0
        # batch 1: {'a b c','b c d','x y z','y z w'} -> 2 new of 4
        assert (out[1].n_shingles, out[1].n_new) == (4, 2)
        assert out[1].novelty == 0.5

    def test_plan_is_python_free_no_join(self, spark):
        from tsdownsample_spark.operators.frequency import ngram_novelty

        plan = (
            ngram_novelty(self._docs(spark), batch_size=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "Join",
        ):
            assert marker not in plan, marker


class TestUnigramEntropy:
    def test_hand_computed(self, spark):
        import math

        from tsdownsample_spark.operators.frequency import unigram_entropy

        # group g: counts {a:2, b:1, c:1} over N=4
        # H = -(0.5 log2 0.5 + 0.25 log2 0.25 * 2) = 1.5 bits
        rows = [("g", "a"), ("g", "a"), ("g", "b"), ("g", "c"),
                ("u", "k"), ("u", "k"), ("u", "k"),          # single value
                ("n", None), ("n", "p"), ("n", "q")]          # null dropped
        df = spark.createDataFrame(rows, "src string, tok string")
        out = {r.src: r for r in unigram_entropy(df, "tok", by=["src"]).collect()}
        assert out["g"].entropy_bits == pytest.approx(1.5, abs=1e-12)
        assert (out["g"].n_values, out["g"].n_distinct) == (4, 3)
        assert out["u"].entropy_bits == pytest.approx(0.0, abs=1e-12)
        # null excluded: N=2, uniform over {p, q} -> 1 bit
        assert out["n"].entropy_bits == pytest.approx(1.0, abs=1e-12)
        assert out["n"].n_values == 2

    def test_plan_python_free_one_exchange_pair(self, spark):
        from tsdownsample_spark.operators.frequency import unigram_entropy

        df = spark.createDataFrame(
            [("s", str(i % 7)) for i in range(50)], "src string, tok string"
        )
        plan = (
            unigram_entropy(df, "tok", by=["src"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestZipfSlope:
    def test_exact_power_law_recovers_slope(self, spark):
        from tsdownsample_spark.operators.frequency import zipf_slope

        # freq = 120/rank exactly (ranks 1..6 all divide 120), so
        # ln(freq) vs ln(rank) is a perfect line of slope -1
        rows = []
        freqs = [120, 60, 40, 30, 24, 20]          # 120/rank, ranks 1..6
        for r, f in enumerate(freqs, start=1):
            rows += [("s", f"tok{r:02d}")] * f
        df = spark.createDataFrame(rows, "src string, tok string")
        out = zipf_slope(df, "tok", by=["src"]).collect()[0]
        assert out.slope == pytest.approx(-1.0, abs=1e-9)
        assert out.r2 == pytest.approx(1.0, abs=1e-9)
        assert out.n_ranks == 6

    def test_max_rank_truncates_and_validates(self, spark):
        from tsdownsample_spark.operators.frequency import zipf_slope

        rows = []
        for r, f in enumerate([120, 60, 40, 30, 24, 20, 1, 1, 1], start=1):
            rows += [("s", f"tok{r:02d}")] * f
        df = spark.createDataFrame(rows, "src string, tok string")
        # the flat tail of ones ruins the fit; truncating to the head
        # restores it
        full = zipf_slope(df, "tok", by=["src"]).collect()[0]
        head = zipf_slope(df, "tok", by=["src"], max_rank=6).collect()[0]
        assert head.r2 > full.r2 and head.n_ranks == 6
        assert head.slope == pytest.approx(-1.0, abs=1e-9)
        with pytest.raises(ValueError, match="max_rank"):
            zipf_slope(df, "tok", by=["src"], max_rank=2)

    def test_plan_python_free(self, spark):
        from tsdownsample_spark.operators.frequency import zipf_slope

        df = spark.createDataFrame(
            [("s", str(i % 9)) for i in range(60)], "src string, tok string"
        )
        plan = (
            zipf_slope(df, "tok", by=["src"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPmiCollocations:
    def _docs(self, spark):
        # "new york" always adjacent (strong collocation); "the" everywhere
        # (high margins -> low pmi); pair counts are hand-countable
        rows = [
            (1, "s", "the new york times the paper"),
            (2, "s", "new york is the city"),
            (3, "s", "the new york subway runs"),
            (4, "s", "the paper is the paper"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    def test_hand_computed_pmi(self, spark):
        import math

        from tsdownsample_spark.operators.frequency import pmi_collocations

        out = pmi_collocations(
            self._docs(spark), min_count=3, k=5
        ).collect()
        by_pair = {(r.w1, r.w2): r for r in out}
        # pairs total N = 5+4+4+4 = 17; c('new','york') = 3;
        # c1('new') = 3 (always left of york); c2('york') = 3
        r = by_pair[("new", "york")]
        assert r.c_ab == 3
        assert r.pmi == pytest.approx(math.log(3 * 17 / (3 * 3)), rel=1e-12)
        assert r.rank == 1       # the strongest collocation in the fixture

    def test_min_count_gates_hapax_pairs(self, spark):
        from tsdownsample_spark.operators.frequency import pmi_collocations

        out = pmi_collocations(self._docs(spark), min_count=3, k=10).collect()
        assert all(r.c_ab >= 3 for r in out)
        # hapax pair 'york is' must be gated out despite high raw pmi
        assert ("york", "is") not in {(r.w1, r.w2) for r in out}

    def test_by_group_and_validation(self, spark):
        from tsdownsample_spark.operators.frequency import pmi_collocations

        df = self._docs(spark)
        out = pmi_collocations(df, by="source", min_count=2, k=3).collect()
        assert all(r.source == "s" for r in out)
        assert all(r.rank <= 3 for r in out)
        with pytest.raises(ValueError, match="min_count"):
            pmi_collocations(df, min_count=0)
        with pytest.raises(ValueError, match="k must"):
            pmi_collocations(df, k=0)

    def test_plan_python_free(self, spark):
        from tsdownsample_spark.operators.frequency import pmi_collocations

        plan = (
            pmi_collocations(self._docs(spark), by="source")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
