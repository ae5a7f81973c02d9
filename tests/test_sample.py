"""Deterministic sampling/splitting tests (operators/sample.py)."""

import pytest
from pyspark.sql import functions as F

from tsdownsample_spark.operators.sample import (
    hash_sample,
    quota_sample,
    split_assign,
    temperature_resample,
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


class TestTokenBudgetSample:
    """Mixture sampling by token budget (operators/sample.py:
    token_budget_sample; oracle twin = q_token_budget)."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_tok long"
        )

    def test_prefix_stops_at_budget(self, spark):
        from tsdownsample_spark.operators.sample import _hash32, token_budget_sample

        rows = [(i, "a", 10) for i in range(20)]
        df = self._df(spark, rows)
        out = token_budget_sample(df, 55, by="source", weight="n_tok").collect()
        # 10 tokens each, budget 55 -> exactly 5 docs, never overshoots
        assert len(out) == 5
        assert max(r.cum_w for r in out) == 50
        # and they are the 5 lowest-hash docs
        hashed = df.select("doc_id", _hash32("doc_id", "0").alias("h")).collect()
        expect = {r.doc_id for r in sorted(hashed, key=lambda r: (r.h, r.doc_id))[:5]}
        assert {r.doc_id for r in out} == expect

    def test_mapping_budgets_and_absent_groups(self, spark):
        from tsdownsample_spark.operators.sample import token_budget_sample

        rows = [(1, "a", 5), (2, "a", 5), (3, "b", 5), (4, "c", 5)]
        out = token_budget_sample(
            self._df(spark, rows), {"a": 5, "b": 100}, by="source", weight="n_tok"
        ).collect()
        got = {(r.source, r.doc_id) for r in out}
        srcs = [s for s, _ in got]
        assert srcs.count("a") == 1          # budget 5 fits one 5-token doc
        assert ("b", 3) in got               # generous budget keeps all of b
        assert all(s != "c" for s, _ in got)  # absent from recipe -> nothing

    def test_zero_and_oversize_first_doc(self, spark):
        from tsdownsample_spark.operators.sample import token_budget_sample

        rows = [(1, "a", 100), (2, "a", 1)]
        # every doc's cumsum exceeds 0 -> empty
        assert token_budget_sample(
            self._df(spark, rows), 0, by="source", weight="n_tok"
        ).count() == 0
        # prefix rule: if the first (lowest-hash) doc overshoots, the
        # prefix is empty even though a later doc would fit
        out = token_budget_sample(
            self._df(spark, rows), 50, by="source", weight="n_tok"
        ).collect()
        assert [r.doc_id for r in out] in ([], [1], [2])  # depends on hash order
        if out:
            assert out[0].cum_w <= 50

    def test_negative_budget_raises(self, spark):
        import pytest as _pytest

        from tsdownsample_spark.operators.sample import token_budget_sample

        df = self._df(spark, [(1, "a", 5)])
        with _pytest.raises(ValueError):
            token_budget_sample(df, -1, by="source", weight="n_tok")
        with _pytest.raises(ValueError):
            token_budget_sample(df, {"a": -2}, by="source", weight="n_tok")


class TestTemperatureResample:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # 1600 docs of s_big, 4 x 100 of small sources
        rows = [(i, "s_big") for i in range(1600)]
        rows += [(10_000 + j * 1000 + i, f"s_sm{j}") for j in range(4) for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_flattening_upweights_small_sources(self, spark, skewed):
        out = temperature_resample(
            skewed, alpha=0.5, by="source", key="doc_id", seed="t", target_frac=0.5
        )
        rates = {
            r["source"]: r["keep_rate"]
            for r in out.select("source", "keep_rate").distinct().collect()
        }
        # alpha<1 flattens: small sources keep a HIGHER fraction than big
        assert rates["s_sm0"] > rates["s_big"]
        # all small sources share one count, hence one rate
        assert len({rates[f"s_sm{j}"] for j in range(4)}) == 1
        # rates are valid probabilities
        assert all(0.0 < v <= 1.0 for v in rates.values())

    def test_cap_binds_when_temperature_exceeds_size(self, spark, skewed):
        # alpha -> 0 equalizes shares; tiny sources cannot supply 1/5 of
        # the target each without duplication, so their rate caps at 1.0
        out = temperature_resample(
            skewed, alpha=0.05, by="source", key="doc_id", seed="t",
            target_frac=0.8,
        )
        rates = {
            r["source"]: r["keep_rate"]
            for r in out.select("source", "keep_rate").distinct().collect()
        }
        assert rates["s_sm0"] == pytest.approx(1.0)
        n_sm = out.where("source = 's_sm0'").count()
        assert n_sm == 100  # cap = keep everything

    def test_deterministic_under_repartition(self, spark, skewed):
        a = sorted(
            r.doc_id
            for r in temperature_resample(skewed, seed="t").select("doc_id").collect()
        )
        b = sorted(
            r.doc_id
            for r in temperature_resample(skewed.repartition(13), seed="t")
            .select("doc_id")
            .collect()
        )
        assert a == b

    def test_rejects_bad_params(self, spark, skewed):
        with pytest.raises(ValueError, match="alpha"):
            temperature_resample(skewed, alpha=0.0)
        with pytest.raises(ValueError, match="target_frac"):
            temperature_resample(skewed, target_frac=1.5)


class TestWeightedSample:
    def _df(self, spark):
        rows = [(i, "s" if i % 2 else "t", float(1 + (i * 13) % 7)) for i in range(200)]
        rows += [(900, "s", 0.0), (901, "s", None)]     # excluded weights
        return spark.createDataFrame(rows, "doc_id long, src string, w double")

    def test_matches_python_aes(self, spark):
        import hashlib, math

        from tsdownsample_spark.operators.sample import weighted_sample

        df = self._df(spark)
        got = sorted(r.doc_id for r in weighted_sample(df, 25, "w").collect())

        def h32(i):
            return int(hashlib.md5(f"{i}:0".encode()).hexdigest()[:8], 16)

        keys = []
        for r in df.collect():
            if r.w is None or r.w <= 0:
                continue
            u = (h32(r.doc_id) + 0.5) / 2**32
            keys.append((round(math.log(u) / r.w, 6), -r.doc_id, r.doc_id))
        exp = sorted(d for _, _, d in sorted(keys, reverse=True)[:25])
        assert got == exp

    def test_weight_bias_is_real(self, spark):
        from tsdownsample_spark.operators.sample import weighted_sample

        # two weight classes: heavy rows (w=100) must dominate a small
        # sample over light rows (w=0.01)
        rows = [(i, 100.0 if i < 50 else 0.01) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = [r.doc_id for r in weighted_sample(df, 40, "w").collect()]
        assert sum(1 for d in got if d < 50) >= 38   # ~all heavy

    def test_stratified_per_group_k(self, spark):
        from tsdownsample_spark.operators.sample import weighted_sample

        df = self._df(spark)
        got = weighted_sample(df, 7, "w", by="src").collect()
        from collections import Counter
        c = Counter(r.src for r in got)
        assert c == {"s": 7, "t": 7}

    def test_excludes_nonpositive_weights_and_validates(self, spark):
        from tsdownsample_spark.operators.sample import weighted_sample

        df = self._df(spark)
        ids = {r.doc_id for r in weighted_sample(df, 1000, "w").collect()}
        assert 900 not in ids and 901 not in ids
        with pytest.raises(ValueError, match="k must"):
            weighted_sample(df, 0, "w")
        with pytest.raises(ValueError, match="reserved"):
            weighted_sample(df.withColumn("samp_key", F.lit(1)), 5, "w")

    def test_global_plan_is_take_ordered_not_full_sort(self, spark):
        from tsdownsample_spark.operators.sample import weighted_sample

        plan = (
            weighted_sample(self._df(spark), 10, "w")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
