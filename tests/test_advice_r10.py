"""Regression tests for the round-10 ADVICE findings:

1. domain_mixture_weights must fail with a CLEAR validation error (not
   an opaque ANSI DIVIDE_BY_ZERO) when the target's nonzero shares all
   name absent domains, and when the total corpus mass is zero; a
   present domain whose own mass is zero gets weight 0, not a crash.
2. The registry's window ordering is a documented contract: the first
   50 entries are all exact-oracle, the round-11 rotation queries are
   inside the window, and every rows-only query is exercised by an
   in-repo test (the separate checked channel beyond the driver's
   sampled window is the full-registry parity run + these pins).
3. ivf_pq_ann_topk_frozen's cell_pairs/residual folds cast to double
   defensively — a float32 input column must produce the same top-k as
   the double rendering of the same vectors (fold precision must not
   depend on unit_vector's call-site cast).
4. leakage_safe_split must refuse a key column whose type differs from
   the pair-id type (singleton rows would otherwise hash a different
   rendering than hash_split), and must keep the singleton==hash_split
   invariant when types match.
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dozer_spark.ops.sampling import (
    domain_mixture_weights,
    hash_split,
    leakage_safe_split,
)

TESTS_DIR = pathlib.Path(__file__).parent


class TestMixtureWeightGuards:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [Row(domain="web", tok=10), Row(domain="web", tok=30),
             Row(domain="code", tok=60)],
            "domain string, tok long",
        )

    def test_target_matching_no_domain_is_clear_error(self, spark):
        df = self._corpus(spark)
        out = domain_mixture_weights(
            df, "domain", "tok", target={"books": 1.0})
        with pytest.raises(Exception) as ei:
            out.collect()
        assert "target matches no observed domain" in str(ei.value)
        assert "DIVIDE_BY_ZERO" not in str(ei.value)

    def test_zero_total_mass_is_clear_error(self, spark):
        df = spark.createDataFrame(
            [Row(domain="web", tok=0), Row(domain="code", tok=0)],
            "domain string, tok long",
        )
        with pytest.raises(Exception) as ei:
            domain_mixture_weights(df, "domain", "tok").collect()
        assert "total corpus mass is zero" in str(ei.value)
        assert "DIVIDE_BY_ZERO" not in str(ei.value)

    def test_zero_mass_domain_gets_weight_zero(self, spark):
        df = spark.createDataFrame(
            [Row(domain="web", tok=40), Row(domain="empty", tok=0)],
            "domain string, tok long",
        )
        rows = {r["domain"]: r for r in
                domain_mixture_weights(df, "domain", "tok").collect()}
        assert rows["empty"]["corpus_share"] == 0.0
        assert rows["empty"]["weight"] == 0.0
        assert rows["web"]["corpus_share"] == 1.0

    def test_happy_path_values_unchanged(self, spark):
        rows = {r["domain"]: r for r in domain_mixture_weights(
            self._corpus(spark), "domain", "tok",
            target={"web": 3.0, "code": 1.0}).collect()}
        assert rows["web"]["corpus_share"] == 0.4
        assert rows["web"]["target_share"] == 0.75
        assert rows["web"]["weight"] == 1.875
        assert rows["code"]["weight"] == pytest.approx(0.25 / 0.6, abs=1e-6)


class TestRegistryWindowContract:
    ROTATED_IN = {
        "split_leakage_safe", "decontaminate_share", "pca_project_frozen",
        "batch_length_bucketed", "domain_mixture_weights",
    }
    DEFERRED = {
        "to_char_format", "interval_arithmetic", "join_right_outer",
        "union_distinct_keys", "ann_lsh_multiprobe_topk",
    }

    def test_window_is_all_exact_and_rotation_landed(self):
        from dozer_spark.queries import registry

        reg = registry()
        window = list(reg)[:50]
        assert all(reg[n].oracle is not None for n in window)
        assert self.ROTATED_IN <= set(window)
        assert not (self.DEFERRED & set(window))
        # deferred queries keep their exact oracle (still parity-replayed)
        assert all(reg[n].oracle is not None for n in self.DEFERRED)

    def test_every_rows_only_query_is_pinned_by_a_test(self):
        # The driver's sampled window never reaches rows-only queries, so
        # their verification channel is (a) the full-registry parity run
        # and (b) an in-repo equivalence/recall test. Pin (b): each
        # rows-only name must appear in at least one test module.
        from dozer_spark.queries import registry

        reg = registry()
        rows_only = [n for n, q in reg.items() if q.oracle is None]
        corpus = "\n".join(
            p.read_text() for p in TESTS_DIR.glob("test_*.py")
            if p.name != "test_advice_r10.py"
        )
        missing = [n for n in rows_only if n not in corpus]
        assert not missing, f"rows-only queries without a test pin: {missing}"


class TestIvfPqFoldPrecision:
    def test_float32_input_matches_double_rendering(self, spark):
        import random

        from dozer_spark.ops.similarity import ivf_pq_ann_topk_frozen

        rng = random.Random(7)
        d, m_sub, dsub = 8, 2, 4
        vecs = [[rng.uniform(-1, 1) for _ in range(d)] for _ in range(40)]
        coarse = [vecs[0], vecs[1], vecs[2], vecs[3]]
        books = [
            [[rng.uniform(-0.5, 0.5) for _ in range(dsub)] for _ in range(4)]
            for _ in range(m_sub)
        ]
        rows = [Row(id=i, v=v) for i, v in enumerate(vecs)]
        df64 = spark.createDataFrame(rows, "id long, v array<double>")
        df32 = df64.select("id", F.col("v").cast("array<float>").alias("v"))

        def run(df):
            out = ivf_pq_ann_topk_frozen(
                df, df.limit(5), "v", "id", coarse, books, k=3, n_probe=2)
            return sorted(map(tuple, out.collect()))

        # float32 storage loses precision vs the double source, so compare
        # float32 input against the DOUBLE RENDERING of those same float32
        # values — identical iff the folds compute in double either way.
        df32_as64 = df32.select(
            "id", F.col("v").cast("array<double>").alias("v"))
        assert run(df32) == run(df32_as64)


class TestLeakageSplitKeyTypes:
    def _pairs(self, spark):
        return spark.createDataFrame(
            [Row(id_a=1, id_b=2)], "id_a long, id_b long")

    def test_mismatched_key_type_is_refused(self, spark):
        df = spark.createDataFrame(
            [Row(k="1"), Row(k="2"), Row(k="3")], "k string")
        with pytest.raises(ValueError, match="types match"):
            leakage_safe_split(df, "k", self._pairs(spark),
                               [("train", 0.8), ("test", 0.2)])

    def test_singletons_match_hash_split_when_types_align(self, spark):
        df = spark.createDataFrame(
            [Row(k=i) for i in range(1, 30)], "k long")
        splits = [("train", 0.5), ("valid", 0.25), ("test", 0.25)]
        got = {r["k"]: r["split"] for r in
               leakage_safe_split(df, "k", self._pairs(spark),
                                  splits, salt="s").collect()}
        want = {r["k"]: r["split"] for r in
                hash_split(df, "k", splits, salt="s").collect()}
        # paired rows 1,2 share the representative min(1,2)=1; every
        # singleton must agree with hash_split exactly
        assert got[2] == want[1]
        for k in range(3, 30):
            assert got[k] == want[k], k
