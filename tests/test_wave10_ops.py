"""Wave-10 ops: leakage-safe cluster splits, domain mixture weights,
length-bucketed batch manifests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dozer_spark.ops.packing import length_bucketed_batches
from dozer_spark.ops.sampling import (
    domain_mixture_weights,
    hash_split,
    leakage_safe_split,
)

SPLITS = [("train", 0.8), ("valid", 0.1), ("test", 0.1)]


def _md5_bucket(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16)


class TestLeakageSafeSplit:
    def _docs(self, spark):
        rows = [(i, f"doc {i}") for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cluster_members_share_split(self, spark):
        docs = self._docs(spark)
        # components: {0,1,2} (chain), {10,11}; rest singletons
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long")
        out = {r.doc_id: r.split for r in leakage_safe_split(
            docs, "doc_id", pairs, SPLITS).collect()}
        assert len(out) == 40
        assert out[0] == out[1] == out[2]
        assert out[10] == out[11]
        # cluster rep is the min id: the whole component splits as it
        assert out[0] == _split_name(_md5_bucket("split", 0))
        assert out[10] == _split_name(_md5_bucket("split", 10))

    def test_singletons_match_plain_hash_split(self, spark):
        docs = self._docs(spark)
        pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
        safe = {r.doc_id: r.split for r in leakage_safe_split(
            docs, "doc_id", pairs, SPLITS).collect()}
        plain = {r.doc_id: r.split for r in hash_split(
            docs, "doc_id", SPLITS, salt="split").collect()}
        for i in range(2, 40):  # everything outside the one pair
            assert safe[i] == plain[i]

    def test_no_near_dup_pair_straddles_splits(self, spark):
        # adversarial: many pairs engineered so row-level hashing WOULD
        # straddle for at least one pair, cluster-level must not
        docs = spark.createDataFrame(
            [(i, "x") for i in range(200)], "doc_id long, text string")
        pairs = spark.createDataFrame(
            [(i, i + 100) for i in range(100)], "id_a long, id_b long")
        plain = {r.doc_id: r.split for r in hash_split(
            docs, "doc_id", SPLITS, salt="split").collect()}
        assert any(plain[a] != plain[a + 100] for a in range(100))
        safe = {r.doc_id: r.split for r in leakage_safe_split(
            docs, "doc_id", pairs, SPLITS).collect()}
        assert all(safe[a] == safe[a + 100] for a in range(100))


def _split_name(bucket: int) -> str:
    if bucket < int(0.8 * (1 << 32)):
        return "train"
    if bucket < int(0.9 * (1 << 32)):
        return "valid"
    return "test"


class TestDomainMixtureWeights:
    def test_uniform_target(self, spark):
        df = spark.createDataFrame(
            [("a", 2.0)] * 3 + [("b", 1.0)] * 1,
            "dom string, sz double")
        out = {r.domain: r for r in domain_mixture_weights(
            df, "dom", size_col="sz").collect()}
        # masses: a=6, b=1; corpus shares 6/7, 1/7; uniform target 1/2
        assert out["a"].n_rows == 3 and out["b"].n_rows == 1
        assert out["a"].corpus_share == pytest.approx(6 / 7, abs=1e-6)
        assert out["a"].weight == pytest.approx(0.5 / (6 / 7), abs=1e-6)
        assert out["b"].weight == pytest.approx(0.5 / (1 / 7), abs=1e-6)

    def test_explicit_target_renormalized_and_absent_zero(self, spark):
        df = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "dom string")
        out = {r.domain: r for r in domain_mixture_weights(
            df, "dom", target={"a": 3.0, "b": 1.0}).collect()}
        assert out["a"].target_share == pytest.approx(0.75, abs=1e-6)
        assert out["b"].target_share == pytest.approx(0.25, abs=1e-6)
        assert out["c"].target_share == 0.0 and out["c"].weight == 0.0

    def test_negative_target_rejected(self, spark):
        df = spark.createDataFrame([("a",)], "dom string")
        with pytest.raises(ValueError):
            domain_mixture_weights(df, "dom", target={"a": -1.0})


class TestLengthBucketedBatches:
    def _docs(self, spark, n=300):
        # token counts spanning all three buckets for edges [4, 8]
        rows = [(i, " ".join(["w"] * (1 + i % 12))) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_single_window_reference(self, spark):
        docs = self._docs(spark)
        got = {r.doc_id: r for r in length_bucketed_batches(
            docs, "doc_id", "text", [4, 8], batch_tokens=40).collect()}
        # pandas replay of the single-window formulation
        recs = []
        for i in range(300):
            n = 1 + i % 12
            h = hashlib.md5(f"batch:{i}".encode()).hexdigest()
            sub = int(h[:4], 16) % 16
            b = 0 if n < 4 else (1 if n < 8 else 2)
            recs.append((b, sub, h, i, n))
        recs.sort()
        cum = {}
        for b, sub, h, i, n in recs:
            start = cum.get(b, 0)
            cum[b] = start + n
            r = got[i]
            assert (r.bucket, r.n_tokens) == (b, n)
            assert r.batch_id == start // 40, (i, r, start)

    def test_subbucket_count_does_not_break_invariants(self, spark):
        # different parallelism, same per-bucket batch sizing invariant:
        # every non-final batch holds >= batch_tokens - max_len + 1 and
        # the batch ids are dense from 0 within each bucket
        docs = self._docs(spark)
        for n_sub in (1, 4):
            out = length_bucketed_batches(
                docs, "doc_id", "text", [4, 8], batch_tokens=40,
                n_subbuckets=n_sub).collect()
            by_bucket = {}
            for r in out:
                by_bucket.setdefault(r.bucket, {}).setdefault(
                    r.batch_id, 0)
                by_bucket[r.bucket][r.batch_id] += r.n_tokens
            for bucket, batches in by_bucket.items():
                ids = sorted(batches)
                assert ids == list(range(len(ids)))
                for bid in ids[:-1]:
                    assert batches[bid] >= 40 - 11

    def test_validates_args(self, spark):
        docs = self._docs(spark, 5)
        with pytest.raises(ValueError):
            length_bucketed_batches(docs, "doc_id", "text", [], 10)
        with pytest.raises(ValueError):
            length_bucketed_batches(docs, "doc_id", "text", [8, 4], 10)
        with pytest.raises(ValueError):
            length_bucketed_batches(docs, "doc_id", "text", [4], 0)


class TestContaminationShare:
    def test_known_values_and_clean_and_short_docs(self, spark):
        from dozer_spark.ops.text import contamination_share

        rows = [
            (0, "a b c d e"),          # eval doc: grams {abc, bcd, cde}
            (1, "a b c x y z"),        # dirty: {abc, bcx, cxy, xyz} -> 1/4
            (2, "p q r s"),            # clean: {pqr, qrs} -> 0/2
            (3, "t u"),                # too short: 0 grams
            (4, "a b c d e"),          # fully dirty: 3/3
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in contamination_share(
            df, "text", "doc_id", F.col("doc_id") == 0, n=3).collect()}
        assert set(out) == {1, 2, 3, 4}  # eval doc excluded
        assert (out[1].n_grams, out[1].n_hits, out[1].share) == (4, 1, 0.25)
        assert (out[2].n_grams, out[2].n_hits, out[2].share) == (2, 0, 0.0)
        assert (out[3].n_grams, out[3].n_hits, out[3].share) == (0, 0, 0.0)
        assert (out[4].n_grams, out[4].n_hits, out[4].share) == (3, 3, 1.0)

    def test_null_text_and_null_pred_rows_survive(self, spark):
        from dozer_spark.ops.text import contamination_share

        df = spark.createDataFrame(
            [(0, "a b c d"), (1, None), (2, "a b c")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in contamination_share(
            df, "text", "doc_id",
            F.when(F.col("doc_id") == 0, True), n=3).collect()}
        # NULL predicate rows are corpus rows (coalesce False), NULL
        # text behaves as gram-less
        assert (out[1].n_grams, out[1].share) == (0, 0.0)
        assert (out[2].n_grams, out[2].n_hits) == (1, 1)


class TestPcaProjectFrozen:
    def test_matches_numpy_and_deterministic(self, spark):
        import numpy as np

        from dozer_spark.ops.embedding import pca_project_frozen
        from dozer_spark.ops.pca_frozen import (
            FROZEN_PCA_COMPONENTS_8x64,
            FROZEN_PCA_MEAN_64,
        )

        rng = np.random.default_rng(11)
        rows = [(i, [float(x) for x in rng.normal(size=64)])
                for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r.vec_id: list(r.pc) for r in pca_project_frozen(
            df, "embedding", FROZEN_PCA_MEAN_64,
            FROZEN_PCA_COMPONENTS_8x64, id_col="vec_id").collect()}
        m = np.array(FROZEN_PCA_MEAN_64)
        P = np.array(FROZEN_PCA_COMPONENTS_8x64)
        for i, v in rows:
            want = (np.array(v, dtype=np.float32).astype(np.float64) - m) @ P.T
            got = np.array(out[i])
            assert np.allclose(got, np.round(want, 6), atol=1e-6), i
        # repartitioning does not change a single bit
        again = {r.vec_id: list(r.pc) for r in pca_project_frozen(
            df.repartition(7), "embedding", FROZEN_PCA_MEAN_64,
            FROZEN_PCA_COMPONENTS_8x64, id_col="vec_id").collect()}
        assert out == again

    def test_components_orthonormal(self):
        import numpy as np

        from dozer_spark.ops.pca_frozen import FROZEN_PCA_COMPONENTS_8x64

        P = np.array(FROZEN_PCA_COMPONENTS_8x64)
        assert np.allclose(P @ P.T, np.eye(8), atol=1e-9)


class TestReviewFindingsR10:
    def test_domain_mixture_rejects_empty_and_all_zero_target(self, spark):
        df = spark.createDataFrame([("a",)], "dom string")
        with pytest.raises(ValueError, match="empty"):
            domain_mixture_weights(df, "dom", target={})
        with pytest.raises(ValueError, match="zero"):
            domain_mixture_weights(df, "dom", target={"a": 0.0})

    def test_frozen_paths_reject_wrong_dimension(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkRuntimeError

        from dozer_spark.ops.embedding import pca_project_frozen
        from dozer_spark.ops.pca_frozen import (
            FROZEN_PCA_COMPONENTS_8x64,
            FROZEN_PCA_MEAN_64,
        )
        from dozer_spark.ops.ivf_frozen import FROZEN_CENTROIDS_16x64
        from dozer_spark.ops.similarity import ivf_ann_topk_frozen

        short = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>")
        with pytest.raises(Exception, match="pca_project_frozen"):
            pca_project_frozen(
                short, "embedding", FROZEN_PCA_MEAN_64,
                FROZEN_PCA_COMPONENTS_8x64, id_col="vec_id").collect()
        with pytest.raises(Exception, match="ivf_ann_topk_frozen"):
            ivf_ann_topk_frozen(
                short, short, "embedding", "vec_id",
                FROZEN_CENTROIDS_16x64, k=1).collect()
