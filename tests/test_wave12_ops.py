"""Wave-12 ops: margin-based bitext mining (Artetxe & Schwenk 2019)
checked against an independent numpy reference and its contracts
(hub-vector normalization, mutual-best symmetry, row-bound guard)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dozer_spark.ops.similarity import bitext_margin_mine

DIM = 8


def _vec(rng: np.random.Generator) -> list[float]:
    v = rng.standard_normal(DIM)
    return [float(x) for x in v]


def _numpy_mine(src_rows, tgt_rows, k, threshold):
    """Independent reference: dense cosine matrix, ratio margins over
    the k nearest, best-per-source cut + mutual flag."""
    sids = [r[0] for r in src_rows]
    tids = [r[0] for r in tgt_rows]
    S = np.array([r[1] for r in src_rows], dtype=float)
    T = np.array([r[1] for r in tgt_rows], dtype=float)
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    C = Sn @ Tn.T  # (ns, nt)

    def topk_mean(scores, ids, k):
        order = sorted(range(len(ids)), key=lambda j: (-scores[j], ids[j]))
        take = order[: min(k, len(ids))]
        return sum(scores[j] for j in take) / len(take), take

    fwd_mean, fwd_take = {}, {}
    for i, sid in enumerate(sids):
        fwd_mean[sid], fwd_take[sid] = topk_mean(C[i], tids, k)
    bwd_mean = {}
    for j, tid in enumerate(tids):
        bwd_mean[tid], _ = topk_mean(C[:, j], sids, k)

    cand = {}  # (sid, tid) -> (cos, margin)
    for i, sid in enumerate(sids):
        for j in fwd_take[sid]:
            tid = tids[j]
            mg = C[i, j] / ((fwd_mean[sid] + bwd_mean[tid]) / 2.0)
            cand[(sid, tid)] = (C[i, j], mg)
    best_s = {}
    for (sid, tid), (c, mg) in cand.items():
        cur = best_s.get(sid)
        if cur is None or (-mg, tid) < (-cur[1], cur[0]):
            best_s[sid] = (tid, mg, c)
    best_t = {}
    for (sid, tid), (c, mg) in cand.items():
        cur = best_t.get(tid)
        if cur is None or (-mg, sid) < (-cur[1], cur[0]):
            best_t[tid] = (sid, mg)
    out = {}
    for sid, (tid, mg, c) in best_s.items():
        if mg >= threshold:
            mutual = best_t[tid][0] == sid
            out[sid] = (tid, round(c, 5), round(mg, 5), mutual)
    return out


@pytest.fixture(scope="module")
def mined(spark):
    rng = np.random.default_rng(7)
    src_rows = [(i, _vec(rng)) for i in range(30)]
    tgt_rows = [(100 + i, _vec(rng)) for i in range(25)]
    src = spark.createDataFrame(src_rows, "vid long, emb array<float>")
    tgt = spark.createDataFrame(tgt_rows, "vid long, emb array<float>")
    got = bitext_margin_mine(src, tgt, "emb", "vid", k=4,
                             threshold=0.9).collect()
    # float32 ingestion: rebuild the reference from the float-cast values
    src32 = [(i, [float(np.float32(x)) for x in v]) for i, v in src_rows]
    tgt32 = [(i, [float(np.float32(x)) for x in v]) for i, v in tgt_rows]
    want = _numpy_mine(src32, tgt32, k=4, threshold=0.9)
    return got, want


class TestBitextMarginMine:
    def test_matches_numpy_reference(self, mined):
        got, want = mined
        assert {r.src_id for r in got} == set(want)
        for r in got:
            tid, c5, mg5, mutual = want[r.src_id]
            assert r.tgt_id == tid
            assert math.isclose(round(r.cosine, 5), c5, abs_tol=2e-5)
            assert math.isclose(round(r.margin, 5), mg5, abs_tol=2e-5)
            assert r.mutual == mutual

    def test_one_row_per_mined_source(self, mined):
        got, _ = mined
        sids = [r.src_id for r in got]
        assert len(sids) == len(set(sids))

    def test_mutual_pairs_unique_per_target(self, mined):
        got, _ = mined
        mut = [r.tgt_id for r in got if r.mutual]
        assert len(mut) == len(set(mut))

    def test_hub_vector_is_margin_penalized(self, spark):
        """A target near the source centroid (a hub: high cosine to
        every source) must lose on margin to an exclusive near-copy
        even when its raw cosine is competitive — the normalization
        that motivates margin mining over cosine thresholding."""
        rng = np.random.default_rng(11)
        base = rng.standard_normal(DIM)
        srcs = [base + 0.25 * rng.standard_normal(DIM) for _ in range(8)]
        hub = np.mean(srcs, axis=0)  # close to every source
        copy0 = srcs[0] + 0.01 * rng.standard_normal(DIM)  # near-dup of s0
        src = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(srcs)],
            "vid long, emb array<float>")
        tgt = spark.createDataFrame(
            [(100, [float(x) for x in hub]),
             (101, [float(x) for x in copy0])],
            "vid long, emb array<float>")
        rows = {r.src_id: r for r in bitext_margin_mine(
            src, tgt, "emb", "vid", k=2, threshold=0.0).collect()}
        assert rows[0].tgt_id == 101  # the exclusive pair wins on margin
        assert rows[0].mutual

    def test_row_bound_guard(self, spark):
        df = spark.range(10).selectExpr(
            "id as vid", "array(cast(id as float), 1.0f) as emb")
        with pytest.raises(ValueError, match="max_rows"):
            bitext_margin_mine(df, df, "emb", "vid", max_rows=5)


class TestPrunePrototypesFrozen:
    def _run(self, spark, prune_frac):
        from dozer_spark.ops.semdedup_frozen import (
            FROZEN_UNIT_CENTROIDS_16x64,
            prune_prototypes_frozen,
        )
        rng = np.random.default_rng(3)
        rows = [(i, [float(x) for x in rng.standard_normal(64)])
                for i in range(200)]
        df = spark.createDataFrame(rows, "vid long, emb array<float>")
        return prune_prototypes_frozen(
            df, "emb", "vid", FROZEN_UNIT_CENTROIDS_16x64,
            prune_frac=prune_frac).collect()

    def test_per_cell_prune_count(self, spark):
        out = self._run(spark, 0.3)
        assert len(out) == 200
        by_cell = {}
        for r in out:
            by_cell.setdefault(r.cell, []).append(r)
        for cell, rs in by_cell.items():
            n = len(rs)
            dropped = sum(1 for r in rs if not r.kept)
            assert dropped == math.floor(0.3 * n + 0.5)

    def test_keeps_hard_tail(self, spark):
        """Every pruned item is at least as prototypical (>= centroid
        sim) as every kept item in its cell."""
        out = self._run(spark, 0.5)
        by_cell = {}
        for r in out:
            by_cell.setdefault(r.cell, []).append(r)
        for rs in by_cell.values():
            kept = [r.centroid_sim for r in rs if r.kept]
            pruned = [r.centroid_sim for r in rs if not r.kept]
            if kept and pruned:
                assert min(pruned) >= max(kept)

    def test_prune_frac_zero_keeps_all(self, spark):
        out = self._run(spark, 0.0)
        assert all(r.kept for r in out)


class TestPpsSystematicSample:
    def _docs(self, spark, weights):
        return spark.createDataFrame(
            [(i, w) for i, w in enumerate(weights)],
            "doc_id long, w long")

    def test_total_draws_equal_k(self, spark):
        from dozer_spark.ops.sampling import pps_systematic_sample

        rng = np.random.default_rng(5)
        docs = self._docs(spark, [int(x) for x in rng.integers(1, 200, 300)])
        for k in (7, 40, 111):
            out = pps_systematic_sample(docs, "w", "doc_id", k=k).collect()
            assert sum(r.n_hits for r in out) == k
            assert all(r.n_hits >= 1 for r in out)

    def test_heavy_doc_always_selected_with_multiplicity(self, spark):
        """Systematic PPS certainty: a doc with weight >= W/k cannot be
        skipped, and one with weight >= 2W/k is drawn >= 2 times."""
        from dozer_spark.ops.sampling import pps_systematic_sample

        weights = [10] * 50 + [2000]  # W = 2500, k=10 -> stride 250
        docs = self._docs(spark, weights)
        out = {r.doc_id: r.n_hits for r in pps_systematic_sample(
            docs, "w", "doc_id", k=10).collect()}
        assert out[50] >= 2000 * 10 // 2500  # 8 draws guaranteed
        assert sum(out.values()) == 10

    def test_bit_identical_across_partitioning(self, spark):
        """n_buckets pins the order (it's part of the order key, like
        the salt); the PHYSICAL partitioning must never matter."""
        from dozer_spark.ops.sampling import pps_systematic_sample

        rng = np.random.default_rng(9)
        docs = self._docs(spark, [int(x) for x in rng.integers(1, 99, 400)])
        a = sorted(map(tuple, pps_systematic_sample(
            docs.coalesce(1), "w", "doc_id", k=33).collect()))
        b = sorted(map(tuple, pps_systematic_sample(
            docs.repartition(17), "w", "doc_id", k=33).collect()))
        assert a == b and len(a) > 0

    def test_zero_weight_rows_excluded(self, spark):
        from dozer_spark.ops.sampling import pps_systematic_sample

        docs = self._docs(spark, [0, 5, 5, 0, 5])
        out = pps_systematic_sample(docs, "w", "doc_id", k=3).collect()
        assert {r.doc_id for r in out} <= {1, 2, 4}
        assert sum(r.n_hits for r in out) == 3

    def test_k_validation(self, spark):
        from dozer_spark.ops.sampling import pps_systematic_sample

        docs = self._docs(spark, [5, 5])
        with pytest.raises(ValueError, match="k must be"):
            pps_systematic_sample(docs, "w", "doc_id", k=0)
