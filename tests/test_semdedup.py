"""SemDeDup semantic dedup: exactness vs a pure-numpy reference at
n_centroids=1, planted-duplicate behavior, keep-policy direction,
determinism, and the hot-cell subcell bound."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from dozer_spark.ops.semdedup import semantic_dedup


def _numpy_semdedup(ids, vecs, centroid, threshold):
    """Reference implementation of the single-cluster policy: order by
    (cosine-to-centroid asc, id asc), keep iff below threshold vs every
    already-kept item."""
    V = np.array(vecs, dtype=float)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    c = np.array(centroid, dtype=float)
    cn = c / np.linalg.norm(c)
    sims = Vn @ cn
    order = sorted(range(len(ids)), key=lambda i: (sims[i], ids[i]))
    kept, kept_idx = {}, []
    for i in order:
        ok = all(float(Vn[i] @ Vn[j]) < threshold for j in kept_idx)
        kept[ids[i]] = ok
        if ok:
            kept_idx.append(i)
    return kept, {ids[i]: float(sims[i]) for i in range(len(ids))}


def _random_vecs(n, dim, seed):
    rnd = random.Random(seed)
    return [[rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


def test_single_cell_matches_numpy_reference(spark):
    # n=36 <= 39*k so _fit_quantizer trains on the FULL set and the
    # k=1 centroid is exactly the mean of the L2-NORMALIZED float-cast
    # vectors (spherical clustering per the SemDeDup paper)
    vecs = _random_vecs(36, 8, seed=7)
    # plant near-duplicate groups: tiny perturbations of base vectors
    for base in (3, 11, 22):
        for off, scale in ((1, 1.001), (2, 0.999)):
            vecs[base + off] = [x * scale for x in vecs[base]]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = semantic_dedup(df, "embedding", "vec_id", eps=0.05,
                         n_centroids=1).collect()
    assert len(got) == 36

    fvecs = [list(np.array(v, dtype=np.float32).astype(float))
             for v in vecs]
    A = np.array(fvecs)
    An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    centroid = list(np.mean(An, axis=0))
    want_kept, want_sim = _numpy_semdedup(
        list(range(36)), fvecs, centroid, threshold=0.95)
    for r in got:
        assert r.kept == want_kept[r.vec_id], r
        assert r.centroid_sim == pytest.approx(want_sim[r.vec_id], abs=1e-6)
    # the planted groups actually dropped someone
    assert sum(1 for r in got if not r.kept) >= 6


def test_keep_policy_farthest_from_centroid(spark):
    """Within a duplicate group the survivor is the member with the
    LOWEST cosine to the centroid (most atypical), per SemDeDup."""
    base = _random_vecs(40, 8, seed=13)
    base[20] = [x * 1.0005 for x in base[19]]  # dup pair 19/20
    rows = [(i, v) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(
        df, "embedding", "vec_id", eps=0.05, n_centroids=1).collect()}
    a, b = out[19], out[20]
    assert a.kept != b.kept  # exactly one of the pair survives
    survivor = a if a.kept else b
    victim = b if a.kept else a
    assert survivor.centroid_sim <= victim.centroid_sim


def test_deterministic_across_runs(catalog):
    e = catalog.df("embeddings").filter(F.col("vec_id") < 300)
    r1 = sorted(map(tuple, semantic_dedup(
        e, "embedding", "vec_id", eps=0.2, n_centroids=4).collect()))
    r2 = sorted(map(tuple, semantic_dedup(
        e, "embedding", "vec_id", eps=0.2, n_centroids=4).collect()))
    assert r1 == r2 and len(r1) == 300


def test_hot_cell_split_bounds_groups_and_keeps_validity(spark):
    """Force every cell hot (cap 16): groups stay bounded, and the
    within-subcell invariants hold — no two kept items >= threshold,
    every dropped item has a kept duplicate in its subcell."""
    vecs = _random_vecs(120, 6, seed=3)
    for i in range(0, 120, 4):  # heavy planted duplication
        vecs[i + 1] = [x * 1.0008 for x in vecs[i]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    out = semantic_dedup(df, "embedding", "vec_id", eps=0.05,
                         n_centroids=2, hot_cell_cap=16)
    rows = out.collect()
    assert len(rows) == 120

    # recompute subcell exactly as the operator does (crc32(id) % s)
    import zlib

    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    threshold = 0.95
    vmap = {i: np.array(v, dtype=np.float32).astype(float)
            for i, v in enumerate(vecs)}
    for cell, members in by_cell.items():
        s = max(1, -(-len(members) // 16))
        groups = {}
        for r in members:
            sub = zlib.crc32(str(r.vec_id).encode()) % s
            groups.setdefault(sub, []).append(r)
        for sub, g in groups.items():
            assert len(g) <= 4 * 16  # bounded group size (hash skew slack)
            kept = [r for r in g if r.kept]
            for i in range(len(kept)):
                vi = vmap[kept[i].vec_id]
                for j in range(i + 1, len(kept)):
                    vj = vmap[kept[j].vec_id]
                    cos = float(vi @ vj / (np.linalg.norm(vi)
                                           * np.linalg.norm(vj)))
                    assert cos < threshold + 1e-9
            for r in g:
                if r.kept:
                    continue
                vi = vmap[r.vec_id]
                assert any(
                    float(vi @ vmap[k.vec_id]
                          / (np.linalg.norm(vi)
                             * np.linalg.norm(vmap[k.vec_id])))
                    >= threshold - 1e-9
                    for k in kept
                ), f"dropped {r.vec_id} has no kept duplicate"


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semantic_dedup(df, "embedding", "vec_id")
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "cell", "centroid_sim", "kept"}


def test_cluster_balanced_sample_quota_and_determinism(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    # two well-separated clusters, 10:1 skew
    big = rng.randn(200, 8) * 0.05 + np.array([5.0] * 8)
    small = rng.randn(20, 8) * 0.05 + np.array([-5.0] * 8)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(big)]
    rows += [(1000 + i, [float(x) for x in v]) for i, v in enumerate(small)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    from dozer_spark.ops.semdedup import cluster_balanced_sample

    a = sorted(map(tuple, cluster_balanced_sample(
        df, "embedding", "vec_id", total=60, n_centroids=2,
        alpha=0.5).collect()))
    b = sorted(map(tuple, cluster_balanced_sample(
        df, "embedding", "vec_id", total=60, n_centroids=2,
        alpha=0.5).collect()))
    assert a == b
    # sqrt weighting: quotas ~ 60*sqrt(200)/(sqrt(200)+sqrt(20)) ≈ 46
    # and ≈ 14 — the rare cluster gets ~23%, far above its 9% share
    by_cell = {}
    for _vid, cell in a:
        by_cell[cell] = by_cell.get(cell, 0) + 1
    assert len(by_cell) == 2
    small_share = min(by_cell.values()) / sum(by_cell.values())
    assert small_share > 0.15
    # no cell exceeds its population
    assert max(by_cell.values()) <= 200
    assert abs(sum(by_cell.values()) - 60) <= 1


def test_cluster_balanced_sample_validates_args(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    from dozer_spark.ops.semdedup import cluster_balanced_sample

    with _pytest.raises(ValueError):
        cluster_balanced_sample(df, "embedding", "vec_id", total=0)
    with _pytest.raises(ValueError):
        cluster_balanced_sample(df, "embedding", "vec_id", total=5,
                                alpha=0.0)
