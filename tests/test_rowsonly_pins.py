"""Query-level pins for every rows-only registry entry.

The driver's CORRECTNESS artifact samples the first 50 registry
entries, all exact-oracle, so rows-only queries (non-SQL-expressible
ANN / k-means / BLAS variants) are never exercised by the external
sampler. Their verification channels are (a) the full-registry parity
run each round (rows + schema recorded in PARITY_r{N}.json) and (b)
this module: each rows-only query name from `registry()` is executed
here at the smoke scale factor AS REGISTERED (the exact callable the
driver would run), asserting non-trivial output, a stable schema, and
— where an exact sibling query exists — agreement with it.

Op-level equivalence (BLAS vs fold, recall vs brute force, policy vs
numpy) lives in tests/test_ann_clusters.py, test_semdedup.py,
test_ivf_pq.py; this module pins the REGISTRY ENTRIES themselves so a
wiring regression (wrong table, wrong params, renamed column) cannot
hide behind a green op test.
"""

from __future__ import annotations

import pytest

from dozer_spark.queries import registry

SF = "/root/testdata/sf0.001"

# the remaining rows-only entries — all genuinely sample-fit paths
# (live k-means / PCA eigendecomposition), each anchored by a frozen
# sibling's exact oracle and by the op-level tests named in each
# query's docstring
SIBLINGS = {
    "ann_ivf_topk": None,
    "ann_ivf_pq_topk": None,
    "cdc_ivf_index_topk": None,
    "dedup_semantic": None,
    "sample_cluster_balanced": None,
    "embedding_pca_project": None,
}

# r12: fast variants converted to EXACT oracles (they reuse their
# sibling's oracle SQL — BLAS cosine matches the fold after the shared
# 6-decimal rounding). No longer rows-only; agreement with the sibling
# is upgraded to strict whole-row equality here. ann_ivf_topk_fast runs
# the FROZEN quantizer now, so its sibling is the frozen Column path.
EXACT_SIBLINGS = {
    "ann_brute_force_topk_fast": "ann_brute_force_topk",
    "ann_lsh_topk_fast": "ann_lsh_topk",
    "ann_ivf_topk_fast": "ann_ivf_topk_frozen",
    "ann_hard_negatives_fast": "ann_hard_negatives",
    "cdc_streaming_ann_index_fast": "cdc_streaming_ann_index",
}


def _pairs(rows):
    return {(r["query_id"], r["neighbor_id"]) for r in rows}


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_sibling_map_is_exhaustive(reg):
    rows_only = {n for n, q in reg.items() if q.oracle is None}
    assert rows_only == set(SIBLINGS), (
        "rows-only registry entries changed; update SIBLINGS so every "
        f"entry stays pinned (diff: {rows_only ^ set(SIBLINGS)})"
    )


@pytest.mark.parametrize("name", sorted(SIBLINGS))
def test_rows_only_query_runs_as_registered(spark, reg, name):
    df = reg[name].build(spark, SF)
    rows = df.collect()
    assert len(rows) > 0, f"{name} produced no rows at smoke scale"
    assert len(df.columns) >= 2, df.columns
    # deterministic: the registered callable must reproduce itself
    again = reg[name].build(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@pytest.mark.parametrize("name,sibling", sorted(EXACT_SIBLINGS.items()))
def test_exact_fast_variant_equals_sibling_rows(spark, reg, name, sibling):
    """The converted fast variants carry their sibling's oracle SQL, so
    the bar is whole-row equality (ids, rounded cosine, rank) — the
    same multiset the driver value-hashes."""
    fast = sorted(map(tuple, reg[name].build(spark, SF).collect()))
    base = sorted(map(tuple, reg[sibling].build(spark, SF).collect()))
    assert fast and fast == base
