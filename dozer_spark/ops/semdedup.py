"""Semantic deduplication (SemDeDup): k-means-cluster the embedding
space, then prune near-identical items WITHIN each cluster by cosine —
the published recipe of Abbas et al. 2023 ("SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540)
that removed ~50% of LAION with no quality loss.

This complements the registry's other embedding dedup
(ops/dedup.py embedding_neardup_pairs_lsh): LSH banding finds HIGH
cosine pairs anywhere in the space; SemDeDup partitions the space first
and dedups within semantic clusters, which is the shape that scales to
web corpora (the paper runs k-means with k~25k on 1.3B LAION items)
and the policy ML pipelines actually use (keep the item FARTHEST from
its centroid — the most atypical exemplar of each duplicate group).

Scale design (100 TB):
- Quantizer: sample-fit k-means (shared _fit_quantizer — bounded
  39*k-row training set, never the corpus; the r8-measured full-corpus
  fit was the one super-linear cost in the IVF family).
- Assignment + centroid similarity: one mapInPandas pass, matmul-
  expanded nearest-centroid (_nearest_cells), centroids in the closure.
- Within-cluster pruning: one shuffle on (cell, subcell) +
  applyInPandas greedy scan. Cells above hot_cell_cap split into
  deterministic id-hash subcells BEFORE the pandas grouping so no task
  materializes an unbounded group — clustered spaces concentrate mass.
  The split trades bounded recall (a duplicate pair straddling two
  subcells of one hot cell is missed) for a hard memory ceiling; the
  paper's own within-cluster scoping makes the identical trade across
  clusters, and hot cells at sqrt(n) centroids are the tail, not the
  norm.

Greedy keep policy (deterministic): items in a (cell, subcell) group
are ordered by (cosine-to-centroid ASC, id ASC) — farthest-from-
centroid first, the SemDeDup keep rule — and an item is kept iff its
cosine to every ALREADY-KEPT item in the group is < 1 - eps. Order is
total and data-derived, so the result is reproducible across runs,
partitionings, and cluster sizes.

No reference-parity row: dozer has no embedding surface
(ops/dedup.py:1 provenance applies) — this is part of the
beyond-reference training-data layer. k-means makes an exact SQL
oracle infeasible (rows-only driver gate); exactness vs a pure-numpy
reference implementation of the same policy is pytest-pinned
(tests/test_semdedup.py) at n_centroids=1, where the Spark plan
reduces to the bare greedy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dozer_spark.operators.hints import (
    cache_materialized,
    ensure_min_partitions,
    maybe_broadcast,
)


def _unit(vec: Column) -> Column:
    """L2-normalize a float array Column — the shared engine-portable
    normalization (similarity.unit_vector); aliased here so every
    semdedup call site uses the same 1e-12-floored sequential-fold norm
    as the frozen/oracle ANN paths."""
    from dozer_spark.ops.similarity import unit_vector

    return unit_vector(vec)


def _semdedup_centroids(df: DataFrame, vec_col: str, id_col: str,
                        n_centroids: int | None, seed: int):
    """Sample-fit the cluster quantizer on L2-NORMALIZED vectors;
    returns list[list[float]].

    Normalization first is the paper's recipe (SemDeDup clusters
    normalized embeddings; the dedup criterion is cosine) and is what
    makes cell assignment scale-invariant: a scaled copy of a vector —
    cosine-identical, the canonical semantic duplicate — must land in
    the same cell, which raw-euclidean k-means does not guarantee
    (measured: 39% of planted scaled dups split cells at 20k vectors
    before this change; see tools/semantic_recall_run.py)."""
    from pyspark.ml.functions import array_to_vector

    from dozer_spark.ops.similarity import _fit_quantizer

    c = df.select(F.col(id_col).alias("neighbor_id"),
                  _unit(F.col(vec_col)).alias("cv"))
    n = c.count()
    if n == 0:
        return []
    k = n_centroids or min(4096, max(4, int(math.sqrt(n))))
    if k == 1:
        # MLlib KMeans requires k >= 2; k=1 converges to the sample
        # mean anyway — compute it directly over the same
        # xxhash64-threshold sample _fit_quantizer would train on
        target = 39
        sample = c
        if n > target:
            ppm = max(1, min(1_000_000,
                             int(1_000_000 * target * 1.05 / n)))
            sample = c.filter(
                F.pmod(F.xxhash64(F.col("neighbor_id"), F.lit(seed)),
                       F.lit(1_000_000)) < F.lit(ppm))
        m = (sample.select(F.posexplode(F.col("cv").cast("array<double>"))
                           .alias("__i", "__x"))
             .groupBy("__i").agg(F.avg("__x").alias("m"))
             .orderBy("__i").collect())
        return [[float(r.m) for r in m]]
    ml = c.select(
        "neighbor_id",
        array_to_vector(F.col("cv").cast("array<double>")).alias("feat"))
    model = _fit_quantizer(ml, n, k, seed)
    return [list(map(float, v)) for v in model.clusterCenters()]


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    eps: float = 0.05,
    n_centroids: int | None = None,
    seed: int = 42,
    hot_cell_cap: int = 8192,
    broadcast_gate_bytes: int | None = None,
) -> DataFrame:
    """SemDeDup decision table: one row per input item —
    (id_col, cell, centroid_sim, kept).

    kept=false means the item has a kept semantic duplicate (cosine >=
    1 - eps) in its cluster; downstream filters `WHERE kept` to
    materialize the deduplicated corpus. centroid_sim is the cosine to
    the item's own centroid (the keep-priority key), exposed because
    the paper's ablations select on it directly.
    """
    import numpy as np
    import pandas as pd

    threshold = 1.0 - eps
    centroids = _semdedup_centroids(df, vec_col, id_col, n_centroids, seed)
    if not centroids:
        return df.sparkSession.createDataFrame(
            [], T.StructType([
                T.StructField(id_col, df.schema[id_col].dataType),
                T.StructField("cell", T.IntegerType()),
                T.StructField("centroid_sim", T.DoubleType()),
                T.StructField("kept", T.BooleanType()),
            ]))
    C = np.array(centroids)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    from dozer_spark.ops.similarity import _nearest_cells

    src = ensure_min_partitions(df).select(
        F.col(id_col), F.col(vec_col).alias("__v"))
    assign_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("__v", df.schema[vec_col].dataType),
        T.StructField("cell", T.IntegerType()),
        T.StructField("centroid_sim", T.DoubleType()),
    ])

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array([list(map(float, v)) for v in pdf["__v"]])
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            # spherical assignment: argmin ||vn - cn||^2 == argmax
            # cosine — scale-invariant, so cosine-identical duplicates
            # share a cell by construction
            cells = _nearest_cells(Vn, Cn, 1)[:, 0]
            sim = np.einsum("ij,ij->i", Vn, Cn[cells])
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "__v": pdf["__v"],
                "cell": cells.astype("int32"),
                "centroid_sim": sim,
            })

    assigned = cache_materialized(src.mapInPandas(assign, assign_schema))

    # hot-cell subcell split: cells past the cap fragment by id hash so
    # every pandas group is <= ~cap rows (bounded-recall trade, see
    # module docstring)
    hot = cache_materialized(
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_cell_cap)
        .select(
            "cell",
            F.ceil(F.col("__n") / hot_cell_cap).cast("int").alias("__s"),
        )
    )
    frag = (
        assigned.join(maybe_broadcast(hot, broadcast_gate_bytes),
                      "cell", "left")
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(1)))
        .withColumn(
            "subcell",
            F.pmod(F.crc32(F.col(id_col).cast("string")),
                   F.col("__s")).cast("int"),
        )
    )

    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("cell", T.IntegerType()),
        T.StructField("centroid_sim", T.DoubleType()),
        T.StructField("kept", T.BooleanType()),
    ])

    def greedy(key, pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values(
            ["centroid_sim", id_col], kind="mergesort"
        ).reset_index(drop=True)
        V = np.array([list(map(float, v)) for v in p["__v"]])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        n = len(p)
        kept = np.zeros(n, dtype=bool)
        K = np.empty_like(Vn)  # preallocated kept-vector prefix
        m = 0
        for i in range(n):
            if m == 0 or float((K[:m] @ Vn[i]).max()) < threshold:
                K[m] = Vn[i]
                kept[i] = True
                m += 1
        return pd.DataFrame({
            id_col: p[id_col],
            "cell": p["cell"],
            "centroid_sim": p["centroid_sim"],
            "kept": kept,
        })

    return (
        frag.select(id_col, "__v", "cell", "centroid_sim", "subcell")
        .groupBy("cell", "subcell")
        .applyInPandas(greedy, out_schema)
    )


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    total: int,
    n_centroids: int | None = None,
    alpha: float = 0.5,
    seed: int = 42,
    salt: str = "cluster",
) -> DataFrame:
    """Cluster-balanced diversity sampling over an embedding column —
    the diversification half of the D4 recipe (Tirumala et al. 2023,
    "D4: Improving LLM Pretraining via Document De-Duplication and
    Diversification", public literature): k-means-partition the
    embedding space, then draw a per-cluster quota
    `round(total * c^alpha / sum(c^alpha))` so dominant semantic
    clusters are downweighted and rare ones over-represented
    (alpha=1 reproduces proportional sampling; alpha->0 approaches
    equal-per-cluster). Rows within a cluster are chosen by the
    deterministic (md5, id) rank — the same engine-portable cut as
    every sampler in ops/sampling.py.

    Returns (id_col, cell) for the selected rows. k-means makes an
    exact SQL oracle infeasible (rows-only gate); determinism, quota
    arithmetic, and skew-rebalancing are pytest-pinned.

    100 TB design: quantizer is sample-fit (bounded training set);
    assignment is one matmul-expanded mapInPandas pass; the quota
    table is n_centroids rows (broadcast); the rank cut is one
    shuffle on the cell column. Hot cells cost one window sort each —
    pre-thin a dominant cluster with hash_sample if a single cell's
    rank task is ever the straggler.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.window import Window

    if total <= 0:
        raise ValueError("total must be positive")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")

    centroids = _semdedup_centroids(df, vec_col, id_col, n_centroids, seed)
    if not centroids:
        return df.sparkSession.createDataFrame(
            [], T.StructType([
                T.StructField(id_col, df.schema[id_col].dataType),
                T.StructField("cell", T.IntegerType()),
            ]))
    C = np.array(centroids)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    from dozer_spark.ops.similarity import _nearest_cells

    src = ensure_min_partitions(df).select(
        F.col(id_col), F.col(vec_col).alias("__v"))
    assign_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("cell", T.IntegerType()),
    ])

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array([list(map(float, v)) for v in pdf["__v"]])
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cells = _nearest_cells(Vn, Cn, 1)[:, 0]
            yield pd.DataFrame({id_col: pdf[id_col],
                                "cell": cells.astype("int32")})

    assigned = cache_materialized(src.mapInPandas(assign, assign_schema))

    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__c"))
    weighted = counts.withColumn(
        "__w", F.pow(F.col("__c").cast("double"), alpha))
    quotas = (
        weighted.withColumn("__wsum", F.sum("__w").over(Window.partitionBy()))
        .select(
            "cell",
            F.round(F.lit(float(total)) * F.col("__w") / F.col("__wsum"))
            .cast("long").alias("__quota"),
        )
    )
    order = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("cell").orderBy(order, F.col(id_col))
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), "cell")
        .filter(F.col("__rn") <= F.col("__quota"))
        .select(id_col, "cell")
    )
