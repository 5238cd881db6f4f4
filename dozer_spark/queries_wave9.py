"""Wave 9: pipeline utilities a training-data platform needs around the
core engine — fuzzy entity matching (edit-distance join), time-series
gap-fill/interpolation, contrastive hard-negative mining, deterministic
dataset splits, and PCA embedding preprocessing. All exact DuckDB
oracles except PCA (eigendecomposition is not SQL-expressible; pinned
by numpy-equivalence pytest instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat

_COS = """
        list_sum(list_transform(generate_series(1, 64),
          i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))"""


@_q(
    "fuzzy_join_customer_names",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS s_a, b.c_name AS s_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_join_customer_names(spark, sf):
    """Edit-distance-1 self-join on customer names (record-linkage
    candidate pairs) via the FastSS deletion-neighborhood EQUI-join —
    linear candidate generation, no quadratic block (ops/fuzzy.py). The
    oracle is the SEMANTIC definition (cross join + levenshtein), so the
    hash match proves the neighborhood blocking is complete and the
    verify removes every false candidate. The reference has no fuzzy
    matching at all (SURVEY §2.4 negative space)."""
    from dozer_spark.ops.fuzzy import fuzzy_self_join_dist1

    c = _cat(spark, sf).df("customer")
    return fuzzy_self_join_dist1(c, "c_custkey", "c_name")


@_q(
    "timeseries_gap_fill_hourly",
    """
    WITH obs AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
             ROUND(AVG(value), 9) AS v_obs
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi FROM obs GROUP BY key
    ), spine AS (
      SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ), j AS (
      SELECT s.key, s.bucket, o.v_obs
      FROM spine s LEFT JOIN obs o ON s.key = o.key AND s.bucket = o.bucket
    ), w AS (
      SELECT *,
        last_value(v_obs IGNORE NULLS) OVER
          (PARTITION BY key ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v_obs IS NOT NULL THEN bucket END IGNORE NULLS)
          OVER (PARTITION BY key ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(v_obs IGNORE NULLS) OVER
          (PARTITION BY key ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v_obs IS NOT NULL THEN bucket END IGNORE NULLS)
          OVER (PARTITION BY key ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT key AS user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
      FLOOR((CASE WHEN v_obs IS NOT NULL THEN v_obs
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv)
                       * (CAST(epoch(bucket) - epoch(pt) AS DOUBLE)
                          / CAST(epoch(nt) - epoch(pt) AS DOUBLE)) END)
            * 1e6 + 0.5) / 1e6 AS value_filled,
      CAST(v_obs IS NOT NULL AS INT) AS is_observed
    FROM w
    """,
)
def timeseries_gap_fill_hourly(spark, sf):
    """Per-user hourly spine over the events stream with linear
    interpolation of unobserved hours (ops/timeseries.py): sequence()
    spine, two ignorenulls window fills over ONE per-key sort, exact
    time-weighted interpolation. The reference's windows only bucket
    existing rows (TUMBLE/HOP) — it cannot emit rows for empty buckets.
    Observed bucket averages are rounded to 9 decimals on BOTH sides
    before interpolating (parallel summation order differs at the last
    ulp between engines), final values to 6."""
    from dozer_spark.ops.timeseries import gap_fill_interpolate

    ev = _cat(spark, sf).df("events")
    return gap_fill_interpolate(
        ev, "user_id", "ts", "value", step="hour", obs_round_to=9
    )


@_q(
    "ann_hard_negatives",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS ql
      FROM embeddings WHERE vec_id % 100 = 0
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, label AS nl
      FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id, CAST(nl AS INT) AS neighbor_label,
             {_COS} AS cos_raw
      FROM c, q WHERE nl <> ql
    )
    SELECT query_id, neighbor_id, neighbor_label,
           ROUND(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
            ORDER BY cos_raw DESC, neighbor_id) <= 5
    """,
)
def ann_hard_negatives(spark, sf):
    """Contrastive hard-negative mining: per query vector, the top-5
    most-similar corpus vectors with a DIFFERENT label (label = cluster
    proxy), exclusion applied before ranking so every query gets k true
    negatives (ops/similarity.py hard_negative_topk)."""
    from dozer_spark.ops.similarity import hard_negative_topk

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return hard_negative_topk(e, q, "embedding", "vec_id", "label", k=5)


@_q(
    "split_train_valid_test",
    """
    WITH b AS (
      SELECT doc_id,
        CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) AS bucket
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN bucket < 3435973836 THEN 'train'
           WHEN bucket < 3865470566 THEN 'valid'
           ELSE 'test' END AS split
    FROM b
    """,
)
def split_train_valid_test(spark, sf):
    """Deterministic 80/10/10 train/valid/test assignment by md5 key
    hash (ops/sampling.py hash_split): reproducible across engines and
    corpus growth — a doc never migrates between splits when new data
    arrives. Cutoffs are exact integer literals on both sides (int
    truncation of fraction * 2^32)."""
    from dozer_spark.ops.sampling import hash_split

    d = _cat(spark, sf).df("documents")
    return hash_split(
        d, "doc_id", [("train", 0.8), ("valid", 0.1), ("test", 0.1)],
        salt="split",
    ).select("doc_id", "split")


@_q(
    "cdc_streaming_fuzzy_index",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS s_a, b.c_name AS s_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def cdc_streaming_fuzzy_index(spark, sf):
    """Incremental fuzzy matching under the oracle gate: three-batch
    replay (c_custkey % 3) through StreamingFuzzyIndex whose emitted-
    pair union must equal the one-shot batch fuzzy join — the oracle IS
    the batch oracle (semantic levenshtein cross join). Deletion
    variants are deterministic in the string, so cross-epoch pairs
    collide on the same keys whenever the later member arrives."""
    from dozer_spark.streaming.fuzzy import StreamingFuzzyIndex

    c = _cat(spark, sf).df("customer")
    fz = StreamingFuzzyIndex(spark, "c_name", "c_custkey")
    outs = [
        fz.process_batch(c.filter(F.col("c_custkey") % 3 == k))
        for k in range(3)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_q("embedding_pca_project", None)  # eigh not SQL-expressible; numpy-pinned
def embedding_pca_project(spark, sf):
    """PCA preprocessing of the embedding corpus (ops/embedding.py):
    one-scan moment partials (no shuffle), driver-side 64x64 eigh —
    constant driver cost in corpus size — then an Arrow-batched matmul
    projection to 8 components. Rows-only driver check; exactness vs
    numpy's PCA on the same data is pinned in tests/test_wave9_ops.py
    (sign-canonicalized components, orthonormality, variance order)."""
    from dozer_spark.ops.embedding import pca_fit, pca_project

    e = _cat(spark, sf).df("embeddings")
    model = pca_fit(e, "embedding", dim=64, n_components=8)
    return pca_project(e, "embedding", model, out_col="pc").select(
        "vec_id", "pc"
    )
