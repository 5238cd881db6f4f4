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


_HARD_NEG_ORACLE = f"""
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
    """


@_q("ann_hard_negatives", _HARD_NEG_ORACLE)
def ann_hard_negatives(spark, sf):
    """Contrastive hard-negative mining: per query vector, the top-5
    most-similar corpus vectors with a DIFFERENT label (label = cluster
    proxy), exclusion applied before ranking so every query gets k true
    negatives (ops/similarity.py hard_negative_topk)."""
    from dozer_spark.ops.similarity import hard_negative_topk

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return hard_negative_topk(e, q, "embedding", "vec_id", "label", k=5)


@_q("ann_hard_negatives_fast", _HARD_NEG_ORACLE,
    defer=True)  # hard-neg family anchored by ann_hard_negatives
def ann_hard_negatives_fast(spark, sf):
    """Label-grouped BLAS fast path for hard-negative mining — exact
    same results as ann_hard_negatives (pinned by the equivalence test
    in tests/test_wave9_ops.py), through the shared bounded-cogroup
    machinery. Carries the sibling's exact oracle: the BLAS cosine
    matches the fold after the shared 6-decimal rounding
    (bit-identical at sf0.001/sf0.01)."""
    from dozer_spark.ops.similarity import hard_negative_topk_fast

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return hard_negative_topk_fast(e, q, "embedding", "vec_id", "label", k=5)


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


@_q(
    "entity_resolution_clusters",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
    """,
)
def entity_resolution_clusters(spark, sf):
    """End-to-end entity resolution: fuzzy candidate pairs (FastSS
    deletion-neighborhood join) -> connected components -> canonical
    entity id (min member id). Composes ops/fuzzy.py with the shared
    dedup_clusters machinery (size-gated driver union-find / iterative
    min-label propagation); the oracle recomputes the same components
    with a recursive transitive-closure CTE over the semantic
    levenshtein pairs."""
    from dozer_spark.ops.dedup import dedup_clusters
    from dozer_spark.ops.fuzzy import fuzzy_self_join_dist1

    c = _cat(spark, sf).df("customer")
    pairs = fuzzy_self_join_dist1(c, "c_custkey", "c_name")
    return dedup_clusters(pairs)


@_q(
    "timeseries_zscore_anomalies",
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
        last_value(v_obs IGNORE NULLS) OVER wprev AS pv,
        last_value(CASE WHEN v_obs IS NOT NULL THEN bucket END IGNORE NULLS)
          OVER wprev AS pt,
        first_value(v_obs IGNORE NULLS) OVER wnext AS nv,
        first_value(CASE WHEN v_obs IS NOT NULL THEN bucket END IGNORE NULLS)
          OVER wnext AS nt
      FROM j
      WINDOW wprev AS (PARTITION BY key ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wnext AS (PARTITION BY key ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ), filled AS (
      SELECT key, bucket,
        FLOOR((CASE WHEN v_obs IS NOT NULL THEN v_obs
                    WHEN pv IS NULL THEN nv
                    WHEN nv IS NULL THEN pv
                    ELSE pv + (nv - pv)
                         * (CAST(epoch(bucket) - epoch(pt) AS DOUBLE)
                            / CAST(epoch(nt) - epoch(pt) AS DOUBLE)) END)
              * 1e6 + 0.5) / 1e6 AS v
      FROM w
    ), roll AS (
      SELECT key, bucket, v,
        AVG(v) OVER wr AS mu, STDDEV_SAMP(v) OVER wr AS sd,
        COUNT(*) OVER wr AS n
      FROM filled
      WINDOW wr AS (PARTITION BY key ORDER BY bucket
              ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT key AS user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
      v AS value_filled,
      ROUND(CASE WHEN n >= 12 AND sd > 0 THEN (v - mu) / sd END, 4) AS zscore,
      CAST((n >= 12 AND sd > 0 AND abs((v - mu) / sd) > 3.0) AS INT)
        AS is_anomaly
    FROM roll
    """,
)
def timeseries_zscore_anomalies(spark, sf):
    """Rolling z-score anomaly detection over the gap-filled hourly
    series: 24-bucket trailing mean/stddev per user (one window sort,
    same partitioning the gap-fill already produced), z emitted once
    the warm-up window holds >= 12 buckets. Composes
    ops/timeseries.gap_fill_interpolate with plain window aggregates —
    the standard streaming-metrics monitor shape."""
    from pyspark.sql import Window

    from dozer_spark.ops.timeseries import gap_fill_interpolate

    ev = _cat(spark, sf).df("events")
    filled = gap_fill_interpolate(
        ev, "user_id", "ts", "value", step="hour", obs_round_to=9
    ).select(
        "user_id", "bucket", F.col("value_filled").alias("v")
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(-23, Window.currentRow)
    )
    roll = filled.select(
        "user_id", "bucket", "v",
        F.avg("v").over(wr).alias("mu"),
        F.stddev_samp("v").over(wr).alias("sd"),
        F.count(F.lit(1)).over(wr).alias("n"),
    )
    ok = (F.col("n") >= 12) & (F.col("sd") > 0)
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    return roll.select(
        "user_id",
        F.col("bucket"),
        F.col("v").alias("value_filled"),
        F.round(F.when(ok, z), 4).alias("zscore"),
        (ok & (F.abs(z) > 3.0)).cast("int").alias("is_anomaly"),
    )


@_q(
    "data_quality_report_orders",
    """
    WITH m AS (
      SELECT
        ROUND(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
          AS v0,
        ROUND(CAST(COUNT(DISTINCT o_orderkey)
                   + MAX(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                   AS DOUBLE) / COUNT(*), 6) AS v1,
        ROUND(AVG(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice >= 0
                        AND o_totalprice <= 200000
                  THEN 1.0 ELSE 0.0 END), 6) AS v2,
        ROUND(AVG(CASE WHEN o_orderpriority IS NOT NULL
                        AND regexp_matches(o_orderpriority, '^[1-5]-')
                  THEN 1.0 ELSE 0.0 END), 6) AS v3,
        ROUND(AVG(CASE WHEN o_orderpriority IN
                       ('1-URGENT', '2-HIGH', '3-MEDIUM')
                  THEN 1.0 ELSE 0.0 END), 6) AS v4
      FROM orders
    )
    SELECT 'completeness(o_custkey)' AS "constraint",
           'non_null_share' AS metric, v0 AS value,
           CAST(v0 >= 1.0 AS INT) AS passed FROM m
    UNION ALL SELECT 'uniqueness(o_orderkey)', 'distinct_share', v1,
           CAST(v1 >= 1.0 AS INT) FROM m
    UNION ALL SELECT 'in_range(o_totalprice,0,200000)', 'in_range_share', v2,
           CAST(v2 >= 0.5 AS INT) FROM m
    UNION ALL SELECT 'matches(o_orderpriority)', 'regex_share', v3,
           CAST(v3 >= 1.0 AS INT) FROM m
    UNION ALL SELECT 'accepted_values(o_orderpriority)', 'accepted_share', v4,
           CAST(v4 >= 0.9 AS INT) FROM m
    """,
)
def data_quality_report_orders(spark, sf):
    """Deequ-style declarative data-quality gate: five constraints
    (completeness, key uniqueness, range share, regex compliance,
    accepted-value share) evaluated in ONE aggregation pass over orders
    (ops/quality.py). Thresholds chosen so the report shows real
    passes AND failures on TPC-H data. The reference validates schema
    types only, never values."""
    from dozer_spark.ops.quality import (
        accepted_values,
        completeness,
        data_quality_report,
        in_range,
        matches,
        uniqueness,
    )

    o = _cat(spark, sf).df("orders")
    return data_quality_report(o, [
        completeness("o_custkey"),
        uniqueness("o_orderkey"),
        in_range("o_totalprice", 0, 200000, min_value=0.5),
        matches("o_orderpriority", "^[1-5]-"),
        accepted_values(
            "o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"],
            min_value=0.9,
        ),
    ])


@_q(
    "fk_orphan_audit_orders_customer",
    """
    SELECT 'o_custkey->c_custkey' AS relationship,
           CAST(COUNT(*) AS BIGINT) AS n_child,
           CAST(COUNT(CASE WHEN o.o_custkey IS NOT NULL
                            AND c.c_custkey IS NULL THEN 1 END) AS BIGINT)
             AS n_orphans,
           ROUND(CAST(COUNT(CASE WHEN o.o_custkey IS NOT NULL
                                  AND c.c_custkey IS NULL THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS orphan_share
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def fk_orphan_audit_orders_customer(spark, sf):
    """Referential-integrity audit: child rows pointing at a missing
    parent key (ops/quality.py fk_orphan_audit — one key-projected left
    join + one aggregate; NULL child keys are completeness's business,
    not orphans)."""
    from dozer_spark.ops.quality import fk_orphan_audit

    cat = _cat(spark, sf)
    return fk_orphan_audit(
        cat.df("orders"), "o_custkey", cat.df("customer"), "c_custkey"
    )


@_q(
    "text_ccnet_buckets",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ), census AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), totals AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n FROM census
    ), per_doc AS (
      SELECT t.doc_id, AVG(ln(ce.c)) AS avg_ln_c
      FROM toks t JOIN census ce USING (tok)
      GROUP BY t.doc_id
    ), scored AS (
      SELECT doc_id,
             ROUND(exp(-(ROUND(avg_ln_c - ln(totals.n), 6))), 3) AS perplexity
      FROM per_doc, totals
    ), ranked AS (
      SELECT s.doc_id, d.lang, s.perplexity,
             CAST(ntile(3) OVER (PARTITION BY d.lang
                  ORDER BY s.perplexity, s.doc_id) AS INT) AS bucket
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, perplexity, bucket,
           CASE WHEN bucket = 1 THEN 'head'
                WHEN bucket = 3 THEN 'tail'
                ELSE 'middle' END AS tier
    FROM ranked
    """,
)
def text_ccnet_buckets(spark, sf):
    """CCNet head/middle/tail stratification (Wenzek et al. 2020):
    per-LANGUAGE perplexity tertiles over the in-corpus unigram LM
    (ops/text.py ccnet_perplexity_buckets) — per-language because
    absolute perplexity is not comparable across languages. ntile
    shares its equal-count bucket definition between engines;
    (perplexity, doc_id) ordering makes ties deterministic."""
    from dozer_spark.ops.text import ccnet_perplexity_buckets

    d = _cat(spark, sf).df("documents")
    return ccnet_perplexity_buckets(d, "text", "doc_id", "lang")


@_q(
    "cross_source_dup_matrix",
    """
    WITH srcs AS (
      SELECT DISTINCT md5(text) AS dg, source FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_texts
    FROM srcs a JOIN srcs b ON a.dg = b.dg AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def cross_source_dup_matrix(spark, sf):
    """Cross-source exact-duplicate matrix (ops/text.py): which crawls/
    feeds overlap, counted on distinct text digests — the dataset-card
    fact consulted before paying for cross-corpus near-dup."""
    from dozer_spark.ops.text import cross_source_dup_matrix as op

    d = _cat(spark, sf).df("documents")
    return op(d, "text", "source")


@_q(
    "cdc_streaming_fuzzy_ttl",
    """
    WITH base AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.c_name AS s_a, b.c_name AS s_b,
             CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), meta AS (
      SELECT c_custkey AS id, c_custkey % 3 AS b,
             TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (c_custkey) MINUTE AS ts
      FROM customer
    ), wm AS (
      SELECT b, MAX(mx) OVER (ORDER BY b) AS wm
      FROM (SELECT b, MAX(ts) AS mx FROM meta GROUP BY b)
    )
    SELECT p.id_a, p.id_b, p.s_a, p.s_b, p.dist
    FROM base p
    JOIN meta ma ON ma.id = p.id_a
    JOIN meta mb ON mb.id = p.id_b
    JOIN wm ON wm.b = greatest(ma.b, mb.b)
    WHERE least(ma.ts, mb.ts) >= wm.wm - INTERVAL 250 MINUTE
    """,
)
def cdc_streaming_fuzzy_ttl(spark, sf):
    """BOUNDED-RECALL fuzzy matching: same three-batch replay as
    cdc_streaming_fuzzy_index but against a 250-minute sliding
    event-time window (ts derived deterministically from the key so
    the oracle replays it) with per-batch physical eviction
    (prune_every=1) — state is O(window), the direct answer to the
    measured O(state) probe cost of full-history matching (SCALING.md).
    The oracle is the batch fuzzy join minus pairs whose earlier
    member had left the window when the later one arrived."""
    from dozer_spark.streaming.fuzzy import StreamingFuzzyIndex

    c = _cat(spark, sf).df("customer").withColumn(
        "ts",
        F.expr("TIMESTAMP '2024-01-01 00:00:00' "
               "+ make_interval(0, 0, 0, 0, 0, c_custkey, 0)"),
    )
    fz = StreamingFuzzyIndex(
        spark, "c_name", "c_custkey",
        ts_col="ts", retain="250 minutes", prune_every=1,
    )
    outs = [
        fz.process_batch(c.filter(F.col("c_custkey") % 3 == k))
        for k in range(3)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_q(
    "cdc_streaming_entity_resolution",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
    """,
)
def cdc_streaming_entity_resolution(spark, sf):
    """TWO streaming operators composed under one exact oracle: names
    arrive in three batches, StreamingFuzzyIndex emits each batch's
    newly-discoverable edit-distance pairs, StreamingClusters folds
    them into incrementally-maintained entity components. The final
    label table must equal the one-shot batch pipeline
    (fuzzy_self_join_dist1 -> dedup_clusters), replayed by the
    recursive-CTE oracle — the streaming face of
    entity_resolution_clusters."""
    from dozer_spark.streaming.dedup import StreamingClusters
    from dozer_spark.streaming.fuzzy import StreamingFuzzyIndex

    c = _cat(spark, sf).df("customer")
    fz = StreamingFuzzyIndex(spark, "c_name", "c_custkey")
    cc = StreamingClusters(spark)
    for k in range(3):
        pairs = fz.process_batch(c.filter(F.col("c_custkey") % 3 == k))
        cc.process_batch(pairs.select("id_a", "id_b"))
    return cc.current().select("id", "cluster_id")


@_q(
    "histogram_order_totalprice",
    """
    WITH b AS (
      SELECT LEAST(GREATEST(
               CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS INT), 0), 19)
             AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           ROUND(CAST(bucket AS DOUBLE) * 25000.0, 6) AS lo_edge,
           ROUND(CAST(bucket + 1 AS DOUBLE) * 25000.0, 6) AS hi_edge,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
)
def histogram_order_totalprice(spark, sf):
    """Equi-width value histogram (ops/quality.py value_histogram):
    20 buckets over [0, 500000), out-of-range values clamped into the
    edge buckets so counts sum to the non-null row count. One map-side
    combinable aggregation; the profiling companion to the constraint
    report."""
    from dozer_spark.ops.quality import value_histogram

    o = _cat(spark, sf).df("orders")
    return value_histogram(o, "o_totalprice", 0.0, 500000.0, n_buckets=20)


@_q(
    "hybrid_search_rrf",
    f"""
    WITH q AS (
      SELECT doc_id AS query_id, text AS qtext FROM documents
      WHERE doc_id % 100 = 0
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents
      ) GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, CAST(SUM(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT AVG(dl) AS avgdl FROM dl
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
    ), dfr AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term, ln(1.0 + (n.n - dfr.df + 0.5) / (dfr.df + 0.5)) AS idf
      FROM dfr, n
    ), qt AS (
      SELECT query_id,
             unnest(list_distinct(
               list_filter(string_split(qtext, ' '), x -> x <> ''))) AS term
      FROM q
    ), lscored AS (
      SELECT qt.query_id, tf.doc_id,
             ROUND(SUM(idf.idf * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6)
               AS score
      FROM qt
      JOIN tf ON tf.term = qt.term
      JOIN idf ON idf.term = qt.term
      JOIN dl ON dl.doc_id = tf.doc_id, stats
      GROUP BY qt.query_id, tf.doc_id
    ), lex AS (
      SELECT query_id, doc_id AS item_id, rn AS rank
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
            FROM lscored)
      WHERE rn <= 10
    ), vq AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 100 = 0
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
    ), vscored AS (
      SELECT query_id, neighbor_id, {_COS} AS cos_raw
      FROM c, vq WHERE neighbor_id <> query_id
    ), vec AS (
      SELECT query_id, neighbor_id AS item_id, rn AS rank
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rn
            FROM vscored)
      WHERE rn <= 5
    ), fused AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.item_id, v.item_id) AS item_id,
             ROUND(COALESCE(1.0 / (60 + l.rank), 0.0)
                   + COALESCE(1.0 / (60 + v.rank), 0.0), 6) AS rrf_score
      FROM lex l FULL JOIN vec v
        ON l.query_id = v.query_id AND l.item_id = v.item_id
    )
    SELECT query_id, item_id, rrf_score, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, item_id) AS rn
          FROM fused)
    WHERE rn <= 10
    """,
    window=True,
)
def hybrid_search_rrf(spark, sf):
    """Hybrid more-like-this retrieval: for each query document
    (doc_id % 100 == 0), BM25 top-10 by its own text PLUS exact cosine
    top-5 by its embedding (vec_id aligns with doc_id in the corpus),
    combined with reciprocal-rank fusion (ops/search.py rrf_fuse,
    Cormack et al. 2009, k=60) — the standard lexical+vector hybrid.
    The query doc itself stays in its lexical list (it is its own best
    lexical match; with rank-based fusion it does not dominate). The
    oracle replays BM25, cosine, and the fusion join end-to-end."""
    from dozer_spark.ops.search import bm25_topn, rrf_fuse
    from dozer_spark.ops.similarity import brute_force_topk

    cat = _cat(spark, sf)
    d, e = cat.df("documents"), cat.df("embeddings")
    qd = d.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
    lex = bm25_topn(d, "text", "doc_id", qd, "qtext", "qid", topn=10)
    qv = e.filter(F.col("vec_id") % 100 == 0)
    vec = brute_force_topk(e, qv, "embedding", "vec_id", k=5).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(lex, vec, "query_id", "doc_id", k=60, topn=10)


@_q(
    "pack_chunk_manifest",
    """
    WITH t AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
          AS n_tokens,
        md5('shard:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), b AS (
      SELECT *, CAST(CAST('0x' || substr(h, 1, 4) AS BIGINT) % 16 AS INT)
        AS bucket
      FROM t
    ), s AS (
      SELECT doc_id, n_tokens,
        CAST(SUM(n_tokens) OVER (ORDER BY bucket, h, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
             AS BIGINT) AS start
      FROM b
    ), e AS (
      SELECT doc_id, n_tokens, start,
             unnest(generate_series(start // 512,
                                    (start + n_tokens - 1) // 512)) AS chunk_id
      FROM s WHERE n_tokens > 0
    )
    SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
      CAST(greatest(start, chunk_id * 512) - start AS BIGINT) AS doc_from,
      CAST(least(start + n_tokens, (chunk_id + 1) * 512) - start AS BIGINT)
        AS doc_to,
      CAST(greatest(start, chunk_id * 512) - chunk_id * 512 AS BIGINT)
        AS chunk_pos
    FROM e
    """,
    window=True,
)
def pack_chunk_manifest(spark, sf):
    """Concat-and-chunk assembly manifest (ops/packing.py): the
    deterministic shuffled token stream cut into 512-token training
    sequences, each (chunk, doc) intersection mapped to its token span
    and chunk position — the GPT-style packing plan downstream of
    pack_token_shards, sharing its two-level prefix sum. The oracle
    replays the single-global-window formulation plus the identical
    integer span arithmetic."""
    from dozer_spark.ops.packing import chunk_assembly_manifest

    d = _cat(spark, sf).df("documents")
    return chunk_assembly_manifest(d, "doc_id", "text", seq_len=512)


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
