"""CDC pipeline queries — the changelog-aware operators under the driver's
oracle gate.

Each query deterministically synthesizes a changelog from the corpus
(insert everything; update every 10th key; delete every 7th), replays it
through the incremental operator in multiple batches, and returns the
final materialized state. The oracle computes the same final state
directly in SQL — if the incremental path drops/double-counts a single
retraction, the hash mismatches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat
from dozer_spark.streaming import RetractingAggregation
from dozer_spark.streaming.join import RetractingJoin


def _stamp(df, op: str, txid: int):
    return df.select(
        F.lit(op).alias("__op"),
        F.lit(txid).cast("long").alias("__txid"),
        F.monotonically_increasing_id().alias("__seq"),
        "*",
    )


@_q(
    "cdc_retraction_aggregation",
    """
    WITH survivors AS (
      SELECT * FROM orders WHERE o_orderkey % 7 <> 0
    ), adjusted AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS p
      FROM survivors
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(floor(p * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM adjusted GROUP BY o_orderstatus
    """,
)
def cdc_retraction_aggregation(spark, sf):
    """Insert all orders; batch 2 raises every 10th order's price 10%;
    batch 3 deletes every 7th. Final incremental aggregate state must
    equal the from-scratch SQL over the surviving, adjusted rows."""
    o = _cat(spark, sf).df("orders")
    b1 = _stamp(o, "I", 1)
    b2 = _stamp(
        o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        ),
        "U",
        2,
    )
    b3 = _stamp(o.filter(F.col("o_orderkey") % 7 == 0), "D", 3)
    ragg = RetractingAggregation(
        spark,
        pk=["o_orderkey"],
        group_by=["o_orderstatus"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"),
        ],
    )
    for b in (b1, b2, b3):
        ragg.process_batch(b)
    return ragg.current().select("o_orderstatus", "n", "cents")


@_q(
    "cdc_resume_aggregation",
    """
    WITH survivors AS (
      SELECT * FROM orders WHERE o_orderkey % 7 <> 0
    ), adjusted AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS p
      FROM survivors
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(floor(p * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM adjusted GROUP BY o_orderstatus
    """,
)
def cdc_resume_aggregation(spark, sf):
    """Same pipeline as cdc_retraction_aggregation but with DURABLE state
    (StateStore parquet epochs) and a forced operator restart between
    batches 2 and 3: a brand-new instance resumes from the committed
    epoch (dozer-core/src/node.rs:61-67 checkpoint contract). The final
    state must still equal the from-scratch SQL."""
    import shutil
    import tempfile

    o = _cat(spark, sf).df("orders")
    b1 = _stamp(o, "I", 1)
    b2 = _stamp(
        o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        ),
        "U",
        2,
    )
    b3 = _stamp(o.filter(F.col("o_orderkey") % 7 == 0), "D", 3)

    state_dir = tempfile.mkdtemp(prefix="dozer_spark_resume_")

    def make():
        return RetractingAggregation(
            spark,
            pk=["o_orderkey"],
            group_by=["o_orderstatus"],
            aggs=[
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"),
            ],
            state_dir=state_dir,
        )

    first = make()
    first.process_batch(b1)
    first.process_batch(b2)
    del first  # "crash" — committed epochs survive on disk

    resumed = make()
    resumed.process_batch(b3)
    out = resumed.current().select("o_orderstatus", "n", "cents")
    rows = out.collect()  # materialize before the state dir is removed
    shutil.rmtree(state_dir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@_q(
    "cdc_incremental_join",
    """
    WITH surviving_orders AS (
      SELECT * FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment
    FROM surviving_orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 150000
    """,
)
def cdc_incremental_join(spark, sf):
    """Incremental inner join: insert customers and big orders, then
    delete every 5th order; the join's materialized output must equal the
    plain SQL join of the final snapshots."""
    cat = _cat(spark, sf)
    o = cat.df("orders").filter(F.col("o_totalprice") > 150000)
    c = cat.df("customer").select("c_custkey", "c_name", "c_mktsegment")
    j = RetractingJoin(
        spark,
        left_pk=["o_orderkey"],
        right_pk=["c_custkey"],
        on=[("o_custkey", "c_custkey")],
        how="inner",
    )
    j.process_batch(
        _stamp(o.select("o_orderkey", "o_custkey"), "I", 1),
        _stamp(c, "I", 1),
    )
    j.process_batch(
        _stamp(o.select("o_orderkey", "o_custkey").filter(F.col("o_orderkey") % 5 == 0), "D", 2),
        None,
    )
    return j.current().select("o_orderkey", "c_name", "c_mktsegment")


@_q(
    "cdc_transactional_merge",
    """
    WITH merged AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(floor(p * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM merged GROUP BY o_orderstatus
    """,
)
def cdc_transactional_merge(spark, sf):
    """End-to-end MERGE-sink pipeline: three batches (insert all orders /
    raise every 10th price via update / delete every 7th) MERGEd into a
    TransactionalTable (atomic bucket-pruned upserts, storage/txtable.py),
    then the table's CHANGE DATA FEED is replayed through apply_changelog
    and aggregated. Oracle computes the surviving rows directly — any
    miscommitted bucket or miscomputed change row breaks the hash."""
    import shutil
    import tempfile

    from dozer_spark.storage import TransactionalTable

    o = _cat(spark, sf).df("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="dozer_spark_txtable_")
    try:
        t = TransactionalTable(spark, path, pk=["o_orderkey"], n_buckets=8)
        t.merge(o)
        t.merge(
            o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") * 1.1
            )
        )
        t.merge(
            o.filter(F.col("o_orderkey") % 7 == 0).withColumn("__del", F.lit(True)),
            delete_col="__del",
        )
        from dozer_spark.streaming.changelog import apply_changelog

        snap = apply_changelog(t.changes_as_changelog(1), ["o_orderkey"])
        out = snap.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@_q(
    "cdc_snapshot_diff_roundtrip",
    """
    WITH modified AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 17 = 0
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM modified GROUP BY o_orderstatus
    """,
)
def cdc_snapshot_diff_roundtrip(spark, sf):
    """snapshot_diff -> apply_changelog round trip: diff the original
    orders snapshot against a modified one (delete every 13th, double
    every 11th price, insert new 'N' rows), replay the changelog, and
    aggregate the materialization. Oracle aggregates the modified
    snapshot directly — any miscomputed diff op breaks the match."""
    from dozer_spark.streaming import snapshot_diff, apply_changelog

    o = _cat(spark, sf).df("orders")
    modified = (
        o.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") * 2).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 17 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 1000000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    cl = snapshot_diff(o, modified, ["o_orderkey"])
    rebuilt = apply_changelog(cl.unionByName(
        # seed: original snapshot as inserts in an earlier txid
        o.selectExpr("'I' AS __op", "CAST(0 AS LONG) AS __txid",
                     "monotonically_increasing_id() AS __seq", "*")
    ), ["o_orderkey"])
    return rebuilt.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"),
    )


@_q(
    "cdc_temporal_enrich",
    """
    WITH sign AS (
      SELECT user_id, ts, MAX(value) AS price
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ), tomb AS (
      SELECT e.user_id, e.ts
      FROM (SELECT user_id, ts FROM events
            WHERE event_type = 'error' AND value < 0.3
            GROUP BY user_id, ts) e
      LEFT JOIN sign s ON e.user_id = s.user_id AND e.ts = s.ts
      WHERE s.user_id IS NULL
    ), vers AS (
      SELECT user_id, ts AS vts, price FROM sign
      UNION ALL
      SELECT user_id, ts, NULL FROM tomb
    ), f AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S.%f') AS fact_ts,
           v.price
    FROM f ASOF LEFT JOIN vers v
      ON f.user_id = v.user_id AND f.ts >= v.vts
    """,
)
def cdc_temporal_enrich(spark, sf):
    """Streaming temporal enrichment (Flink-style temporal table join)
    under the oracle gate: signup events build a per-user price version
    history across two insert batches, qualifying error events append
    tombstone versions (batch 3), then purchase facts are enriched with
    the version valid AT EACH FACT'S EVENT TIME. The oracle replays the
    whole history as one DuckDB ASOF join over the version table — if
    the incremental version log mis-orders, drops, or leaks a single
    version (or a tombstone fails to void its interval), the hash
    mismatches. The reference can only join CURRENT dimension state
    (product/join/operator/mod.rs), so this is beyond-parity."""
    from dozer_spark.streaming.enrich import TemporalEnrich

    ev = _cat(spark, sf).df("events")
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("price"))
    )
    tomb = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") < 0.3))
        .select("user_id", "ts")
        .distinct()
        .join(sign.select("user_id", "ts"), ["user_id", "ts"], "left_anti")
        .withColumn("price", F.lit(None).cast("double"))
    )
    e = TemporalEnrich(spark, ["user_id"], "ts", "vts", ["price"])
    b1 = _stamp(
        sign.filter(F.col("user_id") % 2 == 0)
        .withColumnRenamed("ts", "vts"), "I", 1,
    )
    b2 = _stamp(
        sign.filter(F.col("user_id") % 2 == 1)
        .withColumnRenamed("ts", "vts"), "I", 2,
    )
    b3 = _stamp(tomb.withColumnRenamed("ts", "vts"), "D", 3)
    e.process_batch(b1, None)
    e.process_batch(b2, None)
    e.process_batch(b3, None)
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = e.process_batch(None, facts)
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("fact_ts"),
        "price",
    )


def _smh_oracle():
    from dozer_spark.queries_ops import _minhash_oracle

    return _minhash_oracle(0.9)


@_q("cdc_streaming_minhash_dedup", _smh_oracle())
def cdc_streaming_minhash_dedup(spark, sf):
    """Incremental MinHash dedup under the oracle gate: the corpus
    arrives in three batches (doc_id % 3); each batch is deduped
    against everything before it plus itself, state advances, and the
    UNION of all emitted pairs must equal the one-shot batch
    minhash_lsh_pairs over the whole corpus — the oracle is literally
    the batch oracle. Every unordered pair is emitted exactly once
    (band keys are deterministic in the text), so a dropped, repeated,
    or re-oriented pair in any batch mismatches the hash."""
    from dozer_spark.streaming.dedup import StreamingMinHashDedup

    d = _cat(spark, sf).df("documents")
    smh = StreamingMinHashDedup(spark, "text", "doc_id", threshold=0.9)
    outs = []
    for k in range(3):
        outs.append(
            smh.process_batch(d.filter(F.col("doc_id") % 3 == k))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _mh_ttl_oracle():
    """Batch MinHash pairs restricted to the sliding event-time window:
    a pair qualifies iff BOTH members' ts are within `retain` of the
    watermark (cumulative max ts) at the LATER member's arrival batch —
    exactly the bounded-recall operator's emission rule."""
    from dozer_spark.queries_ops import _minhash_oracle

    base = _minhash_oracle(0.9)
    return f"""
    WITH base AS (
      {base}
    ), meta AS (
      SELECT doc_id, doc_id % 3 AS b,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
      FROM documents
    ), wm AS (
      SELECT b, MAX(mx) OVER (ORDER BY b) AS wm
      FROM (SELECT b, MAX(ts) AS mx FROM meta GROUP BY b)
    )
    SELECT p.id_a, p.id_b, p.jaccard
    FROM base p
    JOIN meta ma ON ma.doc_id = p.id_a
    JOIN meta mb ON mb.doc_id = p.id_b
    JOIN wm ON wm.b = greatest(ma.b, mb.b)
    WHERE least(ma.ts, mb.ts) >= wm.wm - INTERVAL 250 MINUTE
    """


@_q("cdc_streaming_minhash_dedup_ttl", _mh_ttl_oracle())
def cdc_streaming_minhash_dedup_ttl(spark, sf):
    """BOUNDED-RECALL incremental dedup: same three-batch replay as
    cdc_streaming_minhash_dedup, but the operator dedups against a
    250-minute sliding event-time window (ts derived deterministically
    from doc_id so the oracle can replay it) with per-batch physical
    eviction (prune_every=1). The oracle is the batch result minus
    pairs whose earlier member had left the window when the later one
    arrived — state is O(window), not O(corpus)."""
    from dozer_spark.streaming.dedup import StreamingMinHashDedup

    d = _cat(spark, sf).df("documents").withColumn(
        "ts",
        F.expr("TIMESTAMP '2024-01-01 00:00:00' "
               "+ make_interval(0, 0, 0, 0, 0, doc_id, 0)"),
    )
    smh = StreamingMinHashDedup(
        spark, "text", "doc_id", threshold=0.9,
        ts_col="ts", retain="250 minutes", prune_every=1,
    )
    outs = []
    for k in range(3):
        outs.append(smh.process_batch(d.filter(F.col("doc_id") % 3 == k)))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _ssh_oracle():
    from dozer_spark.queries_ops import _simhash_oracle

    return _simhash_oracle()


@_q("cdc_streaming_simhash_dedup", _ssh_oracle())
def cdc_streaming_simhash_dedup(spark, sf):
    """Incremental SimHash dedup under the oracle gate: three-batch
    replay (doc_id % 3) whose emitted-pair union must equal the
    one-shot batch simhash_pairs — the oracle is the batch oracle.
    Signatures are deterministic in the text, so cross-batch pairs
    collide in the same chunks whenever the later member arrives."""
    from dozer_spark.streaming.dedup import StreamingSimHashDedup

    d = _cat(spark, sf).df("documents")
    ssh = StreamingSimHashDedup(spark, "text", "doc_id")
    outs = []
    for k in range(3):
        outs.append(ssh.process_batch(d.filter(F.col("doc_id") % 3 == k)))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _ssh_ttl_oracle():
    """Window-restricted batch SimHash oracle — same emission rule as
    _mh_ttl_oracle."""
    from dozer_spark.queries_ops import _simhash_oracle

    base = _simhash_oracle()
    return f"""
    WITH base AS (
      {base}
    ), meta AS (
      SELECT doc_id, doc_id % 3 AS b,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
      FROM documents
    ), wm AS (
      SELECT b, MAX(mx) OVER (ORDER BY b) AS wm
      FROM (SELECT b, MAX(ts) AS mx FROM meta GROUP BY b)
    )
    SELECT p.id_a, p.id_b, p.hamming
    FROM base p
    JOIN meta ma ON ma.doc_id = p.id_a
    JOIN meta mb ON mb.doc_id = p.id_b
    JOIN wm ON wm.b = greatest(ma.b, mb.b)
    WHERE least(ma.ts, mb.ts) >= wm.wm - INTERVAL 250 MINUTE
    """


@_q("cdc_streaming_simhash_dedup_ttl", _ssh_ttl_oracle())
def cdc_streaming_simhash_dedup_ttl(spark, sf):
    """Bounded-recall SimHash replay: the cdc_streaming_minhash_dedup_ttl
    contract applied to the SimHash family (shared window/eviction
    machinery in streaming/dedup.py)."""
    from dozer_spark.streaming.dedup import StreamingSimHashDedup

    d = _cat(spark, sf).df("documents").withColumn(
        "ts",
        F.expr("TIMESTAMP '2024-01-01 00:00:00' "
               "+ make_interval(0, 0, 0, 0, 0, doc_id, 0)"),
    )
    ssh = StreamingSimHashDedup(
        spark, "text", "doc_id",
        ts_col="ts", retain="250 minutes", prune_every=1,
    )
    outs = []
    for k in range(3):
        outs.append(ssh.process_batch(d.filter(F.col("doc_id") % 3 == k)))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _ann_oracle():
    from dozer_spark.queries_ops import _lsh_ann_oracle

    return _lsh_ann_oracle()


@_q("cdc_streaming_ann_index", _ann_oracle())
def cdc_streaming_ann_index(spark, sf):
    """Incrementally built ANN index under the oracle gate: the
    embedding corpus arrives in three batches (vec_id % 3), the index
    state advances per batch, and the SAME query set as the one-shot
    ann_lsh_topk entry probes the final index — bucket assignment is
    deterministic in the vector, so the results (and the oracle) are
    IDENTICAL to the batch build."""
    from dozer_spark.ops.similarity import StreamingAnnIndex

    e = _cat(spark, sf).df("embeddings")
    idx = StreamingAnnIndex(spark, "embedding", "vec_id",
                            n_planes=8, dim=64)
    for k in range(3):
        idx.add_batch(e.filter(F.col("vec_id") % 3 == k))
    q = e.filter(F.col("vec_id") % 100 == 0)
    return idx.topk(q, k=5)


@_q("cdc_streaming_ann_index_fast", _ann_oracle(),
    defer=True)  # streaming-ANN family anchored by cdc_streaming_ann_index
def cdc_streaming_ann_index_fast(spark, sf):
    """The BLAS serving probe over the same incrementally built index
    as cdc_streaming_ann_index — carries the sibling's exact oracle
    (r12): the BLAS cosine matches the fold after the shared 6-decimal
    rounding, whole-row-identical at sf0.001/sf0.01; equivalence vs
    the fold probe is also pinned by
    test_streaming_ann_topk_fast_matches_fold_probe."""
    from dozer_spark.ops.similarity import StreamingAnnIndex

    e = _cat(spark, sf).df("embeddings")
    idx = StreamingAnnIndex(spark, "embedding", "vec_id",
                            n_planes=8, dim=64)
    for k in range(3):
        idx.add_batch(e.filter(F.col("vec_id") % 3 == k))
    q = e.filter(F.col("vec_id") % 100 == 0)
    return idx.topk_fast(q, k=5)


@_q("cdc_ivf_index_topk", None)  # frozen-quantizer IVF serving -> rows-only
def cdc_ivf_index_topk(spark, sf):
    """IvfAnnIndex under the driver gate: quantizer fit on the FIRST of
    three ingest batches then frozen (the FAISS train-once/add-forever
    serving contract), later batches assigned to the existing cells,
    probe via the shared BLAS bound. Rows-only (BLAS + first-batch-fit
    approximation); one-shot equivalence and resume/geometry guards are
    pytest-pinned (test_ann_clusters)."""
    from dozer_spark.ops.similarity import IvfAnnIndex

    e = _cat(spark, sf).df("embeddings")
    idx = IvfAnnIndex(spark, "embedding", "vec_id", n_centroids=16)
    for k in range(3):
        idx.add_batch(e.filter(F.col("vec_id") % 3 == k))
    q = e.filter(F.col("vec_id") % 100 == 0)
    return idx.topk(q, k=5, n_probe=4)


def _cc_oracle():
    from dozer_spark.queries_ops import _clusters_oracle

    return _clusters_oracle()


@_q("cdc_streaming_dedup_clusters", _cc_oracle())
def cdc_streaming_dedup_clusters(spark, sf):
    """TWO streaming operators composed under one exact oracle: the
    corpus arrives in three batches, StreamingMinHashDedup emits each
    batch's newly-discoverable near-dup pairs, and StreamingClusters
    folds them into incrementally-maintained connected components
    (only affected components recompute, prior connectivity contracted
    to star edges). The final label table must equal the one-shot
    batch pipeline — minhash_lsh_pairs -> dedup_clusters — whose
    recursive-CTE oracle this query reuses."""
    from dozer_spark.streaming.dedup import (
        StreamingClusters,
        StreamingMinHashDedup,
    )

    d = _cat(spark, sf).df("documents")
    smh = StreamingMinHashDedup(spark, "text", "doc_id", threshold=0.9)
    cc = StreamingClusters(spark)
    for k in range(3):
        pairs = smh.process_batch(d.filter(F.col("doc_id") % 3 == k))
        cc.process_batch(pairs)
    return cc.current().select("id", "cluster_id")


@_q(
    "cdc_streaming_bm25",
    """
    WITH q(query_id, qtext) AS (VALUES
      ('q1', 'fast join query'), ('q2', 'table scan filter'),
      ('q3', 'window agg group')),
    tf AS (
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
    ), scored AS (
      SELECT qt.query_id, tf.doc_id,
             ROUND(SUM(idf.idf * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6)
               AS score
      FROM qt
      JOIN tf ON tf.term = qt.term
      JOIN idf ON idf.term = qt.term
      JOIN dl ON dl.doc_id = tf.doc_id, stats
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
)
def cdc_streaming_bm25(spark, sf):
    """Incrementally built BM25 index under the oracle gate: the
    document corpus arrives in three batches (doc_id % 3), the tf/docs
    state advances per batch, and the same query set as the one-shot
    bm25_search_topn entry scores the final index. The maintained
    state is exactly the tf table the batch operator derives and the
    scoring arithmetic is the shared _bm25_from_tf tail, so the
    results — and the oracle — are IDENTICAL to the batch build."""
    from dozer_spark.ops.search import StreamingBm25Index

    d = _cat(spark, sf).df("documents")
    idx = StreamingBm25Index(spark, "text", "doc_id")
    for k in range(3):
        idx.add_batch(d.filter(F.col("doc_id") % 3 == k))
    q = spark.createDataFrame(
        [("q1", "fast join query"), ("q2", "table scan filter"),
         ("q3", "window agg group")], ["query_id", "qtext"])
    return idx.topn(q, "qtext", "query_id", k1=1.2, b=0.75, topn=10)
