"""Wave 8: event-analytics shapes (funnel, cohort retention, exact
quantiles) — the product-analytics queries an event-pipeline user runs
on the engine. All single-key-shuffle window/groupBy plans with exact
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat


@_q(
    "funnel_signup_click_purchase",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
        MIN(CASE WHEN event_type = 'signup' THEN ts END)
          OVER (PARTITION BY user_id) AS t1
      FROM events
    ), w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
          OVER (PARTITION BY user_id) AS t2
      FROM w1
    ), w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
          OVER (PARTITION BY user_id) AS t3
      FROM w2
    )
    SELECT user_id,
      strftime(MIN(t1), '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
      strftime(MIN(t2), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      strftime(MIN(t3), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      CAST(CASE WHEN MIN(t3) IS NOT NULL THEN 3
                WHEN MIN(t2) IS NOT NULL THEN 2
                WHEN MIN(t1) IS NOT NULL THEN 1 ELSE 0 END AS INT) AS depth
    FROM w3 GROUP BY user_id
    """,
    headline=True,
    window=True,
)
def funnel_signup_click_purchase(spark, sf):
    """Ordered funnel per user: first signup, first click AT-OR-AFTER
    it, first purchase at-or-after that. Three full-frame window mins
    over the SAME user partitioning — one shuffle total, no self-joins
    (each stage's threshold is a window column the next stage
    references). At corpus scale this is a single per-user sort, the
    same shape as any sessionization."""
    ev = _cat(spark, sf).df("events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    d1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
               F.col("ts"))
    ).over(w)
    d2 = d1.withColumn("t2", t2)
    t3 = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")),
               F.col("ts"))
    ).over(w)
    d3 = d2.withColumn("t3", t3)
    depth = (
        F.when(F.min("t3").isNotNull(), 3)
        .when(F.min("t2").isNotNull(), 2)
        .when(F.min("t1").isNotNull(), 1)
        .otherwise(0)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return d3.groupBy("user_id").agg(
        F.date_format(F.min("t1"), fmt).alias("signup_ts"),
        F.date_format(F.min("t2"), fmt).alias("click_ts"),
        F.date_format(F.min("t3"), fmt).alias("purchase_ts"),
        depth.cast("int").alias("depth"),
    )


@_q(
    "cohort_weekly_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) // 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
    window=True,
)
def cohort_weekly_retention(spark, sf):
    """Cohort retention: users grouped by the week of their first event,
    counted in each later week they were active. Two groupBys + one
    user-keyed join (first-week table is user-cardinality — size-gate
    broadcastable); both engines truncate weeks to Monday so the
    cohort grid matches exactly."""
    from dozer_spark.operators.hints import maybe_broadcast

    ev = _cat(spark, sf).df("events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        active.join(maybe_broadcast(firsts), "user_id")
        .groupBy("cohort_week", (F.datediff("week", "cohort_week") / 7)
                 .cast("int").alias("week_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset", "n_users",
        )
    )


@_q(
    "quantile_order_values",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def quantile_order_values(spark, sf):
    """Exact interpolated quantiles per group (the reference has no
    percentile support at all). Spark's percentile() and DuckDB's
    quantile_cont share the linear-interpolation definition; rounding
    to 4 decimals absorbs the one-ulp difference in interpolation
    arithmetic order. Exact percentile shuffles the group's values
    once — at corpus scale swap in approx_percentile (t-digest) and
    drop the oracle to a tolerance check."""
    o = _cat(spark, sf).df("orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@_q(
    "pivot_priority_by_year",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
      CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p1_urgent,
      CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p2_high,
      CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3_medium,
      CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4_notspec,
      CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p5_low
    FROM orders GROUP BY 1
    """,
)
def pivot_priority_by_year(spark, sf):
    """PIVOT — rejected by the reference (builder/table_operator.rs:
    46-49 rejects table functions/PIVOT); native in Spark. Explicit
    pivot values keep the output schema static (no extra distinct scan
    to discover columns — the scan-twice trap of dynamic pivot), and
    the oracle expresses the same thing as conditional aggregation."""
    o = _cat(spark, sf).df("orders")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    alias = {
        "1-URGENT": "p1_urgent", "2-HIGH": "p2_high", "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_notspec", "5-LOW": "p5_low",
    }
    out = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderpriority", pri)
        .agg(F.count(F.lit(1)).cast("long"))
    )
    # an empty (year, priority) cell pivots to NULL; COUNT semantics
    # (and the oracle's FILTER form) say 0
    return out.select(
        "order_year",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0).cast("long")).alias(alias[p])
          for p in pri],
    )


@_q(
    "unpivot_customer_measures",
    """
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric,
           CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
)
def unpivot_customer_measures(spark, sf):
    """UNPIVOT (wide -> long) — no reference equivalent; Spark-native
    melt. One scan, no shuffle (the long format is produced by an
    in-row expand, not a union of scans like the SQL oracle spells)."""
    c = _cat(spark, sf).df("customer").select(
        "c_custkey", F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


@_q(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark, sf):
    """CUBE with GROUPING() disambiguation — the reference has no
    grouping sets of any kind (SURVEY §2.4); ROLLUP is already covered,
    this completes the family. grouping_id distinguishes an aggregate
    NULL from a data NULL; Spark and DuckDB share the bitset
    convention."""
    o = _cat(spark, sf).df("orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n")


@_q(
    "agg_salted_skew_equivalence",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(l_linenumber) AS BIGINT) AS max_line
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_skew_equivalence(spark, sf):
    """Salted two-phase aggregation under the oracle gate: lineitem's
    l_returnflag has only 3 values — exactly the hot-group shape that
    sends one reducer the whole table. The salted plan computes
    partials per (group, salt) and combines per group; the oracle is
    the PLAIN one-phase SQL, so the hash check proves the salt
    decomposition is invisible in the result (sum->sum, count->sum,
    max->max combine laws)."""
    from dozer_spark.operators.skew import salted_aggregate

    li = _cat(spark, sf).df("lineitem")
    return salted_aggregate(
        li.select("l_returnflag", "l_quantity", "l_linenumber"),
        ["l_returnflag"],
        partial_aggs=[
            F.sum(F.col("l_quantity").cast("long")).alias("ps"),
            F.count(F.lit(1)).alias("pc"),
            F.max("l_linenumber").alias("pm"),
        ],
        final_aggs=[
            F.sum("ps").cast("long").alias("sum_qty"),
            F.sum("pc").cast("long").alias("n"),
            F.max("pm").cast("long").alias("max_line"),
        ],
        salt=16,
    )


@_q(
    "text_window_duplication_score",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), w AS (
      SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(toks) - 19, 0)),
          i -> md5(array_to_string(list_slice(toks, i, i + 19), ' ')))) AS ws
      FROM t
    ), e AS (
      SELECT doc_id, unnest(ws) AS w FROM w
    ), dup AS (
      SELECT w FROM e GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id,
      CAST(len(w.ws) AS BIGINT) AS n_windows,
      CAST(coalesce(d.n, 0) AS BIGINT) AS n_duplicated,
      CAST(coalesce(d.n, 0) AS DOUBLE)
        / greatest(len(w.ws), 1) AS dup_score
    FROM w LEFT JOIN (
      SELECT e.doc_id, COUNT(*) AS n
      FROM e JOIN dup USING (w) GROUP BY e.doc_id
    ) d USING (doc_id)
    """,
)
def text_window_duplication_score(spark, sf):
    """Per-document substring duplication score: fraction of 20-token
    rolling windows shared with any other document (the fixed-window
    approximation of suffix-array substring dedup; a standard corpus-
    quality report metric). Same scale shape as the n-gram census:
    per-doc distinct windows, 32B digests on the wire, map-side
    combine, gated-broadcast duplicated set."""
    from dozer_spark.ops.text import window_duplication_score

    d = _cat(spark, sf).df("documents")
    return window_duplication_score(d, "text", "doc_id", window=20)


@_q(
    "corpus_dataset_card",
    """
    WITH base AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok,
             md5(text) AS dg
      FROM documents
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) FILTER (WHERE ntok > 0) AS BIGINT) AS n_nonempty,
             CAST(SUM(ntok) AS BIGINT) AS total_tokens,
             ROUND(AVG(ntok), 3) AS avg_tokens,
             ROUND(quantile_cont(ntok, 0.5), 4) AS p50_tokens,
             ROUND(quantile_cont(ntok, 0.95), 4) AS p95_tokens,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             ROUND(1.0 - CAST(COUNT(DISTINCT dg) AS DOUBLE) / COUNT(*), 6)
               AS dup_text_ratio
      FROM base
    ), langs AS (
      SELECT lang, COUNT(*) AS c FROM base GROUP BY lang
    ), top AS (
      SELECT lang AS top_lang, c FROM langs ORDER BY c DESC, lang LIMIT 1
    )
    SELECT tot.*, top.top_lang,
           ROUND(CAST(top.c AS DOUBLE) / tot.n_docs, 6) AS top_lang_share
    FROM tot, top
    """,
)
def corpus_dataset_card(spark, sf):
    """One-row dataset-card report over the corpus — the summary block
    of a dataset card / corpus datasheet: doc counts, token totals,
    exact interpolated token-length percentiles (percentile ==
    quantile_cont, the same contract quantile_order_values pins),
    language diversity with a deterministic argmax top language, and
    the exact-duplicate text ratio. One aggregation pass plus a
    language histogram (domain-bounded, broadcast back); at corpus
    scale swap percentile for approx_percentile and the oracle drops
    to a tolerance check."""
    from dozer_spark.ops.text import token_count

    d = _cat(spark, sf).df("documents")
    base = d.select(
        F.col("lang"),
        token_count(F.col("text")).alias("ntok"),
        F.md5("text").alias("dg"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("ntok") > 0, 1)).cast("long").alias("n_nonempty"),
        F.sum("ntok").cast("long").alias("total_tokens"),
        F.round(F.avg("ntok"), 3).alias("avg_tokens"),
        F.round(F.percentile("ntok", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("ntok", F.lit(0.95)), 4).alias("p95_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.round(
            F.lit(1.0)
            - F.count_distinct("dg").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_text_ratio"),
    )
    top = (
        base.groupBy("lang").agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("lang")).limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("__c"))
    )
    return tot.crossJoin(F.broadcast(top)).select(
        "n_docs", "n_nonempty", "total_tokens", "avg_tokens",
        "p50_tokens", "p95_tokens", "n_langs", "dup_text_ratio",
        "top_lang",
        F.round(F.col("__c").cast("double") / F.col("n_docs"), 6)
        .alias("top_lang_share"),
    )


@_q(
    "text_winnow_fingerprints",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), h AS (
      SELECT doc_id,
        CASE WHEN len(toks) >= 5 THEN
          list_transform(generate_series(1, len(toks) - 4),
            i -> CAST('0x' || substr(md5(
                   array_to_string(list_slice(toks, i, i + 4), ' ')), 1, 8)
                 AS BIGINT))
        ELSE CAST([] AS BIGINT[]) END AS hs
      FROM t
    ), fp AS (
      SELECT doc_id,
        CASE WHEN len(hs) >= 4 THEN
          list_distinct(list_transform(generate_series(1, len(hs) - 3),
            j -> list_min(list_slice(hs, j, j + 3))))
        WHEN len(hs) >= 1 THEN [list_min(hs)]
        ELSE CAST([] AS BIGINT[]) END AS fps
      FROM h
    ), e AS (
      SELECT doc_id, unnest(fps) AS fp FROM fp
    ), dup AS (
      SELECT fp FROM e GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT fp.doc_id,
      CAST(len(fp.fps) AS BIGINT) AS n_fingerprints,
      CAST(coalesce(d.n, 0) AS BIGINT) AS n_shared,
      CAST(coalesce(d.n, 0) AS DOUBLE)
        / greatest(len(fp.fps), 1) AS share_score
    FROM fp LEFT JOIN (
      SELECT e.doc_id, COUNT(*) AS n
      FROM e JOIN dup USING (fp) GROUP BY e.doc_id
    ) d USING (doc_id)
    """,
)
def text_winnow_fingerprints(spark, sf):
    """Winnowing fingerprint duplication report (Schleimer et al. 2003,
    the MOSS algorithm): 5-token shingle hashes, 4-hash sliding-window
    minima, distinct selected values per document — any shared run of
    >= 8 tokens is guaranteed a shared fingerprint at ~2/(w+1) the
    census volume of exhaustive windows. Exact DuckDB oracle replays
    shingle hashing, window minima, the short-document single-minimum
    rule, and the cross-doc shared census."""
    from dozer_spark.ops.text import winnow_fingerprint_score

    d = _cat(spark, sf).df("documents")
    return winnow_fingerprint_score(d, "text", "doc_id", k=5, w=4)


@_q(
    "dedup_remove_spans",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), wpos AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 19, 0))) AS pos
      FROM t
    ), occ AS (
      SELECT doc_id, pos,
             md5(array_to_string(list_slice(toks, pos, pos + 19), ' ')) AS h
      FROM wpos
    ), marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY h) AS c,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM occ
    ), rem AS (
      SELECT doc_id, pos FROM marked WHERE c >= 2 AND rn > 1
    ), cov AS (
      SELECT doc_id,
             list_distinct(flatten(list(
               list_transform(generate_series(0, 19), d -> pos + d)))) AS covered
      FROM rem GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(len(c.covered), 0) AS BIGINT) AS n_removed,
           coalesce(array_to_string(
             CASE WHEN c.covered IS NULL THEN t.toks
                  ELSE list_transform(
                         list_filter(generate_series(1, len(t.toks)),
                                     p -> NOT list_contains(c.covered, p)),
                         p -> t.toks[p]) END, ' '), '') AS clean_text
    FROM t LEFT JOIN cov c USING (doc_id)
    """,
)
def dedup_remove_spans(spark, sf):
    """Duplicated-span EXCISION (Lee et al. substring dedup, fixed
    20-token windows): every span occurring more than once in the
    corpus keeps only its globally-first occurrence; overlapping
    duplicated windows merge into one cut. The oracle replays the
    identical window fingerprints, keeper ordering, and covered-
    position union in SQL."""
    from dozer_spark.ops.text import remove_duplicated_spans

    d = _cat(spark, sf).df("documents")
    return remove_duplicated_spans(d, "text", "doc_id", window=20)


@_q(
    "text_unigram_logprob",
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
      SELECT t.doc_id, COUNT(*) AS n_tokens, AVG(ln(ce.c)) AS avg_ln_c
      FROM toks t JOIN census ce USING (tok)
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(avg_ln_c - ln(totals.n), 6) AS avg_logprob,
           ROUND(exp(-(ROUND(avg_ln_c - ln(totals.n), 6))), 3) AS perplexity
    FROM per_doc, totals
    """,
    window=True,
)
def text_unigram_logprob(spark, sf):
    """In-corpus unigram LM score (the self-contained analog of CCNet's
    LM-perplexity quality filter): average ln-probability of each doc's
    tokens under the corpus's own unigram MLE, plus perplexity
    exp(-avg). The oracle replays census, totals, and the identical
    avg(ln c) - ln N identity in SQL."""
    from dozer_spark.ops.text import unigram_logprob

    d = _cat(spark, sf).df("documents")
    return unigram_logprob(d, "text", "doc_id")


@_q(
    "text_bigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), pairs AS (
      SELECT doc_id, p.prev AS prev, p.cur AS cur
      FROM (
        SELECT doc_id, unnest(list_transform(
            generate_series(1, len(t) - 1),
            i -> {'prev': t[i], 'cur': t[i + 1]})) AS p
        FROM toks WHERE len(t) >= 2
      )
    ), big AS (
      SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb
      FROM pairs GROUP BY prev, cur
    ), leftc AS (
      SELECT prev, SUM(cb) AS cl FROM big GROUP BY prev
    ), uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(cu) AS DOUBLE) AS n FROM uni
    ), scored AS (
      SELECT p.doc_id,
             ln(0.75 * b.cb / l.cl + 0.25 * u.cu / tot.n) AS lnp
      FROM pairs p
      JOIN big b ON b.prev = p.prev AND b.cur = p.cur
      JOIN leftc l ON l.prev = p.prev
      JOIN uni u ON u.tok = p.cur, tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lnp), 6) AS avg_logprob,
           ROUND(exp(-(ROUND(AVG(lnp), 6))), 3) AS perplexity
    FROM scored GROUP BY doc_id
    """,
    window=True,
)
def text_bigram_logprob(spark, sf):
    """In-corpus INTERPOLATED bigram LM score (Jelinek-Mercer, lam=.75):
    average ln P(cur|prev) under the corpus's own bigram MLE with
    unigram backoff — the local-fluency filter one order above
    text_unigram_logprob (scrambled word order scores low even with
    corpus-typical unigrams). Bigram pairs are built with per-doc array
    transforms (no lag window shuffle); the oracle replays the pair
    construction, both censuses, and the identically-ordered
    interpolation expression in SQL."""
    from dozer_spark.ops.text import bigram_logprob

    d = _cat(spark, sf).df("documents")
    return bigram_logprob(d, "text", "doc_id", lam=0.75)
