"""Third query wave — beyond-parity relational surface.

Everything here is rejected or ignored by the reference (SURVEY §2.4
negative space: no SELECT DISTINCT, no OVER() window functions, no
ORDER BY/LIMIT, no semi/anti joins, no count-distinct) but is free and
idiomatic in Spark, so a reference user migrating here gains it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat


@_q(
    "select_distinct",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def select_distinct(spark, sf):
    """Reference parses but IGNORES the distinct flag
    (select_to_pipeline never reads it, builder/mod.rs:237-361) — we
    implement it correctly."""
    return _cat(spark, sf).df("customer").select("c_nationkey", "c_mktsegment").distinct()


@_q(
    "count_distinct",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def count_distinct(spark, sf):
    o = _cat(spark, sf).df("orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@_q(
    "conditional_aggregation",
    """
    SELECT c_nationkey,
           CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
           CAST(SUM(CAST(floor(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END) AS BIGINT)) AS BIGINT) AS pos_bal_floor
    FROM customer GROUP BY c_nationkey
    """,
)
def conditional_aggregation(spark, sf):
    c = _cat(spark, sf).df("customer")
    return c.groupBy("c_nationkey").agg(
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)).cast("long").alias("n_rich"),
        F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0))
        .cast("long")
        .alias("n_building"),
        F.sum(F.floor(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0.0)).cast("long"))
        .cast("long")
        .alias("pos_bal_floor"),
    )


@_q(
    "window_row_number_topn",
    """
    SELECT c_nationkey, c_custkey, rnk FROM (
      SELECT c_nationkey, c_custkey,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
    headline=True,
)
def window_row_number_topn(spark, sf):
    """Top-N per group via OVER() — the reference has no OVER at all
    (SURVEY §2.4). Deterministic tie-break on c_custkey."""
    c = _cat(spark, sf).df("customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "rnk")
    )


@_q(
    "window_lag_lead_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(lag(o_orderkey) OVER w AS BIGINT)            AS prev_order,
           CAST(lead(o_orderkey) OVER w AS BIGINT)           AS next_order,
           CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_floor
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def window_lag_lead_running(spark, sf):
    o = _cat(spark, sf).df("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).cast("long").alias("prev_order"),
        F.lead("o_orderkey").over(w).cast("long").alias("next_order"),
        F.sum(F.floor("o_totalprice").cast("long")).over(run).cast("long").alias("running_floor"),
    )


@_q(
    "semi_join_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def semi_join_exists(spark, sf):
    """EXISTS/semi-join — rejected by the reference's expression builder
    (SURVEY §2.4: no EXISTS/scalar subqueries)."""
    cat = _cat(spark, sf)
    big = cat.df("orders").filter(F.col("o_totalprice") > 200000)
    return cat.df("customer").join(
        big, F.col("c_custkey") == F.col("o_custkey"), "semi"
    ).select("c_custkey", "c_name")


@_q(
    "anti_join_not_exists",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def anti_join_not_exists(spark, sf):
    """Customers with no order above 250k — non-trivial output (plain
    'no orders at all' is vacuously empty in this corpus)."""
    cat = _cat(spark, sf)
    big = cat.df("orders").filter(F.col("o_totalprice") > 250000)
    return cat.df("customer").join(
        big, F.col("c_custkey") == F.col("o_custkey"), "anti"
    ).select("c_custkey")


@_q(
    "self_join_same_nation_pairs",
    """
    SELECT a.s_suppkey AS sup_a, b.s_suppkey AS sup_b, a.s_nationkey AS nk
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
)
def self_join_same_nation_pairs(spark, sf):
    s = _cat(spark, sf).df("supplier")
    a, b = s.alias("a"), s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("sup_a"),
        F.col("b.s_suppkey").alias("sup_b"),
        F.col("a.s_nationkey").alias("nk"),
    )


@_q(
    "group_by_expression",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_band,
           COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders GROUP BY 1
    """,
)
def group_by_expression(spark, sf):
    o = _cat(spark, sf).df("orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("price_band")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").cast("long").alias("first_key"),
    )


@_q(
    "nested_cte_chain",
    """
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n, CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS spend_fl
      FROM orders GROUP BY o_custkey
    ), banded AS (
      SELECT o_custkey, n, spend_fl,
             CASE WHEN n >= 15 THEN 'frequent' WHEN n >= 8 THEN 'regular' ELSE 'rare' END AS band
      FROM per_cust
    )
    SELECT band, COUNT(*) AS n_cust, CAST(SUM(spend_fl) AS BIGINT) AS total_spend
    FROM banded GROUP BY band
    """,
)
def nested_cte_chain(spark, sf):
    o = _cat(spark, sf).df("orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor("o_totalprice").cast("long")).cast("long").alias("spend_fl"),
    )
    banded = per_cust.withColumn(
        "band",
        F.when(F.col("n") >= 15, "frequent").when(F.col("n") >= 8, "regular").otherwise("rare"),
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("spend_fl").cast("long").alias("total_spend"),
    )


@_q(
    "session_windows",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts,
             value
      FROM events
    ), flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1
                  ELSE 0 END AS is_new
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS s_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
    FROM sess GROUP BY user_id, session_id
    """,
)
def session_windows(spark, sf):
    """Gap-based sessionization (30-minute gap) — beyond-reference window
    type; oracle replays the gaps-and-islands construction in SQL."""
    from dozer_spark.operators.session import session_aggregate

    ev = _cat(spark, sf).df("events")
    out = session_aggregate(
        ev,
        "ts",
        ["user_id"],
        "30 MINUTES",
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("v_cents"),
        ],
    )
    return out.select(
        "user_id",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
        "n",
        "v_cents",
    )


@_q(
    "between_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 20 AND 30
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def between_filter(spark, sf):
    """BETWEEN — the reference's expression builder rejects it
    (SURVEY §2.4); Spark/DuckDB both inclusive-bounds."""
    li = _cat(spark, sf).df("lineitem")
    return li.filter(
        F.col("l_quantity").between(20, 30)
        & F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"),
        )
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@_q(
    "scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    """,
)
def scalar_subquery(spark, sf):
    """Scalar subquery in a predicate — rejected by the reference
    (SURVEY §2.4: no scalar subqueries). NOTE: the avg itself is a
    cross-engine double; comparing strictly above 1.5x avg keeps any
    1-ulp avg difference from flipping membership (no price sits within
    1e-9 of the threshold in this corpus)."""
    o = _cat(spark, sf).df("orders")
    threshold = o.agg((F.avg("o_totalprice") * 1.5).alias("t"))
    return o.join(F.broadcast(threshold)).filter(
        F.col("o_totalprice") > F.col("t")
    ).select("o_orderkey", "o_totalprice")


@_q(
    "rollup_aggregation",
    """
    SELECT c_mktsegment, CAST(c_nationkey AS INTEGER) AS nk,
           COUNT(*) AS n,
           CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
           CAST(grouping(c_nationkey) AS BIGINT)  AS g_nk
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
)
def rollup_aggregation(spark, sf):
    """ROLLUP + GROUPING() — 'no grouping sets / cube / rollup' in the
    reference (SURVEY §2.4). Via spark.sql: F.grouping() demands the
    exact grouping expression object, which aliased cast columns break."""
    _cat(spark, sf).view("customer")  # bind the `customer` view to this sf_dir
    return spark.sql(
        """
        SELECT c_mktsegment, CAST(c_nationkey AS INT) AS nk,
               COUNT(*) AS n,
               CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(grouping(CAST(c_nationkey AS INT)) AS BIGINT) AS g_nk
        FROM customer
        GROUP BY ROLLUP (c_mktsegment, CAST(c_nationkey AS INT))
        """
    )


@_q(
    "word_count_unnest",
    """
    SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    )
    GROUP BY tok
    """,
)
def word_count_unnest(spark, sf):
    """UNNEST/table-function shape — rejected by the reference
    (builder/table_operator.rs:46-49). The classic word count."""
    from dozer_spark.ops.text import tokens

    d = _cat(spark, sf).df("documents")
    return (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
    )


@_q(
    "decimal_cast_aggregation",
    """
    SELECT o_orderstatus,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) * 0 
                + CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) * 0
                + COUNT(*) AS BIGINT) AS n,
           MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS min_dec,
           MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS max_dec
    FROM orders GROUP BY o_orderstatus
    """,
)
def decimal_cast_aggregation(spark, sf):
    """Decimal type round-trip (dozer Decimal -> DecimalType, SURVEY
    §1.2): min/max over DECIMAL(18,2) are exact and engine-portable
    (sums are not compared — Spark widens sum precision differently
    than DuckDB)."""
    o = _cat(spark, sf).df("orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(dec).alias("min_dec"),
        F.max(dec).alias("max_dec"),
    )
