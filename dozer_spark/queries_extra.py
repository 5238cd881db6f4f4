"""Second wave of oracle-checked queries: more TPC-H shapes, the remaining
scalar-function families, beyond-parity set ops, and queries routed through
the SQL DIALECT layer (plans/statement_to_dataframe) so the dozer-SQL
front door is correctness-gated, not just the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat
from dozer_spark.plans import statement_to_dataframe
from dozer_spark.operators import equi_join
from dozer_spark.operators.setops import intersect, except_
from dozer_spark.functions.scalar import chr_sql, trim_sql

# ---------------------------------------------------------------------------
# More TPC-H shapes
# ---------------------------------------------------------------------------


@_q(
    "q3_shipping_priority_shape",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    headline=True,
)
def q3_shipping_priority_shape(spark, sf):
    cat = _cat(spark, sf)
    c = cat.df("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = cat.df("orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = cat.df("lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30 00:00:00").cast("timestamp_ntz")
    )
    j = equi_join(c, o, [("c_custkey", "o_custkey")], "inner", broadcast_left=True)
    j = equi_join(j, l, [("o_orderkey", "l_orderkey")], "inner")
    # revenue as integer cents: floor per ROW then integer SUM — exact and
    # summation-order-independent, unlike round(sum(double)) which can flip
    # at representation boundaries when group counts are large
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return j.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        "o_orderpriority",
    ).agg(F.sum(cents).cast("long").alias("revenue_cents")).select(
        "l_orderkey", "revenue_cents", "odate", "o_orderpriority"
    )


@_q(
    "q10_returned_items_shape",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def q10_returned_items_shape(spark, sf):
    cat = _cat(spark, sf)
    c, o, l, n = cat.df("customer"), cat.df("orders"), cat.df("lineitem"), cat.df("nation")
    j = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(cents).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Remaining scalar families (abs/round/chr/trim variants/like-escape/
# least+greatest beyond-parity)
# ---------------------------------------------------------------------------


@_q(
    "math_abs_round",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0)            AS dev,
           round(l_discount * 100)                  AS disc_pct,
           CAST(floor(l_tax * 1000) AS BIGINT)      AS tax_mills,
           greatest(l_quantity, 25.0)               AS q_hi,
           least(l_quantity, 25.0)                  AS q_lo
    FROM lineitem
    """,
)
def math_abs_round(spark, sf):
    """ABS/ROUND (scalar/number.rs); LEAST exists in the reference enum but
    is not name-dispatched (conditional.rs:9-13 vs :28-34) — beyond-parity
    here. round() of a double at scale 0 agrees across engines on .5-free
    values; disc*100 values land far from .5 boundaries."""
    li = _cat(spark, sf).df("lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("dev"),
        F.round(F.col("l_discount") * 100, 0).alias("disc_pct"),
        F.floor(F.col("l_tax") * 1000).cast("long").alias("tax_mills"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("q_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("q_lo"),
    )


@_q(
    "string_chr_trim_variants",
    """
    SELECT p_partkey,
           chr(65 + CAST(p_partkey % 26 AS INTEGER))       AS letter,
           ltrim(p_name, 'bs')                              AS lt,
           rtrim(p_name, 'te')                              AS rt,
           trim(p_brand, '#0123456789')                     AS brand_word,
           (p_name LIKE 'b%' ESCAPE '\\')                   AS starts_b
    FROM part
    """,
)
def string_chr_trim_variants(spark, sf):
    """CHR, TRIM(LEADING/TRAILING/BOTH x FROM s), LIKE ESCAPE
    (scalar/string.rs:151-242)."""
    p = _cat(spark, sf).df("part")
    return p.select(
        "p_partkey",
        chr_sql(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter"),
        trim_sql("p_name", "bs", "LEADING").alias("lt"),
        trim_sql("p_name", "te", "TRAILING").alias("rt"),
        trim_sql("p_brand", "#0123456789", "BOTH").alias("brand_word"),
        F.expr(r"p_name LIKE 'b%' ESCAPE '\\'").alias("starts_b"),
    )


@_q(
    "not_in_not_like_isnull",
    """
    SELECT o_orderkey,
           (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))  AS low_prio,
           (o_orderstatus NOT LIKE 'O%')                    AS not_open,
           (nullif(o_orderstatus, 'F') IS NULL)             AS is_finished,
           (nullif(o_orderstatus, 'F') IS NOT NULL)         AS not_finished
    FROM orders
    """,
)
def not_in_not_like_isnull(spark, sf):
    """NOT IN / NOT LIKE / IS [NOT] NULL (in_list.rs, is_null.rs)."""
    o = _cat(spark, sf).df("orders")
    return o.select(
        "o_orderkey",
        (~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).alias("low_prio"),
        (~F.col("o_orderstatus").like("O%")).alias("not_open"),
        F.nullif(F.col("o_orderstatus"), F.lit("F")).isNull().alias("is_finished"),
        F.nullif(F.col("o_orderstatus"), F.lit("F")).isNotNull().alias("not_finished"),
    )


@_q(
    "extract_all_fields",
    """
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS BIGINT)    AS y,
           CAST(extract(month FROM o_orderdate) AS BIGINT)   AS mo,
           CAST(extract(day FROM o_orderdate) AS BIGINT)     AS d,
           CAST(extract(hour FROM o_orderdate) AS BIGINT)    AS h,
           CAST(extract(minute FROM o_orderdate) AS BIGINT)  AS mi,
           CAST(extract(second FROM o_orderdate) AS BIGINT)  AS s,
           CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS q,
           CAST(extract(dow FROM o_orderdate) AS BIGINT)     AS dw
    FROM orders
    """,
)
def extract_all_fields(spark, sf):
    """EXTRACT across fields (datetime.rs:13-21). DOW normalized to
    DuckDB's convention (Sunday=0)."""
    o = _cat(spark, sf).df("orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.hour("o_orderdate").cast("long").alias("h"),
        F.minute("o_orderdate").cast("long").alias("mi"),
        F.second("o_orderdate").cast("long").alias("s"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dw"),  # Spark: Sunday=1
    )


# ---------------------------------------------------------------------------
# Beyond-parity set ops (reference rejects INTERSECT/EXCEPT,
# builder/mod.rs:214-226)
# ---------------------------------------------------------------------------


@_q(
    "intersect_keys",
    """
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def intersect_keys(spark, sf):
    cat = _cat(spark, sf)
    a = cat.df("customer").select(F.col("c_nationkey").alias("k"))
    b = cat.df("supplier").select(F.col("s_nationkey").alias("k"))
    return intersect(a, b)


@_q(
    "except_keys",
    """
    SELECT CAST(p_size AS INTEGER) AS k FROM part
    EXCEPT
    SELECT n_nationkey AS k FROM nation
    """,
)
def except_keys(spark, sf):
    cat = _cat(spark, sf)
    a = cat.df("part").select(F.col("p_size").cast("int").alias("k"))
    b = cat.df("nation").select(F.col("n_nationkey").alias("k"))
    return except_(a, b)


# ---------------------------------------------------------------------------
# Dialect-layer queries: the dozer SQL front door, oracle-gated
# ---------------------------------------------------------------------------


def _dialect(spark, sf, sql):
    # load_all: the dialect SQL references tables by bare name through
    # session temp views, so every corpus view must be (re)bound here
    df, _ = statement_to_dataframe(spark, sql, _cat(spark, sf).load_all())
    return df


@_q(
    "dialect_tumble_group",
    """
    SELECT strftime(make_timestamp(CAST(floor(epoch_ms(ts) / 7200000) * 7200000 AS BIGINT) * 1000),
                    '%Y-%m-%d %H:%M:%S') AS ws,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def dialect_tumble_group(spark, sf):
    return _dialect(
        spark,
        sf,
        """
        SELECT TO_CHAR(window_start, '%Y-%m-%d %H:%M:%S') AS ws, event_type, COUNT(*) AS n
        FROM TUMBLE(events, ts, '2 HOURS')
        GROUP BY window_start, event_type
        INTO dialect_out
        """,
    )


@_q(
    "dialect_scalar_mix",
    """
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_u,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
           CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'P' THEN 'pending' ELSE 'other' END AS st_d
    FROM orders
    """,
)
def dialect_scalar_mix(spark, sf):
    return _dialect(
        spark,
        sf,
        """
        SELECT o_orderkey,
               UCASE(o_orderpriority) AS prio_u,
               NVL(NULLIF(o_orderstatus, 'O'), 'open') AS st,
               DECODE(o_orderstatus, 'F', 'done', 'P', 'pending', 'other') AS st_d
        FROM orders
        """,
    )


@_q(
    "dialect_argmax",
    """
    SELECT o_orderstatus, ARG_MAX(o_orderkey, o_totalprice) AS key_at_max
    FROM orders GROUP BY o_orderstatus
    """,
)
def dialect_argmax(spark, sf):
    return _dialect(
        spark,
        sf,
        "SELECT o_orderstatus, MAX_VALUE(o_totalprice, o_orderkey) AS key_at_max "
        "FROM orders GROUP BY o_orderstatus",
    )


@_q(
    "dialect_json_value",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def dialect_json_value(spark, sf):
    return _dialect(
        spark,
        sf,
        "SELECT CAST(JSON_VALUE(props, 'k') AS BIGINT) AS k, COUNT(*) AS n FROM events GROUP BY 1",
    )


@_q(
    "dialect_ttl_tumble_nested",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events),
    recent AS (SELECT e.* FROM events e, mx WHERE e.ts >= mx.m - INTERVAL 21 DAY)
    SELECT strftime(make_timestamp(CAST(floor(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) * 1000),
                    '%Y-%m-%d') AS day_s,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sv
    FROM recent GROUP BY 1
    """,
)
def dialect_ttl_tumble_nested(spark, sf):
    """The reference's own nested shape (builder_test.rs:228):
    TTL(TUMBLE(...), ...)."""
    return _dialect(
        spark,
        sf,
        """
        SELECT TO_CHAR(window_start, '%Y-%m-%d') AS day_s, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sv
        FROM TTL(TUMBLE(events, ts, '1 DAY'), ts, '21 DAYS')
        GROUP BY window_start
        """,
    )


@_q(
    "python_udf_roundtrip",
    """
    SELECT CAST(o_orderkey * 2 + 1 AS BIGINT) AS scored, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def python_udf_roundtrip(spark, sf):
    """The Python-UDF surface (expression/src/python_udf.rs) under the
    oracle gate: a vectorized pandas UDF whose arithmetic the oracle
    reproduces in SQL."""
    from pyspark.sql import types as T

    from dozer_spark.functions.udf import register_python_udf

    register_python_udf(spark, "score_key_q", lambda x: x * 2 + 1, T.LongType())
    _cat(spark, sf).view("orders")  # bind the `orders` view to this sf_dir
    return spark.sql(
        "SELECT score_key_q(o_orderkey) AS scored, COUNT(*) AS n FROM orders GROUP BY 1"
    )


@_q(
    "js_udf_roundtrip",
    """
    SELECT CAST(o_orderkey * 3 - 1 AS BIGINT) AS scored,
           upper(o_orderpriority) AS pri_u, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def js_udf_roundtrip(spark, sf):
    """The JavaScript-UDF surface (reference: dozer-deno embedded
    runtime, expression/src/javascript/udf.rs) under the oracle gate:
    a Node-subprocess JS function over an Arrow batch whose arithmetic
    and string ops the oracle reproduces in SQL. Skips (empty frame)
    only if no node runtime exists — this container has one.
    trusted_source: the UDF source here is our own trusted literal.
    """
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(spark, "js_score_q", "(v) => v * 3 - 1", "long",
                    trusted_source=True)
    register_js_udf(spark, "js_upper_q", "(s) => s.toUpperCase()",
                    "string", trusted_source=True)
    _cat(spark, sf).view("orders")  # bind the `orders` view to this sf_dir
    return spark.sql(
        "SELECT js_score_q(o_orderkey) AS scored, "
        "js_upper_q(o_orderpriority) AS pri_u, COUNT(*) AS n "
        "FROM orders GROUP BY 1, 2"
    )


@_q(
    "now_function",
    """
    SELECT COUNT(*) AS n_past,
           CAST(SUM(CASE WHEN ts > now() THEN 1 ELSE 0 END) AS BIGINT) AS n_future
    FROM events
    """,
)
def now_function(spark, sf):
    """NOW() (datetime.rs NOW) — deterministic under the gate because the
    corpus's event times are all in the past for both engines."""
    ev = _cat(spark, sf).df("events")
    now = F.current_timestamp().cast("timestamp_ntz")
    return ev.agg(
        F.count(F.lit(1)).alias("n_past"),
        F.sum(F.when(F.col("ts") > now, 1).otherwise(0)).cast("long").alias("n_future"),
    )


@_q(
    "dialect_all_any_comparison",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders
                          WHERE o_orderstatus = 'P')
      AND o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
)
def dialect_all_any_comparison(spark, sf):
    """Quantified comparisons via the dialect front door: `> ALL (q)` ->
    scalar MAX subquery, `= ANY (q)` -> IN (dialect.rewrite_all_any).
    Beyond-reference surface: the reference's expression builder rejects
    both (SURVEY §2.4 negative space)."""
    return _dialect(
        spark,
        sf,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders "
        "                          WHERE o_orderstatus = 'P') "
        "  AND o_custkey = ANY (SELECT c_custkey FROM customer "
        "                       WHERE c_mktsegment = 'BUILDING')",
    )


@_q(
    "dialect_tumble_in_join",
    """
    WITH w AS (
      SELECT user_id,
             make_timestamp(CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) * 1000)
               AS window_start
      FROM events
    )
    SELECT w.user_id, COUNT(*) AS n
    FROM w JOIN events e ON w.user_id = e.user_id
    GROUP BY w.user_id
    """,
)
def dialect_tumble_in_join(spark, sf):
    """A TUMBLE table operator appearing inside a JOIN clause of the SQL
    front door (ROADMAP #4: previously DataFrame-API-only). The span
    rewriter materializes the windowed view wherever it occurs in FROM."""
    return _dialect(
        spark,
        sf,
        "SELECT w.user_id, COUNT(*) AS n "
        "FROM TUMBLE(events, ts, '1 HOUR') w JOIN events e ON w.user_id = e.user_id "
        "GROUP BY w.user_id",
    )
