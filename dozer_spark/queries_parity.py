"""Type-coercion parity queries (reference execution.rs matrices).

Every query pairs the coercion helpers (functions/coercion.py) with an
oracle that spells out the SAME parity casts, so the hash gate verifies
both the values and the documented divergence handling:
- int/int division -> Float (Div matrix, execution.rs:688-742);
- Decimal-with-Float arithmetic stays Decimal (Add/Sub/Mul/Mod matrix,
  :587-686 — Spark alone would widen to double);
- AVG over the int family returns Decimal (validate_avg :764-807).
Outputs are cast to fixed DECIMAL/DOUBLE shapes on both sides: the two
oracle engines disagree on intermediate precisions (DuckDB divides
decimals in double; Spark keeps decimal), so the comparable surface is
the final cast value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat
from dozer_spark.functions import coercion as co


@_q(
    "coercion_arithmetic_matrix",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS DOUBLE) / CAST(o_custkey + 1 AS DOUBLE) AS div_ii,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) + o_custkey AS DECIMAL(38,6)) AS add_di,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 3 AS DECIMAL(38,6)) AS mul_di,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 4 AS DECIMAL(38,6)) AS div_dd,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) % 7 AS DECIMAL(38,6)) AS mod_di,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                + CAST(CAST(0.5 AS DOUBLE) AS DECIMAL(38,18)) AS DECIMAL(38,6)) AS add_df
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def coercion_arithmetic_matrix(spark, sf):
    """Binary-arithmetic matrix (execution.rs:587-742): int/int -> Float,
    Decimal-op-int -> Decimal, Decimal-op-Float -> Decimal via parity
    cast. The helper resolves operand types from the schema, exactly what
    the reference's static typing pass does."""
    from pyspark.sql import types as T

    o = (
        _cat(spark, sf).df("orders")
        .filter(F.col("o_orderkey") <= 2000)
        .withColumn("dec", F.col("o_totalprice").cast("decimal(18,2)"))
        .withColumn("ck1", F.col("o_custkey") + 1)
        .withColumn("half", F.lit(0.5).cast("double"))
    )
    dec_t = T.DecimalType(18, 2)
    long_t = T.LongType()
    dbl_t = T.DoubleType()
    out6 = T.DecimalType(38, 6)
    return o.select(
        "o_orderkey",
        co.arith(F.col("o_orderkey"), long_t, "/", F.col("ck1"), long_t).alias("div_ii"),
        co.arith(F.col("dec"), dec_t, "+", F.col("o_custkey"), long_t).cast(out6).alias("add_di"),
        co.arith(F.col("dec"), dec_t, "*", F.lit(3), T.IntegerType()).cast(out6).alias("mul_di"),
        co.arith(F.col("dec"), dec_t, "/", F.lit(4), T.IntegerType()).cast(out6).alias("div_dd"),
        co.arith(F.col("dec"), dec_t, "%", F.lit(7), T.IntegerType()).cast(out6).alias("mod_di"),
        co.arith(F.col("dec"), dec_t, "+", F.col("half"), dbl_t).cast(out6).alias("add_df"),
    )


@_q(
    "json_query_matrix",
    """
    WITH j AS (
      SELECT o_orderkey,
             '{"k":' || o_orderkey || ',"tags":["a","b"],"nest":{"d":'
                 || o_custkey || '}}' AS doc,
             o_custkey
      FROM orders WHERE o_orderkey <= 1000
    )
    SELECT o_orderkey,
           CAST(json_extract(doc, '$.nest') AS VARCHAR) AS q_nest,
           CAST(json_extract(doc, '$.tags') AS VARCHAR) AS q_tags,
           CAST(NULL AS VARCHAR) AS q_scalar,
           json_extract_string(doc, '$.k') AS v_k,
           json_extract_string(doc, '$.tags[1]') AS v_tag1,
           CAST(NULL AS VARCHAR) AS v_obj,
           '["a","b"]' AS q_wild,
           CAST(o_custkey AS VARCHAR) AS v_descent
    FROM j
    """,
)
def json_query_matrix(spark, sf):
    """JSON_VALUE / JSON_QUERY with the reference's jsonpath engine
    semantics (json_functions.rs:13-118; engine dozer-sql/jsonpath/):
    JSON_QUERY keeps objects/arrays and NULLs scalars, JSON_VALUE the
    reverse; single-match unwrap; wildcard and recursive-descent paths.
    The JSON docs are built from table columns, so the oracle states
    ground truth directly where DuckDB's path dialect lacks a feature
    (descent), and via json_extract where it has one."""
    from dozer_spark.functions.jsonpath import ensure_json_udfs

    ensure_json_udfs(spark)
    o = (
        _cat(spark, sf).df("orders")
        .filter(F.col("o_orderkey") <= 1000)
        .withColumn(
            "doc",
            F.concat(
                F.lit('{"k":'), F.col("o_orderkey").cast("string"),
                F.lit(',"tags":["a","b"],"nest":{"d":'),
                F.col("o_custkey").cast("string"), F.lit("}}"),
            ),
        )
    )
    return o.select(
        "o_orderkey",
        F.expr("json_query_full(doc, '$.nest')").alias("q_nest"),
        F.expr("json_query_full(doc, '$.tags')").alias("q_tags"),
        F.expr("json_query_full(doc, '$.k')").alias("q_scalar"),
        F.expr("json_value_full(doc, '$.k')").alias("v_k"),
        F.expr("json_value_full(doc, '$.tags[1]')").alias("v_tag1"),
        F.expr("json_value_full(doc, '$.nest')").alias("v_obj"),
        F.expr("json_query_full(doc, '$.tags[*]')").alias("q_wild"),
        F.expr("json_value_full(doc, '$..d')").alias("v_descent"),
    )


@_q(
    "coercion_avg_returns_decimal",
    """
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_orderkey % 1000 AS DECIMAL(38,10))) / COUNT(*)
                AS DECIMAL(38,6)) AS avg_int_dec,
           CAST(AVG(o_totalprice) AS DOUBLE) AS avg_float,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def coercion_avg_returns_decimal(spark, sf):
    """AVG return-type rule (validate_avg, execution.rs:764-807): int
    family -> Decimal (Spark's default avg(int) is double), Float ->
    Float. COUNT -> Int not-null (:809-816)."""
    from pyspark.sql import types as T

    o = _cat(spark, sf).df("orders").withColumn(
        "key_mod", (F.col("o_orderkey") % 1000).cast("long")
    )
    return o.groupBy("o_orderstatus").agg(
        co.avg_agg(F.col("key_mod"), T.LongType()).cast(T.DecimalType(38, 6)).alias("avg_int_dec"),
        co.avg_agg(F.col("o_totalprice"), T.DoubleType()).alias("avg_float"),
        co.count_agg().alias("n"),
    )
