"""statement_to_dataframe — the Spark analogue of the reference's
statement_to_pipeline (dozer-sql/src/builder/mod.rs:79-117).

The reference walks its AST and instantiates processor factories edge by
edge; we instead materialize the dialect-specific FROM operators as temp
views and let spark.sql() build the (Catalyst-optimized) plan for the
rest. CTEs, derived tables, joins, GROUP BY/HAVING, UNION all pass
through untouched — Spark SQL is a superset of the reference dialect for
those (SURVEY.md section 2.4 lists what the reference rejects that we
accept: ORDER BY, LIMIT, INTERSECT/EXCEPT, OVER() windows, FULL joins).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from dozer_spark.operators import tumble, hop, ttl
from dozer_spark.plans.dialect import rewrite_statement, TableOp
from dozer_spark.registry import Catalog


def _materialize(spark: SparkSession, cat: Catalog | None, top: TableOp) -> DataFrame:
    if cat is not None and top.source in cat.tables:
        df = cat.df(top.source)
    else:
        df = spark.table(top.source)
    for op in top.ops:
        kind = op[0]
        if kind == "tumble":
            df = tumble(df, op[1], op[2])
        elif kind == "hop":
            df = hop(df, op[1], op[2], op[3])
        elif kind == "ttl":
            df = ttl(df, op[1], op[2])
        else:  # pragma: no cover
            raise ValueError(f"unknown table op {kind}")
    return df


def statement_to_dataframe(
    spark: SparkSession,
    sql: str,
    catalog: Catalog | None = None,
) -> tuple[DataFrame, str | None]:
    """Compile one dozer-dialect statement to a DataFrame.

    Returns (df, into_name). When the statement names an INTO target the
    caller decides how to sink it (the reference requires INTO at top
    level and attaches sinks there, builder/mod.rs:336-358; we leave the
    write mode to the caller — parquet/console/foreachBatch).
    """
    from dozer_spark.functions.jsonpath import ensure_json_udfs

    ensure_json_udfs(spark)
    spark_sql, into, ops = rewrite_statement(sql)
    # unique view names per statement: concurrent/nested builds in one
    # session must not clobber each other's __top_N__ views
    run_id = uuid.uuid4().hex[:8]
    for i, top in enumerate(ops):
        name = f"__top_{run_id}_{i}__"
        spark_sql = spark_sql.replace(f"__top_{i}__", name)
        _materialize(spark, catalog, top).createOrReplaceTempView(name)
    df = spark.sql(spark_sql)
    return df, into
