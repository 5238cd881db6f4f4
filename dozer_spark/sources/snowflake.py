"""Snowflake source (reference: dozer-ingestion/src/lib.rs:98-106 — the
reference does batch incremental pulls via table streams).

Spark side: the spark-snowflake connector (`format("snowflake")`) for
snapshots, plus a generic high-watermark incremental helper that works
for ANY JDBC-ish batch source (Snowflake table streams expose an offset
column the same way). No Snowflake account in the container — the
builders are config-validated; the watermark logic is engine code and
unit-tested against local tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REQUIRED = ("sfURL", "sfUser", "sfDatabase", "sfSchema", "sfWarehouse")


def snowflake_options(url: str, user: str, database: str, schema: str,
                      warehouse: str, **extra: str) -> dict[str, str]:
    opts = {
        "sfURL": url,
        "sfUser": user,
        "sfDatabase": database,
        "sfSchema": schema,
        "sfWarehouse": warehouse,
        **extra,
    }
    missing = [k for k in _REQUIRED if not opts.get(k)]
    if missing:
        raise ValueError(f"snowflake options missing {missing}")
    return opts


def snowflake_table(spark: SparkSession, options: dict[str, str],
                    table: str) -> DataFrame:
    """Snapshot read via the spark-snowflake connector (pushdown-capable:
    the connector translates Catalyst filters/projections to Snowflake
    SQL, so WHERE/SELECT reach the warehouse)."""
    return (
        spark.read.format("snowflake").options(**options).option("dbtable", table).load()
    )


def incremental_pull(snapshot: DataFrame, watermark_col: str,
                     last_watermark) -> DataFrame:
    """High-watermark incremental slice: rows strictly newer than the
    last pulled watermark. With a pushdown-capable source the predicate
    executes remotely (only new rows transfer) — the same resumable
    contract as the reference's OpIdentifier replay positions."""
    if last_watermark is None:
        return snapshot
    return snapshot.filter(F.col(watermark_col) > F.lit(last_watermark))


def next_watermark(batch: DataFrame, watermark_col: str):
    """Max watermark of a pulled batch (persist it with the sink's epoch
    state, e.g. alongside StateStore's manifest, to resume)."""
    return batch.agg(F.max(watermark_col)).collect()[0][0]
