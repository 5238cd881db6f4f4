"""Kafka source + Debezium CDC envelope parsing.

Reference: Kafka connector with schema-registry support
(dozer-ingestion/src/lib.rs:109-112); Postgres/MySQL CDC arrive the same
way in the Spark world — as Debezium envelopes on Kafka topics.

kafka_stream builds the readStream (requires the spark-sql-kafka package
on the cluster — config-only here, no broker in this container).
parse_debezium converts the envelope into our changelog schema
(__op/__txid/__seq + row image) with from_json — fully testable without
a broker, see tests/test_sources.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    **options,
) -> DataFrame:
    """readStream from Kafka. Returns the raw (key, value, ...) frame;
    compose with parse_debezium for CDC topics."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .options(**options)
        .load()
    )


# Debezium op codes -> dozer Operation kinds (types/mod.rs:293-298)
_DBZ_OP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def parse_debezium(value: Column, row_schema: StructType) -> Column:
    """Parse a Debezium JSON envelope into a struct:
      {__op, __txid, __seq, row:struct(...)}

    - op 'c'/'r' -> I (after image), 'u' -> U (after image; the before
      image is reconstructed downstream by PK lookup, mirroring
      record_store.rs:49-75), 'd' -> D (before image)
    - source.txId -> __txid, source.lsn -> __seq (postgres); falls back
      to ts_ms when absent.
    """
    env_schema = (
        "struct<op:string, ts_ms:long, "
        f"before:{row_schema.simpleString()}, after:{row_schema.simpleString()}, "
        "source:struct<txId:long, lsn:long, ts_ms:long>>"
    )
    env = F.from_json(value.cast("string"), env_schema)
    op = env["op"]
    mapped = (
        F.when(op.isin("c", "r"), F.lit("I"))
        .when(op == "u", F.lit("U"))
        .when(op == "d", F.lit("D"))
    )
    image = F.when(op == "d", env["before"]).otherwise(env["after"])
    txid = F.coalesce(env["source"]["txId"], env["ts_ms"]).cast("long")
    seq = F.coalesce(env["source"]["lsn"], F.lit(0)).cast("long")
    return F.struct(
        mapped.alias("__op"), txid.alias("__txid"), seq.alias("__seq"), image.alias("row")
    )


def debezium_changelog(raw: DataFrame, row_schema: StructType) -> DataFrame:
    """kafka frame -> flat changelog DataFrame (drops tombstones/unknown ops)."""
    parsed = raw.select(parse_debezium(F.col("value"), row_schema).alias("e"))
    return (
        parsed.filter(F.col("e.__op").isNotNull())
        .select("e.__op", "e.__txid", "e.__seq", "e.row.*")
    )


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath (it is
    not bundled with pyspark — clusters add the package)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_batch(spark: SparkSession, brokers: str, topic: str,
                **options) -> DataFrame:
    """Batch read of a topic's full retained log (backfill / testing
    path; the streaming path is kafka_stream)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .options(**options)
        .load()
    )


def kafka_write(df: DataFrame, brokers: str, topic: str) -> None:
    """Batch produce: df must carry a string/binary `value` column
    (and optionally `key`). Spark's own kafka sink — no client lib."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
