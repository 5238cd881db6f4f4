"""MongoDB source (reference: dozer-ingestion/src/lib.rs:131-135,
dozer-ingestion/mongodb/ — snapshot via collection scan + change streams).

Two halves, mirroring the reference connector's snapshot+CDC split:
- snapshot: the mongodb-spark connector (`format("mongodb")`) — config
  builder only, no server in the container;
- CDC: change-stream EVENT PARSING is implemented and tested here. A
  Mongo change stream emits JSON documents with `operationType`,
  `documentKey`, `fullDocument`, `clusterTime` (public wire format);
  `change_stream_to_changelog` normalizes a DataFrame of those events
  (from Kafka, a spool dir, or the connector's streaming mode) into the
  engine changelog. This is the same pattern as the Debezium path
  (sources/kafka.py): the transport is pluggable, the normalization is
  the engine's job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mongo_snapshot(spark: SparkSession, uri: str, database: str,
                   collection: str, schema: T.StructType | None = None) -> DataFrame:
    """Batch snapshot via the MongoDB Spark connector (requires the
    mongo-spark-connector jar on the cluster)."""
    r = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )
    if schema is not None:
        r = r.schema(schema)
    return r.load()


def mongo_stream(spark: SparkSession, uri: str, database: str,
                 collection: str, schema: T.StructType) -> DataFrame:
    """Structured-Streaming change-stream read (connector's micro-batch
    mode, publishes full documents)."""
    return (
        spark.readStream.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .option("change.stream.publish.full.document.only", "true")
        .schema(schema)
        .load()
    )


def change_stream_to_changelog(events: DataFrame, event_col: str,
                               doc_schema: T.StructType) -> DataFrame:
    """Parse raw change-stream event JSON into the engine changelog.

    operationType insert/replace -> I, update -> U, delete -> D (delete
    events carry only documentKey; the document columns are NULL and the
    PK comes from the key — matching Operation::Delete{old} with a
    PK-only old image, which every downstream operator resolves by PK).

    Ordering: __txid is clusterTime; __seq derives from the event's
    RESUME TOKEN (`_id._data`): its leading bytes after the type tag are
    the BSON timestamp (seconds + per-second ordinal) the server assigned,
    so the token's hex prefix is a monotone key over the stream's real
    order. monotonically_increasing_id would instead order by partition
    layout — two ops on one PK in the same batch could replay reversed.
    Events with no token (hand-built fixtures) fall back to seq 0 within
    their clusterTime.
    """
    ev_schema = T.StructType(
        [
            T.StructField("operationType", T.StringType()),
            T.StructField("clusterTime", T.LongType()),
            T.StructField(
                "_id", T.StructType([T.StructField("_data", T.StringType())])
            ),
            T.StructField("documentKey", doc_schema),  # subset: key fields
            T.StructField("fullDocument", doc_schema),
        ]
    )
    p = events.select(F.from_json(F.col(event_col), ev_schema).alias("e"))
    op = (
        F.when(F.col("e.operationType").isin("insert", "replace"), "I")
        .when(F.col("e.operationType") == "update", "U")
        .when(F.col("e.operationType") == "delete", "D")
    )
    image = F.when(
        F.col("e.operationType") == "delete", F.col("e.documentKey")
    ).otherwise(F.col("e.fullDocument"))
    return (
        p.filter(op.isNotNull())
        .select(
            op.alias("__op"),
            F.coalesce(F.col("e.clusterTime"), F.lit(0)).alias("__txid"),
            # the resume token's FULL 64-bit timestamp+ordinal field
            # (16 hex chars after the '82' type tag): monotone in stream
            # order. All 16 chars matter — truncating drops low ordinal
            # bits and collides events within one second. Seconds' top
            # bit stays 0 until 2038, so the value fits a signed long.
            F.coalesce(
                F.conv(F.substring(F.col("e._id._data"), 3, 16), 16, 10).cast("long"),
                F.lit(0).cast("long"),
            ).alias("__seq"),
            image.alias("__doc"),
        )
        .select("__op", "__txid", "__seq", "__doc.*")
    )
