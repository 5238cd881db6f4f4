"""Sources — Spark-native equivalents of the reference's connector registry
(dozer-ingestion/src/lib.rs:43-161; trait connector/src/lib.rs:55-96).

| reference connector       | here                                        |
|---------------------------|---------------------------------------------|
| S3/LocalStorage (parquet, | files.py batch + streaming file sources     |
|   CSV via DataFusion)     |                                             |
| Postgres snapshot + WAL   | jdbc.py snapshot (partitioned) +            |
|   CDC                     |   pg_replication.py NATIVE wire client      |
|                           |   (SCRAM, wal2json slot, LSN resume) +      |
|                           |   wal2json.py parse + pgoutput.py binary    |
|                           |   decoder (stock server, no extension);     |
|                           |   kafka.py Debezium                         |
| MySQL binlog              | mysql_binlog.py NATIVE client (handshake +  |
|                           |   ROW-event decode); kafka.py Debezium too  |
| Kafka                     | kafka.py readStream/batch/write builders +  |
|                           |   kafka_wire.py NATIVE consumer (wire       |
|                           |   protocol, v2 record batches, CRC32C,      |
|                           |   gzip, offset-cursor spool)                |
| Webhook                   | webhook.py HTTP -> atomic ndjson spool      |
| MongoDB                   | mongo.py snapshot builder + change-stream   |
|                           |   normalization + mongo_wire.py NATIVE      |
|                           |   OP_MSG/BSON client (SCRAM, $changeStream, |
|                           |   resume tokens)                            |
| DeltaLake (+CDF)          | delta.py (gated on delta-spark); the        |
|                           |   parquet-native twin is storage/txtable.py |
| Snowflake                 | snowflake.py options + watermark increments |
| gRPC ingest (Arrow)       | ingest_server.py Arrow-IPC-over-TCP spool   |
|                           |   + cdc.py replay (test harness)            |
| Ethereum, Deno JS         | out of scope (documented)                   |

The CDC replay source (cdc.py) doubles as the test harness equivalent of
the reference's SQLite-changelog replay (dozer-tests logic_test.rs:81-94).
"""

from dozer_spark.sources.files import read_table, stream_table
from dozer_spark.sources.cdc import replay_changelog, changelog_batches
from dozer_spark.sources.kafka import kafka_stream, parse_debezium
from dozer_spark.sources.kafka_wire import KafkaWireClient, tail_kafka_to_spool
from dozer_spark.sources.wal2json import wal2json_changelog
from dozer_spark.sources.mongo import change_stream_to_changelog
from dozer_spark.sources.mongo_wire import MongoWireClient, tail_mongo_to_spool
from dozer_spark.sources.ingest_server import ArrowIngestServer, send_arrow
from dozer_spark.sources.pg_replication import PGReplicationClient, tail_to_spool
from dozer_spark.sources.pgoutput import PgOutputDecoder, tail_pgoutput_to_spool
from dozer_spark.sources.mysql_binlog import MySQLBinlogClient
from dozer_spark.sources.webhook import WebhookServer, webhook_changelog

__all__ = [
    "read_table",
    "stream_table",
    "replay_changelog",
    "changelog_batches",
    "kafka_stream",
    "parse_debezium",
    "KafkaWireClient",
    "tail_kafka_to_spool",
    "wal2json_changelog",
    "change_stream_to_changelog",
    "MongoWireClient",
    "tail_mongo_to_spool",
    "PGReplicationClient",
    "tail_to_spool",
    "PgOutputDecoder",
    "tail_pgoutput_to_spool",
    "MySQLBinlogClient",
    "WebhookServer",
    "webhook_changelog",
    "ArrowIngestServer",
    "send_arrow",
]
