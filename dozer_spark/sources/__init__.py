"""Sources — Spark-native equivalents of the reference's connector registry
(dozer-ingestion/src/lib.rs:43-161; trait connector/src/lib.rs:55-96).

| reference connector       | here                                       |
|---------------------------|--------------------------------------------|
| S3/LocalStorage (parquet, | files.py batch + streaming file sources    |
|   CSV via DataFusion)     |                                            |
| Postgres snapshot + WAL   | jdbc.py snapshot (partitioned) + kafka.py  |
|   CDC                     |   Debezium topic parsing -> changelog      |
| MySQL binlog              | same pattern (kafka.py)                    |
| Kafka                     | kafka.py readStream builder                |
| DeltaLake / Snowflake     | format plugins — config builders only      |
| gRPC ingest               | cdc.py replay (tests) / socket source      |
| Ethereum, Deno JS         | out of scope (documented)                  |

The CDC replay source (cdc.py) doubles as the test harness equivalent of
the reference's SQLite-changelog replay (dozer-tests logic_test.rs:81-94).
"""

from dozer_spark.sources.files import read_table, stream_table
from dozer_spark.sources.cdc import replay_changelog, changelog_batches
from dozer_spark.sources.kafka import kafka_stream, parse_debezium

__all__ = [
    "read_table",
    "stream_table",
    "replay_changelog",
    "changelog_batches",
    "kafka_stream",
    "parse_debezium",
]
