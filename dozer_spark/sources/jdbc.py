"""JDBC snapshot source (Postgres/MySQL batch phase).

Reference: the Postgres connector does snapshot-then-CDC
(dozer-ingestion/src/lib.rs:51-64); the snapshot half maps to a
partitioned JDBC read here (the CDC half is a Debezium topic —
sources/kafka.py). Config-only in this container (no database), but the
partitioning math is the part that matters at scale and is unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSnapshot:
    url: str  # jdbc:postgresql://host:5432/db
    table: str
    user: str = ""
    password: str = ""
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 32
    fetch_size: int = 10_000

    def options(self) -> dict[str, str]:
        """Spark JDBC options; partitioned when bounds are provided so the
        snapshot runs as num_partitions parallel range scans instead of
        one connection (the single-threaded trap)."""
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetch_size),
        }
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("partitioned JDBC read needs lower/upper bounds")
            opts.update(
                {
                    "partitionColumn": self.partition_column,
                    "lowerBound": str(self.lower_bound),
                    "upperBound": str(self.upper_bound),
                    "numPartitions": str(self.num_partitions),
                }
            )
        return opts

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.options()).load()
