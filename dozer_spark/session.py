"""SparkSession factory with defaults tuned for both local testing and
large-cluster execution.

The reference engine is a single process with bounded channels
(dozer-core/src/executor/mod.rs:19-32 — 20k-op channel capacity is its only
backpressure mechanism). Spark gives us real distribution; the configs here
are the knobs that matter at 100 TB:

- AQE on: runtime re-planning (skew-join splitting, dynamic coalescing of
  shuffle partitions) replaces hand-tuning per query.
- adaptive skew join: dozer has no answer to skewed keys (its hash join
  state is one in-memory map, dozer-sql/src/product/join/operator/table.rs);
  AQE splits oversized partitions automatically.
- Arrow-enabled pandas UDFs: the only sanctioned Python-side path.
- session timezone UTC: deterministic timestamp semantics regardless of
  host TZ (the reference uses tz-aware ns timestamps everywhere,
  dozer-types/src/types/field.rs:896).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized so a shuffle partition of sf0.1 fits comfortably in an executor
# thread; on a real cluster these are overridden per-deploy (or left to AQE
# coalescing, which is why initialPartitionNum is set high).
_LOCAL_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "dozer_spark", *, extra_conf: dict | None = None) -> SparkSession:
    """Return (building if needed) the shared SparkSession.

    Honors SPARK_GRAFT_CPUS for local parallelism (driver contract).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- correctness-critical ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- scale / performance ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", _LOCAL_SHUFFLE_PARTITIONS)
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Arrow for any pandas-UDF path (10-100x over row-at-a-time python)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep the UI off in test harnesses
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
