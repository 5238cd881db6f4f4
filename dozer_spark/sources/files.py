"""Object-store file sources (parquet/CSV/JSON), batch and streaming.

Reference: the object-store connector lists tables and tails new files
(dozer-ingestion/src/lib.rs:113-120, DataFusion-backed). Spark's file
source does the same natively: `readStream` watches a directory,
maxFilesPerTrigger bounds each micro-batch, checkpointLocation persists
the file-position "resume state" the reference keeps via OpIdentifier
(connector/src/lib.rs:61-67).

Scale notes: prefer parquet with partitioned layout — partition pruning +
pushed filters reach the scan (check .explain for PushedFilters /
PartitionFilters). For CSV always pass an explicit schema: schema
inference is a full extra pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = {"parquet", "csv", "json"}


# Error policy for malformed records, mirroring the reference's
# ErrorManager (dozer-core/src/error_manager.rs:29-41 — default threshold
# 0 = first error panics; configurable tolerance):
#   fail       -> FAILFAST  (the reference default)
#   drop       -> DROPMALFORMED (tolerate by skipping)
#   permissive -> PERMISSIVE (null out bad fields, keep the row)
BAD_RECORDS_MODES = {"fail": "FAILFAST", "drop": "DROPMALFORMED", "permissive": "PERMISSIVE"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    bad_records: str = "fail",
    **options,
) -> DataFrame:
    """Batch snapshot read of a file table."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (one of {sorted(FORMATS)})")
    if bad_records not in BAD_RECORDS_MODES:
        raise ValueError(f"bad_records must be one of {sorted(BAD_RECORDS_MODES)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt in ("csv", "json"):
        options.setdefault("mode", BAD_RECORDS_MODES[bad_records])
    return reader.options(**options).load(path)


def stream_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Streaming tail of a file directory (new files become micro-batches).

    Schema is required for streaming sources (Spark cannot infer on an
    unbounded input); pass the batch read's schema when unsure.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (one of {sorted(FORMATS)})")
    if schema is None:
        raise ValueError("streaming file sources require an explicit schema")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    if max_files_per_trigger is not None:
        options["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return reader.options(**options).load(path)
