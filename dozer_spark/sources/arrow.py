"""Arrow ingestion — the reference's gRPC Arrow adapter equivalent.

Reference: dozer's gRPC ingest accepts Arrow record batches
(dozer-ingestion/src/lib.rs:77-97; Arrow interop in
dozer-types/src/arrow_types/{to_arrow,from_arrow}.rs). Spark 4 accepts
pyarrow Tables natively in createDataFrame (zero-copy columnar transfer),
so the "adapter" is mostly schema discipline:

- ns timestamps downcast to us (Spark has no ns);
- unsigned ints widen to the next signed type (dozer UInt -> LongType,
  SURVEY 1.2);
- large_string/large_binary normalize to string/binary.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def _normalize_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_timestamp(t) and t.unit == "ns":
        return pa.timestamp("us", tz=t.tz)
    if pa.types.is_uint8(t) or pa.types.is_uint16(t):
        return pa.int32()
    if pa.types.is_uint32(t) or pa.types.is_uint64(t):
        return pa.int64()  # dozer UInt(u64) -> LongType, unsigned caveat documented
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_list(t):
        return pa.list_(_normalize_type(t.value_type))
    return t


def normalize_arrow(table: pa.Table) -> pa.Table:
    """Cast an Arrow table to a Spark-ingestible schema.

    Timestamp columns cast unsafely (ns -> us TRUNCATES sub-microsecond
    precision — the documented dozer-Timestamp(ns) -> TimestampType loss,
    SURVEY 1.2); all other columns keep safe casts so e.g. a uint64
    beyond int64 range errors instead of silently wrapping."""
    import pyarrow.compute as pc

    cols = []
    fields = []
    changed = False
    for i, f in enumerate(table.schema):
        target = _normalize_type(f.type)
        col = table.column(i)
        if target != f.type:
            changed = True
            safe = not pa.types.is_timestamp(f.type)
            col = pc.cast(col, target, safe=safe)
        cols.append(col)
        fields.append(pa.field(f.name, target, f.nullable))
    if not changed:
        return table
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))


def ingest_arrow(spark: SparkSession, table: pa.Table | list[pa.RecordBatch]) -> DataFrame:
    """Arrow table / record batches -> DataFrame (columnar transfer)."""
    if isinstance(table, list):
        table = pa.Table.from_batches(table)
    return spark.createDataFrame(normalize_arrow(table))
