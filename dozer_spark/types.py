"""dozer FieldType <-> Spark type mapping.

Reference type system: 17 runtime Field variants
(dozer-types/src/types/field.rs:23-41) with declared FieldType
(field.rs:870-905). Mapping decisions (SURVEY.md section 1.2):

- UInt(u64)/Int(i64)     -> LongType  (unsigned caveat documented)
- U128/I128              -> DecimalType(38, 0)
- Int8                   -> ByteType
- Float (f64 OrderedFloat)-> DoubleType
- Decimal (96-bit, s<=28) -> DecimalType(38, s)
- Timestamp (tz, ns)     -> TimestampType (micros; ns precision loss noted)
- Json                   -> StringType (queried via get_json_object)
- Point                  -> StructType{x: double, y: double}
  (dozer-types/src/types/mod.rs:467)
- Duration (ns)          -> DayTimeIntervalType

Nullability is per-field metadata in the reference
(FieldDefinition.nullable, dozer-types/src/types/mod.rs:50-57) — mapped to
StructField.nullable.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum

from pyspark.sql import types as T


class FieldType(str, Enum):
    """Mirrors dozer-types/src/types/field.rs:870-905."""

    UINT = "uint"
    U128 = "u128"
    INT = "int"
    INT8 = "int8"
    I128 = "i128"
    FLOAT = "float"
    BOOLEAN = "boolean"
    STRING = "string"
    TEXT = "text"
    BINARY = "binary"
    DECIMAL = "decimal"
    TIMESTAMP = "timestamp"
    DATE = "date"
    JSON = "json"
    POINT = "point"
    DURATION = "duration"


POINT_TYPE = T.StructType(
    [T.StructField("x", T.DoubleType(), False), T.StructField("y", T.DoubleType(), False)]
)


def to_spark_type(ft: FieldType, *, decimal_scale: int = 10) -> T.DataType:
    """Map a dozer FieldType to its Spark DataType (SURVEY.md 1.2 table)."""
    mapping: dict[FieldType, T.DataType] = {
        FieldType.UINT: T.LongType(),
        FieldType.U128: T.DecimalType(38, 0),
        FieldType.INT: T.LongType(),
        FieldType.INT8: T.ByteType(),
        FieldType.I128: T.DecimalType(38, 0),
        FieldType.FLOAT: T.DoubleType(),
        FieldType.BOOLEAN: T.BooleanType(),
        FieldType.STRING: T.StringType(),
        FieldType.TEXT: T.StringType(),
        FieldType.BINARY: T.BinaryType(),
        FieldType.DECIMAL: T.DecimalType(38, decimal_scale),
        FieldType.TIMESTAMP: T.TimestampType(),
        FieldType.DATE: T.DateType(),
        FieldType.JSON: T.StringType(),
        FieldType.POINT: POINT_TYPE,
        FieldType.DURATION: T.DayTimeIntervalType(),
    }
    return mapping[ft]


def from_spark_type(dt: T.DataType) -> FieldType:
    """Best-effort inverse mapping (used when registering external tables)."""
    if isinstance(dt, (T.ByteType,)):
        return FieldType.INT8
    if isinstance(dt, (T.ShortType, T.IntegerType, T.LongType)):
        return FieldType.INT
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return FieldType.FLOAT
    if isinstance(dt, T.BooleanType):
        return FieldType.BOOLEAN
    if isinstance(dt, T.StringType):
        return FieldType.STRING
    if isinstance(dt, T.BinaryType):
        return FieldType.BINARY
    if isinstance(dt, T.DecimalType):
        return FieldType.DECIMAL
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return FieldType.TIMESTAMP
    if isinstance(dt, T.DateType):
        return FieldType.DATE
    if isinstance(dt, T.DayTimeIntervalType):
        return FieldType.DURATION
    if isinstance(dt, T.StructType) and [f.name for f in dt.fields] == ["x", "y"]:
        return FieldType.POINT
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return FieldType.JSON
    raise ValueError(f"no dozer FieldType for spark type {dt}")


@dataclass
class FieldDef:
    """Mirrors FieldDefinition (dozer-types/src/types/mod.rs:50-57)."""

    name: str
    typ: FieldType
    nullable: bool = True
    source: str | None = None  # SourceDefinition provenance (mod.rs:37-47)


@dataclass
class TableSchema:
    """Mirrors Schema (dozer-types/src/types/mod.rs:80-91).

    primary_index holds column *names* (the reference uses positions);
    empty => insert-only (Update/Delete unsupported, mod.rs:86-89).
    """

    fields: list[FieldDef] = dc_field(default_factory=list)
    primary_index: list[str] = dc_field(default_factory=list)

    @property
    def is_append_only(self) -> bool:
        return not self.primary_index

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, to_spark_type(f.typ), f.nullable) for f in self.fields]
        )
