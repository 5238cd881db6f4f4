"""Table registry with primary-key metadata.

Spark has no native PK concept; the reference's PK is load-bearing
(dozer-types/src/types/mod.rs:86-89 — without it Update/Delete are
unsupported; joins key state by PK hash, GROUP BY sets output PK to the
group columns, TUMBLE/HOP extend the PK with window_start). We carry the
same metadata here so streaming MERGE sinks and changelog operators know
what to upsert on (SURVEY.md section 1.4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dozer_spark.types import FieldDef, TableSchema, from_spark_type

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Driver-provided synthetic corpus (TESTDATA.md) with PK declarations.
TESTDATA_PKS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


# Columns stored as parquet TIMESTAMP(NANOS) cannot be read natively by
# Spark (PARQUET_TYPE_ILLEGAL). We read them as long via the legacy conf
# and convert ns -> microsecond timestamp_ntz (integer division — double
# math would lose precision on ~1.7e18 ns epochs).


def _nanos_ts_cols(path: str) -> list[str]:
    """Detect TIMESTAMP(NANOS) columns from the parquet footer."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


@dataclass
class TableEntry:
    name: str
    df: DataFrame
    schema: TableSchema
    path: str | None = None


@dataclass
class Catalog:
    """Named tables + PK metadata; mirrors the role of dozer's
    connector-derived schema registry (Connector::get_schemas,
    dozer-ingestion/connector/src/lib.rs:83-86)."""

    spark: SparkSession
    tables: dict[str, TableEntry] = field(default_factory=dict)

    def register(self, name: str, df: DataFrame, pk: list[str] | None = None,
                 path: str | None = None, as_view: bool = True) -> TableEntry:
        fields = [
            FieldDef(f.name, from_spark_type(f.dataType), f.nullable)
            for f in df.schema.fields
        ]
        entry = TableEntry(name, df, TableSchema(fields, pk or []), path)
        self.tables[name] = entry
        if as_view:
            df.createOrReplaceTempView(name)
        return entry

    def df(self, name: str) -> DataFrame:
        if name not in self.tables:
            raise KeyError(
                f"table {name!r} not registered (loaded: {sorted(self.tables)}); "
                "check the sf_dir path and that <table>.parquet exists"
            )
        return self.tables[name].df

    def has(self, name: str) -> bool:
        return name in self.tables

    def names(self) -> list[str]:
        return list(self.tables)

    def pk(self, name: str) -> list[str]:
        return self.tables[name].schema.primary_index

    @classmethod
    def from_testdata(cls, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                      tables: list[str] | None = None) -> "Catalog":
        """Load the driver's parquet corpus (TESTDATA.md) and register
        each table as a temp view with its PK."""
        # The caller's session may not be ours (the driver builds its own):
        # pin UTC so epoch math (window bucketing, TTL cutoffs) is
        # deterministic regardless of host timezone. Runtime-settable conf.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
        cat = cls(spark)
        for name in tables or list(TESTDATA_PKS):
            path = os.path.join(sf_dir, f"{name}.parquet")
            if not os.path.exists(path):
                continue
            df = load_parquet(spark, path, name)
            cat.register(name, df, pk=TESTDATA_PKS.get(name), path=path)
        return cat


def load_parquet(spark: SparkSession, path: str, name: str | None = None) -> DataFrame:
    """Read a parquet table, normalizing ns timestamps to timestamp_ntz."""
    ns_cols = _nanos_ts_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F  # local import to keep module light

    for c in ns_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Convenience: name -> DataFrame for the driver corpus, views registered."""
    cat = Catalog.from_testdata(spark, sf_dir)
    return {n: e.df for n, e in cat.tables.items()}
