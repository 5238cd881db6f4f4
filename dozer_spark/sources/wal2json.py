"""Postgres logical-decoding (wal2json) -> changelog.

The reference's flagship source is Postgres snapshot + WAL CDC
(dozer-ingestion/src/lib.rs:51-64; the connector speaks the streaming
replication protocol directly). In Spark, the snapshot half is the
partitioned JDBC read (sources/jdbc.py); the WAL half lands here: parse
the PUBLIC wal2json output format (format-version 2 — one JSON object
per change: action I/U/D/B/C, schema, table, columns[{name,type,value}],
identity[{name,value}] for the old key) into the engine changelog.

Transport is pluggable by design — pg_recvlogical piping to files, a
Kafka topic, or any log shipper; the engine consumes the records from
whatever file/stream source delivers them. This mirrors the Debezium
envelope path (sources/kafka.py:44) but with no Kafka/Debezium
dependency: wal2json is a stock Postgres plugin and pg_recvlogical a
stock client.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_W2J_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.StringType()),
        T.StructField("xid", T.LongType()),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "identity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _col_value(arr_col: str, name: str) -> F.Column:
    """Value of the named column inside a wal2json columns/identity array."""
    # try_element_at: a record may omit the column entirely (e.g. a D
    # record's `columns`, or non-identity columns in `identity`)
    return F.try_element_at(
        F.filter(F.col(arr_col), lambda c: c["name"] == F.lit(name)), F.lit(1)
    )["value"]


def _lsn_seq() -> F.Column:
    """WAL position as an orderable BIGINT: 'X/Y' hex halves -> (X<<32)|Y.

    This is the change's REAL log order (the reference resumes from
    exactly this LSN). monotonically_increasing_id would order by
    partition layout instead — two ops on the same PK inside one
    transaction (DELETE then re-INSERT) could replay reversed and
    last-op-wins would materialize the wrong image.
    """
    hi = F.conv(F.split(F.col("r.lsn"), "/")[0], 16, 10).cast("long")
    lo = F.conv(F.split(F.col("r.lsn"), "/")[1], 16, 10).cast("long")
    return F.coalesce(
        F.shiftleft(hi, 32) + lo, F.lit(0).cast("long")
    )


def wal2json_changelog(raw: DataFrame, value_col: str, table: str,
                       columns: dict[str, str],
                       pk: list[str] | None = None) -> DataFrame:
    """Parse wal2json v2 records for one table into the changelog.

    raw: DataFrame with a string column `value_col` holding one wal2json
    JSON object per row (as emitted by pg_recvlogical --format-version 2
    or the wal2json Kafka bridge). columns: output name -> Spark type DDL
    (values arrive as JSON strings/numbers; each is cast explicitly —
    the reference's connector does the same pg-type -> Field mapping,
    dozer-ingestion/postgres/ helpers).

    Delete records carry only the REPLICA IDENTITY columns; those are
    taken from `identity` and the remaining columns are NULL (PK-only
    old image, resolved downstream by PK like every delete).

    pk: the table's key columns. A PK-CHANGING update (identity values
    differ from the new image's key) is split into D(old identity image)
    + I(new image) — a single U keyed by the new PK would strand the old
    PK's row in every downstream snapshot forever. The reference builds
    Operation::Update{old,new} from the replica identity for exactly
    this case. __seq stays LSN-ordered; the D half sorts before the I
    half at the same LSN.
    """
    p = raw.select(F.from_json(F.col(value_col), _W2J_SCHEMA).alias("r"))
    p = p.filter(
        (F.col("r.table") == table) & F.col("r.action").isin("I", "U", "D")
    )

    pk_changed = F.lit(False)
    for k in pk or []:
        ident_k = _col_value("r.identity", k)
        new_k = _col_value("r.columns", k)
        pk_changed = pk_changed | (
            ident_k.isNotNull() & ~ident_k.eqNullSafe(new_k)
        )
    pk_changed = (F.col("r.action") == "U") & pk_changed

    # one output row per record, except PK-changing U -> two (D then I)
    p = p.withColumn(
        "__role",
        F.explode(
            F.when(pk_changed, F.array(F.lit("D"), F.lit("I")))
            .otherwise(F.array(F.lit("_")))
        ),
    )
    op = F.when(F.col("__role") == "_", F.col("r.action")).otherwise(F.col("__role"))

    def out_col(name: str, ddl: str) -> F.Column:
        ins = _col_value("r.columns", name)
        ident = _col_value("r.identity", name)
        v = (
            # split-off D half of a PK-changing U: the OLD image is the
            # replica identity only — new-image values must not leak
            # into non-identity columns of the delete row
            F.when(F.col("__role") == "D", ident)
            .when(F.col("r.action") == "D", F.coalesce(ident, ins))
            .otherwise(ins)
        )
        return v.cast(ddl).alias(name)

    # 2*lsn so the split halves get distinct, correctly-ordered seqs
    seq = _lsn_seq() * 2 + F.when(F.col("__role") == "I", 1).otherwise(0)
    return p.select(
        op.alias("__op"),
        F.coalesce(F.col("r.xid"), F.lit(0)).alias("__txid"),
        seq.alias("__seq"),
        *[out_col(n, d) for n, d in columns.items()],
    )
