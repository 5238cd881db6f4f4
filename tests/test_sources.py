"""Source tests: file sources, CDC replay, Debezium parsing, JDBC config."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType, StructField, LongType, StringType, DoubleType

from dozer_spark.sources import (
    read_table,
    stream_table,
    replay_changelog,
    changelog_batches,
    parse_debezium,
)
from dozer_spark.sources.kafka import debezium_changelog
from dozer_spark.sources.jdbc import JdbcSnapshot
from dozer_spark.streaming import RetractingAggregation


def test_read_table_csv_json_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    for fmt in ["parquet", "csv", "json"]:
        p = str(tmp_path / fmt)
        df.write.format(fmt).option("header", "true").save(p)
        back = read_table(spark, p, fmt, schema=df.schema if fmt != "parquet" else None)
        assert {(r.id, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "x", "orc2")


def test_stream_table_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        stream_table(spark, str(tmp_path), "parquet")


def test_changelog_batches_ordered(spark):
    cl = spark.createDataFrame(
        [("I", 2, 1, 10), ("I", 1, 1, 20), ("I", 3, 1, 30)],
        ["__op", "__txid", "__seq", "id"],
    )
    batches = list(changelog_batches(cl))
    assert [b.first()["id"] for b in batches] == [20, 10, 30]


def test_replay_changelog_through_aggregation(spark):
    """The logic_test.rs-style end-to-end: replay txns, watch retractions."""
    cl = spark.createDataFrame(
        [
            ("I", 1, 1, 1, "a", 10.0),
            ("I", 1, 2, 2, "a", 5.0),
            ("U", 2, 1, 1, "a", 20.0),
            ("D", 3, 1, 1, "a", 20.0),
            ("D", 3, 2, 2, "a", 5.0),
        ],
        ["__op", "__txid", "__seq", "id", "grp", "amount"],
    )
    ragg = RetractingAggregation(
        spark, pk=["id"], group_by=["grp"], aggs=[F.sum("amount").alias("s")]
    )
    outs = [
        [(r["__op"], r.grp, r.s) for r in out.collect()]
        for out in replay_changelog(cl, ragg)
    ]
    assert outs[0] == [("I", "a", 15.0)]
    assert outs[1] == [("U", "a", 25.0)]
    assert len(outs[2]) == 1 and outs[2][0][:2] == ("D", "a")


ROW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("balance", DoubleType()),
    ]
)


def _envelope(op, before, after, txid=7, lsn=100):
    return json.dumps(
        {
            "op": op,
            "ts_ms": 1700000000000,
            "before": before,
            "after": after,
            "source": {"txId": txid, "lsn": lsn, "ts_ms": 1700000000000},
        }
    )


def test_parse_debezium_envelope(spark):
    data = [
        (_envelope("c", None, {"id": 1, "name": "x", "balance": 5.0}),),
        (_envelope("u", {"id": 1, "name": "x", "balance": 5.0},
                   {"id": 1, "name": "x", "balance": 9.0}, txid=8, lsn=101),),
        (_envelope("d", {"id": 1, "name": "x", "balance": 9.0}, None, txid=9, lsn=102),),
    ]
    raw = spark.createDataFrame(data, ["value"])
    out = debezium_changelog(raw, ROW_SCHEMA).orderBy("__txid").collect()
    assert [(r["__op"], r["__txid"], r.id, r.balance) for r in out] == [
        ("I", 7, 1, 5.0),
        ("U", 8, 1, 9.0),   # after image
        ("D", 9, 1, 9.0),   # before image
    ]


def test_jdbc_partitioned_options():
    snap = JdbcSnapshot(
        url="jdbc:postgresql://h:5432/db", table="public.orders",
        partition_column="o_orderkey", lower_bound=0, upper_bound=1_000_000,
        num_partitions=64,
    )
    opts = snap.options()
    assert opts["numPartitions"] == "64" and opts["partitionColumn"] == "o_orderkey"
    with pytest.raises(ValueError, match="bounds"):
        JdbcSnapshot(url="u", table="t", partition_column="id").options()


def test_arrow_ingest_normalization(spark):
    import pyarrow as pa
    from dozer_spark.sources.arrow import ingest_arrow

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.uint64()),
            "small": pa.array([3, 4], pa.uint8()),
            "ts": pa.array([1_700_000_000_000_000_000, 1_700_000_001_000_000_000], pa.timestamp("ns")),
            "s": pa.array(["a", "b"], pa.large_string()),
            "v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32())),
        }
    )
    df = ingest_arrow(spark, t)
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["small"] == "int"
    assert types["ts"].startswith("timestamp")
    assert types["s"] == "string" and types["v"] == "array<float>"
    assert df.count() == 2
    # record-batch list path
    df2 = ingest_arrow(spark, t.to_batches(max_chunksize=1))
    assert df2.count() == 2
