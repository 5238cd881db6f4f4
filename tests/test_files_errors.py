"""Malformed-record policy + changelog projection tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType, StructField, LongType, StringType

from dozer_spark.sources.files import read_table
from dozer_spark.streaming.changelog import changelog_project

SCHEMA = StructType([StructField("id", LongType()), StructField("v", StringType())])


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,v\n1,a\nnot_a_number,b\n3,c\n")
    return str(p)


def test_bad_records_fail(spark, bad_csv):
    df = read_table(spark, bad_csv, "csv", schema=SCHEMA, bad_records="fail")
    with pytest.raises(Exception):
        df.collect()


def test_bad_records_drop(spark, bad_csv):
    df = read_table(spark, bad_csv, "csv", schema=SCHEMA, bad_records="drop")
    assert {r.id for r in df.collect()} == {1, 3}


def test_bad_records_permissive(spark, bad_csv):
    df = read_table(spark, bad_csv, "csv", schema=SCHEMA, bad_records="permissive")
    rows = df.collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r.id is None) == 1  # bad field nulled, row kept


def test_bad_records_invalid_mode(spark, bad_csv):
    with pytest.raises(ValueError, match="bad_records"):
        read_table(spark, bad_csv, "csv", schema=SCHEMA, bad_records="explode")


def test_changelog_project_keeps_ops(spark):
    cl = spark.createDataFrame(
        [("I", 1, 1, 1, 10.0), ("D", 2, 1, 1, 10.0)],
        ["__op", "__txid", "__seq", "id", "amount"],
    )
    out = changelog_project(cl, "id", (F.col("amount") * 2).alias("doubled"))
    rows = [(r["__op"], r.id, r.doubled) for r in out.orderBy("__txid").collect()]
    assert rows == [("I", 1, 20.0), ("D", 1, 20.0)]
    assert out.columns == ["__op", "__txid", "__seq", "id", "doubled"]
