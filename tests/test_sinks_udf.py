"""Tests for sinks and UDF registration."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from dozer_spark.sinks import write_table, ClickHouseSink
from dozer_spark.functions.udf import register_python_udf, register_onnx_udf


def test_write_table_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)], ["id", "grp", "v"]
    )
    p = str(tmp_path / "out")
    write_table(df, p, partition_by=["grp"], target_files=2)
    back = spark.read.parquet(p)
    assert back.count() == 3
    # partition pruning: only grp=a files are scanned
    pruned = back.filter(F.col("grp") == "a")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="unsupported sink format"):
        write_table(df, p, fmt="avro2")


def test_clickhouse_sink_options():
    ch = ClickHouseSink(url="jdbc:clickhouse://h:8123/db", table="t", batch_size=5)
    opts = ch.options()
    assert opts["batchsize"] == "5" and opts["isolationLevel"] == "NONE"
    assert callable(ch.foreach_batch())


def test_register_python_udf_vectorized(spark):
    register_python_udf(spark, "plus_one_t", lambda x: x + 1, T.LongType())
    out = spark.sql("SELECT plus_one_t(id) AS o FROM range(3)").collect()
    assert [r.o for r in out] == [1, 2, 3]


def test_register_python_udf_multiarg_and_scalar(spark):
    register_python_udf(spark, "addxy_t", lambda x, y: x * 10 + y, T.LongType())
    out = spark.sql("SELECT addxy_t(id, id) AS o FROM range(3)").collect()
    assert [r.o for r in out] == [0, 11, 22]
    register_python_udf(spark, "slow_neg_t", lambda x: -x, T.LongType(), vectorize=False)
    out2 = spark.sql("SELECT slow_neg_t(id) AS o FROM range(3)").collect()
    assert [r.o for r in out2] == [0, -1, -2]


def test_onnx_udf_with_fake_runner(spark):
    """Plumbing test: batch assembly, shape handling, column output."""
    register_onnx_udf(
        spark, "fake_model_t", "/nonexistent.onnx", n_inputs=2,
        runner=lambda batch: batch.sum(axis=1, keepdims=True) * 2.0,
    )
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], ["a", "b"])
    df.createOrReplaceTempView("onnx_in_t")
    out = spark.sql("SELECT fake_model_t(a, b) AS s FROM onnx_in_t").collect()
    assert [r.s for r in out] == [6.0, 14.0]


def test_onnx_udf_without_runtime_raises(spark):
    register_onnx_udf(spark, "real_model_t", "/nonexistent.onnx", n_inputs=1)
    df = spark.createDataFrame([(1.0,)], ["a"])
    df.createOrReplaceTempView("onnx_in2_t")
    with pytest.raises(Exception, match="onnxruntime|NotImplementedError"):
        spark.sql("SELECT real_model_t(a) AS s FROM onnx_in2_t").collect()