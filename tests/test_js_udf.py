"""JavaScript UDFs (the reference's Deno UDF surface re-expressed via
a sandboxed Node subprocess, Arrow-batch JSON marshalling)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

node_missing = shutil.which("node") is None
pytestmark = pytest.mark.skipif(
    node_missing, reason="no node runtime on PATH (env gate)")


def test_scalar_roundtrip(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(spark, "js_twice", "(v) => v * 2 + 1", "double",
                    allow_unsandboxed=True)
    got = spark.sql("SELECT js_twice(CAST(id AS DOUBLE)) AS r "
                    "FROM range(5) ORDER BY id").collect()
    assert [r.r for r in got] == [1.0, 3.0, 5.0, 7.0, 9.0]


def test_string_and_null_handling(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(
        spark, "js_shout",
        "(s) => s === null ? null : s.toUpperCase() + '!'",
        "string", allow_unsandboxed=True)
    df = spark.createDataFrame([("a",), (None,), ("Bc",)], "s string")
    got = [r.r for r in df.selectExpr("js_shout(s) AS r").collect()]
    assert got == ["A!", None, "BC!"]


def test_struct_arg_json_object(spark):
    """Multi-arg via struct -> JS object, the reference's JSON-arg shape."""
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(
        spark, "js_total",
        "function (row) { return row.qty * row.price; }",
        "double", allow_unsandboxed=True)
    df = spark.createDataFrame([(2, 1.5), (3, 2.0)], "qty long, price double")
    got = [r.r for r in df.selectExpr(
        "js_total(struct(qty, price)) AS r").collect()]
    assert got == [3.0, 6.0]


def test_js_error_propagates(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(spark, "js_boom", "(v) => { throw new Error('nope'); }",
                    "double", allow_unsandboxed=True)
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(Exception, match="nope"):
        df.selectExpr("js_boom(v) AS r").collect()


def test_non_function_source_fails_at_registration(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    with pytest.raises(RuntimeError, match="function"):
        register_js_udf(spark, "js_bad", "42", "double",
                        allow_unsandboxed=True)


def test_sandbox_blocks_fs_when_supported(spark):
    from dozer_spark.functions.js_udf import _sandbox_args, run_js_batch

    if not _sandbox_args():
        pytest.skip("this node lacks a permission flag")
    with pytest.raises(RuntimeError):
        run_js_batch("(v) => require('fs').readFileSync('/etc/hostname')",
                     [1])
