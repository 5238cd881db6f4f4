"""Type-coercion parity tests (execution.rs matrices) + a port of the
reference's decimal AVG retraction vector
(dozer-sql/src/aggregation/tests/aggregation_avg_tests.rs:413-560)."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from dozer_spark.functions import coercion as co
from dozer_spark.streaming import RetractingAggregation


def _types_of(spark, cols):
    df = spark.range(1).select(*cols)
    return [f.dataType for f in df.schema.fields]


class TestArithMatrix:
    def test_int_int_div_is_float(self, spark):
        a, b = F.lit(5).cast("long"), F.lit(2).cast("long")
        [dt] = _types_of(spark, [co.arith(a, T.LongType(), "/", b, T.LongType())])
        assert isinstance(dt, T.DoubleType)  # Div matrix: Int/Int -> Float
        row = spark.range(1).select(
            co.arith(a, T.LongType(), "/", b, T.LongType()).alias("v")
        ).collect()[0]
        assert row.v == 2.5

    def test_int_int_add_stays_int(self, spark):
        a, b = F.lit(5).cast("long"), F.lit(2).cast("long")
        [dt] = _types_of(spark, [co.arith(a, T.LongType(), "+", b, T.LongType())])
        assert isinstance(dt, T.LongType)

    def test_decimal_float_add_stays_decimal(self, spark):
        d = F.lit("3.50").cast("decimal(18,2)")
        f = F.lit(0.5).cast("double")
        col = co.arith(d, T.DecimalType(18, 2), "+", f, T.DoubleType())
        [dt] = _types_of(spark, [col])
        assert isinstance(dt, T.DecimalType)  # reference: Decimal, not double
        row = spark.range(1).select(col.cast("decimal(10,2)").alias("v")).collect()[0]
        assert row.v == Decimal("4.00")

    def test_decimal_div_stays_decimal(self, spark):
        d = F.lit("7.00").cast("decimal(18,2)")
        col = co.arith(d, T.DecimalType(18, 2), "/", F.lit(4), T.IntegerType())
        [dt] = _types_of(spark, [col])
        assert isinstance(dt, T.DecimalType)
        row = spark.range(1).select(col.cast("decimal(10,4)").alias("v")).collect()[0]
        assert row.v == Decimal("1.7500")

    def test_non_numeric_rejected(self, spark):
        with pytest.raises(TypeError, match="cannot apply"):
            co.arith(F.lit("x"), T.StringType(), "+", F.lit(1), T.LongType())


class TestAggReturnRules:
    def test_avg_int_returns_decimal(self, spark):
        df = spark.range(4).select(F.col("id").cast("long").alias("v"))
        out = df.agg(co.avg_agg(F.col("v"), T.LongType()).alias("a"))
        assert isinstance(out.schema["a"].dataType, T.DecimalType)
        assert out.collect()[0].a == Decimal("1.5")

    def test_avg_float_stays_float(self, spark):
        df = spark.range(4).select(F.col("id").cast("double").alias("v"))
        out = df.agg(co.avg_agg(F.col("v"), T.DoubleType()).alias("a"))
        assert isinstance(out.schema["a"].dataType, T.DoubleType)

    def test_avg_rejects_string(self, spark):
        with pytest.raises(TypeError, match="AVG over"):
            co.avg_agg(F.lit("x"), T.StringType())

    def test_count_is_long_not_null(self, spark):
        df = spark.range(3)
        out = df.agg(co.count_agg().alias("n"))
        assert isinstance(out.schema["n"].dataType, T.LongType)
        assert out.collect()[0].n == 3
        # COUNT over an empty input is 0, never NULL (execution.rs:809-816)
        out0 = spark.range(0).agg(co.count_agg().alias("n"))
        assert out0.collect()[0].n == 0


class TestDecimalAvgRetractionVector:
    """aggregation_avg_tests.rs:413-560 — decimal AVG through insert /
    update / group-move, replayed through RetractingAggregation."""

    def _cl(self, spark, rows):
        schema = T.StructType(
            [
                T.StructField("__op", T.StringType()),
                T.StructField("__txid", T.LongType()),
                T.StructField("__seq", T.LongType()),
                T.StructField("id", T.LongType()),
                T.StructField("Country", T.StringType()),
                T.StructField("Salary", T.DecimalType(18, 4)),
            ]
        )
        return spark.createDataFrame(
            [(op, t, s, i, c, Decimal(v)) for (op, t, s, i, c, v) in rows], schema
        )

    def test_vector(self, spark):
        ragg = RetractingAggregation(
            spark,
            pk=["id"],
            group_by=["Country"],
            aggs=[
                co.avg_agg(F.col("Salary"), T.DecimalType(18, 4))
                .cast(T.DecimalType(28, 8))
                .alias("avg_salary")
            ],
        )
        # Italy 100 -> I(Italy, 100)
        out = ragg.process_batch(self._cl(spark, [("I", 1, 1, 1, "Italy", "100")]))
        assert [(r["__op"], r.Country, r.avg_salary) for r in out.collect()] == [
            ("I", "Italy", Decimal("100"))
        ]
        # second Italy 100 -> avg unchanged -> NO event (the reference
        # emits a self-update; we only emit on change, documented)
        out = ragg.process_batch(self._cl(spark, [("I", 2, 1, 2, "Italy", "100")]))
        assert out.count() == 0
        # Singapore 50 -> I
        out = ragg.process_batch(self._cl(spark, [("I", 3, 1, 3, "Singapore", "50")]))
        assert [(r["__op"], r.Country, r.avg_salary) for r in out.collect()] == [
            ("I", "Singapore", Decimal("50"))
        ]
        # Singapore row moves to Italy -> D(Singapore) + U(Italy, 250/3)
        out = ragg.process_batch(self._cl(spark, [("U", 4, 1, 3, "Italy", "50")]))
        got = {(r["__op"], r.Country): r.avg_salary for r in out.collect()}
        assert set(got) == {("D", "Singapore"), ("U", "Italy")}
        assert got[("U", "Italy")] == (Decimal("250") / Decimal("3")).quantize(Decimal("1e-8"))  # 83.333...
        # Italy 100 -> 200 -> U(Italy, 350/3)
        out = ragg.process_batch(self._cl(spark, [("U", 5, 1, 1, "Italy", "200")]))
        got = [(r["__op"], r.Country, r.avg_salary) for r in out.collect()]
        assert got == [("U", "Italy", (Decimal("350") / Decimal("3")).quantize(Decimal("1e-8")))]
