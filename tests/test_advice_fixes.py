"""Regression tests for the round-1 ADVICE findings:

1. RetractingAggregation must treat NULL group keys as one ordinary group
   (SQL GROUP BY semantics — the reference's aggregation processor keys
   its state map by the group Field values, NULL included).
2. RetractingUnion must not strand value rows containing NULL columns.
3. salted_join must reject right/full joins (small side is replicated).
4. changelog_filter with a prior snapshot resolves cross-batch old images.
5. brute_force_topk_fast works with non-integer (string) id columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from dozer_spark.streaming import RetractingAggregation, changelog_filter
from dozer_spark.streaming.setops import RetractingUnion
from dozer_spark.operators.skew import salted_join
from dozer_spark.ops.similarity import brute_force_topk, brute_force_topk_fast


def _cl(spark, rows):
    """rows: (op, txid, seq, id, grp, amount)"""
    schema = T.StructType(
        [
            T.StructField("__op", T.StringType()),
            T.StructField("__txid", T.LongType()),
            T.StructField("__seq", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


class TestNullGroupKeys:
    def _ragg(self, spark):
        return RetractingAggregation(
            spark,
            pk=["id"],
            group_by=["grp"],
            aggs=[F.sum("amount").alias("s"), F.count(F.lit(1)).cast("long").alias("n")],
        )

    @pytest.mark.slow
    def test_null_group_appears_and_updates(self, spark):
        ragg = self._ragg(spark)
        out1 = ragg.process_batch(_cl(spark, [("I", 1, 1, 1, None, 10.0)]))
        assert [(r["__op"], r.grp, r.s) for r in out1.collect()] == [("I", None, 10.0)]

        # second row into the NULL group -> single U, not D+I or nothing
        out2 = ragg.process_batch(_cl(spark, [("I", 2, 1, 2, None, 5.0)]))
        assert [(r["__op"], r.grp, r.s, r.n) for r in out2.collect()] == [
            ("U", None, 15.0, 2)
        ]

    def test_null_group_deletes_to_empty(self, spark):
        ragg = self._ragg(spark)
        ragg.process_batch(_cl(spark, [("I", 1, 1, 1, None, 10.0)]))
        out = ragg.process_batch(_cl(spark, [("D", 2, 1, 1, None, 10.0)]))
        assert [(r["__op"], r.grp) for r in out.collect()] == [("D", None)]
        assert ragg.current().count() == 0

    def test_key_change_null_to_value(self, spark):
        ragg = self._ragg(spark)
        ragg.process_batch(_cl(spark, [("I", 1, 1, 1, None, 10.0)]))
        out = ragg.process_batch(_cl(spark, [("U", 2, 1, 1, "a", 10.0)]))
        got = {(r["__op"], r.grp) for r in out.collect()}
        assert got == {("D", None), ("I", "a")}
        cur = {r.grp: r.s for r in ragg.current().collect()}
        assert cur == {"a": 10.0}


class TestNullUnionValues:
    @pytest.mark.slow
    def test_null_value_rows_flow_through(self, spark):
        u = RetractingUnion(spark, pks=[["id"], ["id"]], value_cols=["val"])
        schema = T.StructType(
            [
                T.StructField("__op", T.StringType()),
                T.StructField("__txid", T.LongType()),
                T.StructField("__seq", T.LongType()),
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
            ]
        )
        a1 = spark.createDataFrame([("I", 1, 1, 1, None)], schema)
        b1 = spark.createDataFrame([], schema)
        out1 = u.process_batch([a1, b1])
        assert [(r["__op"], r.val) for r in out1.collect()] == [("I", None)]

        # same NULL value arrives on input 2 -> count 1->2, nothing emitted
        b2 = spark.createDataFrame([("I", 2, 1, 7, None)], schema)
        out2 = u.process_batch([None, b2])
        assert out2.count() == 0

        # remove one holder -> still present, nothing; remove last -> Delete
        a3 = spark.createDataFrame([("D", 3, 1, 1, None)], schema)
        out3 = u.process_batch([a3, None])
        assert out3.count() == 0
        b4 = spark.createDataFrame([("D", 4, 1, 7, None)], schema)
        out4 = u.process_batch([None, b4])
        assert [(r["__op"], r.val) for r in out4.collect()] == [("D", None)]


def test_salted_join_rejects_right_full(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, small, on=[("k", "k")], how=how)
    # inner/left still fine
    assert salted_join(df, small, on=[("k", "k")], how="inner").count() == 3


def test_changelog_filter_prior_snapshot(spark):
    """A micro-batch U whose old image lives in an earlier batch: without
    `prior` the op degrades to I; with `prior` it resolves correctly."""
    schema = T.StructType(
        [
            T.StructField("__op", T.StringType()),
            T.StructField("__txid", T.LongType()),
            T.StructField("__seq", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    batch1 = spark.createDataFrame([("I", 1, 1, 1, 100), ("I", 1, 2, 2, 5)], schema)
    prior = batch1.filter(F.col("__op") != "D").drop("__op", "__txid", "__seq")
    pred = F.col("v") >= 50

    # batch 2: id=1 drops below the filter (U 100->10); id=2 enters (U 5->80)
    batch2 = spark.createDataFrame([("U", 2, 1, 1, 10), ("U", 2, 2, 2, 80)], schema)
    out = changelog_filter(batch2, ["id"], pred, prior=prior)
    got = sorted((r["__op"], r.id) for r in out.collect())
    assert got == [("D", 1), ("I", 2)]

    # without prior: the leaves-filter U is invisible (pred_old unknown ->
    # treated False) and the enters-filter U still emits I — documented gap
    out_np = changelog_filter(batch2, ["id"], pred)
    got_np = sorted((r["__op"], r.id) for r in out_np.collect())
    assert got_np == [("I", 2)]


def test_brute_force_fast_string_ids(spark):
    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.0, 0.0]),
            ("b", [0.9, 0.1, 0.0]),
            ("c", [0.0, 1.0, 0.0]),
            ("d", [0.0, 0.9, 0.1]),
        ],
        T.StructType(
            [
                T.StructField("doc", T.StringType()),
                T.StructField("vec", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    queries = emb.filter(F.col("doc").isin("a", "c"))
    fast = brute_force_topk_fast(emb, queries, "vec", "doc", k=2)
    slow = brute_force_topk(emb, queries, "vec", "doc", k=2)
    f = sorted((r.query_id, r.neighbor_id, r.rank) for r in fast.collect())
    s = sorted((r.query_id, r.neighbor_id, r.rank) for r in slow.collect())
    assert f == s
    assert ("a", "b", 1) in f


class TestAggregationNullVectors:
    """Ported from the reference's aggregation_null.rs: NULL group keys
    (already covered above per test_sum_aggregation_null), NULL VALUES
    inside aggregates, and the delete-to-empty / re-insert cycle
    (test_sum_aggregation_del_and_insert)."""

    def _ragg(self, spark):
        return RetractingAggregation(
            spark,
            pk=["id"],
            group_by=["grp"],
            aggs=[
                F.sum("amount").alias("s"),
                F.count("amount").cast("long").alias("n_vals"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            ],
        )

    @pytest.mark.slow
    def test_null_values_skipped_by_sum_and_count_col(self, spark):
        ragg = self._ragg(spark)
        out = ragg.process_batch(
            _cl(spark, [("I", 1, 1, 1, "it", 100.0), ("I", 1, 2, 2, "it", None)])
        )
        # SQL semantics both engines share: SUM/COUNT(col) skip NULLs,
        # COUNT(*) does not
        assert [(r["__op"], r.s, r.n_vals, r.n_rows) for r in out.collect()] == [
            ("I", 100.0, 1, 2)
        ]
        # deleting the NULL-valued row changes only COUNT(*)
        out2 = ragg.process_batch(_cl(spark, [("D", 2, 1, 2, "it", None)]))
        assert [(r["__op"], r.s, r.n_vals, r.n_rows) for r in out2.collect()] == [
            ("U", 100.0, 1, 1)
        ]

    @pytest.mark.slow
    def test_delete_to_empty_then_reinsert(self, spark):
        """aggregation_null.rs test_sum_aggregation_del_and_insert: the
        group vanishes (D) on its last delete and returns (I) on
        re-insert — state must not remember the dead group."""
        ragg = self._ragg(spark)
        ragg.process_batch(_cl(spark, [("I", 1, 1, 1, "it", 100.0)]))
        out = ragg.process_batch(_cl(spark, [("D", 2, 1, 1, "it", 100.0)]))
        assert [(r["__op"], r.grp) for r in out.collect()] == [("D", "it")]
        assert ragg.current().count() == 0
        out2 = ragg.process_batch(_cl(spark, [("I", 3, 1, 1, "it", 100.0)]))
        assert [(r["__op"], r.grp, r.s) for r in out2.collect()] == [("I", "it", 100.0)]
