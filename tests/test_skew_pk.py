"""Tests: salted join/aggregate equivalence, PK propagation rules."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dozer_spark.operators.skew import salted_join, salted_aggregate
from dozer_spark.plans import pk as pkrules


def test_salted_join_equals_plain_join(spark, catalog):
    """Salting must not change results — only the shuffle layout."""
    o, c = catalog.df("orders"), catalog.df("customer")
    plain = o.join(c, o["o_custkey"] == c["c_custkey"]).select("o_orderkey", "c_name")
    salted = salted_join(o, c, [("o_custkey", "c_custkey")], salt=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    small = spark.createDataFrame([(1, "X")], ["k2", "w"])
    out = salted_join(big, small, [("k", "k2")], how="left", salt=4)
    got = {(r.k, r.w) for r in out.collect()}
    assert got == {(1, "X"), (2, None), (3, None)}
    with pytest.raises(ValueError, match="salt must be"):
        salted_join(big, small, [("k", "k2")], salt=1)


def test_salted_aggregate_two_phase(spark, catalog):
    li = catalog.df("lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        partial_aggs=[F.count(F.lit(1)).alias("pn"), F.sum("l_quantity").alias("ps")],
        final_aggs=[
            F.sum("pn").cast("long").alias("n"),
            F.sum("ps").alias("s"),
        ],
        salt=8,
    )
    p = {r.l_returnflag: (r.n, round(r.s, 6)) for r in plain.collect()}
    s = {r.l_returnflag: (r.n, round(r.s, 6)) for r in salted.collect()}
    assert p == s


def test_pk_rules():
    assert pkrules.join_pk(["a"], ["b", "a"]) == ["a", "b"]
    assert pkrules.group_by_pk(["g1", "g2"]) == ["g1", "g2"]
    assert pkrules.window_pk(["id"]) == ["id", "window_start"]
    assert pkrules.project_pk(["id"], ["id", "x"]) == ["id"]
    assert pkrules.project_pk(["id"], ["x"]) == []
    assert pkrules.union_pk([["id"], ["id"]]) == ["id"]
    assert pkrules.union_pk([["id"], ["k"]]) == []
    assert pkrules.filter_pk(["id"]) == ["id"]
