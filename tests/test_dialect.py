"""Dialect translation tests — SQL shapes drawn from the reference's own
test corpus (dozer-tests/src/sql_tests/full/*.test and
dozer-sql/src/tests/builder_test.rs:228)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dozer_spark.plans import rewrite_statement, split_into, statement_to_dataframe
from dozer_spark.plans.dialect import find_table_ops, rewrite_functions


def test_split_into():
    sql, name = split_into("SELECT a FROM t INTO out")
    assert sql == "SELECT a FROM t" and name == "out"
    sql2, name2 = split_into("SELECT a FROM t")
    assert name2 is None
    # INTO inside a string literal must not trigger
    sql3, name3 = split_into("SELECT 'INTO x' AS s FROM t")
    assert name3 is None


def test_rewrite_functions():
    assert rewrite_functions("SELECT UCASE(name) FROM t") == "SELECT upper(name) FROM t"
    assert (
        rewrite_functions("SELECT MAX_VALUE(price, id) FROM t")
        == "SELECT max_by(id, price) FROM t"
    )
    assert (
        rewrite_functions("SELECT TO_CHAR(ts, '%Y-%m-%d') FROM t")
        == "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    )
    assert (
        rewrite_functions("SELECT JSON_VALUE(j, 'a.b') FROM t")
        == "SELECT get_json_object(j, '$.a.b') FROM t"
    )
    # nested
    out = rewrite_functions("SELECT UCASE(TO_CHAR(ts, '%Y')) FROM t")
    assert out == "SELECT upper(date_format(ts, 'yyyy')) FROM t"


def test_parse_nested_table_ops():
    # reference shape: dozer-sql/src/tests/builder_test.rs:228
    sql = "SELECT COUNT(*) FROM TTL(TUMBLE(users, ts, '5 MINUTES'), ts, '1 MINUTE') GROUP BY window_start"
    ops = find_table_ops(sql)
    assert len(ops) == 1
    top = ops[0]
    assert top.source == "users"
    assert top.ops == [("tumble", "ts", "5 MINUTES"), ("ttl", "ts", "1 MINUTE")]


def test_rewrite_statement_combines():
    sql = "SELECT window_start, COUNT(*) FROM TUMBLE(events, ts, '1 HOUR') GROUP BY window_start INTO agg_out"
    spark_sql, into, ops = rewrite_statement(sql)
    assert into == "agg_out"
    assert "__top_0__" in spark_sql and "TUMBLE" not in spark_sql.upper()
    assert ops[0].source == "events"


def test_statement_to_dataframe_end_to_end(spark, catalog):
    df, into = statement_to_dataframe(
        spark,
        """
        SELECT window_start, event_type, COUNT(*) AS n, MAX_VALUE(value, event_id) AS id_at_max
        FROM TUMBLE(events, ts, '6 HOURS')
        GROUP BY window_start, event_type
        HAVING COUNT(*) > 1
        INTO out_table
        """,
        catalog,
    )
    assert into == "out_table"
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"window_start", "event_type", "n", "id_at_max"}
    assert all(r.n > 1 for r in rows)


def test_statement_hop_ttl(spark, catalog):
    df, _ = statement_to_dataframe(
        spark,
        "SELECT window_start, COUNT(*) AS n FROM TTL(HOP(events, ts, '3 HOURS', '6 HOURS'), ts, '14 DAYS') GROUP BY window_start",
        catalog,
    )
    assert df.count() > 0


def test_statement_join_union_passthrough(spark, catalog):
    df, _ = statement_to_dataframe(
        spark,
        """
        WITH eu AS (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        SELECT c.c_custkey, UCASE(c.c_name) AS cname
        FROM customer c JOIN eu ON c.c_nationkey = eu.n_nationkey
        """,
        catalog,
    )
    assert df.count() > 0
    assert df.columns == ["c_custkey", "cname"]


def test_beyond_parity_accepted(spark, catalog):
    """Reference rejects ORDER BY / LIMIT (builder/mod.rs:133-143); we accept."""
    df, _ = statement_to_dataframe(
        spark, "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 5", catalog
    )
    assert df.count() == 5


def test_tumble_inside_join_clause(spark, catalog):
    """Table operators are usable anywhere a table can appear, including
    the right side of a JOIN."""
    df, _ = statement_to_dataframe(
        spark,
        """
        SELECT w.window_start, COUNT(*) AS n
        FROM nation n JOIN TUMBLE(events, ts, '12 HOURS') w
          ON (w.user_id % 25) = n.n_nationkey
        GROUP BY w.window_start
        """,
        catalog,
    )
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "n"}


def test_concurrent_statement_builds_do_not_clobber(spark, catalog):
    """Unique per-statement view names: building a second statement before
    collecting the first must not redefine its TUMBLE view."""
    df1, _ = statement_to_dataframe(
        spark, "SELECT COUNT(*) AS n FROM TUMBLE(events, ts, '1 HOUR')", catalog
    )
    df2, _ = statement_to_dataframe(
        spark, "SELECT COUNT(*) AS n FROM TUMBLE(events, ts, '9999 HOURS')", catalog
    )
    # collect AFTER both builds: with shared view names df1 would now see
    # the 9999-hour windows
    n1, n2 = df1.first().n, df2.first().n
    assert n1 == n2 == catalog.df("events").count()
    w1, _ = statement_to_dataframe(
        spark, "SELECT DISTINCT window_end FROM TUMBLE(events, ts, '1 HOUR')", catalog
    )
    w2, _ = statement_to_dataframe(
        spark, "SELECT DISTINCT window_end FROM TUMBLE(events, ts, '9999 HOURS')", catalog
    )
    assert w1.count() != w2.count()  # genuinely different windows


def test_rewrite_all_any():
    from dozer_spark.plans.dialect import rewrite_all_any

    assert rewrite_all_any("SELECT 1 WHERE x > ALL (SELECT c FROM t)") == (
        "SELECT 1 WHERE x > (SELECT MAX(__v) FROM (SELECT c FROM t) AS __allany(__v))"
    )
    assert rewrite_all_any("x < all (SELECT c FROM t)") == (
        "x < (SELECT MIN(__v) FROM (SELECT c FROM t) AS __allany(__v))"
    )
    assert rewrite_all_any("x >= ANY (SELECT c FROM t)") == (
        "x >= (SELECT MIN(__v) FROM (SELECT c FROM t) AS __allany(__v))"
    )
    assert rewrite_all_any("x = ANY (SELECT c FROM t)") == "x IN (SELECT c FROM t)"
    assert rewrite_all_any("x = SOME (SELECT c FROM t)") == "x IN (SELECT c FROM t)"
    assert rewrite_all_any("x <> ALL (SELECT c FROM t)") == "x NOT IN (SELECT c FROM t)"
    # no quantifier: untouched (including column named ALLOWED)
    s = "SELECT ALLOWED(x) FROM t WHERE y > 1"
    assert rewrite_all_any(s) == s
    with pytest.raises(ValueError, match="unsupported quantified"):
        rewrite_all_any("x = ALL (SELECT c FROM t)")


def test_all_any_end_to_end(spark, catalog):
    df, _ = statement_to_dataframe(
        spark,
        "SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders "
        "                          WHERE o_orderstatus = 'P')",
        catalog,
    )
    # equivalent scalar-subquery formulation
    ref, _ = statement_to_dataframe(
        spark,
        "SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders "
        "                      WHERE o_orderstatus = 'P')",
        catalog,
    )
    assert sorted(r.o_orderkey for r in df.collect()) == sorted(
        r.o_orderkey for r in ref.collect()
    )
    assert df.count() > 0
