"""End-to-end app-runner tests (the `dozer run` flow)."""

from __future__ import annotations

import pytest

from dozer_spark.app import run_app, _split_statements


def test_split_statements_respects_strings():
    got = _split_statements("SELECT 'a;b' AS x FROM t; SELECT 1;")
    assert got == ["SELECT 'a;b' AS x FROM t", "SELECT 1"]


def test_run_app_end_to_end(spark, tmp_path):
    out1 = str(tmp_path / "per_cust")
    out2 = str(tmp_path / "frequent")
    config = {
        "sources": {
            "orders": {"path": "/root/testdata/sf0.001/orders.parquet", "pk": ["o_orderkey"]},
            "customer": {"path": "/root/testdata/sf0.001/customer.parquet", "pk": ["c_custkey"]},
        },
        "sql": """
            SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey INTO per_cust;
            SELECT c.c_name, p.n FROM customer c JOIN per_cust p ON c.c_custkey = p.o_custkey
            WHERE p.n > 12 INTO frequent
        """,
        "sinks": {
            "per_cust": {"path": out1},
            "frequent": {"path": out2},
        },
    }
    res = run_app(spark, config)
    assert set(res.outputs) == {"per_cust", "frequent"}
    assert res.written == {"per_cust": out1, "frequent": out2}
    back = spark.read.parquet(out2)
    rows = back.collect()
    assert all(r.n > 12 for r in rows)
    assert back.columns == ["c_name", "n"]
    # chained statement consumed the first statement's INTO output
    assert spark.read.parquet(out1).count() == res.outputs["per_cust"].count()


def test_run_app_yaml_string(spark, tmp_path):
    out = str(tmp_path / "by_type")
    yaml_cfg = f"""
sources:
  events:
    path: /root/testdata/sf0.001/events.parquet
sql: |
  SELECT event_type, COUNT(*) AS n FROM TUMBLE(events, ts, '1 DAY')
  GROUP BY event_type INTO by_type
sinks:
  by_type:
    path: {out}
"""
    res = run_app(spark, yaml_cfg)
    assert spark.read.parquet(out).count() == 5


def test_run_app_errors(spark):
    with pytest.raises(ValueError, match="final statement"):
        run_app(
            spark,
            {
                "sources": {"orders": {"path": "/root/testdata/sf0.001/orders.parquet"}},
                "sql": "SELECT 1 FROM orders; SELECT 2 FROM orders INTO x",
            },
        )
    with pytest.raises(ValueError, match="unknown outputs"):
        run_app(
            spark,
            {
                "sources": {"orders": {"path": "/root/testdata/sf0.001/orders.parquet"}},
                "sql": "SELECT o_orderkey FROM orders INTO a",
                "sinks": {"nope": {"path": "/tmp/x"}},
            },
        )
