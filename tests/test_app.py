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


def test_run_app_transactional_sink(spark, tmp_path):
    """A 'transactional' sink MERGEs the output by PK across runs
    (storage/txtable.py) instead of overwriting parquet."""
    from dozer_spark.app import run_app
    from dozer_spark.storage import TransactionalTable

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "grp", "amount"]
    ).write.mode("overwrite").parquet(src)
    config = {
        "sources": {"t": {"path": src, "pk": ["id"]}},
        "sql": "SELECT id, grp, amount * 2 AS doubled FROM t INTO result",
        "sinks": {
            "result": {"format": "transactional", "path": out, "pk": ["id"]}
        },
    }
    r1 = run_app(spark, config)
    assert r1.written["result"] == out

    # second run with changed data merges by PK (no duplicate rows)
    spark.createDataFrame(
        [(1, "a", 100.0), (3, "c", 30.0)], ["id", "grp", "amount"]
    ).write.mode("overwrite").parquet(src)
    run_app(spark, config)
    t = TransactionalTable(spark, out, pk=["id"])
    got = sorted((r.id, r.doubled) for r in t.read().collect())
    assert got == [(1, 200.0), (2, 40.0), (3, 60.0)]
    assert t.version == 2
