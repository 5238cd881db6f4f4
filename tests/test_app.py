"""End-to-end app-runner tests (the `dozer run` flow)."""

from __future__ import annotations

import os

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


def test_run_app_webhook_and_transactional_sources(spark, tmp_path):
    """New source formats: 'webhook' (ndjson spool) and 'transactional'
    (read a TransactionalTable back as an input)."""
    import json as _json
    import urllib.request

    from dozer_spark.app import run_app
    from dozer_spark.sources.webhook import WebhookServer
    from dozer_spark.storage import TransactionalTable

    hook = str(tmp_path / "hook")
    srv = WebhookServer(hook).start()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/",
            data=_json.dumps([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]).encode(),
        )
        urllib.request.urlopen(req).read()
    finally:
        srv.stop()

    tx = str(tmp_path / "tx")
    TransactionalTable(spark, tx, pk=["id"]).merge(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "amount"])
    )

    config = {
        "sources": {
            "hooked": {"format": "webhook", "path": hook,
                       "schema": "id long, v string"},
            "amounts": {"format": "transactional", "path": tx, "pk": ["id"]},
        },
        "sql": ("SELECT h.id, h.v, a.amount FROM hooked h "
                "JOIN amounts a ON h.id = a.id"),
    }
    out = run_app(spark, config).outputs["__result__"]
    assert sorted((r.id, r.v, r.amount) for r in out.collect()) == [
        (1, "a", 10.0), (2, "b", 20.0)]


def test_run_app_wal2json_spool_source(spark, tmp_path):
    """'wal2json_spool' source: a pg_replication spool dir resolves to
    the replayed current snapshot."""
    import json as _json

    from dozer_spark.app import run_app

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    recs = [
        {"action": "I", "table": "t", "xid": 1, "lsn": "0/10",
         "columns": [{"name": "id", "type": "integer", "value": "1"},
                     {"name": "v", "type": "text", "value": "a"}]},
        {"action": "U", "table": "t", "xid": 2, "lsn": "0/20",
         "columns": [{"name": "id", "type": "integer", "value": "1"},
                     {"name": "v", "type": "text", "value": "b"}],
         "identity": [{"name": "id", "value": "1"}]},
        {"action": "I", "table": "t", "xid": 2, "lsn": "0/30",
         "columns": [{"name": "id", "type": "integer", "value": "2"},
                     {"name": "v", "type": "text", "value": "c"}]},
    ]
    with open(os.path.join(spool, "wal-0.jsonl"), "w") as f:
        for r in recs:
            f.write(_json.dumps(r) + "\n")

    config = {
        "sources": {
            "t": {"format": "wal2json_spool", "path": spool, "pk": ["id"],
                  "table": "t", "columns": {"id": "bigint", "v": "string"}},
        },
        "sql": "SELECT id, v FROM t",
    }
    out = run_app(spark, config).outputs["__result__"]
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, "b"), (2, "c")]


def test_run_app_clickhouse_sink(spark, tmp_path):
    """YAML app -> INTO output -> native ClickHouse HTTP sink: the
    SinkConfig::Clickhouse path of the reference's orchestrator, e2e
    against the fake HTTP server."""
    import json as _json

    from tests.test_clickhouse_http import FakeCH

    # NOTE: source names become session temp views — shared-session tests
    # must not reuse corpus table names (a prior run of this test with
    # "orders" clobbered the dialect tests' view of the real table)
    src = str(tmp_path / "ch_sales")
    spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 5.0)],
        "id long, grp string, amount double",
    ).write.mode("overwrite").parquet(src)

    srv = FakeCH()
    srv.start()
    try:
        config = {
            "sources": {"ch_sales": {"path": src, "format": "parquet"}},
            "sql": "SELECT grp, COUNT(*) AS n FROM ch_sales GROUP BY grp INTO per_grp;"
                   "SELECT * FROM per_grp",
            "sinks": {"per_grp": {
                "format": "clickhouse",
                "endpoint": f"http://127.0.0.1:{srv.port}",
                "database": "db", "order_by": ["grp"],
            }},
        }
        res = run_app(spark, config)
        assert res.outputs["__result__"].count() == 2
        ddl = [q for q, _, _ in srv.requests if q.startswith("CREATE TABLE")]
        assert ddl == ["CREATE TABLE IF NOT EXISTS db.per_grp "
                       "(`grp` Nullable(String), `n` Int64) "
                       "ENGINE = MergeTree ORDER BY (`grp`)"]
        rows = [_json.loads(l) for q, _, b in srv.requests
                if q.startswith("INSERT") for l in b.splitlines()]
        assert sorted((r["grp"], r["n"]) for r in rows) == [("A", 2), ("B", 1)]
    finally:
        srv.stop()


def test_run_app_kafka_debezium_spool_source(spark, tmp_path):
    """Native-Kafka-tailed Debezium spool as a YAML source: the app sees
    the topic's current snapshot (changelog replayed by PK)."""
    import json as _json
    import os

    spool = str(tmp_path / "kspool")
    os.makedirs(spool)
    events = [
        {"offset": 0, "timestamp": 1, "key": "1", "value": _json.dumps(
            {"op": "c", "ts_ms": 1, "after": {"id": 1, "v": "a"},
             "source": {"txId": 1, "lsn": 10}})},
        {"offset": 1, "timestamp": 2, "key": "1", "value": _json.dumps(
            {"op": "u", "ts_ms": 2, "after": {"id": 1, "v": "a2"},
             "source": {"txId": 2, "lsn": 20}})},
        {"offset": 2, "timestamp": 3, "key": "2", "value": _json.dumps(
            {"op": "c", "ts_ms": 3, "after": {"id": 2, "v": "b"},
             "source": {"txId": 3, "lsn": 30}})},
    ]
    with open(os.path.join(spool, "kafka-p0-1.jsonl"), "w") as f:
        f.write("\n".join(_json.dumps(e) for e in events) + "\n")

    config = {
        "sources": {"t": {"format": "kafka_debezium_spool", "path": spool,
                          "pk": ["id"],
                          "columns": {"id": "bigint", "v": "string"}}},
        "sql": "SELECT id, v FROM t",
    }
    out = run_app(spark, config).outputs["__result__"]
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, "a2"), (2, "b")]


def test_app_ops_stage_chains_and_feeds_sql(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"call 555-867-5309 doc {i} " + "w " * (5 + i % 3), "en")
         for i in range(40)],
        ["doc_id", "text", "lang"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out_dir = str(tmp_path / "shards_out")
    cfg = {
        "sources": {"documents": {"path": src, "format": "parquet"}},
        "ops": {
            "clean": {"op": "pii_redact", "input": "documents",
                      "args": {"text_col": "text"}},
            "shards": {"op": "token_shard_assignment", "input": "clean",
                       "args": {"id_col": "doc_id", "text_col": "text",
                                "budget": 100}},
        },
        "sql": "SELECT shard_id, COUNT(*) AS n FROM shards "
               "GROUP BY shard_id INTO per_shard;",
        "sinks": {"shards": {"path": out_dir, "format": "parquet"}},
    }
    from dozer_spark.app import run_app

    res = run_app(spark, cfg)
    # the op output was redacted before packing
    assert res.outputs["clean"].filter(
        res.outputs["clean"].text.contains("555-867-5309")).count() == 0
    # chained op output feeds the SQL stage
    assert res.outputs["per_shard"].count() >= 2
    # and its sink was written
    assert spark.read.parquet(out_dir).count() == 40
    import pytest

    with pytest.raises(ValueError, match="unknown op"):
        run_app(spark, {
            "sources": {"documents": {"path": src, "format": "parquet"}},
            "ops": {"x": {"op": "nope", "input": "documents"}},
            "sql": "SELECT 1 AS one;",
        })


def test_app_quality_gate_metrics_and_failure(spark):
    base = {
        "sources": {
            "orders": {"path": "/root/testdata/sf0.001/orders.parquet",
                       "pk": ["o_orderkey"]},
        },
        "sql": "SELECT o_orderkey, o_totalprice FROM orders "
               "WHERE o_totalprice > 0 INTO positive",
        "metrics": {},
        "quality": {
            "orders_gate": {
                "table": "orders",
                "constraints": [
                    {"type": "completeness", "col": "o_custkey"},
                    {"type": "uniqueness", "col": "o_orderkey"},
                    {"type": "in_range", "col": "o_totalprice",
                     "lo": 0, "hi": 100, "min_value": 0.5},
                ],
            },
            # gates can target SQL OUTPUTS, not just sources
            "result_gate": {
                "table": "positive",
                "constraints": [
                    {"type": "in_range", "col": "o_totalprice",
                     "lo": 0, "hi": 1e9},
                ],
            },
        },
    }
    res = run_app(spark, base)
    rows = {r["constraint"]: r for r in res.quality["orders_gate"]}
    assert rows["completeness(o_custkey)"]["passed"] == 1
    assert rows["uniqueness(o_orderkey)"]["passed"] == 1
    assert rows["in_range(o_totalprice,0,100)"]["passed"] == 0  # real fail
    assert res.quality["result_gate"][0]["passed"] == 1
    # exported as gauges
    assert res.metrics.get(
        "dozer_quality_passed", gate="orders_gate",
        constraint="uniqueness(o_orderkey)") == 1.0
    assert res.metrics.get(
        "dozer_quality_value", gate="result_gate",
        constraint="in_range(o_totalprice,0,1000000000.0)") == 1.0

    # fail_on_violation raises with the violated constraints named
    base["quality"]["orders_gate"]["fail_on_violation"] = True
    with pytest.raises(ValueError, match="in_range"):
        run_app(spark, base)


def test_app_quality_gate_config_errors(spark):
    src = {"orders": {"path": "/root/testdata/sf0.001/orders.parquet",
                      "pk": ["o_orderkey"]}}
    sql = "SELECT 1 AS one FROM orders LIMIT 1"
    with pytest.raises(ValueError, match="unknown table"):
        run_app(spark, {"sources": src, "sql": sql, "quality": {
            "g": {"table": "nope",
                  "constraints": [{"type": "completeness", "col": "x"}]}}})
    with pytest.raises(ValueError, match="unknown constraint type"):
        run_app(spark, {"sources": src, "sql": sql, "quality": {
            "g": {"table": "orders", "constraints": [{"type": "zzz"}]}}})
    with pytest.raises(ValueError, match="missing keys"):
        run_app(spark, {"sources": src, "sql": sql, "quality": {
            "g": {"table": "orders",
                  "constraints": [{"type": "in_range", "col": "x"}]}}})
    with pytest.raises(ValueError, match="missing required key 'table'"):
        run_app(spark, {"sources": src, "sql": sql, "quality": {
            "g": {"constraints": [{"type": "completeness", "col": "x"}]}}})


def test_app_ops_stage_wave9_ops(spark, tmp_path):
    cfg = {
        "sources": {
            "customer": {"path": "/root/testdata/sf0.001/customer.parquet",
                         "pk": ["c_custkey"]},
            "documents": {"path": "/root/testdata/sf0.001/documents.parquet",
                          "pk": ["doc_id"]},
        },
        "ops": {
            "name_pairs": {"op": "fuzzy_pairs", "input": "customer",
                           "args": {"id_col": "c_custkey",
                                    "str_col": "c_name"}},
            "splits": {"op": "hash_split", "input": "documents",
                       "args": {"key_col": "doc_id",
                                "splits": [["train", 0.9], ["test", 0.1]],
                                "salt": "s"}},
            "price_hist": {"op": "value_histogram", "input": "customer",
                           "args": {"col": "c_acctbal", "lo": -1000.0,
                                    "hi": 10000.0, "n_buckets": 5}},
        },
        "sql": "SELECT split, COUNT(*) AS n FROM splits GROUP BY split",
    }
    res = run_app(spark, cfg)
    assert res.outputs["name_pairs"].columns == [
        "id_a", "id_b", "s_a", "s_b", "dist"]
    assert res.outputs["name_pairs"].count() > 0
    hist = res.outputs["price_hist"].collect()
    assert sum(r["n"] for r in hist) == 150  # every non-null row bucketed
    splits = {r["split"]: r["n"] for r in res.outputs["__result__"].collect()}
    assert set(splits) <= {"train", "test"} and sum(splits.values()) == 500
