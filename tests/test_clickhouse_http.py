"""Native ClickHouse HTTP sink: DDL mapping, executor-side JSONEachRow
inserts against a fake HTTP server, dedup-token replay idempotency, and
a SPARK_GRAFT_CLICKHOUSE_HTTP live gate."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import types as T

from dozer_spark.sinks_clickhouse import (
    ClickHouseHttpSink, spark_type_to_clickhouse,
)


def test_type_mapping():
    assert spark_type_to_clickhouse(T.LongType(), False) == "Int64"
    assert spark_type_to_clickhouse(T.StringType(), True) == "Nullable(String)"
    assert spark_type_to_clickhouse(T.TimestampNTZType(), False) == "DateTime64(6)"
    assert spark_type_to_clickhouse(T.DecimalType(12, 2), False) == "Decimal(12, 2)"
    assert (spark_type_to_clickhouse(T.ArrayType(T.DoubleType(), False), True)
            == "Array(Float64)")
    with pytest.raises(TypeError, match="no ClickHouse mapping"):
        spark_type_to_clickhouse(T.MapType(T.StringType(), T.LongType()), False)


def test_ddl():
    sink = ClickHouseHttpSink("http://x:8123", "db", "t", order_by=["id"])
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ])
    assert sink.ddl(schema) == (
        "CREATE TABLE IF NOT EXISTS db.t (`id` Int64, `v` Nullable(String)) "
        "ENGINE = MergeTree ORDER BY (`id`)"
    )


class FakeCH(threading.Thread):
    """Records every (query, params, body) POSTed to it; replies 200."""

    def __init__(self):
        super().__init__(daemon=True)
        self.requests: list[tuple[str, dict, bytes]] = []
        self.lock = threading.Lock()
        outer = self

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                q = parse_qs(urlparse(self.path).query)
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                with outer.lock:
                    outer.requests.append(
                        (q.get("query", [""])[0],
                         {k: v[0] for k, v in q.items() if k != "query"},
                         body)
                    )
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"")

            def log_message(self, *a):
                pass

        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]

    def run(self):
        self.srv.serve_forever()

    def stop(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_insert_distributed_with_dedup_tokens(spark):
    srv = FakeCH()
    srv.start()
    try:
        sink = ClickHouseHttpSink(f"http://127.0.0.1:{srv.port}", "db", "t",
                                  order_by=["id"], app_id="app1")
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).repartition(4)
        sink.create_table(df.schema)
        sink.write(df, batch_id=7)
        sink.write(df, batch_id=7)  # replay: identical tokens re-sent

        ddl = [r for r in srv.requests if r[0].startswith("CREATE TABLE")]
        assert len(ddl) == 1
        inserts = [r for r in srv.requests if r[0].startswith("INSERT INTO db.t")]
        assert inserts and all("JSONEachRow" in q for q, _, _ in inserts)
        # every posted line is a JSON row; both runs together cover 2x10
        rows = [json.loads(l) for _, _, b in inserts for l in b.splitlines()]
        assert sorted(r["id"] for r in rows) == sorted(list(range(10)) * 2)
        # dedup tokens: deterministic per (app, batch, partition) and
        # IDENTICAL across the replay — CH collapses the second run
        tokens = [p["insert_deduplication_token"] for _, p, _ in inserts]
        assert all(t.startswith("app1-7-") for t in tokens)
        first, second = tokens[:len(tokens) // 2], tokens[len(tokens) // 2:]
        assert sorted(first) == sorted(second)
        # token <-> content binding: same token => byte-identical body
        by_token: dict[str, bytes] = {}
        for _, p, b in inserts:
            t = p["insert_deduplication_token"]
            assert by_token.setdefault(t, b) == b
    finally:
        srv.stop()


def test_empty_partitions_post_nothing(spark):
    srv = FakeCH()
    srv.start()
    try:
        sink = ClickHouseHttpSink(f"http://127.0.0.1:{srv.port}", "db", "t")
        df = spark.createDataFrame([(1, "a")], "id long, v string").repartition(8)
        sink.write(df)
        inserts = [r for r in srv.requests if r[0].startswith("INSERT")]
        assert len(inserts) == 1  # 7 empty partitions posted nothing
    finally:
        srv.stop()


def test_foreach_batch_streaming_epochs(spark, tmp_path):
    """The writeStream.foreachBatch shape end-to-end: a rate-limited file
    stream drains through the sink; every micro-batch posts with its own
    batch-scoped dedup tokens (the epoch-commit contract)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .write.mode("overwrite").parquet(src)

    srv = FakeCH()
    srv.start()
    try:
        sink = ClickHouseHttpSink(f"http://127.0.0.1:{srv.port}", "db", "t",
                                  app_id="stream1")
        stream = spark.readStream.schema("id long, v string").parquet(src)
        q = stream.writeStream.foreachBatch(sink.foreach_batch()) \
            .option("checkpointLocation", str(tmp_path / "ckpt")) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)
        inserts = [r for r in srv.requests if r[0].startswith("INSERT")]
        assert inserts
        rows = [json.loads(l) for _, _, b in inserts for l in b.splitlines()]
        assert sorted(r["id"] for r in rows) == [1, 2]
        assert all(p["insert_deduplication_token"].startswith("stream1-0-")
                   for _, p, _ in inserts)
    finally:
        srv.stop()


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_CLICKHOUSE_HTTP"),
    reason="needs SPARK_GRAFT_CLICKHOUSE_HTTP (live ClickHouse HTTP endpoint)",
)
def test_live_clickhouse_roundtrip(spark):
    import urllib.request

    endpoint = os.environ["SPARK_GRAFT_CLICKHOUSE_HTTP"]
    sink = ClickHouseHttpSink(endpoint, "default", "dozer_spark_live",
                              order_by=["id"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink.create_table(df.schema)
    sink.write(df, batch_id=1)
    with urllib.request.urlopen(
        f"{endpoint}/?query=SELECT%20count()%20FROM%20default.dozer_spark_live"
    ) as resp:
        assert int(resp.read().strip()) >= 2
