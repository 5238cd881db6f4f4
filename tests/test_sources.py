"""Source tests: file sources, CDC replay, Debezium parsing, JDBC config."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType, StructField, LongType, StringType, DoubleType

from dozer_spark.sources import (
    read_table,
    stream_table,
    replay_changelog,
    changelog_batches,
    parse_debezium,
)
from dozer_spark.sources.kafka import debezium_changelog
from dozer_spark.sources.jdbc import JdbcSnapshot
from dozer_spark.streaming import RetractingAggregation


def test_read_table_csv_json_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    for fmt in ["parquet", "csv", "json"]:
        p = str(tmp_path / fmt)
        df.write.format(fmt).option("header", "true").save(p)
        back = read_table(spark, p, fmt, schema=df.schema if fmt != "parquet" else None)
        assert {(r.id, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "x", "orc2")


def test_stream_table_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        stream_table(spark, str(tmp_path), "parquet")


def test_changelog_batches_ordered(spark):
    cl = spark.createDataFrame(
        [("I", 2, 1, 10), ("I", 1, 1, 20), ("I", 3, 1, 30)],
        ["__op", "__txid", "__seq", "id"],
    )
    batches = list(changelog_batches(cl))
    assert [b.first()["id"] for b in batches] == [20, 10, 30]


def test_replay_changelog_through_aggregation(spark):
    """The logic_test.rs-style end-to-end: replay txns, watch retractions."""
    cl = spark.createDataFrame(
        [
            ("I", 1, 1, 1, "a", 10.0),
            ("I", 1, 2, 2, "a", 5.0),
            ("U", 2, 1, 1, "a", 20.0),
            ("D", 3, 1, 1, "a", 20.0),
            ("D", 3, 2, 2, "a", 5.0),
        ],
        ["__op", "__txid", "__seq", "id", "grp", "amount"],
    )
    ragg = RetractingAggregation(
        spark, pk=["id"], group_by=["grp"], aggs=[F.sum("amount").alias("s")]
    )
    outs = [
        [(r["__op"], r.grp, r.s) for r in out.collect()]
        for out in replay_changelog(cl, ragg)
    ]
    assert outs[0] == [("I", "a", 15.0)]
    assert outs[1] == [("U", "a", 25.0)]
    assert len(outs[2]) == 1 and outs[2][0][:2] == ("D", "a")


ROW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("balance", DoubleType()),
    ]
)


def _envelope(op, before, after, txid=7, lsn=100):
    return json.dumps(
        {
            "op": op,
            "ts_ms": 1700000000000,
            "before": before,
            "after": after,
            "source": {"txId": txid, "lsn": lsn, "ts_ms": 1700000000000},
        }
    )


def test_parse_debezium_envelope(spark):
    data = [
        (_envelope("c", None, {"id": 1, "name": "x", "balance": 5.0}),),
        (_envelope("u", {"id": 1, "name": "x", "balance": 5.0},
                   {"id": 1, "name": "x", "balance": 9.0}, txid=8, lsn=101),),
        (_envelope("d", {"id": 1, "name": "x", "balance": 9.0}, None, txid=9, lsn=102),),
    ]
    raw = spark.createDataFrame(data, ["value"])
    out = debezium_changelog(raw, ROW_SCHEMA).orderBy("__txid").collect()
    assert [(r["__op"], r["__txid"], r.id, r.balance) for r in out] == [
        ("I", 7, 1, 5.0),
        ("U", 8, 1, 9.0),   # after image
        ("D", 9, 1, 9.0),   # before image
    ]


def test_jdbc_partitioned_options():
    snap = JdbcSnapshot(
        url="jdbc:postgresql://h:5432/db", table="public.orders",
        partition_column="o_orderkey", lower_bound=0, upper_bound=1_000_000,
        num_partitions=64,
    )
    opts = snap.options()
    assert opts["numPartitions"] == "64" and opts["partitionColumn"] == "o_orderkey"
    with pytest.raises(ValueError, match="bounds"):
        JdbcSnapshot(url="u", table="t", partition_column="id").options()


def test_arrow_ingest_normalization(spark):
    import pyarrow as pa
    from dozer_spark.sources.arrow import ingest_arrow

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.uint64()),
            "small": pa.array([3, 4], pa.uint8()),
            "ts": pa.array([1_700_000_000_000_000_000, 1_700_000_001_000_000_000], pa.timestamp("ns")),
            "s": pa.array(["a", "b"], pa.large_string()),
            "v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32())),
        }
    )
    df = ingest_arrow(spark, t)
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["small"] == "int"
    assert types["ts"].startswith("timestamp")
    assert types["s"] == "string" and types["v"] == "array<float>"
    assert df.count() == 2
    # record-batch list path
    df2 = ingest_arrow(spark, t.to_batches(max_chunksize=1))
    assert df2.count() == 2


class TestEthereumLogs:
    """JSON-RPC log puller against an in-process fake RPC server: range
    pagination, cursor resume, normalization, changelog mapping."""

    @staticmethod
    def _fake_rpc(blocks_with_logs):
        import json as _json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        calls = []

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = _json.loads(self.rfile.read(n))
                calls.append(req)
                if req["method"] == "eth_blockNumber":
                    result = hex(max(blocks_with_logs) if blocks_with_logs else 0)
                elif req["method"] == "eth_getLogs":
                    flt = req["params"][0]
                    lo, hi = int(flt["fromBlock"], 16), int(flt["toBlock"], 16)
                    result = [
                        {"address": "0xabc", "topics": ["0xt0", "0xt1"],
                         "data": "0xdead", "blockNumber": hex(b),
                         "transactionHash": f"0xtx{b}", "logIndex": hex(i),
                         "removed": False}
                        for b in sorted(blocks_with_logs)
                        if lo <= b <= hi
                        for i in range(blocks_with_logs[b])
                    ]
                else:
                    result = None
                body = _json.dumps({"jsonrpc": "2.0", "id": req["id"],
                                    "result": result}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}", calls

    def test_pull_normalize_resume_changelog(self, spark, tmp_path):
        from dozer_spark.sources.ethereum import (
            eth_logs, eth_logs_changelog, pull_logs_to_spool,
        )

        srv, url, calls = self._fake_rpc({5: 2, 2500: 1})
        spool = str(tmp_path / "eth")
        try:
            n = pull_logs_to_spool(url, spool, chunk_blocks=1000)
            assert n == 3
            # pagination respected the chunk width
            ranges = [(int(c["params"][0]["fromBlock"], 16),
                       int(c["params"][0]["toBlock"], 16))
                      for c in calls if c["method"] == "eth_getLogs"]
            assert all(hi - lo + 1 <= 1000 for lo, hi in ranges)

            df = eth_logs(spark, spool)
            got = sorted((r.blockNumber, r.logIndex, r.address, r.topic0)
                         for r in df.collect())
            assert got == [(5, 0, "0xabc", "0xt0"), (5, 1, "0xabc", "0xt0"),
                           (2500, 0, "0xabc", "0xt0")]

            cl = eth_logs_changelog(spark, spool)
            ops = {(r["__txid"], r["__seq"]): r["__op"] for r in cl.collect()}
            assert ops == {(5, 0): "I", (5, 1): "I", (2500, 0): "I"}

            # resume: cursor advanced past to_block; a new pull with no
            # new blocks fetches nothing
            with open(f"{spool}/_cursor") as f:
                assert int(f.read()) == 2501
            n2 = pull_logs_to_spool(url, spool, to_block=2500)
            assert n2 == 0
        finally:
            srv.shutdown()
            srv.server_close()


class TestEthereumTraces:
    """debug_traceBlockByNumber (callTracer) puller against a fake RPC:
    recursive flatten (parent before nested calls), chain ordering,
    cursor resume, changelog mapping — reference
    dozer-ingestion/ethereum/src/trace/helper.rs:152-176."""

    @staticmethod
    def _fake_rpc(traces_by_block):
        import json as _json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        calls = []

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = _json.loads(self.rfile.read(n))
                calls.append(req)
                if req["method"] == "eth_blockNumber":
                    result = hex(max(traces_by_block)
                                 if traces_by_block else 0)
                elif req["method"] == "debug_traceBlockByNumber":
                    block = int(req["params"][0], 16)
                    assert req["params"][1] == {"tracer": "callTracer"}
                    result = [{"result": t}
                              for t in traces_by_block.get(block, [])]
                else:
                    result = None
                body = _json.dumps({"jsonrpc": "2.0", "id": req["id"],
                                    "result": result}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}", calls

    def test_pull_flatten_resume_changelog(self, spark, tmp_path):
        from dozer_spark.sources.ethereum import (
            eth_traces,
            eth_traces_changelog,
            pull_traces_to_spool,
        )

        nested = {
            "type": "CALL", "from": "0xaa", "to": "0xbb",
            "value": "0x5", "gas": "0x5208", "gasUsed": "0x5208",
            "input": "0x", "output": "0x01",
            "calls": [
                {"type": "STATICCALL", "from": "0xbb", "to": "0xcc",
                 "gas": "0x100", "gasUsed": "0x80", "input": "0xfe",
                 "calls": [
                     {"type": "DELEGATECALL", "from": "0xcc", "to": "0xdd",
                      "gas": "0x10", "gasUsed": "0x8"},
                 ]},
                {"type": "CALL", "from": "0xbb", "to": "0xee",
                 "value": "0x1", "gas": "0x200", "gasUsed": "0x150"},
            ],
        }
        srv, url, calls = self._fake_rpc({7: [nested], 42: [
            {"type": "CREATE", "from": "0xff", "to": "0x00",
             "gas": "0x1", "gasUsed": "0x1"}]})
        spool = str(tmp_path / "trc")
        try:
            n = pull_traces_to_spool(url, spool, chunk_blocks=10)
            assert n == 5  # 4 flattened from block 7 + 1 from block 42
            df = eth_traces(spark, spool)
            rows = sorted(
                ((r.blockNumber, r.traceIndex, r.type_field, r.from_addr,
                  r.to_addr, r.value, r.gas_used) for r in df.collect())
            )
            # parent-first recursive order within the block
            assert rows == [
                (7, 0, "CALL", "0xaa", "0xbb", 5, 0x5208),
                (7, 1, "STATICCALL", "0xbb", "0xcc", 0, 0x80),
                (7, 2, "DELEGATECALL", "0xcc", "0xdd", 0, 0x8),
                (7, 3, "CALL", "0xbb", "0xee", 1, 0x150),
                (42, 0, "CREATE", "0xff", "0x00", 0, 0x1),
            ]
            cl = eth_traces_changelog(spark, spool)
            ops = {(r["__txid"], r["__seq"]): r["__op"] for r in cl.collect()}
            assert set(ops.values()) == {"I"} and len(ops) == 5

            # resume: nothing re-fetched once the cursor passed to_block
            with open(f"{spool}/_cursor") as f:
                assert int(f.read()) == 43
            assert pull_traces_to_spool(url, spool, to_block=42) == 0
        finally:
            srv.shutdown()
            srv.server_close()


def test_trace_low_u64_preserves_bit_pattern():
    """Review finding (round 11): 9.3-ETH-scale wei values (>= 2^63)
    must keep the reference's low_u64 bit pattern, not lose bit 63."""
    from dozer_spark.sources.ethereum import _low_u64, flatten_trace

    assert _low_u64(5) == 5
    assert _low_u64(2**63) == -(2**63)           # bit 63 preserved
    assert _low_u64(2**63 + 5) == -(2**63) + 5
    assert _low_u64(2**64 + 7) == 7              # low 64 bits only
    rows = flatten_trace(
        {"type": "CALL", "from": "0xa", "to": "0xb",
         "value": hex(2**63 + 5), "gas": "0x1", "gasUsed": "0x1"},
        1, [0])
    assert rows[0]["value"] & ((1 << 64) - 1) == 2**63 + 5
