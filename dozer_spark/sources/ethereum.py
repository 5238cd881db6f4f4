"""Ethereum log source — JSON-RPC over stdlib HTTP, no web3 dependency.

The reference ships an Ethereum connector for logs/traces
(dozer-ingestion/src/lib.rs:65-76). The Spark-native shape follows every
other transport here: a thin puller walks `eth_getLogs` over bounded
block ranges (the public JSON-RPC API), normalizes each log to a flat
record, and lands atomic ndjson spool files that the Spark file source
consumes batch or streaming. Blocks are the resume token (`_cursor`
file advances only after a durable rename — at-least-once).

Logs are append-only facts, so the changelog mapping is pure inserts:
__txid = blockNumber, __seq = logIndex (the chain's real order).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_SCHEMA_DDL = (
    "address string, topic0 string, topic1 string, topic2 string, "
    "topic3 string, data string, blockNumber long, transactionHash string, "
    "logIndex long, removed boolean"
)


def rpc_call(url: str, method: str, params: list, timeout: float = 15.0):
    req = urllib.request.Request(
        url,
        data=json.dumps(
            {"jsonrpc": "2.0", "id": 1, "method": method, "params": params}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    if "error" in out:
        raise RuntimeError(f"rpc error: {out['error']}")
    return out["result"]


def normalize_log(log: dict) -> dict:
    """Raw eth_getLogs entry -> flat record (hex quantities decoded)."""
    topics = log.get("topics") or []
    return {
        "address": log.get("address"),
        "topic0": topics[0] if len(topics) > 0 else None,
        "topic1": topics[1] if len(topics) > 1 else None,
        "topic2": topics[2] if len(topics) > 2 else None,
        "topic3": topics[3] if len(topics) > 3 else None,
        "data": log.get("data"),
        "blockNumber": int(log["blockNumber"], 16)
        if isinstance(log.get("blockNumber"), str) else log.get("blockNumber"),
        "transactionHash": log.get("transactionHash"),
        "logIndex": int(log["logIndex"], 16)
        if isinstance(log.get("logIndex"), str) else log.get("logIndex"),
        "removed": bool(log.get("removed", False)),
    }


def pull_logs_to_spool(url: str, spool_dir: str,
                       address: str | None = None,
                       topics: list | None = None,
                       from_block: int | None = None,
                       to_block: int | None = None,
                       chunk_blocks: int = 2000) -> int:
    """Walk eth_getLogs in bounded block ranges (providers cap range
    width) and land one atomic ndjson file per non-empty chunk. Resumes
    from the _cursor file when from_block is not given. Returns the
    number of logs written."""
    os.makedirs(spool_dir, exist_ok=True)
    cursor_path = os.path.join(spool_dir, "_cursor")
    if from_block is None:
        from_block = 0
        if os.path.exists(cursor_path):
            with open(cursor_path) as f:
                from_block = int(f.read().strip() or 0)
    if to_block is None:
        to_block = int(rpc_call(url, "eth_blockNumber", []), 16)

    total = 0
    start = from_block
    while start <= to_block:
        end = min(start + chunk_blocks - 1, to_block)
        flt = {"fromBlock": hex(start), "toBlock": hex(end)}
        if address:
            flt["address"] = address
        if topics:
            flt["topics"] = topics
        logs = rpc_call(url, "eth_getLogs", [flt])
        if logs:
            recs = [normalize_log(lg) for lg in logs]
            tmp = os.path.join(spool_dir, f".tmp-{start}")
            with open(tmp, "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, os.path.join(
                spool_dir, f"logs-{start:012d}-{end:012d}.jsonl"))
            total += len(recs)
        with open(cursor_path, "w") as f:  # resume point: next start
            f.write(str(end + 1))
        start = end + 1
    return total


def eth_logs(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Batch-read the spooled logs. Streaming:
    spark.readStream.schema(LOG_SCHEMA_DDL).json(spool_dir + '/*.jsonl')."""
    return spark.read.schema(LOG_SCHEMA_DDL).json(
        os.path.join(spool_dir, "*.jsonl")
    )


def eth_logs_changelog(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Logs as the engine changelog: append-only inserts ordered by the
    chain (blockNumber, logIndex); reorg-removed logs become deletes."""
    df = eth_logs(spark, spool_dir)
    return df.select(
        F.when(F.col("removed"), F.lit("D")).otherwise(F.lit("I")).alias("__op"),
        F.col("blockNumber").alias("__txid"),
        F.col("logIndex").alias("__seq"),
        *[c for c in df.columns if c != "removed"],
    )


# ---------------------------------------------------------------------------
# Traces (reference: dozer-ingestion/ethereum/src/trace/ — the
# `debug_traceBlockByNumber` callTracer pull, TraceResult/Trace in
# helper.rs:17-36, recursive flatten map_trace_to_ops helper.rs:152-176)
# ---------------------------------------------------------------------------

TRACE_SCHEMA_DDL = (
    "type_field string, from_addr string, to_addr string, value long, "
    "gas long, gas_used long, input string, output string, "
    "blockNumber long, traceIndex long"
)


def _hex_i(v, default: int = 0) -> int:
    """Hex-quantity ('0x..') or plain-int field -> int."""
    if v is None:
        return default
    if isinstance(v, str):
        return int(v, 16)
    return int(v)


def _low_u64(v: int) -> int:
    """The reference's U256::low_u64 (helper.rs:161), carried in
    Spark's signed 64-bit long as the same BIT PATTERN (two's
    complement for values >= 2^63) — no silent bit-63 stripping; the
    unsigned value is recoverable as `v & 0xFFFF_FFFF_FFFF_FFFF`."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def flatten_trace(trace: dict, block_number: int,
                  counter: list[int]) -> list[dict]:
    """One callTracer trace -> flat rows, parent before its nested
    calls — the reference's recursive map_trace_to_ops order
    (helper.rs:152-176). traceIndex is the within-block emission order
    (the changelog __seq). Quantities truncate to the reference's
    low_u64 (bit-pattern-preserved in the signed long)."""
    row = {
        "type_field": trace.get("type") or "",
        "from_addr": trace.get("from"),
        "to_addr": trace.get("to"),
        "value": _low_u64(_hex_i(trace.get("value"))),
        "gas": _low_u64(_hex_i(trace.get("gas"))),
        "gas_used": _low_u64(_hex_i(trace.get("gasUsed"))),
        "input": trace.get("input"),
        "output": trace.get("output"),
        "blockNumber": block_number,
        "traceIndex": counter[0],
    }
    counter[0] += 1
    rows = [row]
    for call in trace.get("calls") or []:
        rows.extend(flatten_trace(call, block_number, counter))
    return rows


def pull_traces_to_spool(url: str, spool_dir: str,
                         from_block: int | None = None,
                         to_block: int | None = None,
                         chunk_blocks: int = 100) -> int:
    """Walk `debug_traceBlockByNumber` (callTracer) over bounded block
    ranges and land one atomic ndjson file per non-empty chunk — the
    same spool/cursor/resume contract as pull_logs_to_spool. Returns
    the number of trace rows written (nested calls flattened)."""
    os.makedirs(spool_dir, exist_ok=True)
    cursor_path = os.path.join(spool_dir, "_cursor")
    if from_block is None:
        from_block = 0
        if os.path.exists(cursor_path):
            with open(cursor_path) as f:
                from_block = int(f.read().strip() or 0)
    if to_block is None:
        to_block = int(rpc_call(url, "eth_blockNumber", []), 16)

    total = 0
    start = from_block
    while start <= to_block:
        end = min(start + chunk_blocks - 1, to_block)
        recs: list[dict] = []
        for block_no in range(start, end + 1):
            results = rpc_call(
                url, "debug_traceBlockByNumber",
                [hex(block_no), {"tracer": "callTracer"}],
            ) or []
            counter = [0]
            for tr in results:
                # node variants wrap the trace in {"result": ...}
                trace = tr.get("result", tr) if isinstance(tr, dict) else tr
                if trace:
                    recs.extend(flatten_trace(trace, block_no, counter))
        if recs:
            tmp = os.path.join(spool_dir, f".tmp-{start}")
            with open(tmp, "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, os.path.join(
                spool_dir, f"traces-{start:012d}-{end:012d}.jsonl"))
            total += len(recs)
        with open(cursor_path, "w") as f:  # resume point: next start
            f.write(str(end + 1))
        start = end + 1
    return total


def eth_traces(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Batch-read the spooled traces. Streaming:
    spark.readStream.schema(TRACE_SCHEMA_DDL).json(spool_dir+'/*.jsonl')."""
    return spark.read.schema(TRACE_SCHEMA_DDL).json(
        os.path.join(spool_dir, "*.jsonl")
    )


def eth_traces_changelog(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Traces as the engine changelog: append-only inserts in chain
    order (blockNumber, traceIndex — parents before nested calls)."""
    df = eth_traces(spark, spool_dir)
    return df.select(
        F.lit("I").alias("__op"),
        F.col("blockNumber").alias("__txid"),
        F.col("traceIndex").alias("__seq"),
        *df.columns,
    )
