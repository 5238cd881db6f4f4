"""Webhook ingest source: HTTP POST JSON -> ndjson spool -> Spark.

The reference ships a webhook connector (dozer-ingestion/src/lib.rs:146-148)
that accepts pushed records over HTTP. Spark-native equivalent, same
landing contract as the Arrow ingest endpoint (ingest_server.py):

- `WebhookServer` (stdlib http.server, threaded) accepts POSTs of a JSON
  object or array of objects per request; each request lands as ONE
  ndjson spool file via write-then-atomic-rename — visible only complete,
  and a request is acknowledged (200) only after the rename, so a
  producer retrying on non-200 gets at-least-once with no torn files.
- Consumers read the spool with Spark's file source: batch
  (`spark.read.json`) or incremental (`spark.readStream` + schema),
  exactly-once via checkpointLocation. File-arrival IS the notification.
- Optional changelog envelopes: POST records shaped
  {"op": "I|U|D", "txid": n, "data": {...}} to /changelog and read them
  back with `webhook_changelog` — the same __op/__txid/__seq convention
  every operator consumes. __seq derives from the spool file's landing
  counter + in-request index (the transport's real order, per ADVICE r2).

At scale the spool dir lives on shared storage behind N server replicas;
the atomic-rename contract is unchanged.
"""

from __future__ import annotations

import itertools
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class WebhookServer:
    """Threaded HTTP endpoint spooling posted JSON records as ndjson."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._counter = itertools.count()
        self.requests_landed = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"null")
                except (ValueError, json.JSONDecodeError):
                    self.send_error(400, "invalid JSON")
                    return
                records = body if isinstance(body, list) else [body]
                if not all(isinstance(r, dict) for r in records):
                    self.send_error(400, "expected object or array of objects")
                    return
                seq = next(outer._counter)
                # one request -> one atomically-published file; ack only
                # after the rename (at-least-once for retrying producers)
                kind = "changelog" if self.path.rstrip("/") == "/changelog" else "rows"
                name = f"{kind}-{seq:012d}.jsonl"
                tmp = os.path.join(outer.spool_dir, f".{name}.tmp")
                with open(tmp, "w") as f:
                    for i, r in enumerate(records):
                        if kind == "changelog":
                            r = dict(r)
                            r["_landed_seq"] = seq * 1_000_000 + i
                        f.write(json.dumps(r) + "\n")
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, os.path.join(outer.spool_dir, name))
                outer.requests_landed += 1
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address

    def start(self) -> "WebhookServer":
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def webhook_rows(spark: SparkSession, spool_dir: str, schema) -> DataFrame:
    """Batch-read plain posted rows. For streaming use
    spark.readStream.schema(schema).json(spool_dir)."""
    return spark.read.schema(schema).json(os.path.join(spool_dir, "rows-*.jsonl"))


def webhook_changelog(spark: SparkSession, spool_dir: str,
                      data_schema) -> DataFrame:
    """Read /changelog posts into the engine changelog. Envelope:
    {"op": "I|U|D", "txid": n, "data": {...row...}}; __seq is the
    landing order (request counter * 1e6 + index within request)."""
    env = (
        "op string, txid long, _landed_seq long, "
        f"data struct<{', '.join(f'{f.name}: {f.dataType.simpleString()}' for f in data_schema.fields)}>"
    )
    raw = spark.read.schema(env).json(
        os.path.join(spool_dir, "changelog-*.jsonl")
    )
    return (
        raw.filter(F.col("op").isin("I", "U", "D"))
        .select(
            F.col("op").alias("__op"),
            F.coalesce(F.col("txid"), F.lit(0)).alias("__txid"),
            F.col("_landed_seq").alias("__seq"),
            F.col("data.*"),
        )
    )
