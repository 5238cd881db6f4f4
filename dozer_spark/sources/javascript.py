"""JavaScript source connector — run a user JS script that pushes
records through an `ingest(msg)` callback, landing them in the shared
spool/changelog contract.

Reference behavior (dozer-ingestion/javascript/src/lib.rs + the Deno
extension js_extension/mod.rs): the connector exposes ONE table,
`json_records`, with ONE Json column `value`; the user script calls
`ingest({typ, old_val, new_val})` with typ in
Insert | Delete | Update | SnapshottingDone (mod.rs:24,106 — the
snapshot marker splits the bootstrap phase from live ops), e.g. the
shipped sample js_extension/ingest.js fetches an HTTP API and ingests
each row. The reference embeds Deno; this container has Node
(/usr/bin/node, the same runtime the JS UDFs use — functions/js_udf.py),
so the Spark-native shape is:

- a PRELUDE defines `globalThis.ingest(msg)`: it validates the message
  shape and appends one ndjson line to the file named by
  DOZER_SPARK_JS_INGEST env (append-only file, not stdout, so user
  console.log noise can't corrupt the feed; returns a resolved Promise
  so `await ingest(...)` works as in the reference sample);
- the prelude + user script run as one Node process; on clean exit the
  ingest file is atomically renamed into the spool
  (`js-<n>.jsonl`), the same at-least-once rename contract as every
  other spool source here;
- SnapshottingDone is recorded both as a `_snapshot_done` marker file
  and as the `__snapshot_done` sequence position, mirroring the
  reference's TransactionInfo::SnapshottingDone.

Security note: the script runs with the invoking user's OS privileges
(Node has no Deno-style permission flags) — same trust model as the
reference's bootstrap script, which also runs user code in-process.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA_DDL = ("__op string, __seq long, value string, "
                     "old_value string")

_PRELUDE = r"""
const __fs = require("fs");
const __out = process.env.DOZER_SPARK_JS_INGEST;
if (!__out) { throw new Error("DOZER_SPARK_JS_INGEST not set"); }
const __TYPES = new Set(["Insert", "Delete", "Update", "SnapshottingDone"]);
globalThis.ingest = function (msg) {
  if (!msg || !__TYPES.has(msg.typ)) {
    throw new Error("ingest: typ must be one of " + [...__TYPES].join("|"));
  }
  if (msg.typ === "Insert" && msg.new_val == null) {
    throw new Error("ingest: Insert requires new_val");
  }
  if (msg.typ === "Delete" && msg.old_val == null) {
    throw new Error("ingest: Delete requires old_val");
  }
  if (msg.typ === "Update" && (msg.new_val == null || msg.old_val == null)) {
    throw new Error("ingest: Update requires old_val and new_val");
  }
  __fs.appendFileSync(__out, JSON.stringify({
    typ: msg.typ,
    old_val: msg.old_val === undefined ? null : msg.old_val,
    new_val: msg.new_val === undefined ? null : msg.new_val,
  }) + "\n");
  return Promise.resolve();
};
"""

_OPS = {"Insert": "I", "Update": "U", "Delete": "D"}


def run_js_source(script_path: str, spool_dir: str,
                  node_bin: str = "node", timeout: float = 300.0) -> int:
    """Execute the user script once (the reference's bootstrap run) and
    land its ingested records in the spool. Returns the number of data
    records written (the SnapshottingDone marker is not a record)."""
    with open(script_path) as f:
        user_src = f.read()
    os.makedirs(spool_dir, exist_ok=True)
    with tempfile.TemporaryDirectory(prefix="js_src_") as td:
        bundle = os.path.join(td, "bundle.js")
        feed = os.path.join(td, "feed.ndjson")
        with open(bundle, "w") as f:
            f.write(_PRELUDE + "\n" + user_src)
        open(feed, "w").close()
        env = dict(os.environ, DOZER_SPARK_JS_INGEST=feed)
        proc = subprocess.run(
            [node_bin, bundle], env=env, timeout=timeout,
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"JavaScript source failed (exit {proc.returncode}): "
                f"{proc.stderr.strip()[:2000]}"
            )
        rows = []
        snapshot_done_at = None
        with open(feed) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                msg = json.loads(line)
                if msg["typ"] == "SnapshottingDone":
                    if snapshot_done_at is None:
                        snapshot_done_at = len(rows)
                    continue
                val = (msg["old_val"] if msg["typ"] == "Delete"
                       else msg["new_val"])
                rows.append({
                    "__op": _OPS[msg["typ"]],
                    "__seq": len(rows),
                    "value": json.dumps(val, sort_keys=True),
                    "old_value": (json.dumps(msg["old_val"],
                                             sort_keys=True)
                                  if msg["typ"] == "Update" else None),
                })
        # find the next spool file index (append-only, like every spool)
        existing = [fn for fn in os.listdir(spool_dir)
                    if fn.startswith("js-") and fn.endswith(".jsonl")]
        nxt = 1 + max(
            (int(fn[3:-6]) for fn in existing), default=-1)
        if rows:
            tmp = os.path.join(spool_dir, f".tmp-{nxt}")
            with open(tmp, "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, os.path.join(spool_dir, f"js-{nxt:06d}.jsonl"))
        if snapshot_done_at is not None:
            with open(os.path.join(spool_dir, "_snapshot_done"), "w") as f:
                f.write(str(snapshot_done_at))
        return len(rows)


def js_records(spark: SparkSession, spool_dir: str) -> DataFrame:
    """The `json_records` table: one Json column `value`, the CURRENT
    rows after applying every op in sequence. json_records has no PK
    (the reference's one-Json-column contract), so ops apply by VALUE
    multiset: Insert and Update.new add one occurrence, Delete.old and
    Update.old remove one; rows with a positive net count remain, at
    their multiplicity. (Values are canonical sort_keys JSON, so equal
    objects compare equal.) For raw events use js_changelog; for
    streaming: spark.readStream.schema(RECORD_SCHEMA_DDL).json(...)."""
    df = spark.read.schema(RECORD_SCHEMA_DDL).json(
        os.path.join(spool_dir, "*.jsonl"))
    adds = (
        df.filter(F.col("__op").isin("I", "U"))
        .select(F.col("value").alias("v"), F.lit(1).alias("d"))
    )
    drops = (
        df.filter(F.col("__op") == "D")
        .select(F.col("value").alias("v"), F.lit(-1).alias("d"))
        .unionByName(
            df.filter(F.col("__op") == "U")
            .select(F.col("old_value").alias("v"), F.lit(-1).alias("d")))
    )
    net = (
        adds.unionByName(drops)
        .groupBy("v").agg(F.sum("d").alias("n"))
        .filter(F.col("n") > 0)
    )
    return (
        net.select(F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_"),
                   F.col("v").alias("value"))
        .select("value")
    )


def js_changelog(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Records as the engine changelog convention (__op/__txid/__seq):
    each bootstrap RUN is its own transaction, in emission order within
    it. run_js_source supports repeated runs (append-only js-%06d spool
    files, one per run) and __seq restarts at 0 every run, so __txid is
    the spool file's run index — parsed from the file name — keeping
    (__txid, __seq) a total, unambiguous ordering/idempotence key
    across runs (ADVICE r11)."""
    df = spark.read.schema(RECORD_SCHEMA_DDL).json(
        os.path.join(spool_dir, "*.jsonl"))
    return df.select(
        "__op",
        F.regexp_extract(F.input_file_name(), r"js-(\d+)\.jsonl$", 1)
        .cast("long").alias("__txid"),
        "__seq", "value", "old_value")


def snapshot_done(spool_dir: str) -> bool:
    """Whether the source has signalled SnapshottingDone — the
    reference's TransactionInfo::SnapshottingDone marker."""
    return os.path.exists(os.path.join(spool_dir, "_snapshot_done"))
