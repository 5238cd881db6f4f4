"""JavaScript UDFs (the reference's Deno UDF surface re-expressed via
a sandboxed Node subprocess, Arrow-batch JSON marshalling)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

node_missing = shutil.which("node") is None
pytestmark = pytest.mark.skipif(
    node_missing, reason="no node runtime on PATH (env gate)")


def test_scalar_roundtrip(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(spark, "js_twice", "(v) => v * 2 + 1", "double",
                    trusted_source=True)
    got = spark.sql("SELECT js_twice(CAST(id AS DOUBLE)) AS r "
                    "FROM range(5) ORDER BY id").collect()
    assert [r.r for r in got] == [1.0, 3.0, 5.0, 7.0, 9.0]


def test_string_and_null_handling(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(
        spark, "js_shout",
        "(s) => s === null ? null : s.toUpperCase() + '!'",
        "string", trusted_source=True)
    df = spark.createDataFrame([("a",), (None,), ("Bc",)], "s string")
    got = [r.r for r in df.selectExpr("js_shout(s) AS r").collect()]
    assert got == ["A!", None, "BC!"]


def test_struct_arg_json_object(spark):
    """Multi-arg via struct -> JS object, the reference's JSON-arg shape."""
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(
        spark, "js_total",
        "function (row) { return row.qty * row.price; }",
        "double", trusted_source=True)
    df = spark.createDataFrame([(2, 1.5), (3, 2.0)], "qty long, price double")
    got = [r.r for r in df.selectExpr(
        "js_total(struct(qty, price)) AS r").collect()]
    assert got == [3.0, 6.0]


def test_js_error_propagates(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    register_js_udf(spark, "js_boom", "(v) => { throw new Error('nope'); }",
                    "double", trusted_source=True)
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(Exception, match="nope"):
        df.selectExpr("js_boom(v) AS r").collect()


def test_non_function_source_fails_at_registration(spark):
    from dozer_spark.functions.js_udf import register_js_udf

    with pytest.raises(RuntimeError, match="function"):
        register_js_udf(spark, "js_bad", "42", "double",
                        trusted_source=True)


def test_sandbox_blocks_fs_when_supported(spark):
    from dozer_spark.functions.js_udf import _sandbox_args, run_js_batch

    if not _sandbox_args():
        pytest.skip("this node lacks a permission flag")
    with pytest.raises(RuntimeError):
        run_js_batch("(v) => require('fs').readFileSync('/etc/hostname')",
                     [1])


def test_untrusted_registration_raises(spark):
    """The trust gate: Node cannot deny network egress (no --allow-net
    equivalent), so every registration must carry the explicit
    trusted_source opt-in — the truthful version of the reference's
    deny-by-default Deno sandbox."""
    from dozer_spark.functions.js_udf import register_js_udf

    with pytest.raises(RuntimeError, match="network egress"):
        register_js_udf(spark, "js_nope", "(v) => v", "double")


def test_worker_is_persistent_across_batches(spark):
    """One resident Node process per executor worker: consecutive
    batches of the same function must hit the same PID (spawn-per-batch
    was the r6 design; this pins the persistent-worker upgrade)."""
    from dozer_spark.functions.js_udf import _worker, run_js_batch

    src = "(v) => v + 1"
    assert run_js_batch(src, [1, 2]) == [2, 3]
    pid1 = _worker(src).proc.pid
    assert run_js_batch(src, [10]) == [11]
    assert _worker(src).proc.pid == pid1


def test_worker_death_fails_loudly_and_respawns(spark):
    """A worker that exits mid-stream fails the batch with its exit
    code; the next call gets a fresh worker instead of a silent hang."""
    from dozer_spark.functions.js_udf import run_js_batch

    src = "(v) => { if (v === 13) process.exit(7); return v; }"
    assert run_js_batch(src, [1]) == [1]
    with pytest.raises(RuntimeError, match="exit 7"):
        run_js_batch(src, [13])
    # evicted from the pool -> a retry works again
    assert run_js_batch(src, [2]) == [2]


def test_run_js_batch_thread_safe(spark):
    """run_js_batch is a public primitive: concurrent callers sharing
    one resident worker must never swap responses (the framing is
    serialized under a per-worker lock)."""
    import threading

    from dozer_spark.functions.js_udf import run_js_batch

    src = "(v) => v * 3"
    errors = []

    def hammer(base):
        try:
            for i in range(20):
                vals = [base + i, base + i + 1]
                assert run_js_batch(src, vals) == [v * 3 for v in vals]
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(b * 1000,))
               for b in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_partial_line_hang_hits_deadline(spark):
    """The timeout bounds the FULL response read: a worker that writes a
    partial line then hangs must fail at the deadline, not block
    readline forever (select alone only bounds time-to-first-byte)."""
    import time as _time

    from dozer_spark.functions.js_udf import run_js_batch

    # fs.writeSync(1, ...) flushes the partial bytes synchronously, then
    # the busy loop blocks the event loop so no newline ever arrives
    src = "(v) => { require('fs').writeSync(1, 'xx'); for(;;){} }"
    t0 = _time.monotonic()
    with pytest.raises(RuntimeError, match="timed out"):
        run_js_batch(src, [1], timeout=2)
    assert _time.monotonic() - t0 < 30
