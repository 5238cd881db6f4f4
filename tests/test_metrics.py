"""Metrics layer (reference: dozer-tracing telemetry + prometheus
server): registry semantics, the HTTP scrape endpoint, per-epoch
streaming counters, and the app-runner `metrics:` stage."""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import functions as F

from dozer_spark.metrics import (
    MetricsRegistry,
    MetricsServer,
    instrument_foreach_batch,
)


def test_registry_counters_and_prometheus_text():
    reg = MetricsRegistry()
    reg.inc("dozer_rows_total", 5, pipeline="p1")
    reg.inc("dozer_rows_total", 7, pipeline="p1")
    reg.inc("dozer_rows_total", 1, pipeline="p2")
    reg.inc("dozer_up")
    assert reg.get("dozer_rows_total", pipeline="p1") == 12
    assert reg.get("dozer_rows_total", pipeline="p2") == 1
    txt = reg.prometheus_text()
    assert "# TYPE dozer_rows_total counter" in txt
    assert 'dozer_rows_total{pipeline="p1"} 12' in txt
    assert "dozer_up 1.0" in txt
    snap = reg.snapshot()
    assert {"labels": {"pipeline": "p1"}, "value": 12.0} in snap["dozer_rows_total"]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read().decode()


def test_http_endpoint_serves_both_formats():
    reg = MetricsRegistry()
    reg.inc("dozer_epochs_total", 3, pipeline="x")
    srv = MetricsServer(reg).start()
    try:
        js = json.loads(_get(srv.url + "/metrics.json"))
        assert js["dozer_epochs_total"][0]["value"] == 3.0
        txt = _get(srv.url + "/metrics")
        assert 'dozer_epochs_total{pipeline="x"} 3' in txt
    finally:
        srv.stop()


def test_streaming_epoch_counters_advance(spark, tmp_path):
    """The acceptance gate: counters advance across micro-batch epochs
    of a real structured-streaming query, observable over HTTP while
    the pipeline runs batch after batch."""
    src = tmp_path / "in"
    src.mkdir()
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    df.filter(F.col("id") == 1).coalesce(1).write.parquet(str(src / "f1"))

    reg = MetricsRegistry()
    srv = MetricsServer(reg).start()
    sunk: list = []

    def sink(bdf, bid):
        sunk.extend(bdf.collect())

    def run_once():
        stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
        q = (
            stream.writeStream
            .foreachBatch(instrument_foreach_batch(sink, reg, "ingest"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        run_once()
        e1 = reg.get("dozer_epochs_total", pipeline="ingest")
        r1 = reg.get("dozer_rows_total", pipeline="ingest")
        assert e1 >= 1 and r1 == 1

        # second epoch: new files, same checkpoint -> counters ADVANCE
        df.filter(F.col("id") > 1).coalesce(1).write.parquet(str(src / "f2"))
        run_once()
        js = json.loads(_get(srv.url + "/metrics.json"))
        by = {tuple(s["labels"].items()): s["value"]
              for s in js["dozer_epochs_total"]}
        assert by[(("pipeline", "ingest"),)] > e1
        assert reg.get("dozer_rows_total", pipeline="ingest") == 3
        assert reg.get("dozer_batch_seconds_total", pipeline="ingest") > 0
        assert len(sunk) == 3
    finally:
        srv.stop()


def test_run_app_metrics_stage(spark, tmp_path):
    import yaml

    from dozer_spark.app import run_app

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    ).write.parquet(str(src))
    cfg = yaml.safe_dump({
        "app_name": "m",
        "sources": {"docs": {"path": str(src), "format": "parquet"}},
        "ops": {"dedup": {"op": "exact_dedup", "input": "docs",
                          "args": {"text_col": "text", "id_col": "doc_id"}}},
        "sql": "SELECT COUNT(*) AS n FROM dedup",
        "metrics": {"port": 0},
    })
    res = run_app(spark, cfg)
    try:
        # terminal-only row counting: 'dedup' is an unsunk intermediate
        # consumed by the SQL stage — counting it would re-execute its
        # query purely for observability, so it gets seconds only.
        # Rows are recorded for sunk outputs and the final __result__.
        assert res.metrics.get("dozer_output_rows_total", output="dedup") == 0.0
        assert res.metrics.get("dozer_output_rows_total", output="__result__") == 1
        assert res.metrics.get("dozer_output_seconds_total", output="dedup") > 0
        txt = _get(res.metrics_server.url + "/metrics")
        assert 'dozer_output_rows_total{output="__result__"} 1' in txt
        assert 'dozer_output_seconds_total{output="dedup"}' in txt
        assert 'dozer_output_rows_total{output="dedup"}' not in txt
    finally:
        res.metrics_server.stop()


def test_run_app_injected_registry_still_serves_config_port(spark, tmp_path):
    """metrics_registry= injection replaces the registry, not the
    config-declared scrape endpoint: `metrics: {port: N}` must still
    start a server (on the injected registry) — previously it was
    silently ignored."""
    import yaml

    from dozer_spark.app import run_app

    src = tmp_path / "t.parquet"
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(str(src))
    cfg = yaml.safe_dump({
        "app_name": "inj",
        "sources": {"t": {"path": str(src), "format": "parquet"}},
        "sql": "SELECT COUNT(*) AS n FROM t",
        "metrics": {"port": 0},
    })
    reg = MetricsRegistry()
    res = run_app(spark, cfg, metrics_registry=reg)
    try:
        assert res.metrics is reg
        assert res.metrics_server is not None
        txt = _get(res.metrics_server.url + "/metrics")
        assert 'dozer_output_rows_total{output="__result__"} 1' in txt
        assert reg.get("dozer_output_rows_total", output="__result__") == 1
    finally:
        res.metrics_server.stop()


def test_run_app_serve_metrics_false_skips_config_port(spark, tmp_path):
    """A caller that pre-binds the scrape port itself (documented CLI
    pattern: start the server, then inject the registry) passes
    serve_metrics=False — run_app must NOT start a second server on the
    config-declared port (EADDRINUSE mid-run otherwise). Counters still
    land in the injected registry; the caller's server keeps serving."""
    import yaml

    from dozer_spark.app import run_app

    src = tmp_path / "t.parquet"
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(str(src))
    reg = MetricsRegistry()
    own = MetricsServer(reg).start()  # caller's server, pre-bound
    try:
        cfg = yaml.safe_dump({
            "app_name": "inj2",
            "sources": {"t": {"path": str(src), "format": "parquet"}},
            "sql": "SELECT COUNT(*) AS n FROM t",
            # declare the SAME port the caller already bound
            "metrics": {"port": own.port},
        })
        res = run_app(spark, cfg, metrics_registry=reg,
                      serve_metrics=False)
        assert res.metrics is reg
        assert res.metrics_server is None  # no second bind attempted
        txt = _get(own.url + "/metrics")
        assert 'dozer_output_rows_total{output="__result__"} 1' in txt
    finally:
        own.stop()
