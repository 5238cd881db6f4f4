"""Regression tests for the round-9 ADVICE findings:

1. value_histogram must clamp the bucket index while it is still LONG —
   an outlier more than 2^31 bucket-widths from lo must land in the edge
   bucket, not wrap into an interior one.
2. prometheus_text must declare set_gauge-written series as `gauge`
   (last-write-wins values can decrease; a `counter` TYPE breaks
   rate()/increase() and strict scrapers).
3. run_app must stop a metrics server it started when a
   fail_on_violation quality gate raises (no leaked HTTP thread/port),
   and attach the partial AppResult to the exception.
4. pca_fit's determinism claim is scoped to a fixed partitioning (doc
   change; behavior pinned here: same data + same partitioning is
   bit-for-bit reproducible).

Also: the driver CORRECTNESS window (first 50 registry entries) must be
all exact-oracle queries — rows-only variants register after slot 50.
"""

from __future__ import annotations

import urllib.error
import urllib.request

import numpy as np
import pytest
from pyspark.sql import Row

from dozer_spark.metrics import MetricsRegistry
from dozer_spark.ops.quality import value_histogram


class TestHistogramLongClamp:
    def test_extreme_outlier_lands_in_edge_buckets(self, spark):
        # 3e18 / width 0.5 = 6e18 bucket-widths >> 2^31: wraps if the
        # floor result is cast to INT before clamping.
        df = spark.createDataFrame(
            [Row(x=5.0), Row(x=3.0e18), Row(x=-3.0e18), Row(x=None)],
            "x double",
        )
        rows = {r["bucket"]: r["n"]
                for r in value_histogram(df, "x", 0.0, 10.0, 20).collect()}
        assert rows == {0: 1, 10: 1, 19: 1}  # -inf->0, 5.0->10, +inf->19
        assert sum(rows.values()) == 3  # NULL excluded, nothing lost

    def test_interior_values_unchanged(self, spark):
        df = spark.createDataFrame(
            [Row(x=float(i)) for i in range(10)], "x double")
        rows = {r["bucket"]: r["n"]
                for r in value_histogram(df, "x", 0.0, 10.0, 5).collect()}
        assert rows == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2}


class TestPrometheusGaugeType:
    def test_gauge_and_counter_types(self):
        reg = MetricsRegistry()
        reg.inc("dozer_rows_total", 5, table="t")
        reg.set_gauge("dozer_quality_value", 0.9, gate="g", constraint="c")
        reg.set_gauge("dozer_quality_value", 0.4, gate="g", constraint="c")
        text = reg.prometheus_text()
        assert "# TYPE dozer_rows_total counter" in text
        assert "# TYPE dozer_quality_value gauge" in text
        assert "counter" not in [
            ln.split()[-1] for ln in text.splitlines()
            if ln.startswith("# TYPE dozer_quality_value")
        ]
        # decreased value is the last write
        assert 'dozer_quality_value{constraint="c",gate="g"} 0.4' in text

    def test_name_used_as_both_is_exposed_as_gauge(self):
        reg = MetricsRegistry()
        reg.inc("m", 1)
        reg.set_gauge("m", 7)
        assert "# TYPE m gauge" in reg.prometheus_text()


class TestQualityGateServerCleanup:
    def test_failed_gate_stops_metrics_server(self, spark, catalog):
        from dozer_spark.app import run_app

        cfg = {
            "sources": {"nation": {"path": "/root/testdata/sf0.001/nation.parquet"}},
            "sql": ["SELECT n_nationkey, n_name FROM nation"],
            "metrics": {"port": 0},
            "quality": {
                "g1": {
                    "table": "nation",
                    "fail_on_violation": True,
                    "constraints": [
                        # 25 nations: impossible range => violated
                        {"type": "in_range", "col": "n_nationkey",
                         "lo": 1000, "hi": 2000},
                    ],
                }
            },
        }
        with pytest.raises(ValueError, match="violated") as ei:
            run_app(spark, cfg, serve_metrics=True)
        partial = getattr(ei.value, "app_result", None)
        assert partial is not None
        assert partial.metrics_server is None  # stopped and cleared
        assert "g1" in partial.quality  # gate rows still inspectable

    def test_passing_gate_leaves_server_running(self, spark, catalog):
        from dozer_spark.app import run_app

        cfg = {
            "sources": {"nation": {"path": "/root/testdata/sf0.001/nation.parquet"}},
            "sql": ["SELECT n_nationkey FROM nation"],
            "metrics": {"port": 0},
            "quality": {
                "g1": {
                    "table": "nation",
                    "fail_on_violation": True,
                    "constraints": [
                        {"type": "completeness", "col": "n_nationkey"},
                    ],
                }
            },
        }
        res = run_app(spark, cfg, serve_metrics=True)
        try:
            assert res.metrics_server is not None
            url = f"http://127.0.0.1:{res.metrics_server.port}/metrics"
            body = urllib.request.urlopen(url, timeout=5).read().decode()
            assert "# TYPE dozer_quality_value gauge" in body
        finally:
            if res.metrics_server is not None:
                res.metrics_server.stop()


class TestPcaFixedPartitioningDeterminism:
    def test_same_partitioning_bit_for_bit(self, spark):
        from dozer_spark.ops.embedding import pca_fit

        rng = np.random.default_rng(7)
        rows = [Row(v=[float(x) for x in rng.normal(size=8)])
                for _ in range(400)]
        df = spark.createDataFrame(rows, "v array<double>").repartition(4, "v")
        m1 = pca_fit(df, "v", 8, 3)
        m2 = pca_fit(df, "v", 8, 3)
        assert np.array_equal(m1.components, m2.components)
        assert np.array_equal(m1.mean, m2.mean)


class TestDriverWindowAllExact:
    def test_first_50_registry_entries_have_oracles(self):
        from dozer_spark.queries import registry

        r = registry()
        names = list(r)
        assert len(names) >= 50
        missing = [n for n in names[:50] if r[n].oracle is None]
        assert missing == []


class TestServerCleanupAllStages:
    def test_failed_ops_stage_stops_metrics_server(self, spark):
        """The leak guard must cover every stage after the server
        starts, not just quality gates (review finding r10)."""
        from dozer_spark.app import run_app

        cfg = {
            "sources": {"nation": {
                "path": "/root/testdata/sf0.001/nation.parquet"}},
            "metrics": {"port": 0},
            "ops": {"bad": {"op": "no_such_op", "input": "nation"}},
            "sql": ["SELECT n_nationkey FROM nation"],
        }
        with pytest.raises(ValueError, match="unknown op") as ei:
            run_app(spark, cfg, serve_metrics=True)
        partial = getattr(ei.value, "app_result", None)
        assert partial is not None and partial.metrics_server is None

    def test_failed_sql_stage_stops_metrics_server(self, spark):
        from dozer_spark.app import run_app

        cfg = {
            "sources": {"nation": {
                "path": "/root/testdata/sf0.001/nation.parquet"}},
            "metrics": {"port": 0},
            "sql": ["SELECT no_such_col FROM nation"],
        }
        with pytest.raises(Exception) as ei:
            run_app(spark, cfg, serve_metrics=True)
        partial = getattr(ei.value, "app_result", None)
        assert partial is not None and partial.metrics_server is None
