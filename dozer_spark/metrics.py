"""Operational metrics — the reference's telemetry layer re-expressed.

The reference exports operator-level Prometheus counters from a small
embedded HTTP server (dozer-tracing/src/telemetry.rs,
dozer-tracing/src/prometheus_server.rs); Spark's own metrics system
covers executor/task internals, but the APP-level counters a `dozer
run` operator watches — rows processed per pipeline, epochs committed,
wall seconds — live here:

- MetricsRegistry: thread-safe labeled counters (plain dict + lock; a
  micro-batch increments a handful of counters, so contention is nil).
- MetricsServer: stdlib http.server (same pattern as the webhook
  source) exposing GET /metrics (Prometheus text exposition format)
  and GET /metrics.json (JSON snapshot). Port 0 picks a free port.
- instrument_foreach_batch: wraps a writeStream.foreachBatch callable
  so every epoch advances rows/epochs/seconds counters. The row count
  is one count() job per micro-batch — the standard observability tax;
  leave metrics off if an epoch's extra job matters.

All counters are process-local (the driver). On a real cluster the
driver is where foreachBatch runs, so the counters are already global
to the query; multi-driver deployments scrape each driver, which is
exactly the reference's one-server-per-process model.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MetricsRegistry:
    """Labeled monotonic counters: name + sorted label tuple -> float."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, dict[tuple, float]] = {}
        # Names ever written via set_gauge: last-write-wins values can
        # decrease, so the exposition must declare them `gauge` — a
        # `counter` TYPE would make rate()/increase() garbage and strict
        # scrapers may reject a decreasing counter series.
        self._gauge_names: set[str] = set()

    def inc(self, name: str, value: float = 1.0, **labels) -> None:
        key = tuple(sorted(labels.items()))
        with self._lock:
            series = self._counters.setdefault(name, {})
            series[key] = series.get(key, 0.0) + value

    def set_gauge(self, name: str, value: float, **labels) -> None:
        """Last-write-wins gauge (quality shares, watermarks) — same
        storage/exposition as counters, overwrite instead of add."""
        key = tuple(sorted(labels.items()))
        with self._lock:
            self._gauge_names.add(name)
            self._counters.setdefault(name, {})[key] = value

    def get(self, name: str, **labels) -> float:
        key = tuple(sorted(labels.items()))
        with self._lock:
            return self._counters.get(name, {}).get(key, 0.0)

    def snapshot(self) -> dict:
        """{name: [{labels: {...}, value: v}, ...]} — the JSON shape."""
        with self._lock:
            return {
                name: [
                    {"labels": dict(key), "value": v}
                    for key, v in sorted(series.items())
                ]
                for name, series in sorted(self._counters.items())
            }

    def prometheus_text(self) -> str:
        """Prometheus text exposition format (counters + gauges)."""
        lines = []
        with self._lock:
            for name, series in sorted(self._counters.items()):
                kind = "gauge" if name in self._gauge_names else "counter"
                lines.append(f"# TYPE {name} {kind}")
                for key, v in sorted(series.items()):
                    if key:
                        lbl = ",".join(f'{k}="{val}"' for k, val in key)
                        lines.append(f"{name}{{{lbl}}} {v}")
                    else:
                        lines.append(f"{name} {v}")
        return "\n".join(lines) + "\n"


class MetricsServer:
    """Embedded scrape endpoint for a MetricsRegistry."""

    def __init__(self, registry: MetricsRegistry,
                 host: str = "127.0.0.1", port: int = 0):
        self.registry = registry
        reg = registry

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.split("?")[0] == "/metrics.json":
                    body = json.dumps(reg.snapshot()).encode()
                    ctype = "application/json"
                elif self.path.split("?")[0] == "/metrics":
                    body = reg.prometheus_text().encode()
                    ctype = "text/plain; version=0.0.4"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "MetricsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def instrument_foreach_batch(fn, registry: MetricsRegistry, pipeline: str):
    """Wrap a foreachBatch(df, batch_id) callable with per-epoch
    counters: dozer_epochs_total, dozer_rows_total,
    dozer_batch_seconds_total (all labeled pipeline=<name>)."""

    def wrapped(df, batch_id):
        t0 = time.monotonic()
        n = df.count()
        fn(df, batch_id)
        registry.inc("dozer_epochs_total", pipeline=pipeline)
        registry.inc("dozer_rows_total", n, pipeline=pipeline)
        registry.inc("dozer_batch_seconds_total",
                     time.monotonic() - t0, pipeline=pipeline)

    return wrapped
