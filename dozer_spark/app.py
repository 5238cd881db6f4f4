"""Application runner — the `dozer run` equivalent (reference entry point A).

Reference flow (SURVEY.md section 3.1): YAML config declares connections/
sources/sql/sinks (dozer-types/src/models/config.rs:51);
SimpleOrchestrator::run_apps builds connectors, compiles the SQL to a
pipeline, attaches sinks to the INTO-named outputs
(dozer-cli/src/simple/orchestrator.rs:77-118).

Our config schema (YAML or dict):

    sources:
      orders:                 # registered table name
        path: /data/orders.parquet
        format: parquet        # parquet|csv|json
        pk: [o_orderkey]       # optional primary key
    sql: |
      SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey INTO per_cust;
      SELECT * FROM per_cust WHERE n > 5 INTO frequent;
    sinks:
      per_cust: {path: /out/per_cust, format: parquet}
      frequent: {path: /out/frequent, format: parquet, partition_by: [n]}

An optional `ops:` stage (beyond the reference's SQL-only model) runs
declarative corpus-pipeline steps before the SQL; each output registers
as a table the SQL and sinks can reference:

    ops:
      clean:
        op: pii_redact              # see _app_ops() for the registry
        input: documents
        args: {text_col: text}
      shards:
        op: token_shard_assignment
        input: clean                # ops chain in declaration order
        args: {id_col: doc_id, text_col: text, budget: 2000}

An optional `quality:` stage (ops/quality.py) runs LAST, so gates can
target sources, op outputs, or SQL outputs; values export as metrics
gauges, and `fail_on_violation: true` raises before the caller promotes
the batch:

    quality:
      orders_gate:
        table: orders
        fail_on_violation: true
        constraints:
          - {type: completeness, col: o_custkey}
          - {type: uniqueness, col: o_orderkey}
          - {type: in_range, col: o_totalprice, lo: 0, hi: 200000,
             min_value: 0.5}

Each statement's INTO output is registered as a table for later
statements (mirroring the reference, where INTO names an endpoint other
pipelines and sinks can reference) and written by its sink if one is
declared. Statements without INTO must be last and are returned.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dozer_spark.plans import statement_to_dataframe
from dozer_spark.registry import Catalog, load_parquet
from dozer_spark.sinks import write_table
from dozer_spark.sources.files import read_table


@dataclass
class AppResult:
    outputs: dict[str, DataFrame] = field(default_factory=dict)
    written: dict[str, str] = field(default_factory=dict)  # name -> path
    metrics: object = None          # MetricsRegistry when `metrics:` set
    metrics_server: object = None   # MetricsServer when a port was given
    quality: dict = field(default_factory=dict)  # gate -> constraint rows


def _split_statements(sql: str) -> list[str]:
    """Split on ';' outside string literals."""
    out, buf, in_str = [], [], None
    for ch in sql:
        if in_str:
            buf.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(ch)
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


def run_app(spark: SparkSession, config: dict | str,
            metrics_registry=None, serve_metrics: bool = True) -> AppResult:
    """Execute an app config (dict, YAML string, or path to a YAML file).

    metrics_registry: inject a pre-built MetricsRegistry (counters land
    there instead of a fresh one). serve_metrics=False skips starting
    the config-declared `metrics: {port: N}` scrape endpoint — pass it
    when the caller already serves the injected registry on that port
    itself (starting a second server there would hit EADDRINUSE
    mid-run)."""
    # canonical loader shared with the build/clean CLI surface
    # (buildlock.load_config) so the path-vs-inline heuristic can't
    # drift between `run`, `build`, and the metrics override branch
    from dozer_spark.buildlock import load_config

    config, _ = load_config(config)

    cat = Catalog(spark)
    for name, src in (config.get("sources") or {}).items():
        fmt = src.get("format", "parquet")
        if fmt == "parquet":
            # ns-timestamp-safe path (see registry._nanos_ts_cols)
            df = load_parquet(spark, src["path"], name)
        elif fmt == "webhook":
            # rows spooled by sources/webhook.WebhookServer; `schema` is
            # a DDL string ("id long, v string")
            from pyspark.sql.types import _parse_datatype_string

            from dozer_spark.sources.webhook import webhook_rows

            df = webhook_rows(spark, src["path"],
                              _parse_datatype_string(src["schema"]))
        elif fmt == "wal2json_spool":
            # changelog spooled by sources/pg_replication.tail_to_spool;
            # resolves to the CURRENT snapshot (changelog replayed by PK)
            from dozer_spark.sources.pg_replication import spool_changelog
            from dozer_spark.streaming.changelog import apply_changelog

            pk = src.get("pk")
            if not pk:
                raise ValueError(f"source {name!r}: wal2json_spool needs pk")
            cl = spool_changelog(spark, src["path"], src.get("table", name),
                                 dict(src["columns"]), pk=list(pk))
            df = apply_changelog(cl, list(pk))
        elif fmt == "kafka_debezium_spool":
            # snapshot of a Debezium CDC topic tailed by the native
            # Kafka consumer (sources/kafka_wire.py tail_kafka_to_spool)
            from pyspark.sql import types as T

            from dozer_spark.sources.kafka import debezium_changelog
            from dozer_spark.sources.kafka_wire import spool_kafka_frame
            from dozer_spark.streaming.changelog import apply_changelog

            pk = src.get("pk")
            if not pk:
                raise ValueError(f"source {name!r}: kafka_debezium_spool needs pk")
            row_schema = T.StructType.fromDDL(
                ", ".join(f"{c} {t}" for c, t in dict(src["columns"]).items())
            )
            cl = debezium_changelog(spool_kafka_frame(spark, src["path"]),
                                    row_schema)
            df = apply_changelog(cl, list(pk))
        elif fmt == "transactional":
            # read back a TransactionalTable sink as a source
            from dozer_spark.storage import TransactionalTable

            pk = src.get("pk")
            if not pk:
                raise ValueError(f"source {name!r}: transactional needs pk")
            df = TransactionalTable(spark, src["path"], pk=list(pk)).read()
        else:
            df = read_table(spark, src["path"], fmt)
        cat.register(name, df, pk=src.get("pk"))

    sinks = config.get("sinks") or {}
    result = AppResult()

    # optional `metrics:` stage — app-level counters (rows/seconds per
    # output) plus an embedded scrape endpoint when `port` is given
    # (reference: dozer-tracing/src/prometheus_server.rs). Row counts
    # are recorded only for TERMINAL outputs (sunk tables and the final
    # un-INTO'd result): counting an unsunk intermediate would
    # re-execute its full query once more purely for observability.
    # Wall-clock seconds are recorded for every stage (no extra job).
    # A caller may inject a pre-built registry (metrics_registry=) so
    # e.g. the CLI can start the scrape server BEFORE execution. A
    # config-declared `metrics: {port: N}` still starts the scrape
    # endpoint in that case (on the injected registry) — injection
    # replaces the registry, not the declared endpoint — UNLESS the
    # caller passes serve_metrics=False because it pre-bound the port
    # with its own server.
    registry = metrics_registry
    mcfg = config.get("metrics")
    if registry is None and mcfg is not None:
        from dozer_spark.metrics import MetricsRegistry

        registry = MetricsRegistry()
    if (serve_metrics and registry is not None and isinstance(mcfg, dict)
            and mcfg.get("port") is not None):
        from dozer_spark.metrics import MetricsServer

        result.metrics_server = MetricsServer(
            registry, port=int(mcfg["port"])
        ).start()
    result.metrics = registry
    sinks_cfg_names = set(sinks)

    def _record(name: str, df: DataFrame, t0: float) -> None:
        if registry is None:
            return
        import time as _time

        registry.inc("dozer_output_seconds_total",
                     _time.monotonic() - t0, output=name)
        if name in sinks_cfg_names or name == "__result__":
            registry.inc("dozer_output_rows_total", df.count(), output=name)

    # Every stage below can raise (unknown op/table, SQL errors, sink
    # failures, fail_on_violation quality gates). A raising stage must
    # not leak the scrape server started above: the caller never
    # receives the AppResult holding it, so stop it here and attach the
    # partial result to the exception (`exc.app_result`) for callers
    # that want the stage outputs / registry post-mortem.
    try:
        # ops stage: declarative corpus-pipeline steps (beyond the
        # reference's SQL-only app model — the ops/ layer exposed to the
        # `dozer run` UX). Each entry registers its output as a table the
        # SQL stage and sinks can reference; entries run in declaration
        # order, so an op can consume an earlier op's output.
        for name, spec in (config.get("ops") or {}).items():
            fn = _APP_OPS.get(spec.get("op"))
            if fn is None:
                raise ValueError(
                    f"ops.{name}: unknown op {spec.get('op')!r} "
                    f"(available: {sorted(_APP_OPS)})"
                )
            if cat.has(name):
                # an op output named like an existing source/op would
                # silently shadow that table for the SQL stage
                raise ValueError(
                    f"ops.{name}: name collides with an existing table — "
                    "rename the op entry or the source"
                )
            inp = spec.get("input")
            if not inp:
                raise ValueError(f"ops.{name}: missing required key 'input'")
            if not cat.has(inp):
                raise ValueError(
                    f"ops.{name}: unknown input table {inp!r} "
                    f"(known: {sorted(cat.names())})"
                )
            import time as _time

            t0 = _time.monotonic()
            out = fn(cat.df(inp), **(spec.get("args") or {}))
            cat.register(name, out)
            result.outputs[name] = out
            if name in sinks:
                result.written[name] = _run_sink(spark, cat, out, name,
                                                 sinks[name])
            _record(name, out, t0)

        statements = _split_statements(config.get("sql", ""))
        for i, stmt in enumerate(statements):
            import time as _time

            t0 = _time.monotonic()
            df, into = statement_to_dataframe(spark, stmt, cat)
            if into is None:
                if i != len(statements) - 1:
                    raise ValueError(
                        "only the final statement may omit INTO (intermediate "
                        "outputs must be named so later statements/sinks can "
                        "reference them — builder/mod.rs:336-358)"
                    )
                result.outputs["__result__"] = df
                _record("__result__", df, t0)
                continue
            cat.register(into, df)
            result.outputs[into] = df
            if into in sinks:
                result.written[into] = _run_sink(spark, cat, df, into,
                                                 sinks[into])
            _record(into, df, t0)
        unknown_sinks = set(sinks) - set(result.outputs)
        if unknown_sinks:
            raise ValueError(f"sinks reference unknown outputs: {sorted(unknown_sinks)}")

        # quality stage: declarative validation gates (ops/quality.py) over
        # any registered table — sources, op outputs, or SQL outputs (it
        # runs last so it can gate what the app produced). One aggregation
        # pass per gate; values exported as gauges when `metrics:` is on;
        # fail_on_violation raises BEFORE the caller promotes the batch.
        for gname, spec in (config.get("quality") or {}).items():
            table = spec.get("table")
            if not table:
                raise ValueError(
                    f"quality.{gname}: missing required key 'table'")
            src = (cat.df(table) if cat.has(table)
                   else result.outputs.get(table))
            if src is None:
                raise ValueError(
                    f"quality.{gname}: unknown table {table!r} "
                    f"(known: {sorted(set(cat.names()) | set(result.outputs))})"
                )
            cons = [_build_constraint(gname, c)
                    for c in (spec.get("constraints") or [])]
            from dozer_spark.ops.quality import data_quality_report

            rows = data_quality_report(src, cons).collect()  # 1/constraint
            result.quality[gname] = rows
            if registry is not None:
                for r in rows:
                    registry.set_gauge("dozer_quality_value", r["value"],
                                       gate=gname, constraint=r["constraint"])
                    registry.set_gauge("dozer_quality_passed",
                                       float(r["passed"]),
                                       gate=gname, constraint=r["constraint"])
            failed = [r["constraint"] for r in rows if r["passed"] == 0]
            if failed and spec.get("fail_on_violation", False):
                raise ValueError(
                    f"quality.{gname}: constraint(s) violated on {table!r}: "
                    f"{failed} — batch must not be promoted"
                )
    except Exception as exc:
        if result.metrics_server is not None:
            result.metrics_server.stop()
            result.metrics_server = None
        exc.app_result = result
        raise
    return result


_CONSTRAINT_TYPES = {
    "completeness": ("col",),
    "uniqueness": ("col",),
    "in_range": ("col", "lo", "hi"),
    "matches": ("col", "pattern"),
    "accepted_values": ("col", "values"),
}


def _build_constraint(gate: str, spec: dict):
    """YAML constraint entry -> ops/quality.py Constraint."""
    from dozer_spark.ops import quality as q

    kind = spec.get("type")
    if kind not in _CONSTRAINT_TYPES:
        raise ValueError(
            f"quality.{gate}: unknown constraint type {kind!r} "
            f"(available: {sorted(_CONSTRAINT_TYPES)})"
        )
    required = _CONSTRAINT_TYPES[kind]
    missing = [k for k in required if k not in spec]
    if missing:
        raise ValueError(
            f"quality.{gate}: constraint {kind!r} missing keys {missing}")
    kwargs = {k: spec[k] for k in required}
    if "min_value" in spec:
        kwargs["min_value"] = float(spec["min_value"])
    return getattr(q, kind)(**kwargs)


def _app_ops() -> dict:
    """Name -> op callable (df, **args). Deliberately the high-level
    table-in/table-out subset of ops/ — pair ops, samplers, packers,
    cleaners; anything needing a second table or a predicate stays an
    API call."""
    from pyspark.sql import functions as F

    from dozer_spark.ops.dedup import (
        drop_duplicated_segments,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from dozer_spark.ops.packing import token_shard_assignment
    from dozer_spark.ops.sampling import (
        hash_sample,
        quota_sample,
        stratified_hash_sample,
        temperature_sample,
    )
    from dozer_spark.ops.embedding import pca_fit, pca_project
    from dozer_spark.ops.fuzzy import fuzzy_self_join_dist1
    from dozer_spark.ops.quality import value_histogram
    from dozer_spark.ops.sampling import hash_split
    from dozer_spark.ops.text import (
        ccnet_perplexity_buckets,
        cross_source_dup_matrix,
        gopher_quality,
        redact_pii,
        top_ngrams,
    )
    from dozer_spark.ops.timeseries import gap_fill_interpolate

    def gopher_filter(df, text_col):
        return df.filter(gopher_quality(F.col(text_col))["passes"])

    def pii_redact(df, text_col, token="[PII]"):
        return df.withColumn(text_col, redact_pii(F.col(text_col), token))

    def hash_split_op(df, key_col, splits, salt=""):
        # YAML lists arrive as [[name, frac], ...]
        return hash_split(df, key_col, [tuple(s) for s in splits], salt)

    def pca_project_op(df, vec_col, dim, n_components, out_col="pc"):
        model = pca_fit(df, vec_col, dim=int(dim),
                        n_components=int(n_components))
        return pca_project(df, vec_col, model, out_col=out_col)

    return {
        "exact_dedup": exact_dedup,
        "minhash_lsh_pairs": minhash_lsh_pairs,
        "simhash_pairs": simhash_pairs,
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "drop_duplicated_segments": drop_duplicated_segments,
        "token_shard_assignment": token_shard_assignment,
        "hash_sample": hash_sample,
        "stratified_hash_sample": stratified_hash_sample,
        "quota_sample": quota_sample,
        "temperature_sample": temperature_sample,
        "top_ngrams": top_ngrams,
        "gopher_filter": gopher_filter,
        "pii_redact": pii_redact,
        "fuzzy_pairs": fuzzy_self_join_dist1,
        "gap_fill": gap_fill_interpolate,
        "hash_split": hash_split_op,
        "value_histogram": value_histogram,
        "ccnet_buckets": ccnet_perplexity_buckets,
        "cross_source_dup_matrix": cross_source_dup_matrix,
        "pca_project": pca_project_op,
    }


_APP_OPS_CACHE: dict | None = None


class _LazyOps:
    """Memoized view over _app_ops(): keeps the module's lazy-import
    convention — the ops subtree loads only when a config actually has
    an ops: stage."""

    def _reg(self) -> dict:
        global _APP_OPS_CACHE
        if _APP_OPS_CACHE is None:
            _APP_OPS_CACHE = _app_ops()
        return _APP_OPS_CACHE

    def get(self, name):
        return self._reg().get(name)

    def __iter__(self):
        return iter(self._reg())


_APP_OPS = _LazyOps()


def _run_sink(spark: SparkSession, cat: Catalog, df: DataFrame, into: str,
              sink: dict) -> str:
    """Write one named output to its declared sink; returns the target."""
    if sink.get("format") == "transactional":
        # MERGE-by-PK sink (storage/txtable.py): atomic versioned
        # commits + change feed; pk required (the reference's
        # sinks are PK-keyed too, record_store.rs)
        from dozer_spark.storage import TransactionalTable

        pk = sink.get("pk") or (cat.pk(into) if hasattr(cat, "pk") else None)
        if not pk:
            raise ValueError(
                f"transactional sink {into!r} needs a pk: [...] entry"
            )
        TransactionalTable(
            spark, sink["path"], pk=list(pk),
            n_buckets=int(sink.get("n_buckets", 16)),
        ).merge(df)
    elif sink.get("format") == "clickhouse":
        # native HTTP sink (sinks_clickhouse.py): DDL from the
        # output schema, executor-side JSONEachRow inserts — the
        # reference's SinkConfig::Clickhouse path
        from dozer_spark.sinks_clickhouse import ClickHouseHttpSink

        ch = ClickHouseHttpSink(
            sink["endpoint"], sink.get("database", "default"),
            sink.get("table", into),
            user=sink.get("user", "default"),
            password=sink.get("password", ""),
            order_by=list(sink.get("order_by") or []),
        )
        ch.create_table(df.schema)
        ch.write(df)
    else:
        write_table(
            df,
            sink["path"],
            fmt=sink.get("format", "parquet"),
            mode=sink.get("mode", "overwrite"),
            partition_by=sink.get("partition_by"),
        )
    return sink.get("path") or sink.get("endpoint", "")
