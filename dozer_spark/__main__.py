"""CLI entry point — the `dozer run` equivalent.

    python -m dozer_spark app.yaml [--show N]

Loads the YAML app config (sources / sql with INTO chaining / sinks),
executes it (app.run_app), prints each sink's path and, with --show, the
first N rows of every named output.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dozer_spark",
                                 description="run a YAML app config")
    ap.add_argument("config", help="path to the YAML app config")
    ap.add_argument("--show", type=int, default=0, metavar="N",
                    help="print the first N rows of each output")
    ap.add_argument("--master", default=None,
                    help="Spark master override (default: session factory)")
    ap.add_argument("--metrics-port", type=int, default=None, metavar="PORT",
                    help="serve /metrics + /metrics.json on this port "
                         "(0 = pick a free port) while the app runs")
    args = ap.parse_args(argv)

    from dozer_spark import get_spark
    from dozer_spark.app import run_app

    extra = {"spark.master": args.master} if args.master else None
    spark = get_spark("dozer_spark_app", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    config = args.config
    if args.metrics_port is not None:
        import yaml

        with open(config) as f:
            config = yaml.safe_load(f)
        config["metrics"] = {
            **(config.get("metrics") or {}), "port": args.metrics_port,
        }
    result = run_app(spark, config)
    if result.metrics_server is not None:
        print(f"metrics at {result.metrics_server.url}/metrics")
    for name, path in result.written.items():
        print(f"wrote {name} -> {path}")
    if args.show:
        for name, df in result.outputs.items():
            print(f"== {name} ==")
            df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
