"""CLI entry point — the `dozer` CLI equivalent
(reference: dozer-cli/src/cli/types.rs:47-69).

    python -m dozer_spark run app.yaml [--show N] [--locked]
    python -m dozer_spark build app.yaml [--locked] [--force]
    python -m dozer_spark clean app.yaml

`run` loads the YAML app config (sources / ops / sql with INTO chaining
/ sinks / quality), executes it (app.run_app), prints each sink's path
and, with --show, the first N rows of every named output; --locked
requires an up-to-date lock file first (reference run_all). `build`
plans the app without executing sinks and writes the contract lock
file (--locked verifies instead of writing; --force cleans the home
dir first). `clean` removes the app home directory. A bare config path
(`python -m dozer_spark app.yaml`) still works and means `run`.
"""

from __future__ import annotations

import argparse
import sys

_SUBCOMMANDS = ("run", "build", "clean")


def _parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="dozer_spark",
                                 description="dozer-style YAML app CLI")
    sub = ap.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="execute a YAML app config")
    run.add_argument("config", help="path to the YAML app config")
    run.add_argument("--show", type=int, default=0, metavar="N",
                     help="print the first N rows of each output")
    run.add_argument("--master", default=None,
                     help="Spark master override (default: session factory)")
    run.add_argument("--metrics-port", type=int, default=None, metavar="PORT",
                     help="serve /metrics + /metrics.json on this port "
                          "(0 = pick a free port) while the app runs")
    run.add_argument("--locked", action="store_true",
                     help="require an up-to-date lock file before running")

    build = sub.add_parser(
        "build", help="plan the app and write/verify the contract lock file")
    build.add_argument("config", help="path to the YAML app config")
    build.add_argument("--locked", action="store_true",
                       help="require the existing lock file to be up-to-date "
                            "instead of writing it")
    build.add_argument("--force", action="store_true",
                       help="clean the app home directory before building")
    build.add_argument("--master", default=None)

    clean = sub.add_parser(
        "clean", help="remove the app home directory (state, spools, lock)")
    clean.add_argument("config", help="path to the YAML app config")
    return ap


_VALUE_FLAGS = {"--show", "--master", "--metrics-port"}


def _subcommand_position_token(argv: list[str]) -> str | None:
    """The first token that can occupy the subcommand position: skip
    flags and the separate value of a value-taking flag. Only THIS
    token decides the backward-compat rewrite — a flag value or config
    path that happens to spell 'run'/'build' must not suppress it
    (ADVICE r11)."""
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("-"):
            i += 2 if a in _VALUE_FLAGS else 1
            continue
        return a
    return None


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # backward compat: the pre-subcommand CLI took [flags] CONFIG with
    # no leading verb — rewrite to `run` when the token in subcommand
    # position is not a subcommand (flag-first invocations like
    # `--show 5 app.yaml` must keep working, not just path-first ones)
    if argv and argv[0] not in ("-h", "--help") \
            and _subcommand_position_token(argv) not in _SUBCOMMANDS:
        argv = ["run", *argv]
    args = _parser().parse_args(argv)

    if args.command == "clean":
        from dozer_spark import buildlock

        removed = buildlock.clean(args.config)
        print(f"cleaned {removed}" if removed else "nothing to clean")
        return 0

    from dozer_spark import get_spark

    extra = {"spark.master": args.master} if args.master else None
    spark = get_spark("dozer_spark_app", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    if args.command == "build":
        from dozer_spark import buildlock

        try:
            path = buildlock.build(spark, args.config, locked=args.locked,
                                   force=args.force)
        except (buildlock.LockedNoLockFile,
                buildlock.LockedOutdatedLockfile) as e:
            print(str(e), file=sys.stderr)
            return 1
        print(f"{'verified' if args.locked else 'wrote'} {path}")
        return 0

    from dozer_spark.app import run_app

    if args.locked:
        from dozer_spark import buildlock

        try:
            buildlock.verify_locked(spark, args.config)
        except (buildlock.LockedNoLockFile,
                buildlock.LockedOutdatedLockfile) as e:
            print(str(e), file=sys.stderr)
            return 1

    config = args.config
    if args.metrics_port is not None:
        from dozer_spark.buildlock import load_config

        config, _ = load_config(config)
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
