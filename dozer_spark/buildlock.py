"""Build contracts + lockfile — the `dozer build [--locked]` / `dozer
clean` CLI surface (reference: dozer-cli/src/cli/types.rs:47-69,
dozer-cli/src/simple/orchestrator.rs:150-217).

The reference's `build` propagates schemas through the DAG, derives a
Contract (pipeline version + per-endpoint schemas), and serializes it
to a lock file; `build --locked` instead REQUIRES the existing lock
file to match the freshly computed contract (errors `LockedNoLockFile`
/ `LockedOutdatedLockfile` otherwise); `clean` removes the app home
directory wholesale.

Here the contract is computed by PLANNING the app (sources loaded,
ops/SQL stages built as lazy DataFrames) with sinks / quality gates /
metrics stripped, so no data is written and no gate collects — the
contract captures the config shape (canonical-JSON sha256 of the
sources/ops/sql/sinks/quality stages) plus every named output's
resolved schema, which also moves when an upstream source's schema
moves. Serialized as sorted-keys JSON -> engine-portable, diffable.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

LOCK_FILE = "dozer-spark.lock"
HOME_DIR = ".dozer_spark"

# config stages that shape the pipeline contract (metrics/show flags and
# other observability knobs deliberately excluded — they don't change
# what the pipeline computes)
_CONTRACT_STAGES = ("sources", "ops", "sql", "sinks", "quality")


class LockedNoLockFile(RuntimeError):
    def __init__(self, path: str):
        super().__init__(
            f"{path} does not exist. `--locked` requires a lock file — "
            "run `build` once without --locked to create it.")


class LockedOutdatedLockfile(RuntimeError):
    def __init__(self, path: str):
        super().__init__(
            f"{path} is out of date: the config or a source schema changed "
            "since the lock file was written. Re-run `build` (without "
            "--locked) to accept the change.")


def load_config(config: dict | str) -> tuple[dict, str | None]:
    """Returns (config_dict, config_dir) — config_dir is None when the
    config was passed inline (dict / YAML string)."""
    if isinstance(config, dict):
        return config, None
    import yaml

    if "\n" not in config and config.endswith((".yml", ".yaml")):
        with open(config) as f:
            return yaml.safe_load(f), os.path.dirname(os.path.abspath(config))
    return yaml.safe_load(config), None


def home_dir(config: dict, config_dir: str | None) -> str:
    """The app's state/home directory (reference default: ./.dozer)."""
    home = config.get("home_dir") or HOME_DIR
    if not os.path.isabs(home) and config_dir:
        home = os.path.join(config_dir, home)
    return home


def lockfile_path(config: dict, config_dir: str | None) -> str:
    return os.path.join(home_dir(config, config_dir), LOCK_FILE)


def app_contract(spark, config: dict) -> dict:
    """Plan the app (no sinks written, no quality gates collected) and
    derive the contract: config-stage hash + per-output schemas."""
    from dozer_spark.app import run_app

    planned = {k: v for k, v in config.items()
               if k not in ("sinks", "quality", "metrics")}
    result = run_app(spark, planned, serve_metrics=False)
    canon = json.dumps(
        {k: config.get(k) for k in _CONTRACT_STAGES},
        sort_keys=True, default=str,
    )
    return {
        "version": int(config.get("version", 1)),
        "config_sha256": hashlib.sha256(canon.encode()).hexdigest(),
        "outputs": {name: df.schema.simpleString()
                    for name, df in sorted(result.outputs.items())},
    }


def build(spark, config: dict | str, locked: bool = False,
          force: bool = False) -> str:
    """Compute the contract and write (or, with locked=True, verify)
    the lock file. Returns the lock file path."""
    if locked and force:
        # --force wipes the home dir INCLUDING the lock file, which a
        # verify-only --locked run exists to check — honoring both
        # would destroy the contract and then fail LockedNoLockFile.
        # Reject the contradiction before touching anything.
        raise ValueError(
            "--locked verifies the existing lock file; --force would "
            "delete it (and all durable state) first — drop one flag")
    cfg, cfg_dir = load_config(config)
    if force:
        clean(cfg, cfg_dir)
    contract = app_contract(spark, cfg)
    path = lockfile_path(cfg, cfg_dir)
    if locked:
        if not os.path.exists(path):
            raise LockedNoLockFile(path)
        with open(path) as f:
            existing = json.load(f)
        if existing != contract:
            raise LockedOutdatedLockfile(path)
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(contract, f, sort_keys=True, indent=2)
    os.replace(tmp, path)
    return path


def verify_locked(spark, config: dict | str) -> str:
    """`run --locked` gate: require an up-to-date lock file before
    executing (reference run_all calls build(locked) first)."""
    return build(spark, config, locked=True)


def clean(config: dict | str, config_dir: str | None = None) -> str | None:
    """Remove the app home directory (state, spools, lock file) —
    reference orchestrator.rs clean(): rm -rf home_dir. Returns the
    removed path, or None when it didn't exist."""
    if not isinstance(config, dict):
        config, config_dir = load_config(config)
    home = home_dir(config, config_dir)
    if not os.path.exists(home):
        return None
    if not os.path.isdir(home):
        raise ValueError(f"home_dir {home!r} is not a directory")
    shutil.rmtree(home)
    return home
