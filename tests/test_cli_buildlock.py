"""CLI parity tests: `build [--locked] [--force]`, `clean`, and
`run --locked` (reference dozer-cli/src/cli/types.rs:47-69,
orchestrator.rs build/clean/run_all lock semantics)."""

from __future__ import annotations

import json
import os

import pytest

from dozer_spark import buildlock
from dozer_spark.__main__ import main


def _write_cfg(tmp_path, sql_pred="n > 12", sink=True):
    out = str(tmp_path / "frequent")
    sinks = f"""
sinks:
  frequent:
    path: {out}
""" if sink else ""
    cfg = f"""
sources:
  orders:
    path: /root/testdata/sf0.001/orders.parquet
    pk: [o_orderkey]
sql: |
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
  HAVING COUNT(*) > 0 INTO per_cust;
  SELECT o_custkey, n FROM per_cust WHERE {sql_pred} INTO frequent
{sinks}"""
    p = tmp_path / "app.yaml"
    p.write_text(cfg)
    return str(p), out


class TestBuild:
    def test_build_writes_contract_lockfile(self, spark, tmp_path):
        cfg, out = _write_cfg(tmp_path)
        assert main(["build", cfg]) == 0
        lock = tmp_path / buildlock.HOME_DIR / buildlock.LOCK_FILE
        assert lock.exists()
        contract = json.loads(lock.read_text())
        assert contract["version"] == 1
        assert set(contract["outputs"]) == {"per_cust", "frequent"}
        assert "o_custkey:bigint" in contract["outputs"]["per_cust"]
        # planning must NOT have executed the sink
        assert not os.path.exists(out)

    def test_locked_without_lockfile_fails(self, spark, tmp_path):
        cfg, _ = _write_cfg(tmp_path)
        assert main(["build", cfg, "--locked"]) == 1

    def test_locked_verifies_then_detects_config_drift(self, spark, tmp_path):
        cfg, _ = _write_cfg(tmp_path)
        assert main(["build", cfg]) == 0
        assert main(["build", cfg, "--locked"]) == 0
        # a config change must invalidate the lock
        _write_cfg(tmp_path, sql_pred="n > 40")
        assert main(["build", cfg, "--locked"]) == 1
        # re-accepting the change rewrites the lock
        assert main(["build", cfg]) == 0
        assert main(["build", cfg, "--locked"]) == 0

    def test_build_force_cleans_home_first(self, spark, tmp_path):
        cfg, _ = _write_cfg(tmp_path)
        home = tmp_path / buildlock.HOME_DIR
        home.mkdir()
        stale = home / "stale_state"
        stale.write_text("x")
        assert main(["build", cfg, "--force"]) == 0
        assert not stale.exists()
        assert (home / buildlock.LOCK_FILE).exists()


class TestClean:
    def test_clean_removes_home_dir(self, spark, tmp_path):
        cfg, _ = _write_cfg(tmp_path)
        assert main(["build", cfg]) == 0
        home = tmp_path / buildlock.HOME_DIR
        assert home.exists()
        assert main(["clean", cfg]) == 0
        assert not home.exists()
        # idempotent: nothing to clean is still success
        assert main(["clean", cfg]) == 0

    def test_clean_refuses_non_directory_home(self, tmp_path):
        p = tmp_path / "app.yaml"
        p.write_text("sources: {}\nhome_dir: weird\n")
        (tmp_path / "weird").write_text("a file, not a dir")
        with pytest.raises(ValueError, match="not a directory"):
            buildlock.clean(str(p))


class TestRunLocked:
    def test_run_locked_requires_lockfile(self, spark, tmp_path, capsys):
        cfg, out = _write_cfg(tmp_path)
        assert main(["run", cfg, "--locked"]) == 1
        assert "requires a lock file" in capsys.readouterr().err
        assert not os.path.exists(out)  # gate fired before execution

    def test_run_locked_executes_after_build(self, spark, tmp_path):
        cfg, out = _write_cfg(tmp_path)
        assert main(["build", cfg]) == 0
        assert main(["run", cfg, "--locked"]) == 0
        assert spark.read.parquet(out).count() > 0

    def test_bare_config_path_still_means_run(self, spark, tmp_path):
        cfg, out = _write_cfg(tmp_path)
        assert main([cfg]) == 0
        assert spark.read.parquet(out).count() > 0


def test_build_locked_force_rejected(spark, tmp_path):
    """Review finding (round 11): --locked --force would delete the
    lock file (and all durable state) and then fail LockedNoLockFile —
    the contradiction must be rejected before anything is cleaned."""
    import pytest

    from dozer_spark import buildlock

    cfg, _out = _write_cfg(tmp_path)
    buildlock.build(spark, cfg)  # creates the lock
    home = buildlock.home_dir(*buildlock.load_config(cfg))
    with pytest.raises(ValueError, match="drop one flag"):
        buildlock.build(spark, cfg, locked=True, force=True)
    # nothing was cleaned
    import os

    assert os.path.exists(os.path.join(home, buildlock.LOCK_FILE))


class TestSubcommandRewrite:
    """ADVICE r11: the legacy-CLI rewrite must key ONLY on the token in
    subcommand position — a flag value or a config filename spelled
    'run'/'build' elsewhere in argv must not suppress it."""

    def test_position_token_skips_flags_and_their_values(self):
        from dozer_spark.__main__ import _subcommand_position_token as tok

        assert tok(["run", "cfg.yaml"]) == "run"
        assert tok(["--show", "5", "app.yaml"]) == "app.yaml"
        # a value-flag's value never occupies the subcommand position
        assert tok(["--master", "run", "cfg.yaml"]) == "cfg.yaml"
        assert tok(["--show=5", "build.yaml"]) == "build.yaml"
        # a bare positional literally named like a subcommand IS one
        assert tok(["build", "cfg.yaml"]) == "build"
        assert tok(["--show", "5"]) is None

    def test_flag_value_named_run_still_rewrites(self, tmp_path, capsys):
        # `--master run missing.yaml` is a legacy flag-first invocation:
        # it must rewrite to `run --master run missing.yaml` (and then
        # fail on the missing config), NOT misparse 'run' as the verb
        # with '--master' dangling
        from dozer_spark.__main__ import main

        with pytest.raises((SystemExit, Exception)) as ei:
            main(["--master", "local[1]", str(tmp_path / "nope.yaml")])
        # argparse would exit(2) on a misparse BEFORE reaching the
        # config-open failure; reaching FileNotFoundError proves the
        # rewrite routed to `run` with flags intact
        assert not (isinstance(ei.value, SystemExit) and ei.value.code == 2)
