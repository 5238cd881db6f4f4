"""Test harnesses mirroring the reference's dozer-tests crate."""

from dozer_spark.testing.sqllogic import SqlLogicRunner, parse_slt_file

__all__ = ["SqlLogicRunner", "parse_slt_file"]
