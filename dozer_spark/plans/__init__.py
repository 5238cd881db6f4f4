"""SQL dialect -> DataFrame plan translation.

The reference parses its SQL dialect with a forked sqlparser-rs
(DozerDialect, dozer-sql/src/builder/mod.rs:86-90) and hand-builds a
processor DAG 1:1 from the AST (no optimizer). Here the translation layer
is deliberately thin: we rewrite only what Spark SQL cannot parse —
dozer's table operators (TUMBLE/HOP/TTL in FROM), the INTO clause, and a
few function spellings — then hand the statement to spark.sql(), where
Catalyst does the planning/optimizing the reference never had.
"""

from dozer_spark.plans.dialect import rewrite_statement, split_into
from dozer_spark.plans.pipeline import statement_to_dataframe

__all__ = ["rewrite_statement", "split_into", "statement_to_dataframe"]
