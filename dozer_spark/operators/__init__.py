"""Relational operators — batch implementations of the reference's
processor inventory (SURVEY.md section 2.3).

Each operator is a DataFrame -> DataFrame function that composes into a
Catalyst logical plan; there is deliberately no custom execution here —
Catalyst/Tungsten/AQE pick the physical strategy (the reference has no
optimizer at all: dozer-sql/src/builder/ is a 1:1 AST->DAG translation).
"""

from dozer_spark.operators.window import tumble, hop
from dozer_spark.operators.ttl import ttl
from dozer_spark.operators.join import equi_join
from dozer_spark.operators.aggregate import group_aggregate
from dozer_spark.operators.setops import union_all, union_distinct
from dozer_spark.operators.session import sessionize, session_aggregate
from dozer_spark.operators.temporal import asof_join, range_join

__all__ = [
    "asof_join",
    "range_join",
    "sessionize",
    "session_aggregate",
    "tumble",
    "hop",
    "ttl",
    "equi_join",
    "group_aggregate",
    "union_all",
    "union_distinct",
]
