"""GROUP BY aggregation with HAVING, dozer aggregate-function parity.

Reference: a single Projection+Aggregation processor
(dozer-sql/src/aggregation/processor.rs:48-586) maintains per-group
incremental aggregator state and emits retractions; HAVING is re-evaluated
on old+new aggregate rows (processor.rs:339-386). In batch mode the whole
retraction machinery collapses to groupBy().agg().filter(having) — Spark's
partial aggregation (map-side combine) + AQE handle scale. GROUP BY columns
become the output primary key (dozer-sql/src/planner/projection.rs:178-208).

Aggregate functions (dozer-sql/expression/src/aggregate.rs:4-30):
SUM, COUNT, AVG, MIN, MAX, MIN_APPEND_ONLY, MAX_APPEND_ONLY,
MIN_VALUE, MAX_VALUE — mapped below. The *_APPEND_ONLY variants are pure
optimizations in the reference (O(1) state, no retraction); in batch they
are identical to MIN/MAX. MIN_VALUE/MAX_VALUE are argmin/argmax
(expression/src/execution.rs:1047-1139) -> F.min_by / F.max_by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AGGREGATES: dict[str, callable] = {
    "sum": F.sum,
    "count": F.count,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "min_append_only": F.min,
    "max_append_only": F.max,
    "min_value": F.min_by,  # MIN_VALUE(of, ret) -> min_by(ret, of)
    "max_value": F.max_by,
}


def agg_fn(name: str, *args) -> Column:
    """Resolve a dozer aggregate name to a Spark aggregate Column.

    MIN_VALUE(measure, returned) returns `returned` at the row where
    `measure` is minimal (aggregator.rs:412-490) — note the argument
    order swap for min_by/max_by.
    """
    key = name.lower()
    if key not in AGGREGATES:
        raise ValueError(f"unknown aggregate {name!r}")
    if key in ("min_value", "max_value"):
        measure, returned = args
        return AGGREGATES[key](returned, measure)
    return AGGREGATES[key](*args)


def group_aggregate(
    df: DataFrame,
    group_by: list[str | Column],
    aggs: list[Column],
    having: Column | str | None = None,
) -> DataFrame:
    """SELECT group_by..., aggs... GROUP BY group_by [HAVING having].

    Returns a DataFrame whose natural PK is the group columns
    (planner/projection.rs:178-208).
    """
    out = df.groupBy(*group_by).agg(*aggs)
    if having is not None:
        out = out.filter(having if isinstance(having, Column) else F.expr(having))
    return out
