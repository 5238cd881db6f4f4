"""Data-quality auditing: declarative constraint checks and referential-
integrity audits over any table — the Deequ-style validation gate a
pipeline runs before promoting a batch (and the reference engine lacks
entirely: its schema system validates types, never values).

Design: every constraint compiles to ONE aggregate expression, the whole
suite computes in a single scan/aggregation (no per-constraint jobs),
and the wide result row is unpivoted to (constraint, metric, value,
passed) rows. At 100 TB the audit costs exactly one pass over the
table — the same shape as any corpus census — and the FK audit is one
key-projected left join (broadcast-able when the parent's key set is
small, shuffled otherwise; Catalyst decides from real sizes).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    metric: str
    expr: Column  # aggregate expression -> double in [0, 1]
    min_value: float = 1.0  # passes when value >= min_value


def _share(pred: Column) -> Column:
    """Share of rows satisfying pred, 1.0 on an empty table."""
    return F.coalesce(
        F.avg(F.when(pred, 1.0).otherwise(0.0)), F.lit(1.0)
    )


def completeness(col: str, min_value: float = 1.0) -> Constraint:
    return Constraint(f"completeness({col})", "non_null_share",
                      _share(F.col(col).isNotNull()), min_value)


def uniqueness(col: str, min_value: float = 1.0) -> Constraint:
    """distinct / total — 1.0 iff the column is a key (NULLs count as
    one shared value, matching COUNT(DISTINCT) semantics plus a null
    bucket)."""
    distinct = F.count_distinct(F.col(col)) + F.max(
        F.when(F.col(col).isNull(), 1).otherwise(0)
    )
    total = F.count(F.lit(1))
    return Constraint(
        f"uniqueness({col})", "distinct_share",
        F.coalesce(distinct.cast("double") / total, F.lit(1.0)), min_value,
    )


def in_range(col: str, lo: float, hi: float,
             min_value: float = 1.0) -> Constraint:
    return Constraint(
        f"in_range({col},{lo},{hi})", "in_range_share",
        _share(F.col(col).isNotNull()
               & (F.col(col) >= lo) & (F.col(col) <= hi)),
        min_value,
    )


def matches(col: str, pattern: str, min_value: float = 1.0) -> Constraint:
    return Constraint(
        f"matches({col})", "regex_share",
        _share(F.col(col).isNotNull() & F.col(col).rlike(pattern)),
        min_value,
    )


def accepted_values(col: str, values: list,
                    min_value: float = 1.0) -> Constraint:
    return Constraint(
        f"accepted_values({col})", "accepted_share",
        _share(F.col(col).isin(values)), min_value,
    )


def data_quality_report(df: DataFrame,
                        constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints in ONE aggregation pass.

    Output: (constraint, metric, value [round 6], passed [int 0/1]),
    one row per constraint, in no particular order.
    """
    if not constraints:
        raise ValueError("data_quality_report: no constraints given")
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names: {names}")
    wide = df.agg(*[
        F.round(c.expr, 6).alias(f"__v{i}")
        for i, c in enumerate(constraints)
    ])
    rows = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.lit(c.metric).alias("metric"),
            F.col(f"__v{i}").alias("value"),
            (F.col(f"__v{i}") >= F.lit(c.min_value)).cast("int")
            .alias("passed"),
        )
        for i, c in enumerate(constraints)
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.constraint", "r.metric", "r.value", "r.passed")


def fk_orphan_audit(child: DataFrame, child_key: str,
                    parent: DataFrame, parent_key: str,
                    relationship: str | None = None) -> DataFrame:
    """Referential-integrity audit: how many child rows reference a
    missing parent key (NULL child keys are not orphans — they are
    completeness's business).

    Output: one row (relationship, n_child, n_orphans, orphan_share
    [round 6]). One key-projected left join + one aggregate.
    """
    rel = relationship or f"{child_key}->{parent_key}"
    p = parent.select(F.col(parent_key).alias("__pk")).distinct()
    j = child.select(F.col(child_key).alias("__ck")).join(
        p, F.col("__ck") == F.col("__pk"), "left"
    )
    orphan = F.count(
        F.when(F.col("__ck").isNotNull() & F.col("__pk").isNull(), 1)
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_child"),
        orphan.alias("n_orphans"),
        F.round(
            F.coalesce(orphan.cast("double") / F.count(F.lit(1)),
                       F.lit(0.0)),
            6,
        ).alias("orphan_share"),
    ).select(
        F.lit(rel).alias("relationship"),
        "n_child", "n_orphans", "orphan_share",
    )


def value_histogram(df: DataFrame, col: str, lo: float, hi: float,
                    n_buckets: int = 20) -> DataFrame:
    """Equi-width histogram of a numeric column — the profiling
    companion to the constraint report (spot skew/outliers before
    choosing in_range thresholds). NULLs are excluded; values outside
    [lo, hi) clamp into the edge buckets so the counts always sum to
    the non-null row count. One aggregation pass (groupBy on a derived
    bucket — map-side combinable, n_buckets cardinality).

    Output: (bucket [0..n-1], lo_edge, hi_edge, n), only non-empty
    buckets, edges rounded to 6.
    """
    if not n_buckets >= 1:
        raise ValueError("n_buckets must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    w = (hi - lo) / n_buckets
    # Clamp while the floor result is still LONG: an outlier more than
    # 2^31 bucket-widths from lo would wrap if cast to INT first and
    # could land in an interior bucket instead of the edge bucket.
    bucket = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
            F.lit(0).cast("long"),
        ),
        F.lit(n_buckets - 1).cast("long"),
    ).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(w), 6)
            .alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(w), 6)
            .alias("hi_edge"),
            "n",
        )
    )
