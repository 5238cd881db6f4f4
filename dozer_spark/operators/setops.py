"""Set operators: UNION / UNION ALL.

Reference: UNION ALL is a pass-through; UNION deduplicates via a counting
record map, emitting Insert on 0->1 and Delete on 1->0
(dozer-sql/src/product/set/operator.rs:27-96; counting map / counting
Bloom variant in product/set/record_map/mod.rs:16-106). INTERSECT/EXCEPT
are rejected by the reference (builder/mod.rs:214-226) — provided here as
beyond-parity since Spark has them natively.

In batch, the counting map is simply distinct() after union — Spark's
hash aggregate with partial (map-side) dedup does the counting-map work,
distributed and spillable (the reference's map is single-process,
in-memory only).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL — pass-through concatenation (by column NAME, so reordered
    schemas still line up; the reference requires identical schemas)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """UNION — dedup across all inputs (set/operator.rs 0->1 semantics)."""
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Beyond parity (reference rejects INTERSECT, builder/mod.rs:214-226)."""
    return a.intersect(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """Beyond parity (reference rejects EXCEPT)."""
    return a.subtract(b)
