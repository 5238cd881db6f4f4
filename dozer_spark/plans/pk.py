"""Primary-key propagation rules.

Spark has no PK concept; the reference's operators each define how the
output PK derives from input PKs, and downstream MERGE sinks depend on it
(SURVEY.md section 1.3 — "primary key is load-bearing"). The rules,
with their reference sources:

- filter/projection: PK unchanged (pass-through processors)
- join: left PK ++ right PK (product/join/factory.rs:169-191)
- GROUP BY: the group columns become the PK
  (planner/projection.rs:178-208)
- TUMBLE/HOP: input PK ++ [window_start] (window/operator.rs:36-56)
- UNION: PK only survives if both inputs share it AND rows are disjoint
  — the reference keeps the common PK; UNION ALL of overlapping inputs
  has no PK (insert-only)
"""

from __future__ import annotations


def filter_pk(pk: list[str]) -> list[str]:
    return list(pk)


def project_pk(pk: list[str], kept_cols: list[str]) -> list[str]:
    """Projection keeps the PK only if every PK column survives."""
    return list(pk) if all(c in kept_cols for c in pk) else []


def join_pk(left_pk: list[str], right_pk: list[str]) -> list[str]:
    """join/factory.rs:169-191 — concatenation, de-duplicated."""
    return list(left_pk) + [c for c in right_pk if c not in left_pk]


def group_by_pk(group_cols: list[str]) -> list[str]:
    """planner/projection.rs:178-208."""
    return list(group_cols)


def window_pk(pk: list[str], start_col: str = "window_start") -> list[str]:
    """window/operator.rs:36-56 — PK extended by window_start (a record
    can appear in several HOP windows, so the window is part of identity)."""
    return list(pk) + [start_col]


def union_pk(pks: list[list[str]]) -> list[str]:
    """Common PK across inputs or none (insert-only)."""
    if not pks:
        return []
    first = pks[0]
    return list(first) if all(p == first for p in pks[1:]) else []
