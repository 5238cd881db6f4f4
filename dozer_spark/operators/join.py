"""Equi-join with PK propagation and broadcast awareness.

Reference: incremental symmetric hash equi-join, INNER/LEFT/RIGHT only,
constraint must be a conjunction of col = col
(dozer-sql/src/product/join/factory.rs:116-130,193-235); output PK is the
concatenation of both sides' PKs (factory.rs:169-191). FULL OUTER / CROSS /
theta joins are rejected (factory.rs:120,231-234) — we accept them anyway
(Spark gives them for free; documented as beyond-parity).

Spark-first scale notes:
- The reference materializes BOTH sides fully in in-memory hashmaps
  (operator/table.rs:24-145) — a hard single-node memory wall at 100 TB.
  Here Catalyst picks broadcast-hash (small side), shuffled-hash, or
  sort-merge; AQE converts to broadcast at runtime when a side turns out
  small and splits skewed partitions.
- Pass broadcast_right/broadcast_left to force a map-side join for
  dimension tables (no shuffle of the fact side at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED = {"inner", "left", "right", "full", "cross"}  # first 3 = parity


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    how: str = "inner",
    *,
    broadcast_left: bool = False,
    broadcast_right: bool = False,
) -> DataFrame:
    """JOIN ... ON l.a = r.b [AND ...] — conjunction of equalities only,
    mirroring factory.rs:193-235's constraint parsing.

    `on` is a list of (left_col, right_col) pairs.
    """
    how = how.lower().replace(" ", "_")
    if how == "left_outer":
        how = "left"
    if how == "right_outer":
        how = "right"
    if how not in SUPPORTED:
        raise ValueError(f"unsupported join type {how!r}")
    if broadcast_left:
        left = F.broadcast(left)
    if broadcast_right:
        right = F.broadcast(right)
    cond = None
    for lc, rc in on:
        c = left[lc] == right[rc]
        cond = c if cond is None else cond & c
    return left.join(right, on=cond, how=how)


def join_pk(left_pk: list[str], right_pk: list[str]) -> list[str]:
    """Output PK = left PK ++ right PK (join/factory.rs:169-191)."""
    return list(left_pk) + [c for c in right_pk if c not in left_pk]
