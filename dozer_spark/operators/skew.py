"""Skew mitigation: salted joins and salted aggregation.

The reference has no answer to skew at all — its join state is one
in-memory hashmap per process (product/join/operator/table.rs), so a hot
key just grows one bucket. On a cluster, a hot join/group key sends one
partition 100x the data of the rest and the stage runs at the speed of
that straggler.

Two tools here, complementing AQE's runtime skew-join splitting
(spark.sql.adaptive.skewJoin, enabled in session.py — AQE only splits
SORT-MERGE join partitions; salting also covers shuffled-hash joins and
aggregations, and works when stats are not yet known):

- salted_join: replicate the small side R times, salt the big side's key
  with a uniform 0..R-1 component. Every hot key spreads over R tasks.
- salted_aggregate: two-phase agg — partial agg on (key, salt), then
  final agg on key. Only needed for non-algebraic aggregates forced
  through a single reducer; Spark's hash agg already does map-side
  partials for the standard ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where `big` has skewed join keys.

    big gets a random-ish but DETERMINISTIC salt (hash of its PK-bearing
    row spread over `salt` buckets — crc32 of all columns; deterministic
    so retries/speculative tasks agree); small is exploded `salt` times.
    Output columns match a plain join (salt dropped).
    """
    if salt < 2:
        raise ValueError("salt must be >= 2 (1 would be a plain join)")
    if how not in ("inner", "left"):
        # right/full would surface each unmatched small-side row once per
        # salt replica (small is exploded `salt` times); put the skewed
        # side on the left or dedupe externally.
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}"
        )
    big_cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in big.columns]
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.crc32(F.concat_ws("\x01", *big_cols)), F.lit(salt)).cast("int")
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    cond = salted_big[SALT_COL] == salted_small[SALT_COL]
    for b, s in on:
        cond = cond & (salted_big[b] == salted_small[s])
    out = salted_big.join(salted_small, cond, how)
    return out.drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    group_by: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed group key.

    partial_aggs run per (group, salt); final_aggs combine the partials
    per group — caller supplies both phases since the combine function
    depends on the aggregate (sum->sum, count->sum, min->min, ...).
    """
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.crc32(F.concat_ws("\x01", *[F.col(c).cast("string") for c in df.columns])),
               F.lit(salt)).cast("int"),
    )
    partial = salted.groupBy(*group_by, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*group_by).agg(*final_aggs)
