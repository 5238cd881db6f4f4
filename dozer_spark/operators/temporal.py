"""Temporal joins Spark lacks as built-ins: AS-OF join and bucketed
range join.

The reference rejects every non-equi join form outright
(`dozer-sql/src/product/join/factory.rs:231-234` — "no theta/range/
as-of joins"), so this is deliberate beyond-parity surface: the two
temporal join shapes every event pipeline eventually needs, built the
way they must be built at 100 TB — no cross join, no per-row Python,
no range explosion.

AS-OF join (nearest prior match): implemented as the union-window
pattern — tag both sides, sort each key's merged timeline once, and
carry the most recent right-side payload forward with
last(ignorenulls) over an unbounded-preceding window. ONE shuffle on
the join keys (same as the equi-join Spark would do anyway), no
inequality join, no self-cross. The window is per-key, so skewed keys
degrade exactly like any groupBy and AQE's skew handling applies.

Range join (all matches within [lower, upper] of the anchor):
implemented with bucketization — the right side maps into fixed-width
time buckets, the left side duplicates into only the buckets its
window overlaps (ceil(span/width)+1, i.e. 2 for span<=width), the join
is a plain equi-join on (keys, bucket) and the exact predicate filters
in-bucket false positives. Work is O(matches + bucket collisions), not
O(n*m); each true pair is produced exactly once because the right row
lives in exactly one bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
    tolerance_expr: Column | None = None,
    right_ts_as: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest right_ts <= left_ts within the same key group (backward
    as-of). Equal timestamps match (<=, the DuckDB/pandas convention).

    Caller contract: (keys, right_ts) must be unique on the right side
    (pre-aggregate duplicates first) — otherwise "the" latest prior row
    is ambiguous and no engine pair would agree.

    how='left' keeps unmatched left rows with NULL payload;
    how='inner' drops them. tolerance_expr (e.g. F.expr("INTERVAL 1
    HOUR")) additionally voids matches older than left_ts - tolerance.
    right_ts_as, when set, also emits the matched row's timestamp
    under that name.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    out_names = set(payload_cols) | ({right_ts_as} if right_ts_as else set())
    clash = out_names & set(left.columns)
    if clash:
        raise ValueError(
            f"output columns {sorted(clash)} collide with left columns; "
            "alias the payload (or right_ts_as) first"
        )
    # SQL join semantics: NULL keys never match and a NULL right_ts can
    # never satisfy right_ts <= left_ts, so such right rows are dropped
    # up front — otherwise the NULL-key window partition would happily
    # 'match' NULL to NULL and a NULL-ts right row would sort first and
    # leak its payload to every left row (DuckDB ASOF returns NULL for
    # both cases).
    right_valid = right
    for k in [*keys, right_ts]:
        right_valid = right_valid.filter(F.col(k).isNotNull())
    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in payload_cols],
    )
    r2 = right_valid.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    ptype = r2.schema["__p"].dataType
    lcols = list(left.columns)
    l2 = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__p", F.lit(None).cast(ptype))
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # at equal __ts the right row sorts first (side 0 < 1) so <= matches;
    # (keys, right_ts) uniqueness makes the order total where it matters
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("__p", ignorenulls=True).over(w)
    if tolerance_expr is not None:
        m = F.when(m["__rts"] >= F.col("__ts") - tolerance_expr, m)
    out = u.withColumn("__m", m).filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    extra = (
        [F.col("__m")["__rts"].alias(right_ts_as)] if right_ts_as else []
    )
    return out.select(
        *lcols, *extra, *[F.col("__m")[c].alias(c) for c in payload_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """All (left, right) pairs in the same key group with
    right_ts - left_ts in [lower_s, upper_s] seconds (inclusive).
    Returns left columns + right columns suffixed where they collide.

    Bucketized: no cross join at any scale. bucket_s defaults to the
    window span (so each left row lands in at most 2 buckets); tune it
    down when windows are long but matches sparse. Timestamps are
    compared at microsecond precision; bucket ids derive from epoch
    seconds, which is safe because the bucket join is a superset filter
    — the exact predicate runs on the raw timestamps.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    if right_ts not in right.columns:
        raise ValueError(
            f"right_ts {right_ts!r} is not a right-side column "
            f"(pass the PRE-rename name; right has {right.columns})"
        )
    if bucket_s is not None and bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    span = max(upper_s - lower_s, 1)
    w = bucket_s if bucket_s is not None else span
    lsec = F.unix_timestamp(F.col(left_ts))

    rename = {
        c: f"r_{c}" for c in right.columns if c in set(left.columns)
    }
    r2 = right.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(rename.get(c, c))
            for c in right.columns
            if c not in keys
        ],
    )
    rts_name = rename.get(right_ts, right_ts)
    r2 = r2.withColumn("__b", F.floor(F.unix_timestamp(F.col(rts_name)) / w))

    # left row's window [lts+lower, lts+upper] overlaps buckets
    # floor((lts+lower)/w) .. floor((lts+upper)/w)
    b_lo = F.floor((lsec + lower_s) / w)
    b_hi = F.floor((lsec + upper_s) / w)
    l2 = left.withColumn("__b", F.explode(F.sequence(b_lo, b_hi)))

    rts_col = F.col(rts_name)
    cond = (rts_col >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECOND")) & (
        rts_col <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECOND")
    )
    return l2.join(r2, [*keys, "__b"]).filter(cond).drop("__b")
