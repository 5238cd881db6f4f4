"""Size-gated join hints.

A hard-coded `F.broadcast(df)` is a scale landmine: the hint overrides
Spark's own size checks, so a table that fits at sf0.1 OOM-kills
executors when the corpus is 1000x bigger. The fix is to make the hint
conditional on Catalyst's own size estimate (file-size based for scans,
propagated through projections/filters) and otherwise emit NO hint —
AQE then picks broadcast at runtime if the actual size allows, or a
shuffled join if not. Either way the plan is valid at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default gate for doc-side tables (id + token/gram arrays). Deliberately
# larger than spark.sql.autoBroadcastJoinThreshold (the estimate is of the
# pre-projection plan; the joined payload is one row per doc), but small
# enough that a real corpus (>> GB) never gets pinned to a broadcast.
BROADCAST_GATE_BYTES = 256 << 20


def estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for df's optimized logical plan.

    File-backed scans report real file sizes; unknown relations report
    spark.sql.defaultSizeInBytes (Long.MaxValue) which correctly fails
    the gate. Returns None when the JVM plan is unreachable (e.g. Spark
    Connect) — callers must treat None as "too big"."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    cluster has slots. A small file (one split) would otherwise pin a
    CPU-heavy scan (per-token hashing, decoding) to a single task. At
    real data sizes the input naturally exceeds the core count and this
    is a no-op — the shuffle is only paid when the input is small enough
    for it to be trivial."""
    try:
        sc = df.sparkSession.sparkContext
        target = min_parts or sc.defaultParallelism
        n_parts = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect (no JVM-local rdd access) or any estimator
        # failure: degrade to the unhinted frame, mirroring
        # estimated_plan_bytes' None fallback.
        return df
    if n_parts < max(2, target // 2):
        return df.repartition(target)
    return df


def cache_materialized(df: DataFrame) -> DataFrame:
    """Cache df and force materialization so Catalyst's stats for the
    InMemoryRelation reflect the REAL cached size. Plans built afterward
    (e.g. `maybe_broadcast` of a key set derived from a micro-batch) then
    gate on actual bytes instead of the unknown-relation default, which
    would otherwise refuse the hint for every in-memory changelog. The
    count is one cheap job; the scan it pays for would run anyway at the
    first downstream action (and lands in the cache)."""
    c = df.cache()
    c.count()
    return c


def maybe_broadcast(df: DataFrame, gate_bytes: int | None = None) -> DataFrame:
    """`F.broadcast(df)` only when Catalyst estimates df under the gate;
    otherwise the UNHINTED df (AQE/planner picks the join strategy from
    runtime sizes). gate_bytes=0 disables the hint unconditionally."""
    gate = BROADCAST_GATE_BYTES if gate_bytes is None else gate_bytes
    if gate <= 0:
        return df
    est = estimated_plan_bytes(df)
    if est is not None and 0 <= est <= gate:
        return F.broadcast(df)
    return df
