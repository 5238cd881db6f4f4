"""TTL table operator.

Reference: TTL(source, ts_col, interval) stamps each record's Lifetime
(dozer-sql/src/table_operator/lifetime.rs:29-88); downstream stateful
operators (joins) evict records whose reference-ts + duration has passed
(dozer-sql/src/product/join/operator/table.rs:117-136).

Spark mapping (SURVEY.md 2.3): in streaming mode TTL is exactly a
watermark — `withWatermark(ts, interval)` bounds state retention for
joins/aggregations. In batch mode a TTL is a filter against the max
event time of the batch (records older than max(ts) - ttl are "expired"
by the time the snapshot is evaluated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dozer_spark.operators.window import interval_ms


def ttl(df: DataFrame, ts_col: str, interval: str | int, *,
        reference_ts=None) -> DataFrame:
    """Apply TTL semantics.

    - streaming df: withWatermark (state eviction — the direct analogue
      of the reference's lifetime_map eviction on commit).
    - batch df: keep rows with ts >= reference - ttl, where reference
      defaults to the batch max(ts) (snapshot-at-high-watermark view).
    """
    ms = interval_ms(interval)
    if df.isStreaming:
        secs = max(1, ms // 1000)
        return df.withWatermark(ts_col, f"{secs} seconds")
    ivl = F.expr(f"INTERVAL {ms // 1000} SECOND")
    if reference_ts is not None:
        cutoff = F.lit(reference_ts).cast("timestamp") - ivl
        return df.filter(F.col(ts_col) >= cutoff)
    # default reference = batch max(ts), computed LAZILY: a broadcast
    # cross-join of the 1-row max keeps TTL inside one job instead of an
    # eager collect() that forces an extra scan of the input mid-plan.
    ref = df.agg(F.max(ts_col).alias("__ttl_ref"))
    return (
        df.crossJoin(F.broadcast(ref))
        .filter(
            F.col("__ttl_ref").isNull()  # all-NULL ts: nothing expires
            | (F.col(ts_col) >= F.col("__ttl_ref") - ivl)
        )
        .drop("__ttl_ref")
    )
