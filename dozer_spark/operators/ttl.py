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
    if reference_ts is None:
        reference_ts = df.agg(F.max(ts_col)).collect()[0][0]
        if reference_ts is None:  # empty input
            return df
    cutoff = F.lit(reference_ts).cast("timestamp") - F.expr(f"INTERVAL {ms // 1000} SECOND")
    return df.filter(F.col(ts_col) >= cutoff)
