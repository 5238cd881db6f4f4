"""Session windows (gap-based) — beyond-reference operator.

The reference only has TUMBLE/HOP (window/operator.rs); session windows
(a new session starts when the gap since the previous event of the same
key exceeds a threshold) are the third standard window type and a core
primitive for behavioral/training-data pipelines.

Batch implementation is the gaps-and-islands pattern in pure window
functions: flag gap-starts with lag(), running-sum the flags into a
session ordinal, derive session bounds by grouping. One shuffle on the
key — the same cost class as any per-key window.

Streaming uses Spark's native F.session_window (state-store backed,
watermark-evicted), which is the exact streaming analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dozer_spark.operators.window import interval_ms


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str | int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a session ordinal per key: events within `gap` of the
    previous event share a session. Adds `session_id` (0-based per key,
    in time order)."""
    gap_ms = interval_ms(gap)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_ms_expr = F.unix_millis(F.col(ts_col).cast("timestamp")) - F.unix_millis(
        prev_ts.cast("timestamp")
    )
    is_new = F.when(prev_ts.isNull() | (gap_ms_expr > gap_ms), 1).otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, (F.sum(is_new).over(run) - 1).cast("long"))


def session_aggregate(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str | int,
    aggs: list[Column],
) -> DataFrame:
    """One row per (key, session): session_start/session_end bounds plus
    caller aggregates."""
    s = sessionize(df, ts_col, key_cols, gap)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        *aggs,
    )


def streaming_session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming session aggregation via native session_window (merging
    state-store sessions, closed by the watermark)."""
    ms = interval_ms(gap)
    gap_str = f"{ms // 1000} seconds" if ms % 1000 == 0 else f"{ms} milliseconds"
    wm = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap_str)
    out = wm.groupBy(win.alias("__w"), *keys).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *[c for c in out.columns if c != "__w"],
    )
