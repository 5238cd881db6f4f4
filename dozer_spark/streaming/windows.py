"""Streaming TUMBLE/HOP aggregation with watermarks.

Batch mode uses operators/window.py (explicit window columns); in
streaming, Spark's built-in F.window IS the tumble/hop operator with
state management included, and withWatermark IS the reference's TTL
(lifetime-based state eviction, dozer-sql/src/table_operator/lifetime.rs
+ join state eviction table.rs:117-136). We use the native forms so the
streaming state store handles eviction — no custom state code for the
windowed-aggregation path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dozer_spark.operators.window import interval_ms


def _iv_str(spec: str | int) -> str:
    ms = interval_ms(spec)
    return f"{ms // 1000} seconds" if ms % 1000 == 0 else f"{ms} milliseconds"


def streaming_tumble_agg(
    df: DataFrame,
    ts_col: str,
    interval: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    """TUMBLE + GROUP BY over a stream; emits window_start/window_end
    columns like the batch operator (PK = keys + window_start, mirroring
    window/operator.rs:36-56)."""
    wm = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), _iv_str(interval))
    out = wm.groupBy(win.alias("__w"), *keys).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in out.columns if c != "__w"],
    )


def streaming_hop_agg(
    df: DataFrame,
    ts_col: str,
    hop_size: str,
    interval: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    """HOP + GROUP BY over a stream (sliding window)."""
    wm = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), _iv_str(interval), _iv_str(hop_size))
    out = wm.groupBy(win.alias("__w"), *keys).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in out.columns if c != "__w"],
    )
