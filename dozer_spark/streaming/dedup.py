"""Streaming deduplication.

- streaming_exact_dedup: native dropDuplicatesWithinWatermark — exact
  dedup over an unbounded stream with bounded state (the watermark
  bounds how long a key is remembered). This is the streaming face of
  ops/dedup.exact_dedup.
- For near-dup (MinHash/SimHash) on streams, compute signatures per
  micro-batch (stateless, ops/dedup.minhash_signatures) and MERGE into a
  signature store keyed by band (foreachBatch + upsert_parquet); new
  docs probe the store for collisions. The signature computation is the
  same code path batch and streaming — only the store differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_exact_dedup(df: DataFrame, keys: list[str], ts_col: str,
                          watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    State per key is evicted once the watermark passes — the unbounded-
    stream equivalent of a groupBy-digest dedup."""
    wm = df.withWatermark(ts_col, watermark)
    return wm.dropDuplicatesWithinWatermark(keys)
