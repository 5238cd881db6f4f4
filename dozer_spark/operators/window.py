"""TUMBLE / HOP table-valued window operators.

Reference semantics (dozer-sql/src/window/operator.rs:21-130):
- TUMBLE(source, ts_col, interval): appends window_start/window_end;
  each record belongs to exactly one window aligned to the epoch.
- HOP(source, ts_col, hop_size, interval): duplicates each record into
  EVERY overlapping window (operator.rs hop path); window_start strides
  by hop_size.
- Both extend the table's primary key with window_start
  (window/operator.rs:36-56) — we mirror that in Catalog metadata when
  callers register the result.
- Interval units ms..days (window/builder.rs:187-194).

Spark-first: tumble is floor-alignment column math; hop is a
sequence()+explode generator — both native expressions, no UDF, and both
are embarrassingly parallel (no shuffle introduced by the operator
itself). Spark's built-in F.window produces the same windows inside
groupBy; we emit explicit columns because dozer's windows are
*table operators* (rows keep flowing, aggregation is separate).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_MS = {
    "millisecond": 1,
    "milliseconds": 1,
    "second": 1000,
    "seconds": 1000,
    "minute": 60_000,
    "minutes": 60_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
    "day": 86_400_000,
    "days": 86_400_000,
}


def interval_ms(spec: str | int) -> int:
    """Parse '5 MINUTES' style interval to milliseconds
    (window/builder.rs:25-195)."""
    if isinstance(spec, int):
        return spec
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", spec)
    if not m:
        raise ValueError(f"bad interval {spec!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    if unit not in _UNIT_MS:
        raise ValueError(f"bad interval unit {unit!r} (ms..days supported)")
    return n * _UNIT_MS[unit]


def _floor_to(ts_ms: Column, size_ms: int) -> Column:
    return (F.floor(ts_ms / size_ms) * size_ms).cast("long")


def _ts_ms(ts_col: str) -> Column:
    """Epoch millis for TimestampType or TimestampNTZType columns.

    NTZ -> timestamp cast interprets wall time in the session TZ (we pin
    UTC in session.py), keeping epoch math deterministic.
    """
    return F.unix_millis(F.col(ts_col).cast("timestamp"))


def _out_ts_type(df: DataFrame, ts_col: str) -> str:
    """Window bounds keep the input column's timestamp flavor (NTZ vs TZ)."""
    dt = df.schema[ts_col].dataType.simpleString()
    return "timestamp_ntz" if dt == "timestamp_ntz" else "timestamp"


def tumble(df: DataFrame, ts_col: str, interval: str | int,
           start_col: str = "window_start", end_col: str = "window_end") -> DataFrame:
    """TUMBLE(df, ts, interval) -> df + window_start/window_end columns."""
    size = interval_ms(interval)
    ts_ms = _ts_ms(ts_col)
    start = _floor_to(ts_ms, size)
    out_t = _out_ts_type(df, ts_col)
    return df.withColumn(start_col, F.timestamp_millis(start).cast(out_t)).withColumn(
        end_col, F.timestamp_millis((start + size).cast("long")).cast(out_t)
    )


def hop(df: DataFrame, ts_col: str, hop_size: str | int, interval: str | int,
        start_col: str = "window_start", end_col: str = "window_end") -> DataFrame:
    """HOP(df, ts, hop_size, interval) -> one output row per overlapping
    window (window/operator.rs hop path duplicates records).

    A window [s, s+size) with s = k*hop contains t iff
    t-size < s <= t, i.e. s in [hop*(floor((t-size)/hop)+1), hop*floor(t/hop)].
    Generated natively with sequence()+explode.
    """
    hop_ms = interval_ms(hop_size)
    size_ms = interval_ms(interval)
    if size_ms % hop_ms != 0:
        # the reference allows any pair; non-divisible works here too,
        # alignment is to hop multiples in both.
        pass
    t = _ts_ms(ts_col)
    first = (F.floor((t - size_ms) / hop_ms) + 1) * hop_ms
    last = F.floor(t / hop_ms) * hop_ms
    starts = F.sequence(first.cast("long"), last.cast("long"), F.lit(hop_ms).cast("long"))
    out_t = _out_ts_type(df, ts_col)
    out = df.withColumn("__ws", F.explode(starts))
    return (
        out.withColumn(start_col, F.timestamp_millis(F.col("__ws")).cast(out_t))
        .withColumn(end_col, F.timestamp_millis((F.col("__ws") + size_ms).cast("long")).cast(out_t))
        .drop("__ws")
    )
