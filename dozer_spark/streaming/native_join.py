"""Native watermark stream-stream join (append-only fast path).

The reference's join keeps BOTH sides fully in memory forever unless a
TTL is set (product/join/operator/table.rs). For append-only streams
(Schema::is_append_only — the reference hard-codes false and relies on
the *_APPEND_ONLY opt-ins; we let the caller declare it), Spark's built-in
stream-stream join IS the right operator: state bounded by watermark +
time-range condition, eviction handled by the state store, no
foreachBatch round-trips. The general retraction case (updates/deletes
flowing through) stays on RetractingJoin.

Inner joins need a watermark on both sides plus a time-range constraint
(otherwise state is unbounded); outer joins additionally REQUIRE the
range to know when to emit NULL-padded rows — identical reasoning to the
reference's lifetime eviction, enforced here by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dozer_spark.operators.window import interval_ms


def _iv_str(spec: str | int) -> str:
    ms = interval_ms(spec)
    return f"{ms // 1000} seconds" if ms % 1000 == 0 else f"{ms} milliseconds"


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    within: str | int,
    how: str = "inner",
    watermark: str | int = "10 minutes",
) -> DataFrame:
    """Append-only stream-stream equi-join with bounded state.

    on: [(left_col, right_col), ...] equality conjunction (the only
    constraint the reference accepts, join/factory.rs:193-235).
    within: max event-time distance between matching rows — becomes the
    time-range condition that lets the state store evict (the TTL
    analogue). how: inner | left | right (factory.rs:116-130 parity —
    Spark also offers full/semi/anti beyond the reference).
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unsupported join type {how!r}")
    wm = _iv_str(watermark)
    l = left.withWatermark(left_ts, wm)
    r = right.withWatermark(right_ts, wm)

    cond: Column | None = None
    for lc, rc in on:
        e = l[lc] == r[rc]
        cond = e if cond is None else cond & e
    iv = _iv_str(within)
    # range bound on event time: |left_ts - right_ts| <= within
    cond = (
        cond
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {iv}"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {iv}"))
    )
    spark_how = {"left": "leftOuter", "right": "rightOuter", "full": "fullOuter"}.get(
        how, how
    )
    return l.join(r, cond, spark_how)
