"""Time-series regularization: gap-fill a sparse event stream onto a
fixed-step spine with linear interpolation.

The standard prep step before any windowed model / anomaly detector
consumes event data: per key, resample observations onto an evenly
spaced grid (here: hourly buckets between the key's first and last
observation), carrying observed bucket averages through and linearly
interpolating the holes. The reference engine has no time-spine /
resample support (SURVEY.md §2.4 negative space — its windows are
TUMBLE/HOP over existing rows only); this is native Spark:
``sequence()`` builds each key's spine without a generator UDF, and the
forward/backward fills are two ``last/first(ignorenulls)`` passes over
the SAME per-key ordering — Catalyst collapses them into one sort, so
the whole operator is a groupBy + one window sort per key, no
self-joins.

Scale shape: everything is keyed by the series key — one shuffle for
the bucket aggregate, one for the window sort. Spine rows per key are
bounded by the key's own time span over the step, so a 1000-executor
run distributes by key with no hot driver path. A key whose span/step
ratio is pathological (one key spanning years at 1s steps) inflates
only its own partition — cap with a coarser step or split the key's
range, not the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STEP_SECONDS = {"hour": 3600, "day": 86400, "minute": 60}


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "hour",
    obs_round_to: int | None = None,
) -> DataFrame:
    """Per-key fixed-step spine with linear interpolation of gaps.

    Buckets ``ts_col`` by ``step`` (avg of observed values per bucket),
    builds the dense bucket spine from each key's first to last observed
    bucket, and fills unobserved buckets by linear interpolation between
    the neighboring observed buckets (time-weighted, exact at the
    endpoints by construction — the spine never extends past an
    observed bucket, so there is no extrapolation).

    Output: (key, bucket [string ts], value_filled [round 6],
    is_observed [int 0/1]).
    """
    if step not in _STEP_SECONDS:
        raise ValueError(f"step must be one of {sorted(_STEP_SECONDS)}")
    key = F.col(key_col)
    v_obs = F.avg(value_col)
    if obs_round_to is not None:
        # pin the bucket average to a fixed precision before
        # interpolating — parallel summation order makes the raw avg
        # engine/partitioning-dependent at the last ulp
        v_obs = F.round(v_obs, obs_round_to)
    obs = df.groupBy(
        key.alias("key"), F.date_trunc(step, F.col(ts_col)).alias("bucket")
    ).agg(v_obs.alias("v_obs"))
    spine = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {step.upper()}"))
            ).alias("bucket"),
        )
    )
    j = spine.join(obs, ["key", "bucket"], "left")
    w_prev = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("v_obs").isNotNull(), F.col("bucket"))
    filled = (
        j.withColumn("pv", F.last("v_obs", ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(obs_bucket, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("v_obs", ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(obs_bucket, ignorenulls=True).over(w_next))
    )
    frac = (
        (F.unix_timestamp("bucket") - F.unix_timestamp("pt")).cast("double")
        / (F.unix_timestamp("nt") - F.unix_timestamp("pt")).cast("double")
    )
    value = (
        F.when(F.col("v_obs").isNotNull(), F.col("v_obs"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    # tie-stable rounding: interpolation of decimal-ish inputs lands
    # EXACTLY on .xxxxxx5 often, where decimal HALF_UP (Spark round)
    # and scaled-double rounding (DuckDB round) disagree per binary
    # luck. floor(x*1e6 + 0.5)/1e6 evaluates the same IEEE expression
    # on the same double everywhere -> one answer on every engine.
    rounded = (
        F.floor(value * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6)
    )
    return filled.select(
        F.col("key").alias(key_col),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        rounded.alias("value_filled"),
        F.col("v_obs").isNotNull().cast("int").alias("is_observed"),
    )
