"""AS-OF and bucketized range joins: semantics on hand-built frames plus
physical-plan pins (no cartesian product; as-of is one key shuffle)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from pyspark.sql import functions as F

from dozer_spark.operators.temporal import asof_join, range_join


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00")),
            (2, 1, _ts("2024-01-01 12:00:00")),
            (3, 2, _ts("2024-01-01 09:00:00")),
        ],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (1, _ts("2024-01-01 12:00:00"), 30.0),  # equal ts matches (<=)
            (2, _ts("2024-01-01 09:30:00"), 99.0),  # after left -> no match
        ],
        ["k", "ts", "v"],
    )
    out = {
        r.event_id: r
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert out[1].v == 10.0
    assert out[2].v == 30.0  # equal timestamp wins over 11:00
    assert out[3].v is None  # left join keeps unmatched

    inner = asof_join(left, right, ["k"], "ts", "ts", ["v"], how="inner")
    assert sorted(r.event_id for r in inner.collect()) == [1, 2]


def test_asof_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], ["event_id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 07:00:00"), 5.0)], ["k", "ts", "v"]
    )
    fresh = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        tolerance_expr=F.expr("INTERVAL 1 HOUR"),
    ).first()
    assert fresh.v is None  # 3h old > 1h tolerance
    loose = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        tolerance_expr=F.expr("INTERVAL 4 HOUR"),
    ).first()
    assert loose.v == 5.0


def test_asof_plan_single_shuffle_no_cartesian(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], ["event_id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1.0)], ["k", "ts", "v"]
    )
    plan = _plan(asof_join(left, right, ["k"], "ts", "ts", ["v"]))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # union-window: exactly one exchange partitions by the key for the sort
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1
    assert "hashpartitioning(k" in plan


def test_range_join_bucket_correctness_vs_naive(spark):
    # fuzzed timeline: compare bucketized result against the naive
    # cross+filter on a small frame, including window spans larger than
    # one bucket (bucket_s < span -> left explodes into >2 buckets)
    rows_l = [(i, i % 3, _ts("2024-01-01 00:00:00")
               + dt.timedelta(minutes=7 * i)) for i in range(40)]
    rows_r = [(100 + i, i % 3, _ts("2024-01-01 00:00:00")
               + dt.timedelta(minutes=5 * i)) for i in range(60)]
    left = spark.createDataFrame(rows_l, ["event_id", "k", "ts"])
    right = spark.createDataFrame(rows_r, ["r_id", "k", "r_ts"])

    for lo, up, bw in [(0, 600, None), (0, 3600, 600), (-600, 600, None)]:
        got = sorted(
            (r.event_id, r.r_id)
            for r in range_join(
                left, right, ["k"], "ts", "r_ts", lo, up, bucket_s=bw
            ).collect()
        )
        naive = sorted(
            (r.event_id, r.r_id)
            for r in left.join(right, "k")
            .filter(
                (F.col("r_ts") >= F.col("ts") + F.expr(f"INTERVAL {lo} SECOND"))
                & (F.col("r_ts") <= F.col("ts") + F.expr(f"INTERVAL {up} SECOND"))
            )
            .collect()
        )
        assert got == naive and len(got) > 0


def test_range_join_plan_no_cartesian(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], ["event_id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(2, 1, _ts("2024-01-01 10:05:00"))], ["r_id", "k", "r_ts"]
    )
    plan = _plan(range_join(left, right, ["k"], "ts", "r_ts", 0, 600))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_fuzz_vs_naive(spark):
    # seeded fuzz: compare the union-window plan against a brute-force
    # per-row argmax on randomized timelines (ties included via the
    # coarse second grid)
    import random

    rnd = random.Random(1234)
    base = _ts("2024-03-01 00:00:00")
    left_rows = [
        (i, rnd.randrange(5), base + dt.timedelta(seconds=rnd.randrange(2000)))
        for i in range(150)
    ]
    right_rows = list({
        (k, base + dt.timedelta(seconds=s)): v
        for k, s, v in (
            (rnd.randrange(5), rnd.randrange(2000), float(i))
            for i in range(200)
        )
    }.items())
    right_rows = [(k, ts, v) for (k, ts), v in right_rows]
    left = spark.createDataFrame(left_rows, ["event_id", "k", "ts"])
    right = spark.createDataFrame(right_rows, ["k", "ts", "v"])

    got = {
        r.event_id: r.v
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    by_key: dict[int, list] = {}
    for k, ts, v in right_rows:
        by_key.setdefault(k, []).append((ts, v))
    for eid, k, lts in left_rows:
        prior = [(ts, v) for ts, v in by_key.get(k, []) if ts <= lts]
        want = max(prior)[1] if prior else None
        assert got[eid] == want, (eid, got[eid], want)


def test_asof_null_keys_and_ts_never_match(spark):
    import pytest

    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-01 10:00:00")),
            (2, 1, _ts("2024-01-01 10:00:00")),
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01 09:00:00"), 1.0),  # NULL key: no match
            (1, None, 2.0),                            # NULL ts: no match
            (1, _ts("2024-01-01 09:30:00"), 3.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {r.event_id: r.v for r in
           asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()}
    assert out[1] is None  # NULL left key matches nothing (SQL semantics)
    assert out[2] == 3.0   # the NULL-ts right row must not leak its payload

    # output-name collision is rejected up front, not at downstream select
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "ts", ["v"], right_ts_as="ts")


def test_range_join_validates_right_ts_and_bucket(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], ["event_id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(2, 1, _ts("2024-01-01 10:05:00"))], ["r_id", "k", "r_ts"]
    )
    with pytest.raises(ValueError, match="PRE-rename"):
        range_join(left, right, ["k"], "ts", "nope", 0, 600)
    with pytest.raises(ValueError, match="bucket_s"):
        range_join(left, right, ["k"], "ts", "r_ts", 0, 600, bucket_s=0)
