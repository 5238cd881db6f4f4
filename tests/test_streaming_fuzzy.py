"""StreamingFuzzyIndex: incremental edit-distance-1 matching equals the
one-shot batch op; durable state resumes and is re-delivery safe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dozer_spark.ops.fuzzy import fuzzy_self_join_dist1
from dozer_spark.streaming.fuzzy import StreamingFuzzyIndex

ROWS = [
    (1, "kitten"), (2, "mitten"), (3, "kitten"), (4, "kittens"),
    (5, "kitte"), (6, "sitting"), (7, "ab"), (8, "ba"),
    (9, "zebra"), (10, "zebr"), (11, "xebra"), (12, "qq"),
]


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["s_a"], r["s_b"], r["dist"])
        for r in df.collect()
    }


def test_streaming_equals_batch_three_epochs(spark):
    df = spark.createDataFrame(ROWS, ["id", "name"])
    expected = _pairs(fuzzy_self_join_dist1(df, "id", "name"))
    fz = StreamingFuzzyIndex(spark, "name", "id")
    got = {}
    for k in range(3):
        batch = df.filter(F.col("id") % 3 == k)
        got.update(_pairs(fz.process_batch(batch)))
    assert got == expected
    # every pair emitted exactly once: dict update never collided
    total = sum(
        len(_pairs(StreamingFuzzyIndex(spark, "name", "id").process_batch(df)))
        for _ in range(1)
    )
    assert total == len(expected)


@pytest.mark.slow
def test_streaming_durable_resume_and_redelivery(spark, tmp_path):
    sd = str(tmp_path / "fzstate")
    df = spark.createDataFrame(ROWS, ["id", "name"])
    b1 = df.filter(F.col("id") <= 6)
    b2 = df.filter(F.col("id") > 6)

    fz1 = StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
    got = _pairs(fz1.process_batch(b1))
    # resume from disk with a NEW instance
    fz2 = StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
    got.update(_pairs(fz2.process_batch(b2)))
    expected = _pairs(fuzzy_self_join_dist1(df, "id", "name"))
    assert got == expected
    # at-least-once re-delivery: replaying batch 1 emits nothing new
    fz3 = StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
    assert _pairs(fz3.process_batch(b1)) == {}


@pytest.mark.slow
def test_streaming_ttl_window_and_prune(spark, tmp_path):
    from pyspark.sql import functions as F

    # ids double as minutes; retain 10 minutes
    rows = [
        (1, "kitten", "2024-01-01 00:01:00"),
        (2, "mitten", "2024-01-01 00:02:00"),
        (30, "kittez", "2024-01-01 00:30:00"),  # kitten left the window
        (31, "mittez", "2024-01-01 00:31:00"),
        (32, "kittez", "2024-01-01 00:32:00"),  # dup of 30, in window
    ]
    df = spark.createDataFrame(rows, ["id", "name", "ts"]).withColumn(
        "ts", F.to_timestamp("ts"))
    fz = StreamingFuzzyIndex(
        spark, "name", "id", state_dir=str(tmp_path / "fzttl"),
        ts_col="ts", retain="10 minutes", prune_every=1,
    )
    got = _pairs(fz.process_batch(df.filter(F.col("id") <= 2)))
    assert set(got) == {(1, 2)}  # both in window at epoch 1
    got2 = _pairs(fz.process_batch(df.filter(F.col("id") >= 30)))
    # cross-epoch pairs with 1/2 are NOT emitted (outside the window);
    # within-window pairs among 30/31/32 are
    assert set(got2) == {(30, 31), (30, 32), (31, 32)}
    # physical prune ran (prune_every=1): expired variants are gone
    # from the durable variant state AND the slim seen-ids state
    assert fz._tx.read_live().filter(F.col("id") <= 2).count() == 0
    assert fz._seen.filter(F.col("id") <= 2).count() == 0


def test_streaming_ttl_durable_crash_resume(spark, tmp_path):
    """New instance per batch (crash + resume each time): the watermark
    must come back from StateStore meta, so the window cutoff applies
    identically to a single long-lived instance."""
    from pyspark.sql import functions as F

    rows = [
        (1, "kitten", "2024-01-01 00:01:00"),
        (2, "mitten", "2024-01-01 00:02:00"),
        (30, "kittez", "2024-01-01 00:30:00"),
        (31, "mittez", "2024-01-01 00:31:00"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "ts"]).withColumn(
        "ts", F.to_timestamp("ts"))
    sd = str(tmp_path / "fzttlcr")

    def mk():
        return StreamingFuzzyIndex(
            spark, "name", "id", state_dir=sd,
            ts_col="ts", retain="10 minutes", prune_every=1,
        )

    got = _pairs(mk().process_batch(df.filter(F.col("id") <= 2)))
    assert set(got) == {(1, 2)}
    fz = mk()  # crash + resume: watermark restored from meta
    assert fz._watermark is not None
    got2 = _pairs(fz.process_batch(df.filter(F.col("id") >= 30)))
    assert set(got2) == {(30, 31)}  # 1/2 outside the restored window


def test_streaming_geometry_guard(spark, tmp_path, monkeypatch):
    sd = str(tmp_path / "fzgeom")
    df = spark.createDataFrame(ROWS[:4], ["id", "name"])
    fz = StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
    fz.process_batch(df)
    import dozer_spark.streaming.fuzzy as sfz

    monkeypatch.setattr(sfz, "_GEOM", {"max_dist": 2})
    with pytest.raises(ValueError, match="geometry"):
        StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
