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


def test_streaming_geometry_guard(spark, tmp_path, monkeypatch):
    sd = str(tmp_path / "fzgeom")
    df = spark.createDataFrame(ROWS[:4], ["id", "name"])
    fz = StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
    fz.process_batch(df)
    import dozer_spark.streaming.fuzzy as sfz

    monkeypatch.setattr(sfz, "_GEOM", {"max_dist": 2})
    with pytest.raises(ValueError, match="geometry"):
        StreamingFuzzyIndex(spark, "name", "id", state_dir=sd)
