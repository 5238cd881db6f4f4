"""Broadcast Bloom filter (`ops/bloom.py`) and its decontamination
prefilter: no-false-negative guarantee, measured false-positive rate
near the requested fpp, and bloom-prefiltered decontamination equal to
the exact path row-for-row (the property the `decontaminate_bloom`
registry entry gates against the SAME oracle SQL as the exact entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.ops.bloom import BloomFilter, _geometry
from dozer_spark.ops.text import eval_ngram_overlap


def test_geometry_standard_sizing():
    m, k = _geometry(1000, 0.01)
    # canonical 1% figures: ~9.59 bits/item, 7 hashes
    assert 9000 <= m <= 10200
    assert k == 7
    # degenerate empty set stays well-formed
    m0, k0 = _geometry(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_no_false_negatives_and_fpp(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id")).alias("v"))
    bf = BloomFilter.build(members, "v", fpp=0.01)
    assert members.filter(~bf.contains(F.col("v"))).count() == 0

    probes = spark.range(0, 20000).select(
        F.concat(F.lit("absent"), F.col("id")).alias("v"))
    fp = probes.filter(bf.contains(F.col("v"))).count()
    # 1% target; generous ceiling keeps the test deterministic-stable
    assert fp / 20000 < 0.03


def test_empty_reference_set(spark):
    empty = spark.range(0, 0).select(F.col("id").cast("string").alias("v"))
    bf = BloomFilter.build(empty, "v", fpp=0.01)
    probes = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    assert probes.filter(bf.contains(F.col("v"))).count() == 0


def test_bloom_decontamination_equals_exact(spark):
    rows = []
    for i in range(300):
        if i % 7 == 0:
            # contaminated: shares the eval trigram
            rows.append((i, "alpha beta gamma filler%d tail" % i))
        else:
            rows.append((i, "clean text body %d with words" % i))
    # eval split: doc_id % 97 == 0 -> ids 0, 97, 194, 291
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pred = F.col("doc_id") % 97 == 0
    exact = {r["doc_id"]: r["n_hits"] for r in
             eval_ngram_overlap(df, "text", "doc_id", pred, n=3).collect()}
    bloom = {r["doc_id"]: r["n_hits"] for r in
             eval_ngram_overlap(df, "text", "doc_id", pred, n=3,
                                bloom_fpp=0.01).collect()}
    assert exact == bloom
    assert len(exact) > 0
