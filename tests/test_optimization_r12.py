"""Focused guards for the round-12 optimization internals changes.

1. `_blocked_self_join_pairs` no longer runs a driver-side skew-probe
   job: constructing the pair frame must launch ZERO Spark jobs (the
   skew decision is part of the plan), and on a corpus with no hot
   bucket the fragment path must produce exactly the plain self-join's
   pair multiset (the branch it replaced).
2. The F.expr()-built minhash/simhash expressions must stay equivalent
   to the Column-operator forms they replaced (bit-for-bit rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _n_jobs(spark) -> int:
    return len(
        spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
    )


@pytest.fixture(scope="module")
def docs(spark):
    from dozer_spark.registry import Catalog

    d = Catalog.from_testdata(
        spark, "/root/testdata/sf0.001", lazy=True
    ).df("documents")
    d = d.persist()
    d.count()
    yield d
    d.unpersist()


def test_pair_construction_runs_no_driver_jobs(spark, docs):
    """The r12 fold-in removed the cache_materialized(hot).count()
    probe: building the candidate-pair frame is plan-only."""
    from dozer_spark.ops.dedup import (
        _blocked_self_join_pairs,
        minhash_band_table,
        minhash_signatures,
    )

    sigs = minhash_signatures(docs, "text", "doc_id", 16).drop("toks")
    bands = minhash_band_table(sigs, "doc_id", 16, 4)
    before = _n_jobs(spark)
    cand = _blocked_self_join_pairs(
        bands, ["band", "band_key"], "doc_id", hot_cap=4096
    )
    assert _n_jobs(spark) == before, (
        "constructing the pair frame launched a Spark job — the "
        "driver-side skew probe is back"
    )
    assert cand.columns == ["id_a", "id_b"]


def test_fragment_path_equals_plain_self_join(spark, docs):
    """With hot_cap above every bucket size (s=1 everywhere), the
    fragment machinery must BE the plain self-join: identical pair
    multiset, zero replication."""
    from dozer_spark.ops.dedup import (
        _blocked_self_join_pairs,
        minhash_band_table,
        minhash_signatures,
    )

    sigs = minhash_signatures(docs, "text", "doc_id", 16).drop("toks")
    bands = minhash_band_table(sigs, "doc_id", 16, 4).persist()
    bands.count()
    try:
        got = _blocked_self_join_pairs(
            bands, ["band", "band_key"], "doc_id", hot_cap=1 << 30
        )
        a, b = bands.alias("a"), bands.alias("b")
        ref = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .distinct()
        )
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0
    finally:
        bands.unpersist()


def test_simhash_expr_equals_column_operator_form(spark, docs):
    """The single-SQL-string votes/signature must match the chained
    Column-operator construction they replaced, row for row."""
    from dozer_spark.operators.hints import ensure_min_partitions
    from dozer_spark.ops.dedup import _md5_bits, _token_set, simhash

    n_bits = 60
    got = simhash(docs, "text", "doc_id", n_bits)

    tok = ensure_min_partitions(docs).select(
        F.col("doc_id"), F.explode(_token_set("text")).alias("tok")
    )
    tok = tok.select(F.col("doc_id"), _md5_bits(F.col("tok"), n_bits).alias("h"))
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(n_bits):
        bit = (
            F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        sig = bit if sig is None else sig + bit
    ref = agg.select(F.col("doc_id"), sig.alias("simhash"))

    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_minhash_expr_equals_column_operator_form(spark, docs):
    """Same guard for the 16-hash minhash signature columns + toksh."""
    from dozer_spark.operators.hints import ensure_min_partitions
    from dozer_spark.ops.dedup import (
        MINHASH_PRIME,
        _token_set,
        minhash_signatures,
    )

    n = 16
    got = minhash_signatures(docs, "text", "doc_id", n).drop("toks")

    def mh(i: int):
        return F.array_min(
            F.transform(
                F.col("__h12"),
                lambda s: (s["h1"] + F.lit(i) * s["h2"]) % F.lit(MINHASH_PRIME),
            )
        ).alias(f"mh{i}")

    base = (
        ensure_min_partitions(docs)
        .select(F.col("doc_id"), _token_set("text").alias("toks"))
        .withColumn("__digests", F.transform("toks", lambda t: F.md5(t)))
        .withColumn(
            "__h12",
            F.transform(
                "__digests",
                lambda d: F.struct(
                    F.conv(F.substring(d, 1, 8), 16, 10).cast("long").alias("h1"),
                    F.conv(F.substring(d, 9, 8), 16, 10).cast("long").alias("h2"),
                ),
            ),
        )
    )
    toksh = F.array_distinct(
        F.transform(
            "__digests",
            lambda d: F.conv(F.substring(d, 1, 15), 16, 10).cast("long"),
        )
    )
    ref = base.select(
        F.col("doc_id"), toksh.alias("toksh"), *[mh(i) for i in range(n)]
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
