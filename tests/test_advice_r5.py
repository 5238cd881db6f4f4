"""Regression tests for the round-5 ADVICE findings:

1. TemporalEnrich facts-before-any-dimension batches emit TYPED null
   payloads when payload_types is configured (stable schema across the
   first-dimension boundary; NullType otherwise broke parquet sinks).
2. TemporalEnrich retention accepts a lateness margin: versions inside
   watermark - retain - lateness survive the prune.
3. DiffStateTable's crash-resume rewind refuses a vacuumed change feed
   instead of silently reconstructing a state that never existed.
4. App runner ops stage: name collisions with existing tables and
   unknown/missing input tables are config errors, not silent shadowing
   / raw KeyErrors.
5. Ephemeral streaming dedup state checkpoints only the NEW rows per
   batch (append-only union) — outputs stay equal to the durable path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dozer_spark.streaming.enrich import TemporalEnrich


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "__op string, __txid long, __seq long, k long, "
              "vts timestamp, price double"
    )


def _facts(spark, rows):
    return spark.createDataFrame(rows, "fid long, k long, ts timestamp")


def test_enrich_typed_null_payloads_before_first_dim(spark):
    e = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"],
                       payload_types={"price": "double"})
    out0 = e.process_batch(None, _facts(spark, [(1, 1, _ts("2024-01-01 00:00:00"))]))
    assert out0.schema["price"].dataType == T.DoubleType()
    assert out0.first().price is None
    # later matched batches have the identical schema -> union is legal
    e.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-02 00:00:00"), 9.0),
    ]), None)
    out1 = e.process_batch(None, _facts(spark, [(2, 1, _ts("2024-01-03 00:00:00"))]))
    assert out0.schema == out1.schema
    assert out0.unionByName(out1).count() == 2


def test_enrich_untyped_nulls_still_supported(spark):
    e = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"])
    out = e.process_batch(None, _facts(spark, [(1, 1, _ts("2024-01-01 00:00:00"))]))
    assert out.first().price is None


def test_enrich_lateness_margin_keeps_versions(spark):
    mk = lambda: _dim(spark, [  # noqa: E731
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 1.0),
        ("U", 2, 1, 1, _ts("2024-01-02 00:00:00"), 2.0),
        ("U", 3, 1, 1, _ts("2024-01-10 00:00:00"), 3.0),
    ])
    # without lateness: watermark 2024-01-12, retain 3 days -> cutoff
    # 01-09; versions 01-01/01-02 collapse to the boundary image (01-02)
    tight = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"],
                           retain="3 days", prune_every=1)
    tight.process_batch(mk(), _facts(spark, [(1, 1, _ts("2024-01-12 00:00:00"))]))
    tight.process_batch(None, _facts(spark, [(9, 1, _ts("2024-01-12 00:00:00"))]))
    assert tight.current_versions().count() == 2  # boundary + 01-10

    # with an 8-day lateness margin the cutoff moves to 01-01: all three
    # versions survive, and a late fact still sees the true history
    lax = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"],
                         retain="3 days", lateness="8 days", prune_every=1)
    lax.process_batch(mk(), _facts(spark, [(1, 1, _ts("2024-01-12 00:00:00"))]))
    lax.process_batch(None, _facts(spark, [(9, 1, _ts("2024-01-12 00:00:00"))]))
    assert lax.current_versions().count() == 3
    late = lax.process_batch(None, _facts(spark, [
        (2, 1, _ts("2024-01-01 12:00:00")),
    ]))
    assert late.first().price == 1.0


def test_rewind_refuses_vacuumed_change_feed(spark, tmp_path):
    from dozer_spark.storage import TransactionalTable
    from dozer_spark.streaming.incstate import rewind_to_version

    tx = TransactionalTable(spark, str(tmp_path / "t"), pk=["id"],
                            n_buckets=2, change_retention=1)
    for v in range(4):
        tx.merge(spark.createDataFrame([(v, v * 10)], "id long, val long"),
                 batch_id=v + 1, app_id="t")
    with pytest.raises(ValueError, match="vacuumed"):
        rewind_to_version(tx, tx.read(), 1, ["id"])


def test_app_ops_name_collision_and_unknown_input(spark, tmp_path):
    import yaml

    from dozer_spark.app import run_app

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    ).write.parquet(str(src))

    def cfg(ops):
        p = tmp_path / "app.yaml"
        p.write_text(yaml.safe_dump({
            "app_name": "t",
            "sources": {"docs": {"path": str(src), "format": "parquet"}},
            "ops": ops,
            "sql": "SELECT COUNT(*) AS n FROM docs",
        }))
        return str(p)

    with pytest.raises(ValueError, match="collides"):
        run_app(spark, cfg({"docs": {
            "op": "exact_dedup", "input": "docs",
            "args": {"text_col": "text", "id_col": "doc_id"}}}))
    with pytest.raises(ValueError, match="unknown input table"):
        run_app(spark, cfg({"out": {
            "op": "exact_dedup", "input": "nope",
            "args": {"text_col": "text", "id_col": "doc_id"}}}))
    with pytest.raises(ValueError, match="missing required key 'input'"):
        run_app(spark, cfg({"out": {
            "op": "exact_dedup",
            "args": {"text_col": "text", "id_col": "doc_id"}}}))


@pytest.mark.slow
def test_ephemeral_dedup_incremental_checkpoint_equivalence(spark):
    """The lazy-union ephemeral state must produce the same pairs as
    reprocessing everything in one batch."""
    from dozer_spark.ops.dedup import minhash_lsh_pairs
    from dozer_spark.streaming.dedup import StreamingMinHashDedup

    docs = [(i, "alpha beta gamma delta epsilon zeta " +
             ("eta theta" if i % 2 else "eta iota")) for i in range(30)]
    full = spark.createDataFrame(docs, "doc_id long, text string")
    sd = StreamingMinHashDedup(spark, "text", "doc_id", threshold=0.5)
    got = []
    for b in range(3):
        batch = full.filter(F.col("doc_id") % 3 == b)
        got.extend((r.id_a, r.id_b, r.jaccard)
                   for r in sd.process_batch(batch).collect())
    want = [(r.id_a, r.id_b, r.jaccard)
            for r in minhash_lsh_pairs(full, "text", "doc_id",
                                       threshold=0.5).collect()]
    assert sorted(got) == sorted(want)
    assert len(got) == len(set(got))  # exactly-once


def test_embedding_lsh_subset_of_bruteforce_with_good_recall(spark):
    """Every LSH pair is a true pair (exact verify), and recall on the
    deterministic fixture geometry is high."""
    import math

    from dozer_spark.ops.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    # deterministic clustered vectors: 3 groups of near-identical
    # directions plus noise dims
    rows = []
    for i in range(60):
        g = i % 3
        base = [1.0 if d == g else 0.0 for d in range(8)]
        base[(g + 3) % 8] = 0.05 * ((i * 7) % 5)  # slight jitter
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(
        df, "embedding", "vec_id", threshold=0.9).collect()}
    lsh = {(r.id_a, r.id_b) for r in embedding_neardup_pairs_lsh(
        df, "embedding", "vec_id", threshold=0.9,
        n_bands=8, band_bits=4, dim=8).collect()}
    assert lsh <= exact, "LSH emitted a pair the exact baseline rejects"
    assert exact, "fixture must produce exact pairs"
    assert len(lsh) / len(exact) >= 0.9


def test_embedding_bruteforce_fail_fast_bound(spark):
    import pytest as _pytest

    from dozer_spark.ops.dedup import embedding_neardup_pairs

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="max_rows"):
        embedding_neardup_pairs(df, "embedding", "vec_id", max_rows=10)
    # raising the bound deliberately works
    assert embedding_neardup_pairs(
        df, "embedding", "vec_id", max_rows=5000
    ).count() == 50 * 49 // 2


def test_embedding_lsh_hot_bucket_split_same_result(spark):
    """Fragment-split cells (tiny cap) must produce exactly the pairs of
    the unsplit path — the applyInPandas memory-ceiling guard."""
    from dozer_spark.ops.dedup import embedding_neardup_pairs_lsh

    rows = []
    for i in range(120):
        g = i % 2  # TWO tight clusters -> hot buckets at any geometry
        base = [1.0 if d == g else 0.02 * ((i * 5) % 7) for d in range(8)]
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plain = {(r.id_a, r.id_b, r.cosine) for r in embedding_neardup_pairs_lsh(
        df, "embedding", "vec_id", threshold=0.9,
        n_bands=4, band_bits=4, dim=8).collect()}
    split = {(r.id_a, r.id_b, r.cosine) for r in embedding_neardup_pairs_lsh(
        df, "embedding", "vec_id", threshold=0.9,
        n_bands=4, band_bits=4, dim=8, hot_bucket_cap=7).collect()}
    assert plain == split
    assert plain, "fixture must produce pairs"
