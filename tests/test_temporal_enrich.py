"""Streaming temporal enrichment (Flink-style temporal table join):
point-in-time correctness, tombstones, retention pruning, durable
crash/resume."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dozer_spark.streaming.enrich import TemporalEnrich


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _dim(spark, rows):
    """rows: (op, txid, seq, k, vts, price)"""
    return spark.createDataFrame(
        rows, "__op string, __txid long, __seq long, k long, "
              "vts timestamp, price double"
    )


def _facts(spark, rows):
    """rows: (fid, k, ts)"""
    return spark.createDataFrame(rows, "fid long, k long, ts timestamp")


def test_point_in_time_vs_current_state(spark):
    e = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"])
    e.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 100.0),
    ]), None)
    e.process_batch(_dim(spark, [
        ("U", 2, 1, 1, _ts("2024-01-05 00:00:00"), 200.0),
    ]), None)
    # a LATE fact (event time before the price change) must see the OLD
    # price — the case the reference's current-state join gets wrong
    out = e.process_batch(None, _facts(spark, [
        (1, 1, _ts("2024-01-03 12:00:00")),
        (2, 1, _ts("2024-01-06 00:00:00")),
        (3, 1, _ts("2023-12-30 00:00:00")),  # before any version
        (4, 2, _ts("2024-01-06 00:00:00")),  # unknown key
    ]))
    got = {r.fid: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_tombstone_voids_interval(spark):
    e = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"])
    e.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 100.0),
        ("D", 2, 1, 1, _ts("2024-01-10 00:00:00"), 100.0),
        ("I", 3, 1, 1, _ts("2024-01-20 00:00:00"), 300.0),
    ]), None)
    out = e.process_batch(None, _facts(spark, [
        (1, 1, _ts("2024-01-05 00:00:00")),  # alive: 100
        (2, 1, _ts("2024-01-15 00:00:00")),  # deleted interval: NULL
        (3, 1, _ts("2024-01-25 00:00:00")),  # re-created: 300
    ]))
    got = {r.fid: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: None, 3: 300.0}


def test_same_batch_dim_then_facts_and_intra_ts_upsert(spark):
    e = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"])
    # two ops on the SAME version slot in one batch: latest (txid) wins
    out = e.process_batch(
        _dim(spark, [
            ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 1.0),
            ("U", 2, 1, 1, _ts("2024-01-01 00:00:00"), 2.0),
        ]),
        _facts(spark, [(1, 1, _ts("2024-01-02 00:00:00"))]),
    )
    assert out.first().price == 2.0


def test_retention_prunes_but_keeps_boundary_version(spark):
    e = TemporalEnrich(
        spark, ["k"], "ts", "vts", ["price"], retain="2 DAYS", prune_every=1
    )
    e.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 100.0),
        ("U", 2, 1, 1, _ts("2024-01-02 00:00:00"), 150.0),
        ("U", 3, 1, 1, _ts("2024-01-10 00:00:00"), 200.0),
    ]), None)
    # watermark advances to 01-12; cutoff 01-10: the 01-01 version is
    # prunable, the 01-02 one is the newest-before-cutoff... no: 01-10
    # is AT cutoff (not older), 01-02 is newest strictly-older -> kept,
    # 01-01 dropped.
    e.process_batch(None, _facts(spark, [(1, 1, _ts("2024-01-12 00:00:00"))]))
    e.process_batch(_dim(spark, [
        ("U", 4, 1, 1, _ts("2024-01-12 00:00:00"), 250.0),
    ]), None)
    vts = sorted(
        r.v for r in
        e.current_versions().select(F.col("__vts").alias("v")).collect()
    )
    assert _ts("2024-01-01 00:00:00") not in vts
    assert _ts("2024-01-02 00:00:00") in vts
    # in-horizon facts still resolve correctly after the prune
    out = e.process_batch(None, _facts(spark, [
        (9, 1, _ts("2024-01-11 00:00:00")),
    ]))
    assert out.first().price == 200.0


def test_durable_crash_resume(spark, tmp_path):
    sd = str(tmp_path / "enrich_state")
    e1 = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"], state_dir=sd)
    e1.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 100.0),
    ]), None)
    e1.process_batch(_dim(spark, [
        ("U", 2, 1, 1, _ts("2024-01-05 00:00:00"), 200.0),
    ]), None)
    # "crash": abandon e1, resume from disk
    e2 = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"], state_dir=sd)
    out = e2.process_batch(None, _facts(spark, [
        (1, 1, _ts("2024-01-03 00:00:00")),
        (2, 1, _ts("2024-01-06 00:00:00")),
    ]))
    got = {r.fid: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: 200.0}
    # replaying the same dim batch (at-least-once delivery) is idempotent:
    # same (k, vts) slot, same image
    e2.process_batch(_dim(spark, [
        ("U", 2, 1, 1, _ts("2024-01-05 00:00:00"), 200.0),
    ]), None)
    assert e2.current_versions().count() == 2


def test_durable_prune_and_reupsert_same_epoch(spark, tmp_path):
    # a prunable slot re-upserted in the SAME epoch that prunes must
    # survive (the upsert is fresher than the prune decision, which was
    # computed on pre-batch state)
    sd = str(tmp_path / "enrich_prune")
    e = TemporalEnrich(
        spark, ["k"], "ts", "vts", ["price"],
        retain="2 DAYS", prune_every=1, state_dir=sd,
    )
    e.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 100.0),
        ("U", 2, 1, 1, _ts("2024-01-02 00:00:00"), 150.0),
        ("U", 3, 1, 1, _ts("2024-01-10 00:00:00"), 200.0),
    ]), None)
    # watermark to 01-12 -> cutoff 01-10: the 01-01 slot is prunable
    e.process_batch(None, _facts(spark, [(1, 1, _ts("2024-01-12 00:00:00"))]))
    # this batch BOTH triggers the prune and re-upserts the prunable slot
    e.process_batch(_dim(spark, [
        ("U", 4, 1, 1, _ts("2024-01-01 00:00:00"), 111.0),
    ]), None)
    vs = {(r.v, r.p) for r in e.current_versions().select(
        F.col("__vts").alias("v"), F.col("price").alias("p")).collect()}
    assert (_ts("2024-01-01 00:00:00"), 111.0) in vs
    # and the state survives a restart identically (compaction path)
    e2 = TemporalEnrich(
        spark, ["k"], "ts", "vts", ["price"],
        retain="2 DAYS", prune_every=1, state_dir=sd,
    )
    vs2 = {(r.v, r.p) for r in e2.current_versions().select(
        F.col("__vts").alias("v"), F.col("price").alias("p")).collect()}
    assert vs2 == vs


def test_prune_drops_tombstone_boundary(spark):
    # a deleted-and-never-recreated key must not leak a tombstone row
    # past the horizon forever
    e = TemporalEnrich(
        spark, ["k"], "ts", "vts", ["price"], retain="2 DAYS", prune_every=1
    )
    e.process_batch(_dim(spark, [
        ("I", 1, 1, 1, _ts("2024-01-01 00:00:00"), 100.0),
        ("D", 2, 1, 1, _ts("2024-01-02 00:00:00"), 100.0),
        ("I", 3, 1, 2, _ts("2024-01-02 00:00:00"), 50.0),
    ]), None)
    # watermark far past the horizon: key 1's tombstone (and its prior
    # version) must vanish entirely; key 2's value boundary stays
    out = e.process_batch(None, _facts(spark, [
        (1, 1, _ts("2024-02-01 00:00:00")),
        (2, 2, _ts("2024-02-01 00:00:00")),
    ]))
    e.process_batch(_dim(spark, [
        ("I", 4, 1, 3, _ts("2024-02-01 00:00:00"), 1.0),
    ]), None)  # triggers the prune
    got = {r.fid: r.price for r in out.collect()}
    assert got == {1: None, 2: 50.0}
    ks = sorted(r.k for r in e.current_versions().select("k").collect())
    assert ks == [2, 3]  # key 1 fully gone
    # post-prune facts for the deleted key still (correctly) see NULL
    out2 = e.process_batch(None, _facts(spark, [
        (9, 1, _ts("2024-02-02 00:00:00")),
    ]))
    assert out2.first().price is None


def test_enrich_fuzz_vs_reference_model(spark):
    # random multi-batch version histories + facts vs a brute-force
    # Python point-in-time model (latest version at-or-before fact ts;
    # tombstone -> None)
    import random

    rnd = random.Random(7)
    base = _ts("2024-06-01 00:00:00")

    def t(mins):
        return base + dt.timedelta(minutes=mins)

    e = TemporalEnrich(spark, ["k"], "ts", "vts", ["price"])
    history: dict[tuple[int, dt.datetime], tuple[float | None, bool]] = {}
    txid = 0
    for _ in range(3):
        batch = []
        for _ in range(15):
            txid += 1
            k = rnd.randrange(4)
            vts = t(rnd.randrange(500))
            if rnd.random() < 0.25:
                batch.append(("D", txid, 1, k, vts, None))
                history[(k, vts)] = (None, True)
            else:
                price = float(rnd.randrange(1000))
                batch.append(("I", txid, 1, k, vts, price))
                history[(k, vts)] = (price, False)
        e.process_batch(_dim(spark, batch), None)

    facts = [(i, rnd.randrange(5), t(rnd.randrange(550)))
             for i in range(60)]
    out = e.process_batch(None, _facts(spark, facts))
    got = {r.fid: r.price for r in out.collect()}

    for fid, k, fts in facts:
        versions = [(vts, pv) for (kk, vts), pv in history.items()
                    if kk == k and vts <= fts]
        if not versions:
            want = None
        else:
            _, (price, tomb) = max((vts, pv) for vts, pv in versions)
            want = None if tomb else price
        assert got[fid] == want, (fid, k, fts, got[fid], want)
