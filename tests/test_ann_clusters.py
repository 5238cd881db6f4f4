"""Tests for IVF ANN and dedup clustering, plus streaming-hop and
old-image helpers."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from dozer_spark.ops.similarity import ivf_ann_topk, brute_force_topk
from dozer_spark.ops.dedup import dedup_clusters
from dozer_spark.streaming.changelog import old_images
from dozer_spark.streaming import streaming_hop_agg, foreach_batch_upsert


def test_ivf_recall_vs_brute_force(catalog):
    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = ivf_ann_topk(e, q, "embedding", "vec_id", k=5, n_centroids=8, n_probe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    assert approx_set
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells of random data should recover a majority
    assert recall > 0.4, recall
    # every approx hit must be a genuine corpus neighbor with sane rank
    for r in approx:
        assert 1 <= r.rank <= 5 and r.neighbor_id != r.query_id


def test_ivf_deterministic(catalog):
    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_ann_topk(e, q, "embedding", "vec_id", k=3).collect()))
    b = sorted(map(tuple, ivf_ann_topk(e, q, "embedding", "vec_id", k=3).collect()))
    assert a == b


def test_dedup_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)], ["id_a", "id_b"]
    )
    got = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_old_images_lag(spark):
    cl = spark.createDataFrame(
        [("I", 1, 1, 1, 10.0), ("U", 2, 1, 1, 20.0), ("U", 3, 1, 1, 30.0)],
        ["__op", "__txid", "__seq", "id", "v"],
    )
    rows = old_images(cl, ["id"]).orderBy("__txid").collect()
    assert [r["__old_v"] for r in rows] == [None, 10.0, 20.0]


def test_streaming_hop_agg(spark, tmp_path):
    src = tmp_path / "in"
    out = str(tmp_path / "out")
    src.mkdir()
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:40:00", 2.0)], ["event_id", "ts_s", "v"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(1).write.parquet(str(src / "f1"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    agg = streaming_hop_agg(
        stream, "ts", "30 MINUTES", "1 HOUR", [], [F.sum("v").alias("sv")],
        watermark="1 minute",
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(foreach_batch_upsert(out, ["window_start"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(str(r.window_start) for r in spark.read.parquet(out).collect())
    # 00:40 falls in hop windows starting 00:00 and 00:30
    assert got == ["2024-01-01 00:00:00", "2024-01-01 00:30:00"]


def test_brute_force_fast_split_equals_unsplit(catalog):
    """brute_force_topk_fast no longer collects queries to the driver —
    it blocks the corpus and replicates queries per block. Forcing many
    blocks (block_rows far below the corpus size) must return exactly
    the single-block result: per-block top-k union + global re-rank is
    an exact merge."""
    from dozer_spark.ops.similarity import brute_force_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 10)
    base = sorted(map(tuple, brute_force_topk_fast(
        e, q, "embedding", "vec_id", k=5, block_rows=1 << 20).collect()))
    split = sorted(map(tuple, brute_force_topk_fast(
        e, q, "embedding", "vec_id", k=5, block_rows=16).collect()))
    assert base == split


def test_brute_force_fast_matches_exact(catalog):
    from dozer_spark.ops.similarity import brute_force_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    fast = brute_force_topk_fast(e, q, "embedding", "vec_id", k=5).collect()
    es = {(r.query_id, r.neighbor_id) for r in exact}
    fs = {(r.query_id, r.neighbor_id) for r in fast}
    # BLAS vs fold can differ in the last ulp -> allow one flipped pair
    assert len(es & fs) >= len(es) - 1
    # cosines agree to 1e-6 on the intersection
    em = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in fast:
        if (r.query_id, r.neighbor_id) in em:
            assert abs(em[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-5


def test_lsh_ann_fast_matches_fold(catalog):
    """lsh_ann_topk_fast (in-bucket BLAS scoring) matches the fold-based
    oracle-gated variant at pinned geometry."""
    from dozer_spark.ops.similarity import lsh_ann_topk, lsh_ann_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    fold = lsh_ann_topk(e, q, "embedding", "vec_id", k=5, n_planes=8).collect()
    fast = lsh_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                             n_planes=8).collect()
    fo = {(r.query_id, r.neighbor_id) for r in fold}
    fa = {(r.query_id, r.neighbor_id) for r in fast}
    assert len(fo & fa) >= len(fo) - 1  # last-ulp rank flips allowed
    fm = {(r.query_id, r.neighbor_id): r.cosine for r in fold}
    for r in fast:
        if (r.query_id, r.neighbor_id) in fm:
            assert abs(fm[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-5


def test_lsh_ann_fast_auto_planes_and_empty_bucket(spark):
    from dozer_spark.ops.similarity import lsh_ann_topk_fast

    rows = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
            for i in range(200)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.filter(F.col("vec_id") < 4)
    out = lsh_ann_topk_fast(e, q, "embedding", "vec_id", k=3, dim=8)
    got = out.collect()
    assert {r.query_id for r in got} <= {0, 1, 2, 3}
    assert all(1 <= r.rank <= 3 for r in got)


def test_ivf_fast_matches_fold_cells(catalog):
    """ivf_ann_topk_fast with the same centroids/probe must agree with
    the fold-based ivf_ann_topk (last-ulp rank flips allowed)."""
    from dozer_spark.ops.similarity import ivf_ann_topk, ivf_ann_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    fold = ivf_ann_topk(e, q, "embedding", "vec_id", k=5,
                        n_centroids=16, n_probe=4).collect()
    fast = ivf_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                             n_centroids=16, n_probe=4).collect()
    fo = {(r.query_id, r.neighbor_id) for r in fold}
    fa = {(r.query_id, r.neighbor_id) for r in fast}
    assert len(fo & fa) >= len(fo) - 1
    fm = {(r.query_id, r.neighbor_id): r.cosine for r in fold}
    for r in fast:
        if (r.query_id, r.neighbor_id) in fm:
            assert abs(fm[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-5


def test_split_hot_groups_bounds_block_size(spark):
    """The r6/r7 standing weak: a hot bucket must never arrive as one
    pandas cogroup. _split_hot_groups caps corpus rows per (group,
    block) at ~2x cap and replicates queries to every block."""
    from dozer_spark.ops.similarity import _split_hot_groups

    # one pathological bucket (7) with 1000 rows, others tiny
    rows = [(i, [float(i % 5)] * 4, 7 if i < 1000 else i % 3)
            for i in range(1060)]
    c = spark.createDataFrame(
        rows, "neighbor_id long, cv array<double>, bucket long")
    q = spark.createDataFrame(
        [(101, [1.0] * 4, 7), (102, [2.0] * 4, 1)],
        "query_id long, qv array<double>, bucket long")
    cap = 100
    c2, q2 = _split_hot_groups(c, q, ["bucket"], "neighbor_id", cap)
    sizes = {(r["bucket"], r["__blk"]): r["n"] for r in
             c2.groupBy("bucket", "__blk").agg(
                 F.count("*").alias("n")).collect()}
    assert max(sizes.values()) <= 2 * cap
    # every corpus row in a probed bucket lands in exactly one block;
    # queryless buckets (0, 2: 20 rows each) are dropped — their
    # cogroups produced no output anyway
    assert sum(sizes.values()) == 1020
    # the hot bucket's query is replicated to each of its blocks,
    # the cold bucket's query to its single block
    nblk_hot = len({b for (g, b) in sizes if g == 7})
    assert nblk_hot == 10
    qrep = {r.query_id: r.n for r in q2.groupBy("query_id").agg(
        F.count("*").alias("n")).collect()}
    assert qrep[101] == nblk_hot and qrep[102] == 1


def test_split_hot_groups_bounds_query_side(spark):
    """The query side is bounded too: a fat serving batch splits into
    ~qcap-row query blocks, the corpus replicated across them — no
    cogroup task materializes more than ~cap corpus + ~qcap query
    rows, and each (corpus row, query) pair meets exactly once."""
    from dozer_spark.ops.similarity import _split_hot_groups

    c = spark.createDataFrame(
        [(i, [float(i)] * 4, 0) for i in range(50)],
        "neighbor_id long, cv array<double>, bucket long")
    q = spark.createDataFrame(
        [(1000 + i, [float(i)] * 4, 0) for i in range(300)],
        "query_id long, qv array<double>, bucket long")
    c2, q2 = _split_hot_groups(c, q, ["bucket"], "neighbor_id",
                               cap=100, qcap=40)
    qsizes = {(r["__blk"], r["__qblk"]): r["n"] for r in
              q2.groupBy("__blk", "__qblk").agg(
                  F.count("*").alias("n")).collect()}
    assert max(qsizes.values()) <= 2 * 40
    assert sum(qsizes.values()) == 300  # nblk=1: each query in one task
    nqblk = len({qb for (_, qb) in qsizes})
    assert nqblk == 8  # ceil(300/40)
    # the corpus is replicated once per query block
    crep = {r.neighbor_id: r.n for r in c2.groupBy("neighbor_id").agg(
        F.count("*").alias("n")).collect()}
    assert set(crep.values()) == {nqblk}
    # pair coverage: every (corpus, query) key combo appears exactly once
    pairs = (c2.select("__blk", "__qblk", "neighbor_id")
             .join(q2.select("__blk", "__qblk", "query_id"),
                   ["__blk", "__qblk"]))
    assert pairs.count() == 50 * 300
    assert pairs.distinct().count() == 50 * 300


def test_brute_force_fast_query_split_equals_unsplit(catalog):
    """Forcing query-side blocking (query_block_rows far below the
    batch size) must return the one-block result bit-for-bit: per-pair
    scores are blocking-independent and the merge is exact."""
    from dozer_spark.ops.similarity import brute_force_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 40)
    base = sorted(map(tuple, brute_force_topk_fast(
        e, q, "embedding", "vec_id", k=5).collect()))
    split = sorted(map(tuple, brute_force_topk_fast(
        e, q, "embedding", "vec_id", k=5, block_rows=64,
        query_block_rows=7).collect()))
    assert base == split


def test_lsh_ann_fast_split_equals_unsplit(catalog):
    """Forcing hot-bucket splitting (tiny cap) must reproduce the
    unsplit fast-path results exactly — per-block top-k union re-ranked
    is the global top-k."""
    from dozer_spark.ops.similarity import lsh_ann_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    base = lsh_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                             n_planes=8).collect()
    split = lsh_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                              n_planes=8, hot_bucket_cap=32).collect()
    key = lambda r: (r.query_id, r.rank)
    assert {key(r): (r.neighbor_id, r.cosine) for r in base} == \
           {key(r): (r.neighbor_id, r.cosine) for r in split}


def test_ivf_fast_split_equals_unsplit(catalog):
    from dozer_spark.ops.similarity import ivf_ann_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    base = ivf_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                             n_centroids=16, n_probe=4).collect()
    split = ivf_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                              n_centroids=16, n_probe=4,
                              hot_cell_cap=32).collect()
    key = lambda r: (r.query_id, r.rank)
    assert {key(r): (r.neighbor_id, r.cosine) for r in base} == \
           {key(r): (r.neighbor_id, r.cosine) for r in split}


def test_dedup_clusters_mixed_id_types(spark):
    """id_a int vs id_b long must widen to a common type instead of
    building the output schema from id_a alone (ADVICE r6 low #3)."""
    from pyspark.sql import types as T

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)],
        T.StructType([T.StructField("id_a", T.IntegerType()),
                      T.StructField("id_b", T.LongType())]))
    for dme in (200_000, None):  # driver fast path AND distributed path
        out = dedup_clusters(pairs, driver_max_edges=dme)
        assert out.schema["id"].dataType == T.LongType()
        assert out.schema["cluster_id"].dataType == T.LongType()
        got = {r.id: r.cluster_id for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


@pytest.mark.slow
def test_dedup_clusters_probe_overflow_single_evaluation(spark):
    """When the limit-probe overflows driver_max_edges, the pairs
    pipeline must NOT be recomputed for the distributed path: edges are
    persisted before the probe, so each input row is evaluated exactly
    once (previously the collected probe was discarded and the whole
    upstream — typically a full LSH run — ran again)."""
    from pyspark.sql import functions as SF

    acc = spark.sparkContext.accumulator(0)

    @SF.udf("long")
    def counted(v):
        acc.add(1)
        return v

    base = spark.range(0, 40).select(
        counted(F.col("id")).alias("id_a"), (F.col("id") + 1).alias("id_b"))
    out = dedup_clusters(base, driver_max_edges=10)
    assert out.count() == 41  # 0..40 all one chain
    assert acc.value == 40  # one evaluation per row, not probe + rerun


def test_dedup_clusters_unpersists_on_failure(spark, monkeypatch):
    """The persist-before-probe must not leak executor storage when
    anything downstream raises: every exit of dedup_clusters (driver
    path, distributed path, exception) unpersists the edge cache."""
    import pytest

    from dozer_spark.ops import dedup as dedup_mod

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    def boom(*a, **kw):
        raise RuntimeError("injected resolve failure")

    monkeypatch.setattr(dedup_mod, "_dedup_clusters_resolve", boom)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="injected"):
        dedup_mod.dedup_clusters(pairs)
    assert cm.isEmpty()

    # and the success paths leave no cache behind either
    monkeypatch.undo()
    assert dedup_mod.dedup_clusters(pairs).count() == 3
    assert cm.isEmpty()
    assert dedup_mod.dedup_clusters(pairs, driver_max_edges=1).count() == 3
    assert cm.isEmpty()


def test_nearest_cells_matches_naive():
    """The matmul-expanded nearest-centroid search must agree with the
    naive broadcast computation (which it replaced for memory: the
    naive form materializes a batch x centroids x dim temporary)."""
    import numpy as np

    from dozer_spark.ops.similarity import _nearest_cells

    rng = np.random.RandomState(3)
    Q = rng.randn(37, 16)
    C = rng.randn(11, 16)
    got = _nearest_cells(Q, C, 4)
    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = np.argpartition(d2, 3, axis=1)[:, :4]
    # unordered within the n -> compare as sets per row
    for g, w in zip(got, want):
        assert set(g) == set(w)
    # n >= centroids returns every cell
    assert set(_nearest_cells(Q, C, 99)[0]) == set(range(11))


def test_ivf_index_matches_one_shot_batch(catalog):
    """IvfAnnIndex fed the whole corpus in ONE batch shares centroids
    with ivf_ann_topk_fast (identical _fit_quantizer sample + seed), so
    their top-k agree up to last-ulp ties."""
    from dozer_spark.ops.similarity import IvfAnnIndex, ivf_ann_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    idx = IvfAnnIndex(spark=e.sparkSession, vec_col="embedding",
                      id_col="vec_id", n_centroids=16)
    idx.add_batch(e)
    got = idx.topk(q, k=5, n_probe=4).collect()
    want = ivf_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                             n_centroids=16, n_probe=4).collect()
    go = {(r.query_id, r.neighbor_id) for r in got}
    wa = {(r.query_id, r.neighbor_id) for r in want}
    assert len(go & wa) >= len(wa) - 1


@pytest.mark.slow
def test_ivf_index_incremental_frozen_quantizer_and_resume(spark, tmp_path):
    """The quantizer fits on the FIRST batch and freezes; a crashed
    instance resumes the identical centroids and corpus from the
    durable state_dir; a resume with different geometry raises."""
    import random

    import pytest

    from dozer_spark.ops.similarity import IvfAnnIndex

    rnd = random.Random(11)
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    sd = str(tmp_path / "ivf_idx")
    idx = IvfAnnIndex(spark, "embedding", "vec_id", n_centroids=4,
                      state_dir=sd)
    idx.add_batch(df.filter(df.vec_id < 60))
    cents = [list(c) for c in idx._centroids]
    idx.add_batch(df.filter(df.vec_id >= 60))
    assert [list(c) for c in idx._centroids] == cents  # frozen

    # crash: fresh instance resumes identical centroids + full corpus
    idx2 = IvfAnnIndex(spark, "embedding", "vec_id", n_centroids=4,
                       state_dir=sd)
    assert [list(c) for c in idx2._centroids] == cents
    assert idx2._tx.read_live().count() == 120
    q = df.filter(df.vec_id % 30 == 0)
    a = sorted(map(tuple, idx.topk(q, k=3).collect()))
    b = sorted(map(tuple, idx2.topk(q, k=3).collect()))
    assert a == b and len(a) > 0

    # geometry guard: mismatched resume must fail loud
    with pytest.raises(ValueError, match="geometry"):
        IvfAnnIndex(spark, "embedding", "vec_id", n_centroids=8,
                    state_dir=sd)

    # upsert: re-adding an id replaces its row (and may move cells)
    idx2.add_batch(spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<float>"))
    live = idx2._tx.read_live()
    assert live.filter("neighbor_id = 0").count() == 1
    assert live.count() == 120  # replaced, not duplicated


def test_lsh_multiprobe_improves_recall(catalog):
    from dozer_spark.ops.similarity import lsh_ann_topk

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 30)
    exact = brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    single = lsh_ann_topk(e, q, "embedding", "vec_id", k=5,
                          n_planes=8).collect()
    multi = lsh_ann_topk(e, q, "embedding", "vec_id", k=5,
                         n_planes=8, n_probes=4).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    r1 = len(truth & {(r.query_id, r.neighbor_id) for r in single})
    r4 = len(truth & {(r.query_id, r.neighbor_id) for r in multi})
    # probing 3 extra thin-margin buckets can only add candidates
    assert r4 >= r1
    assert len(multi) >= len(single)


def test_lsh_multiprobe_one_probe_equals_plain(catalog):
    from dozer_spark.ops.similarity import lsh_ann_topk

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    plain = sorted(map(tuple, lsh_ann_topk(
        e, q, "embedding", "vec_id", k=5, n_planes=8).collect()))
    one = sorted(map(tuple, lsh_ann_topk(
        e, q, "embedding", "vec_id", k=5, n_planes=8,
        n_probes=1).collect()))
    assert plain == one


def test_lsh_multiprobe_fast_matches_fold(catalog):
    from dozer_spark.ops.similarity import lsh_ann_topk, lsh_ann_topk_fast

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    fold = lsh_ann_topk(e, q, "embedding", "vec_id", k=5, n_planes=8,
                        n_probes=3).collect()
    fast = lsh_ann_topk_fast(e, q, "embedding", "vec_id", k=5, n_planes=8,
                             n_probes=3).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in fold} == \
           {(r.query_id, r.neighbor_id, r.rank) for r in fast}


def test_ivf_frozen_recall_and_shape(catalog):
    """Frozen-quantizer IVF (serving shape): valid ranks, no self
    matches, and cosines that agree exactly with brute force for the
    pairs it returns (the re-rank is exact within probed cells)."""
    from dozer_spark.ops.ivf_frozen import FROZEN_CENTROIDS_16x64
    from dozer_spark.ops.similarity import ivf_ann_topk_frozen

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    froz = ivf_ann_topk_frozen(
        e, q, "embedding", "vec_id", FROZEN_CENTROIDS_16x64, k=5, n_probe=4
    ).collect()
    assert froz
    for r in froz:
        assert 1 <= r.rank <= 5 and r.neighbor_id != r.query_id
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in froz:
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert r.cosine == exact_cos[(r.query_id, r.neighbor_id)]
    # centroids were fit at sf0.01 but generalize: probing 4/16 cells
    # must recover a chunk of the true neighbors even on sf0.001
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    froz_set = {(r.query_id, r.neighbor_id) for r in froz}
    assert len(exact_set & froz_set) / len(exact_set) > 0.3


def test_ivf_frozen_deterministic_across_partitionings(catalog):
    """Unlike the live-fit variants, the frozen path has NO training
    step — results are identical under any repartitioning."""
    from dozer_spark.ops.ivf_frozen import FROZEN_CENTROIDS_16x64
    from dozer_spark.ops.similarity import ivf_ann_topk_frozen

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_ann_topk_frozen(
        e, q, "embedding", "vec_id", FROZEN_CENTROIDS_16x64, k=3).collect()))
    b = sorted(map(tuple, ivf_ann_topk_frozen(
        e.repartition(7), q.coalesce(1), "embedding", "vec_id",
        FROZEN_CENTROIDS_16x64, k=3).collect()))
    assert a == b


@pytest.mark.slow
def test_ivf_pq_frozen_recall_and_determinism(catalog):
    """Frozen-geometry IVF-PQ: valid output shape, no self matches,
    decent recall vs brute force (4-bit PQ over 4/16 probed cells), and
    bit-identical results under repartitioning (no training step)."""
    from dozer_spark.ops.pq_frozen import (
        FROZEN_PQ_BOOKS_8x16x8,
        FROZEN_PQ_COARSE_16x64,
    )
    from dozer_spark.ops.similarity import ivf_pq_ann_topk_frozen

    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    froz = ivf_pq_ann_topk_frozen(
        e, q, "embedding", "vec_id",
        FROZEN_PQ_COARSE_16x64, FROZEN_PQ_BOOKS_8x16x8, k=5).collect()
    assert froz
    for r in froz:
        assert 1 <= r.rank <= 5 and r.neighbor_id != r.query_id
    exact = brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    froz_set = {(r.query_id, r.neighbor_id) for r in froz}
    assert len(exact_set & froz_set) / len(exact_set) > 0.3

    again = ivf_pq_ann_topk_frozen(
        e.repartition(5), q.coalesce(1), "embedding", "vec_id",
        FROZEN_PQ_COARSE_16x64, FROZEN_PQ_BOOKS_8x16x8, k=5).collect()
    assert sorted(map(tuple, froz)) == sorted(map(tuple, again))
