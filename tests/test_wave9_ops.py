"""Wave-9 operators: fuzzy edit-distance join, time-series gap-fill,
hard-negative mining, deterministic splits, distributed PCA."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dozer_spark.ops.fuzzy import deletion_variants, fuzzy_self_join_dist1
from dozer_spark.ops.timeseries import gap_fill_interpolate
from dozer_spark.ops.sampling import hash_split
from dozer_spark.ops.similarity import hard_negative_topk
from dozer_spark.ops.embedding import pca_fit, pca_project


# ---------------------------------------------------------------- fuzzy

def test_deletion_variants_values(spark):
    df = spark.createDataFrame([("abc",), ("",), ("aa",)], ["s"])
    got = {
        r["s"]: sorted(r["v"])
        for r in df.select("s", deletion_variants(F.col("s")).alias("v")).collect()
    }
    assert got["abc"] == sorted(["abc", "bc", "ac", "ab"])
    assert got[""] == [""]
    # deleting either 'a' collapses to one variant
    assert got["aa"] == ["a", "aa"]


def test_fuzzy_join_dist1_exact_semantics(spark):
    rows = [
        (1, "kitten"),
        (2, "mitten"),   # substitution -> dist 1
        (3, "kitten"),   # exact dup -> dist 0
        (4, "kittens"),  # insertion -> dist 1
        (5, "kitte"),    # deletion -> dist 1
        (6, "sitting"),  # dist > 1 from all
        (7, "ab"),
        (8, "ba"),       # shares deletion keys with 'ab' but dist 2 -> excluded
        (9, None),       # ignored
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join_dist1(df, "id", "name").collect()
    }
    expected = {
        (1, 2): 1, (1, 3): 0, (1, 4): 1, (1, 5): 1,
        (2, 3): 1, (3, 4): 1, (3, 5): 1,
        # mitten-kittens dist 2, mitten-kitte dist 2, kittens-kitte dist 2
    }
    assert got == expected


def test_fuzzy_join_matches_brute_force_random(spark):
    # random short strings; brute-force levenshtein as the reference
    rng = np.random.default_rng(7)
    alphabet = list("abcd")
    words = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 6)))
        for _ in range(60)
    ]
    rows = [(i, w) for i, w in enumerate(words)]

    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[lb]

    expected = {
        (i, j): lev(words[i], words[j])
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= 1
    }
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join_dist1(df, "id", "name").collect()
    }
    assert got == expected


def test_fuzzy_join_forced_split_equals_unsplit(spark):
    # hot_cap=1 forces the triangle-fragment split on EVERY variant
    # bucket; output must be identical to the plain plan
    rows = [(i, w) for i, w in enumerate(
        ["kitten", "mitten", "kitten", "kittens", "kitte", "ab", "ba", "cb"]
    )]
    df = spark.createDataFrame(rows, ["id", "name"])
    plain = {(r["id_a"], r["id_b"]): r["dist"]
             for r in fuzzy_self_join_dist1(df, "id", "name").collect()}
    split = {(r["id_a"], r["id_b"]): r["dist"]
             for r in fuzzy_self_join_dist1(df, "id", "name", hot_cap=1).collect()}
    assert split == plain and len(plain) > 0


def test_fuzzy_join_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "cd")], ["id", "name"])
    plan = fuzzy_self_join_dist1(df, "id", "name")._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    # the variant self-join must be sort-merge (spillable), never a
    # broadcast of the stats-underestimated exploded table
    assert "SortMergeJoin" in plan


# ----------------------------------------------------------- timeseries

def test_gap_fill_linear_interpolation(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 00:50:00", 20.0),  # same bucket -> avg 15
        (1, "2024-01-01 03:00:00", 45.0),  # 2 gap hours to interpolate
        (2, "2024-01-01 05:30:00", 7.0),   # single-bucket key
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        (r["user_id"], r["bucket"]): (r["value_filled"], r["is_observed"])
        for r in gap_fill_interpolate(df, "user_id", "ts", "value").collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): (15.0, 1),
        (1, "2024-01-01 01:00:00"): (25.0, 0),  # 15 + (45-15)*1/3
        (1, "2024-01-01 02:00:00"): (35.0, 0),
        (1, "2024-01-01 03:00:00"): (45.0, 1),
        (2, "2024-01-01 05:00:00"): (7.0, 1),
    }


def test_gap_fill_no_extrapolation_and_step_validation(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], ["user_id", "ts", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = gap_fill_interpolate(df, "user_id", "ts", "value").collect()
    assert len(out) == 1  # spine never extends past observed range
    with pytest.raises(ValueError):
        gap_fill_interpolate(df, "user_id", "ts", "value", step="fortnight")


# ---------------------------------------------------------------- split

def test_hash_split_partitions_and_determinism(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    splits = [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    out = hash_split(df, "k", splits, salt="s")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000  # a partition: every row, once
    assert set(counts) == {"train", "valid", "test"}
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.07 < counts["valid"] / 5000 < 0.13
    # deterministic: same assignment on re-run
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k", splits, salt="s").collect()}
    assert a == b
    # different salt -> different assignment (with overwhelming probability)
    c = {r["k"]: r["split"] for r in hash_split(df, "k", splits, salt="t").collect()}
    assert a != c


def test_hash_split_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_split(df, "k", [("a", 0.5), ("b", 0.2)])
    with pytest.raises(ValueError):
        hash_split(df, "k", [("a", 1.5), ("b", -0.5)])


# -------------------------------------------------------------- quality

def test_data_quality_report_known_values(spark):
    from dozer_spark.ops.quality import (
        accepted_values, completeness, data_quality_report, in_range,
        matches, uniqueness,
    )

    rows = [
        (1, "a", 5.0), (2, "b", 15.0), (3, None, 25.0),
        (3, "a", None), (4, "zz", -1.0),
    ]
    df = spark.createDataFrame(rows, ["k", "cat", "x"])
    got = {
        r["constraint"]: (r["metric"], r["value"], r["passed"])
        for r in data_quality_report(df, [
            completeness("cat", min_value=0.9),
            uniqueness("k"),                      # 4 distinct / 5 rows
            in_range("x", 0, 20, min_value=0.5),  # 2 of 5 in range
            matches("cat", "^[ab]$", min_value=0.6),
            accepted_values("cat", ["a", "b"], min_value=0.6),
        ]).collect()
    }
    assert got["completeness(cat)"] == ("non_null_share", 0.8, 0)
    assert got["uniqueness(k)"] == ("distinct_share", 0.8, 0)
    assert got["in_range(x,0,20)"] == ("in_range_share", 0.4, 0)
    assert got["matches(cat)"] == ("regex_share", 0.6, 1)
    assert got["accepted_values(cat)"] == ("accepted_share", 0.6, 1)


def test_data_quality_report_edge_cases(spark):
    from dozer_spark.ops.quality import (
        completeness, data_quality_report, uniqueness,
    )

    df = spark.createDataFrame([(1, "a")], ["k", "cat"]).filter("k < 0")
    got = data_quality_report(df, [completeness("cat")]).collect()
    assert got[0]["value"] == 1.0 and got[0]["passed"] == 1  # empty passes
    # nulls count as one shared value for uniqueness
    df2 = spark.createDataFrame([(None,), (None,), (1,)], "k: int")
    got2 = data_quality_report(df2, [uniqueness("k")]).collect()
    assert got2[0]["value"] == round(2 / 3, 6)  # report rounds to 6
    with pytest.raises(ValueError):
        data_quality_report(df, [])
    with pytest.raises(ValueError):
        data_quality_report(df, [completeness("cat"), completeness("cat")])


def test_value_histogram_clamping_and_totals(spark):
    from dozer_spark.ops.quality import value_histogram

    rows = [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (99.0,), (150.0,),
            (None,)]
    df = spark.createDataFrame(rows, "x: double")
    got = {r["bucket"]: (r["lo_edge"], r["hi_edge"], r["n"])
           for r in value_histogram(df, "x", 0.0, 100.0, 10).collect()}
    # -5 clamps into bucket 0; 150 clamps into bucket 9; NULL excluded
    assert got[0] == (0.0, 10.0, 3)   # -5, 0, 9.9
    assert got[1] == (10.0, 20.0, 1)  # 10.0 lands on its edge
    assert got[2] == (20.0, 30.0, 1)
    assert got[9] == (90.0, 100.0, 2)  # 99 + clamped 150
    assert sum(n for (_, _, n) in got.values()) == 7
    with pytest.raises(ValueError):
        value_histogram(df, "x", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        value_histogram(df, "x", 5.0, 5.0, 10)


def test_fk_orphan_audit_planted_orphans(spark):
    from dozer_spark.ops.quality import fk_orphan_audit

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk: int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: int")
    r = fk_orphan_audit(child, "fk", parent, "pk").collect()[0]
    assert r["relationship"] == "fk->pk"
    assert r["n_child"] == 5
    assert r["n_orphans"] == 1  # the 9; NULL is not an orphan
    assert abs(r["orphan_share"] - 0.2) < 1e-9


# ------------------------------------------------------------ text wave9

def test_cross_source_dup_matrix_counts(spark):
    # the sf0.01 oracle gate is trivially empty (no exact dups in that
    # corpus), so the counting logic is pinned here: distinct digests,
    # C(k,2) source pairs per shared digest, a<b ordering
    from dozer_spark.ops.text import cross_source_dup_matrix

    rows = [
        (1, "same text", "crawlA"), (2, "same text", "crawlB"),
        (3, "same text", "crawlC"),           # shared by A,B,C -> 3 pairs
        (4, "same text", "crawlA"),           # dup within A: still 1 digest
        (5, "other", "crawlA"), (6, "other", "crawlB"),  # A-B again
        (7, "solo", "crawlC"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
           for r in cross_source_dup_matrix(df, "text", "source").collect()}
    assert got == {
        ("crawlA", "crawlB"): 2,  # "same text" + "other"
        ("crawlA", "crawlC"): 1,
        ("crawlB", "crawlC"): 1,
    }


def test_ccnet_buckets_per_language_tertiles(spark):
    from dozer_spark.ops.text import ccnet_perplexity_buckets

    # 6 docs in one lang (buckets of 2), 2 in another (sizes 1,1,0)
    rows = [(i, f"w{i} w{i} common", "en") for i in range(6)]
    rows += [(10, "common common", "fr"), (11, "w10 w11 w12", "fr")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = ccnet_perplexity_buckets(df, "text", "doc_id", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["en"]) == 6 and len(by_lang["fr"]) == 2
    # en: equal-count tertiles of 2
    from collections import Counter

    assert Counter(r["bucket"] for r in by_lang["en"]) == {1: 2, 2: 2, 3: 2}
    # buckets ordered by perplexity: every head perplexity <= every tail
    en = by_lang["en"]
    assert max(r["perplexity"] for r in en if r["tier"] == "head") <= min(
        r["perplexity"] for r in en if r["tier"] == "tail")
    # fr doc with corpus-common tokens is the head, rare-token doc next
    fr = {r["doc_id"]: r for r in by_lang["fr"]}
    assert fr[10]["bucket"] == 1 and fr[10]["tier"] == "head"
    assert fr[11]["bucket"] == 2


# ------------------------------------------------------- hard negatives

def test_hard_negative_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    n, d = 120, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % 4).astype(int)
    rows = [(i, vecs[i].tolist(), int(labels[i])) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter(F.col("vec_id") % 20 == 0)
    got = hard_negative_topk(df, q, "embedding", "vec_id", "label", k=3).collect()

    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    for qi in range(0, n, 20):
        cos = (v64 @ v64[qi]) / (norms * norms[qi])
        mask = labels != labels[qi]
        order = sorted(
            (i for i in range(n) if mask[i]),
            key=lambda i: (-cos[i], i),
        )[:3]
        mine = sorted(
            (r for r in got if r["query_id"] == qi), key=lambda r: r["rank"]
        )
        assert [r["neighbor_id"] for r in mine] == order
        for r in mine:
            # negatives only, and every rank filled
            assert labels[r["neighbor_id"]] != labels[qi]
        assert [r["rank"] for r in mine] == [1, 2, 3]


def test_hard_negative_fast_equals_fold(spark):
    from dozer_spark.ops.similarity import hard_negative_topk_fast

    rng = np.random.default_rng(9)
    n, d = 150, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % 5).astype(int)
    rows = [(i, vecs[i].tolist(), int(labels[i])) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter(F.col("vec_id") % 25 == 0)

    def key(out):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"],
             r["neighbor_label"], r["cosine"])
            for r in out.collect()
        )

    fold = key(hard_negative_topk(df, q, "embedding", "vec_id", "label", k=4))
    fast = key(hard_negative_topk_fast(
        df, q, "embedding", "vec_id", "label", k=4))
    assert fast == fold
    # forced block split must not change results
    split = key(hard_negative_topk_fast(
        df, q, "embedding", "vec_id", "label", k=4, block_rows=16))
    assert split == fold


# ------------------------------------------------------------------ rrf

def test_rrf_fuse_semantics(spark):
    from dozer_spark.ops.search import rrf_fuse

    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)], ["qid", "doc", "rank"])
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 9, 2)], ["qid", "doc", "rank"])
    got = {r["item_id"]: (r["rrf_score"], r["rank"])
           for r in rrf_fuse(a, b, "qid", "doc", k=60, topn=10).collect()}
    # doc 2: in both lists -> 1/62 + 1/61
    assert got[2][0] == round(1 / 62 + 1 / 61, 6)
    assert got[2][1] == 1  # fused winner
    # one-sided items still score
    assert got[1][0] == round(1 / 61, 6)
    assert got[9][0] == round(1 / 62, 6)
    assert got[3][0] == round(1 / 63, 6)
    # equal scores tie-break on item id: doc1 (1/61 from a) vs nothing equal
    ranks = sorted((v[1], k) for k, v in got.items())
    assert [k for _, k in ranks] == [2, 1, 9, 3]


# ------------------------------------------------------------------ pca

def test_pca_matches_numpy_eigh(spark):
    rng = np.random.default_rng(11)
    # anisotropic cloud: variance concentrated along known directions
    base = rng.normal(size=(400, 6)) * np.array([10, 5, 2, 1, 0.5, 0.1])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    data = (base @ rot).astype(np.float32)
    df = spark.createDataFrame(
        [(i, data[i].tolist()) for i in range(400)], ["vec_id", "embedding"]
    ).repartition(5)
    model = pca_fit(df, "embedding", dim=6, n_components=3)

    x = data.astype(np.float64)
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref = evecs[:, order].T.copy()
    for row in ref:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0

    assert model.n_rows == 400
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.components, ref, atol=1e-7)
    assert np.allclose(model.explained_variance, evals[order], atol=1e-7)
    # orthonormal, variance descending
    assert np.allclose(model.components @ model.components.T, np.eye(3), atol=1e-9)
    assert all(np.diff(model.explained_variance) <= 1e-12)

    proj = pca_project(df, "embedding", model, round_to=None)
    got = {r["vec_id"]: np.array(r["pc"]) for r in proj.collect()}
    expected = (x - mean) @ ref.T
    for i in range(400):
        assert np.allclose(got[i], expected[i], atol=1e-6)


def test_pca_deterministic_across_partitionings(spark):
    rng = np.random.default_rng(5)
    data = rng.normal(size=(200, 4)).astype(np.float32)
    rows = [(i, data[i].tolist()) for i in range(200)]
    m1 = pca_fit(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(3),
        "embedding", dim=4, n_components=2,
    )
    m2 = pca_fit(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(7),
        "embedding", dim=4, n_components=2,
    )
    # same moments regardless of partitioning (sorted driver combine)
    assert np.allclose(m1.components, m2.components, atol=1e-9)
    assert np.allclose(m1.mean, m2.mean, atol=1e-12)


def test_pca_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", dim=2, n_components=3)
    with pytest.raises(Exception):
        pca_fit(df, "embedding", dim=3, n_components=1)  # wrong dim
    with pytest.raises(ValueError):
        pca_fit(df.filter("vec_id < 0"), "embedding", dim=2, n_components=1)


# -------------------------------------------------------------- packing

def test_chunk_manifest_tiling_invariants(spark):
    from dozer_spark.ops.packing import chunk_assembly_manifest

    rows = [(i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 20)))
            for i in range(40)]
    rows.append((99, ""))  # zero-token doc: no manifest rows
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_assembly_manifest(df, "doc_id", "text", seq_len=16).collect()
    assert all(r["doc_id"] != 99 for r in out)

    # per-doc spans tile [0, n_tokens)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tok = {i: 3 + (i * 7) % 20 for i in range(40)}
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["doc_from"])
        assert rs[0]["doc_from"] == 0
        assert rs[-1]["doc_to"] == n_tok[d]
        for a, b in zip(rs, rs[1:]):
            assert a["doc_to"] == b["doc_from"]

    # per-chunk segments tile [0, 16) except the final chunk's tail
    by_chunk = {}
    for r in out:
        by_chunk.setdefault(r["chunk_id"], []).append(r)
    total = sum(n_tok.values())
    last_chunk = max(by_chunk)
    for c, rs in by_chunk.items():
        rs.sort(key=lambda r: r["chunk_pos"])
        assert rs[0]["chunk_pos"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["chunk_pos"] + (a["doc_to"] - a["doc_from"]) == b["chunk_pos"]
        filled = rs[-1]["chunk_pos"] + rs[-1]["doc_to"] - rs[-1]["doc_from"]
        assert filled == (16 if c != last_chunk else total - 16 * last_chunk)

    with pytest.raises(ValueError):
        chunk_assembly_manifest(df, "doc_id", "text", seq_len=0)


def test_chunk_manifest_consistent_with_shard_assignment(spark):
    # chunk_id * seq_len boundaries and shard boundaries derive from the
    # SAME global offsets: a doc's first chunk must equal its shard when
    # seq_len == budget
    from dozer_spark.ops.packing import (
        chunk_assembly_manifest,
        token_shard_assignment,
    )

    rows = [(i, " ".join("w" for _ in range(5 + i % 9))) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    shards = {r["doc_id"]: r["shard_id"] for r in
              token_shard_assignment(df, "doc_id", "text", budget=32).collect()}
    manifest = chunk_assembly_manifest(df, "doc_id", "text", seq_len=32).collect()
    first_chunk = {}
    for r in manifest:
        d = r["doc_id"]
        if d not in first_chunk or r["chunk_id"] < first_chunk[d]:
            first_chunk[d] = r["chunk_id"]
    assert first_chunk == shards
