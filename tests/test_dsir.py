"""DSIR importance weighting (`dsir_log_weights`): closed-form check
against an independent pure-Python replay of the hashed-feature
log-ratio, the selection property (raw docs resembling the target
split outweigh ones that don't), feature counting, and the
null-predicate guard. Corpus-level DuckDB parity is the driver's
`dsir_importance_weights` oracle (queries_ops.py)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dozer_spark.ops.sampling import dsir_log_weights


def _py_weights(rows, target_ids, n_buckets):
    """Independent replay: hashed unigram+bigram censuses and the add-1
    smoothed log-ratio, in pure Python."""
    def feats(text):
        t = [x for x in text.split(" ") if x != ""]
        grams = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        return [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
                for g in grams]

    tc, rc = {}, {}
    nt = nr = 0
    for doc_id, text in rows:
        for b in feats(text):
            if doc_id in target_ids:
                tc[b] = tc.get(b, 0) + 1
                nt += 1
            else:
                rc[b] = rc.get(b, 0) + 1
                nr += 1
    out = {}
    for doc_id, text in rows:
        if doc_id in target_ids:
            continue
        fs = feats(text)
        if not fs:
            continue
        lw = sum(
            math.log((tc.get(b, 0) + 1) / (nt + float(n_buckets)))
            - math.log((rc[b] + 1) / (nr + float(n_buckets)))
            for b in fs
        )
        out[doc_id] = (len(fs), round(lw, 6))
    return out


def test_closed_form_matches_python_replay(spark):
    rows = [
        (1, "alpha beta gamma"),        # target
        (2, "alpha beta gamma delta"),  # raw, target-like
        (3, "xray yankee zulu"),        # raw, off-target
        (4, ""),                        # raw, empty -> no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_feats"], r["log_weight"]) for r in
           dsir_log_weights(df, "text", "doc_id",
                            F.col("doc_id") == 1, n_buckets=97).collect()}
    want = _py_weights(rows, {1}, 97)
    assert set(got) == set(want) == {2, 3}
    for d in got:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-6


def test_target_like_docs_outweigh_off_target(spark):
    target = [(i, "the model trains on curated text") for i in range(1, 6)]
    like = [(100, "the model trains on curated web text")]
    unlike = [(200, "zzz qqq vvv kkk jjj www")]
    filler = [(300 + i, "common filler words appear here") for i in range(5)]
    df = spark.createDataFrame(target + like + unlike + filler,
                               ["doc_id", "text"])
    got = {r["doc_id"]: r["log_weight"] for r in
           dsir_log_weights(df, "text", "doc_id",
                            F.col("doc_id") < 10).collect()}
    assert got[100] > got[200]


def test_feature_count_is_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "t t"), (2, "a b c")], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_feats"] for r in
           dsir_log_weights(df, "text", "doc_id",
                            F.col("doc_id") == 1).collect()}
    # doc 2: 3 unigrams + 2 bigrams
    assert got[2] == 5


def test_null_predicate_counts_as_raw(spark):
    df = spark.createDataFrame(
        [(1, "a b", "t"), (2, "a c", None)], ["doc_id", "text", "tag"])
    got = dsir_log_weights(df, "text", "doc_id",
                           F.col("tag") == "t").collect()
    assert {r["doc_id"] for r in got} == {2}


def test_gumbel_topk_deterministic_and_bounded(spark):
    rows = [(i, f"word{i % 13} common text body {i % 5}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from dozer_spark.ops.sampling import dsir_gumbel_topk

    pred = F.col("doc_id") % 10 == 0
    a = sorted(map(tuple, dsir_gumbel_topk(
        df, "text", "doc_id", pred, n_select=15).collect()))
    b = sorted(map(tuple, dsir_gumbel_topk(
        df, "text", "doc_id", pred, n_select=15).collect()))
    assert a == b and len(a) == 15
    # selected docs are raw only, scores are finite
    for r in a:
        assert r[0] % 10 != 0
    # n_select larger than the raw population returns everything
    allr = dsir_gumbel_topk(df, "text", "doc_id", pred,
                            n_select=1000).collect()
    assert len(allr) == 54
