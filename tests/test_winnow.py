"""Winnowing fingerprints (`winnow_fingerprint_score`): closed-form
fingerprint selection vs an independent pure-Python replay, the
shared-run detection guarantee (any >= w+k-1-token overlap is caught),
the short-document single-minimum rule, and the under-k zero row.
Corpus-level DuckDB parity is the driver's `text_winnow_fingerprints`
oracle (queries_wave8.py)."""

from __future__ import annotations

import hashlib

from dozer_spark.ops.text import winnow_fingerprint_score

K, W = 5, 4


def _py_fps(text):
    t = [x for x in text.split(" ") if x]
    hs = [int(hashlib.md5(" ".join(t[i:i + K]).encode()).hexdigest()[:8], 16)
          for i in range(len(t) - K + 1)] if len(t) >= K else []
    if len(hs) >= W:
        sel = {min(hs[j:j + W]) for j in range(len(hs) - W + 1)}
    elif hs:
        sel = {min(hs)}
    else:
        sel = set()
    return sel


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = winnow_fingerprint_score(df, "text", "doc_id", k=K, w=W)
    return {r["doc_id"]: r for r in out.collect()}


def test_fingerprint_counts_match_python_replay(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one two three four five six"),
        (3, "x y z w v"),          # exactly k tokens -> 1 hash -> 1 fp
        (4, "too few"),            # under k tokens -> 0 fingerprints
    ]
    got = _run(spark, rows)
    for d, text in rows:
        assert got[d]["n_fingerprints"] == len(_py_fps(text)), d
    assert got[4]["n_fingerprints"] == 0
    assert got[4]["share_score"] == 0.0


def test_shared_long_run_is_guaranteed_caught(spark):
    # two docs sharing a run of w + k - 1 = 8 tokens, different context
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        (1, "p1 p2 p3 " + shared + " q1 q2"),
        (2, "r1 r2 " + shared + " u1 u2 u3"),
        (3, "alone here with other words entirely different"),
    ]
    got = _run(spark, rows)
    assert got[1]["n_shared"] >= 1
    assert got[2]["n_shared"] >= 1
    assert got[3]["n_shared"] == 0
    assert 0.0 < got[1]["share_score"] <= 1.0


def test_density_below_exhaustive(spark):
    text = " ".join(f"tok{i}" for i in range(200))
    got = _run(spark, [(1, text)])
    n_shingles = 200 - K + 1
    # winnowing selects ~2/(w+1) of shingles; allow generous slack
    assert got[1]["n_fingerprints"] < n_shingles * 0.8
    assert got[1]["n_fingerprints"] >= n_shingles // (W + 1)
