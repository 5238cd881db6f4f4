"""BM25 ranked retrieval (`bm25_topn`): closed-form score check
against an independent pure-Python replay, ranking sanity (documents
containing the query terms beat ones that don't; rarer matching terms
score higher), top-n/rank contract, and duplicate-query-term
idempotence. Corpus-level DuckDB parity is the driver's
`bm25_search_topn` oracle (queries_ops.py)."""

from __future__ import annotations

import math

from dozer_spark.ops.search import bm25_topn


def _py_bm25(doc_rows, query_terms, k1=1.2, b=0.75):
    toks = {d: [x for x in t.split(" ") if x] for d, t in doc_rows}
    n = float(len(doc_rows))
    tf = {d: {} for d in toks}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dls = {d: float(len(ts)) for d, ts in toks.items() if ts}
    avgdl = sum(dls.values()) / len(dls)
    df = {}
    for d in tf:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    out = {}
    for d in toks:
        s = 0.0
        hit = False
        for t in set(query_terms):
            if t in tf[d]:
                hit = True
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += (idf * (tf[d][t] * (k1 + 1.0))
                      / (tf[d][t] + k1 * (1.0 - b + b * dls[d] / avgdl)))
        if hit:
            out[d] = round(s, 6)
    return out


def _run(spark, doc_rows, queries, topn=10):
    d = spark.createDataFrame(doc_rows, ["doc_id", "text"])
    q = spark.createDataFrame(queries, ["query_id", "qtext"])
    return bm25_topn(d, "text", "doc_id", q, "qtext", "query_id",
                     topn=topn).collect()


def test_closed_form_matches_python_replay(spark):
    docs = [
        (1, "spark shuffle join join"),
        (2, "spark filter scan"),
        (3, "unrelated words here"),
        (4, ""),
    ]
    got = {r["doc_id"]: r["score"] for r in
           _run(spark, docs, [("q", "spark join")])}
    want = _py_bm25(docs, ["spark", "join"])
    assert set(got) == set(want) == {1, 2}
    for d in got:
        assert abs(got[d] - want[d]) < 1e-9


def test_rarer_term_scores_higher(spark):
    docs = [(i, "common filler text") for i in range(1, 10)]
    docs += [(20, "common rareword text"), (21, "common filler extra")]
    rows = _run(spark, docs, [("q", "rareword common")])
    top = min(rows, key=lambda r: r["rank"])
    assert top["doc_id"] == 20 and top["rank"] == 1


def test_topn_and_rank_contract(spark):
    docs = [(i, "hit term") for i in range(30)]
    rows = _run(spark, docs, [("q", "hit")], topn=5)
    assert len(rows) == 5
    assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
    # equal scores -> tie broken by ascending doc_id
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3, 4]


def test_duplicate_query_terms_count_once(spark):
    docs = [(1, "a b c"), (2, "a x y")]
    once = {r["doc_id"]: r["score"] for r in _run(spark, docs, [("q", "a")])}
    twice = {r["doc_id"]: r["score"] for r in
             _run(spark, docs, [("q", "a a a")])}
    assert once == twice
