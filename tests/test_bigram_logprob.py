"""Interpolated bigram LM scoring (`bigram_logprob`): closed-form
exactness on a tiny corpus, the local-fluency property (scrambled word
order scores lower than natural order at identical unigram content),
and the >=2-token row contract. Corpus-level DuckDB parity is the
driver's `text_bigram_logprob` oracle (queries_wave8.py)."""

from __future__ import annotations

import math

from dozer_spark.ops.text import bigram_logprob


def _run(spark, rows, lam=0.75):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bigram_logprob(df, "text", "doc_id", lam=lam)
    return {r["doc_id"]: r for r in out.collect()}


def test_closed_form_two_docs(spark):
    # corpus tokens: a b a c -> N=4, cu: a=2 b=1 c=1
    # bigrams: (a,b) in doc1, (a,c) in doc2 -> cb=1 each, cl(a)=2
    got = _run(spark, [(1, "a b"), (2, "a c")])
    lp = math.log(0.75 * 1 / 2 + 0.25 * 1 / 4.0)
    for d in (1, 2):
        assert got[d]["n_bigrams"] == 1
        assert abs(got[d]["avg_logprob"] - round(lp, 6)) < 1e-9
        assert abs(got[d]["perplexity"]
                   - round(math.exp(-round(lp, 6)), 3)) < 1e-9


def test_scrambled_order_scores_lower(spark):
    natural = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over fox lazy jumps brown the quick"
    rows = [(i, natural) for i in range(1, 20)]
    rows.append((99, scrambled))
    got = _run(spark, rows)
    # identical unigram content; the bigram term separates them
    assert got[1]["avg_logprob"] > got[99]["avg_logprob"]
    assert got[1]["perplexity"] < got[99]["perplexity"]


def test_short_docs_have_no_row(spark):
    got = _run(spark, [(1, "solo"), (2, ""), (3, "two tokens")])
    assert 1 not in got and 2 not in got
    assert got[3]["n_bigrams"] == 1


def test_lambda_one_is_pure_bigram(spark):
    # lam=1: p = cb/cl exactly; doc "a b a b": bigrams ab, ba, ab
    # cb(ab)=2, cb(ba)=1; cl(a)=2, cl(b)=1
    got = _run(spark, [(1, "a b a b")], lam=1.0)
    lp = (math.log(2 / 2) + math.log(1 / 1) + math.log(2 / 2)) / 3
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["avg_logprob"] - round(lp, 6)) < 1e-9
