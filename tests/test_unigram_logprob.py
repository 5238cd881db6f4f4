"""In-corpus unigram LM scoring (`unigram_logprob`): closed-form
exactness on a tiny corpus, ranking sanity (corpus-typical docs score
higher than rare-token docs), and the one-row-per-nonempty-doc
contract. Corpus-level DuckDB parity is the driver's
`text_unigram_logprob` oracle (queries_wave8.py)."""

from __future__ import annotations

import math

from dozer_spark.ops.text import unigram_logprob


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = unigram_logprob(df, "text", "doc_id")
    return {r["doc_id"]: r for r in out.collect()}


def test_closed_form_two_docs(spark):
    # corpus: a a a b  -> N=4, c(a)=3, c(b)=1
    got = _run(spark, [(1, "a a a"), (2, "b")])
    n = 4.0
    lp1 = ((3 * math.log(3)) / 3) - math.log(n)   # doc1: three 'a'
    lp2 = math.log(1) - math.log(n)               # doc2: one 'b'
    assert got[1]["n_tokens"] == 3
    assert abs(got[1]["avg_logprob"] - round(lp1, 6)) < 1e-9
    assert abs(got[2]["avg_logprob"] - round(lp2, 6)) < 1e-9
    assert abs(got[1]["perplexity"] - round(math.exp(-round(lp1, 6)), 3)) < 1e-9
    assert abs(got[2]["perplexity"] - round(math.exp(-round(lp2, 6)), 3)) < 1e-9


def test_typical_doc_beats_rare_token_doc(spark):
    common = " ".join(["the quick brown fox"] * 10)
    rows = [(i, common) for i in range(1, 6)]
    rows.append((99, "zyzzyva qwfparst xlqueue"))
    got = _run(spark, rows)
    assert got[1]["avg_logprob"] > got[99]["avg_logprob"]
    assert got[1]["perplexity"] < got[99]["perplexity"]


def test_empty_doc_excluded_whitespace_normalized(spark):
    got = _run(spark, [(1, "a  b   a"), (2, "")])
    assert set(got) == {1}
    assert got[1]["n_tokens"] == 3


def test_uniform_corpus_perplexity_equals_vocab_size(spark):
    # every token unique -> p = 1/N for all, perplexity == N
    rows = [(1, "t1 t2 t3 t4"), (2, "t5 t6 t7 t8")]
    got = _run(spark, rows)
    for d in (1, 2):
        assert abs(got[d]["perplexity"] - 8.0) < 1e-6
