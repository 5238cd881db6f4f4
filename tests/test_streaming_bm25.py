"""StreamingBm25Index: batch-split equality with the one-shot batch
bm25_topn (the property the cdc_streaming_bm25 oracle gates),
re-sent-document replacement (stale postings tombstoned), within-batch
duplicate reduction, durable crash-resume, and the no-batches guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dozer_spark.ops.search import StreamingBm25Index, bm25_topn

DOCS = [
    (1, "spark shuffle join join"),
    (2, "spark filter scan"),
    (3, "window agg group rows"),
    (4, "join scan filter spark window"),
    (5, "totally unrelated words"),
    (6, ""),
]
QUERIES = [("qa", "spark join"), ("qb", "window scan")]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _qdf(spark):
    return spark.createDataFrame(QUERIES, ["query_id", "qtext"])


def test_three_batch_build_equals_one_shot(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = StreamingBm25Index(spark, "text", "doc_id")
    for k in range(3):
        idx.add_batch(d.filter(F.col("doc_id") % 3 == k))
    got = _rows(idx.topn(_qdf(spark), "qtext", "query_id"))
    want = _rows(bm25_topn(d, "text", "doc_id", _qdf(spark),
                           "qtext", "query_id"))
    assert got == want and got


def test_resent_doc_replaces_postings(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = StreamingBm25Index(spark, "text", "doc_id")
    idx.add_batch(d)
    # re-send doc 1 with entirely different terms: old "join join"
    # postings must be gone, so doc 1 leaves qa's results
    idx.add_batch(spark.createDataFrame(
        [(1, "completely different now")], ["doc_id", "text"]))
    final = spark.createDataFrame(
        [(1, "completely different now")] + DOCS[1:], ["doc_id", "text"])
    got = _rows(idx.topn(_qdf(spark), "qtext", "query_id"))
    want = _rows(bm25_topn(final, "text", "doc_id", _qdf(spark),
                           "qtext", "query_id"))
    assert got == want
    qa_docs = {t[1] for t in got if t[0] == "qa"}
    assert 1 not in qa_docs


def test_within_batch_duplicate_ids_reduce(spark):
    dup = spark.createDataFrame(
        [(9, "alpha beta"), (9, "alpha beta"), (9, "gamma delta")],
        ["doc_id", "text"])
    idx = StreamingBm25Index(spark, "text", "doc_id")
    idx.add_batch(dup)
    q = spark.createDataFrame([("q", "alpha gamma")], ["query_id", "qtext"])
    rows = idx.topn(q, "qtext", "query_id").collect()
    # one surviving image of doc 9 -> at most one result row
    assert len(rows) <= 1


@pytest.mark.slow
def test_durable_resume(spark, tmp_path):
    sd = str(tmp_path / "bm25_state")
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = StreamingBm25Index(spark, "text", "doc_id", state_dir=sd)
    idx.add_batch(d.filter(F.col("doc_id") <= 3))
    idx.add_batch(d.filter(F.col("doc_id") > 3))
    before = _rows(idx.topn(_qdf(spark), "qtext", "query_id"))

    # a fresh object over the same state dir serves identical results
    idx2 = StreamingBm25Index(spark, "text", "doc_id", state_dir=sd)
    after = _rows(idx2.topn(_qdf(spark), "qtext", "query_id"))
    assert before == after
    want = _rows(bm25_topn(d, "text", "doc_id", _qdf(spark),
                           "qtext", "query_id"))
    assert after == want


def test_no_batches_raises(spark):
    idx = StreamingBm25Index(spark, "text", "doc_id")
    with pytest.raises(ValueError, match="no batches"):
        idx.topn(_qdf(spark), "qtext", "query_id")


@pytest.mark.slow
def test_durable_resent_doc_replaces_postings(spark, tmp_path):
    """The durable stale-postings branch: a re-sent id must tombstone
    its vanished terms in the delta-log state (the append-only fast
    path skips the postings probe entirely, so this pins the one code
    path that pays it)."""
    sd = str(tmp_path / "bm25_state2")
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = StreamingBm25Index(spark, "text", "doc_id", state_dir=sd)
    idx.add_batch(d)
    idx.add_batch(spark.createDataFrame(
        [(1, "completely different now")], ["doc_id", "text"]))
    final = spark.createDataFrame(
        [(1, "completely different now")] + DOCS[1:], ["doc_id", "text"])
    got = _rows(idx.topn(_qdf(spark), "qtext", "query_id"))
    want = _rows(bm25_topn(final, "text", "doc_id", _qdf(spark),
                           "qtext", "query_id"))
    assert got == want
    # and it survives a resume
    idx2 = StreamingBm25Index(spark, "text", "doc_id", state_dir=sd)
    assert _rows(idx2.topn(_qdf(spark), "qtext", "query_id")) == want
