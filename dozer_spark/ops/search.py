"""BM25 ranked retrieval over a document corpus.

The lexical-search face of the engine: score documents against a
(small) query set with the classic Okapi BM25 function
(Robertson/Sparck Jones; the default ranking function of Lucene/
Elasticsearch, from public literature) and return the top-n documents
per query. Complements the ANN family — embeddings answer "similar",
BM25 answers "relevant to these terms".

Reference scope: beyond dozer's surface — corpus-pipeline family
(SURVEY.md §2 extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dozer_spark.ops.text import tokens


def bm25_topn(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    queries: DataFrame,
    qtext_col: str,
    qid_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 10,
) -> DataFrame:
    """Okapi BM25 top-n: for each query, the `topn` best documents by
    `sum over distinct query terms of
     idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`
    with `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))` (the
    non-negative Robertson idf Lucene uses). N counts ALL corpus
    documents; avgdl averages over documents with at least one token
    (empty documents have no postings and can never score).

    Returns (query_id, doc_id-named-as-id_col... ) -> concretely
    (qid_col, id_col, score, rank), rank 1..topn per query; scores
    rounded to 6 places BEFORE ranking (ties break on doc id) so the
    cut is deterministic across engines and summation orders.

    100 TB design: the term-frequency table is the one corpus-sized
    shuffle (map-side combined groupBy on (doc, term)); doc lengths
    derive from it (no second corpus pass); the idf table is
    vocabulary-sized and the distinct query-term list is tiny — both
    join back under the broadcast size gate; corpus totals arrive via
    broadcast single-row cross joins; the final per-(query, doc)
    aggregation shuffles only postings that match a query term.
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    n_docs = docs.count()
    tf = cache_materialized(
        ensure_min_partitions(docs)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__term"))
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dl = tf.groupBy(id_col).agg(F.sum("__tf").cast("double").alias("__dl"))
    stats = dl.agg(F.avg("__dl").alias("__avgdl"))
    df_t = tf.groupBy("__term").agg(
        F.count(F.lit(1)).cast("double").alias("__df"))
    idf = df_t.select(
        "__term",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
              / (F.col("__df") + F.lit(0.5))).alias("__idf"),
    )
    qt = queries.select(
        F.col(qid_col).alias("__qid"),
        F.explode(F.array_distinct(tokens(F.col(qtext_col)))).alias("__term"),
    )
    contrib = (
        F.col("__idf")
        * (F.col("__tf") * F.lit(k1 + 1.0))
        / (F.col("__tf") + F.lit(k1)
           * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")))
    )
    scored = (
        tf.join(maybe_broadcast(cache_materialized(qt)), "__term")
        .join(maybe_broadcast(cache_materialized(idf)), "__term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy("__qid", id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
        .select(
            F.col("__qid").alias("query_id"),
            F.col(id_col),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )
