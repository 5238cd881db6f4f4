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
    )

    n_docs = docs.count()
    tf = cache_materialized(
        ensure_min_partitions(docs)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__term"))
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    return _bm25_from_tf(tf, n_docs, id_col, queries, qtext_col, qid_col,
                         k1, b, topn)


def _bm25_from_tf(
    tf: DataFrame,
    n_docs: int,
    id_col: str,
    queries: DataFrame,
    qtext_col: str,
    qid_col: str,
    k1: float,
    b: float,
    topn: int,
) -> DataFrame:
    """The BM25 scoring tail over a prebuilt term-frequency table
    (id_col, __term, __tf) — shared verbatim by the batch `bm25_topn`
    and the incrementally maintained `StreamingBm25Index`, which is
    what makes the streaming index's exact replay oracle possible: the
    only thing the index maintains across epochs is the tf table, and
    the scoring arithmetic is this one code path."""
    from dozer_spark.operators.hints import cache_materialized, maybe_broadcast

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


class StreamingBm25Index:
    """Incrementally maintained BM25 index: document batches update a
    term-frequency state; query batches score against the accumulated
    corpus — the streaming-ingest face of bm25_topn.

    State = TWO tables. "tf" holds (id, __term, __tf) keyed by
    (id, term) — the postings; "docs" holds the seen doc ids — kept
    separately because N (the idf denominator) counts ALL indexed
    documents, including token-less ones that own no postings. Both
    are PK-keyed delta-logs (DiffStateTable) when durable: O(batch)
    epoch IO, shared crash/replay contract. A re-sent doc id REPLACES
    its old image — its changed postings overwrite by key and its
    stale terms are tombstoned (the one state read per epoch is the
    live-postings probe for the batch's ids).

    Because the maintained state is exactly the tf table the batch
    operator derives, and scoring goes through the shared
    _bm25_from_tf tail, an index built across ANY batch split serves
    IDENTICAL results to the one-shot batch bm25_topn — the exact
    oracle cdc_streaming_bm25 replays.
    """

    def __init__(self, spark, text_col: str, id_col: str,
                 state_dir: str | None = None):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self._tf = None
        self._docs = None
        self._store = None
        if state_dir is not None:
            from dozer_spark.streaming.incstate import (
                DiffStateTable,
                diff_state_path,
            )
            from dozer_spark.streaming.state import StateStore

            self._store = StateStore(spark, state_dir)
            self._tx_tf = DiffStateTable(
                spark, diff_state_path(state_dir, "bm25_tf"),
                key_cols=[id_col, "__term"],
            )
            self._tx_docs = DiffStateTable(
                spark, diff_state_path(state_dir, "bm25_docs"),
                key_cols=[id_col],
            )
            if self._store.epoch > 0:
                self._tf = self._tx_tf.read_committed(
                    self._store.load_meta("bm25_tf_v"))
                self._docs = self._tx_docs.read_committed(
                    self._store.load_meta("bm25_docs_v"))

    def add_batch(self, docs) -> None:
        """Index a batch (upsert by doc id: a re-sent document replaces
        its postings; duplicate ids WITHIN a batch reduce to one row
        deterministically — greatest text digest wins)."""
        w = Window.partitionBy(self.id_col).orderBy(
            F.desc(F.md5(F.col(self.text_col))))
        batch = (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(self.id_col), F.col(self.text_col))
        )
        tf_new = (
            batch.select(F.col(self.id_col),
                         F.explode(tokens(F.col(self.text_col)))
                         .alias("__term"))
            .groupBy(self.id_col, "__term")
            .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
        )
        doc_new = batch.select(self.id_col)

        if self._store is not None:
            # Re-sent-id detection probes the DOCS state (8B/doc —
            # ~1000x smaller than postings), NOT the postings state:
            # scanning the postings per epoch is an O(accumulated
            # corpus) cost that the first scale run measured as 4.6s ->
            # 51s over five 100k-doc epochs (SCALING.md round-9
            # streaming BM25). Append-only ingest — the common case —
            # now never touches the postings in add_batch; only an
            # epoch that actually re-sends a known id pays the
            # stale-postings scan.
            resent = (self._docs.join(doc_new, self.id_col)
                      if self._docs is not None else None)
            changed = tf_new.withColumn("__del", F.lit(False))
            if resent is not None and resent.limit(1).count() > 0:
                stale = (
                    self._tf.join(resent, self.id_col)
                    .join(tf_new.select(self.id_col, "__term"),
                          [self.id_col, "__term"], "left_anti")
                    .select(self.id_col, "__term", "__tf")
                    .withColumn("__del", F.lit(True))
                )
                changed = changed.unionByName(stale)
            epoch = self._store.epoch + 1
            meta_tf = self._tx_tf.advance(changed, epoch=epoch,
                                          app_id="bm25_tf")
            meta_docs = self._tx_docs.advance(
                doc_new.withColumn("__del", F.lit(False)),
                epoch=epoch, app_id="bm25_docs")
            self._store.stage_meta("bm25_tf_v", meta_tf)
            self._store.stage_meta("bm25_docs_v", meta_docs)
            self._tf = self._tx_tf.read_live()
            self._docs = self._tx_docs.read_live()
            self._store.commit()
        else:
            if self._tf is None:
                self._tf = tf_new.localCheckpoint(eager=True)
                self._docs = doc_new.localCheckpoint(eager=True)
            else:
                merged_tf = self._tf.join(
                    doc_new, self.id_col, "left_anti").unionByName(tf_new)
                merged_docs = self._docs.join(
                    doc_new, self.id_col, "left_anti").unionByName(doc_new)
                self._tf = merged_tf.localCheckpoint(eager=True)
                self._docs = merged_docs.localCheckpoint(eager=True)

    def topn(self, queries, qtext_col: str, qid_col: str,
             k1: float = 1.2, b: float = 0.75, topn: int = 10):
        """BM25 top-n over everything indexed so far — identical to the
        one-shot batch bm25_topn over the same documents."""
        if self._tf is None:
            raise ValueError("StreamingBm25Index: no batches indexed yet")
        n_docs = self._docs.count()
        return _bm25_from_tf(self._tf, n_docs, self.id_col, queries,
                             qtext_col, qid_col, k1, b, topn)


def rrf_fuse(a: DataFrame, b: DataFrame, query_col: str, item_col: str,
             rank_col: str = "rank", k: int = 60,
             topn: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two ranked
    retrieval lists — the standard hybrid-search combiner (lexical BM25
    + vector ANN): score(item) = sum over lists of 1/(k + rank), k=60
    the canonical constant. Rank-based, so the two lists' raw score
    scales never need calibrating.

    One full-outer join on (query, item) — both inputs are top-n lists,
    so the join is tiny regardless of corpus size — then a per-query
    window cut. Scores round to 6 before the cut, ties break on
    item id: deterministic across engines.

    Output: (query_id, item_id, rrf_score, rank).
    """
    fa = a.select(
        F.col(query_col).alias("query_id"),
        F.col(item_col).alias("item_id"),
        F.col(rank_col).alias("__ra"),
    )
    fb = b.select(
        F.col(query_col).alias("query_id"),
        F.col(item_col).alias("item_id"),
        F.col(rank_col).alias("__rb"),
    )
    j = fa.join(fb, ["query_id", "item_id"], "full_outer")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("__ra")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("__rb")), F.lit(0.0)),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("item_id"))
    return (
        j.withColumn("rrf_score", rrf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
        .select("query_id", "item_id", "rrf_score",
                F.col("rank").cast("long").alias("rank"))
    )
