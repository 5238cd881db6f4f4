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
    qt = _query_terms(queries, qtext_col, qid_col)
    posts = (
        tf.join(maybe_broadcast(cache_materialized(qt)), "__term")
        .join(maybe_broadcast(cache_materialized(idf)), "__term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    return _bm25_rank(posts, id_col, k1, b, topn)


def _query_terms(queries: DataFrame, qtext_col: str, qid_col: str) -> DataFrame:
    return queries.select(
        F.col(qid_col).alias("__qid"),
        F.explode(F.array_distinct(tokens(F.col(qtext_col)))).alias("__term"),
    )


def _bm25_rank(posts: DataFrame, id_col: str, k1: float, b: float,
               topn: int) -> DataFrame:
    """The one scoring/ranking tail both BM25 paths share — posts
    carries (__qid, id_col, __tf, __dl double, __idf, __avgdl double).
    Keeping the arithmetic in a single expression tree is what makes
    the index's pruned serving path BIT-IDENTICAL to the one-shot
    batch operator (and therefore to its exact replay oracle)."""
    contrib = (
        F.col("__idf")
        * (F.col("__tf") * F.lit(k1 + 1.0))
        / (F.col("__tf") + F.lit(k1)
           * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")))
    )
    scored = (
        posts.groupBy("__qid", id_col)
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

    State = TWO tables plus three meta scalars. "tf" holds
    (id, __term, __tf, __dl) keyed by (id, term) — the postings, each
    carrying its document's length (the classic search-index layout: a
    posting is self-sufficient for scoring). "docs" holds the seen doc
    ids — kept separately because N (the idf denominator) counts ALL
    indexed documents, including token-less ones that own no postings.
    The scalars (n_docs, sum_dl, n_nonempty) live in StateStore meta,
    advanced per epoch with exact integer arithmetic, so
    avgdl = sum_dl/n_nonempty is bit-identical to the batch operator's
    F.avg over integer-valued doubles regardless of how the corpus was
    split. Both tables are delta-logs (DiffStateTable) when durable:
    O(batch) epoch IO, shared crash/replay contract. A re-sent doc id
    REPLACES its old image — its changed postings overwrite by key,
    its stale terms are tombstoned, and the scalars subtract its old
    length.

    Serving path (durable): the tf state is hash-bucketed BY TERM
    (bucket_cols=["__term"], state_buckets dirs), so `topn` reads ONLY
    the buckets the query's terms hash to — O(query terms), not
    O(postings). Per-term document frequency is exact from the pruned
    read (every posting of a term lives in that term's bucket), and
    N / avgdl come from the scalars — no corpus-sized scan anywhere in
    a probe. Because the posting rows are exactly what the batch
    operator derives and scoring funnels through the shared _bm25_rank
    tail, an index built across ANY batch split serves IDENTICAL
    results to the one-shot batch bm25_topn — the exact oracle
    cdc_streaming_bm25 replays.
    """

    # probes with more distinct terms than this fall back to the full
    # postings path (the pruned read's isin + driver-side bucket hash
    # stop being "tiny" at some point; interactive queries are a
    # handful of terms)
    MAX_PROBE_TERMS = 1024

    def __init__(self, spark, text_col: str, id_col: str,
                 state_dir: str | None = None, state_buckets: int = 256):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self._tf = None      # ephemeral only: (id, __term, __tf)
        self._docs = None
        self._scalars = None  # durable: {n_docs, sum_dl, n_nonempty}
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
                bucket_cols=["__term"], n_buckets=state_buckets,
            )
            self._tx_docs = DiffStateTable(
                spark, diff_state_path(state_dir, "bm25_docs"),
                key_cols=[id_col],
            )
            if self._store.epoch > 0:
                self._scalars = self._store.load_meta("bm25_scalars")
                if self._scalars is None:
                    raise ValueError(
                        "StreamingBm25Index: durable state at "
                        f"{state_dir!r} predates the term-bucketed "
                        "serving layout (no bm25_scalars meta); delete "
                        "the state dir to rebuild"
                    )
                # restore the postings log position for pruned serving
                # reads; the frame itself is never held
                self._tx_tf.read_committed(
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
            # persist the deduped batch, the raw postings, and the slim
            # per-doc lengths for the epoch: the stats jobs, the resent
            # probe, and the delta write would otherwise each recompute
            # the batch's dedup window + token explode + groupBy chain.
            # The token aggregation runs ONCE per epoch (r10 parity);
            # the ONLY intrinsic cost the dl-carrying layout adds is the
            # postings<->lengths join, and the stats read the 1-row-per-
            # doc dl_new cache, never the postings
            batch = batch.persist()
            tf_new = tf_new.persist()
            dl_new = tf_new.groupBy(self.id_col).agg(
                F.sum("__tf").cast("long").alias("__dl")).persist()
            tf_dl = tf_new.join(dl_new, self.id_col)
            # batch-sized stats jobs (exact longs — see class doc)
            batch_n = batch.count()
            st = dl_new.agg(
                F.count(F.lit(1)).alias("ne"),
                F.coalesce(F.sum("__dl"), F.lit(0)).alias("sd"),
            ).first()
            ne_batch, sd_batch = int(st["ne"]), int(st["sd"])
            # Re-sent-id detection probes the DOCS state (8B/doc —
            # ~1000x smaller than postings), NOT the postings state:
            # scanning the postings per epoch is an O(accumulated
            # corpus) cost the first scale run measured as 4.6s -> 51s
            # over five epochs (SCALING.md round-9 streaming BM25).
            # Append-only ingest — the common case — never touches the
            # postings in add_batch; only an epoch that actually
            # re-sends a known id pays the stale-postings scan.
            resent = (self._docs.join(doc_new, self.id_col)
                      if self._docs is not None else None)
            # limit(1) short-circuit: append-only ingest (the common
            # case) pays an early-exit scan, not a full count
            resent_n = (resent.count()
                        if resent is not None
                        and resent.limit(1).count() > 0 else 0)
            changed = tf_dl.withColumn("__del", F.lit(False))
            ne_old = sd_old = 0
            if resent_n > 0:
                old_tf = self._tx_tf.read_live().join(resent, self.id_col)
                old_dl = old_tf.groupBy(self.id_col).agg(
                    F.sum("__tf").cast("long").alias("__odl"))
                ost = old_dl.agg(
                    F.count(F.lit(1)).alias("ne"),
                    F.coalesce(F.sum("__odl"), F.lit(0)).alias("sd"),
                ).first()
                ne_old, sd_old = int(ost["ne"]), int(ost["sd"])
                stale = (
                    old_tf
                    .join(tf_new.select(self.id_col, "__term"),
                          [self.id_col, "__term"], "left_anti")
                    .select(self.id_col, "__term", "__tf", "__dl")
                    .withColumn("__del", F.lit(True))
                )
                changed = changed.unionByName(stale)
            prev = self._scalars or {"n_docs": 0, "sum_dl": 0,
                                     "n_nonempty": 0}
            scalars = {
                "n_docs": prev["n_docs"] + batch_n - resent_n,
                "sum_dl": prev["sum_dl"] + sd_batch - sd_old,
                "n_nonempty": prev["n_nonempty"] + ne_batch - ne_old,
            }
            epoch = self._store.epoch + 1
            meta_tf = self._tx_tf.advance(changed, epoch=epoch,
                                          app_id="bm25_tf",
                                          fresh_keys=resent_n == 0)
            meta_docs = self._tx_docs.advance(
                doc_new.withColumn("__del", F.lit(False)),
                epoch=epoch, app_id="bm25_docs",
                fresh_keys=resent_n == 0)
            self._store.stage_meta("bm25_tf_v", meta_tf)
            self._store.stage_meta("bm25_docs_v", meta_docs)
            self._store.stage_meta("bm25_scalars", scalars)
            self._docs = self._tx_docs.read_live()
            self._store.commit()
            self._scalars = scalars
            batch.unpersist()
            tf_new.unpersist()
            dl_new.unpersist()
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
        one-shot batch bm25_topn over the same documents. Durable
        indexes serve through the term-bucket-pruned postings read
        (O(query terms), not O(postings)); the ephemeral index and
        over-wide probes fall back to the full postings path."""
        if self._store is not None:
            if self._scalars is None:
                raise ValueError(
                    "StreamingBm25Index: no batches indexed yet")
            return self._topn_pruned(queries, qtext_col, qid_col,
                                     k1, b, topn)
        if self._tf is None:
            raise ValueError("StreamingBm25Index: no batches indexed yet")
        n_docs = self._docs.count()
        return _bm25_from_tf(self._tf, n_docs, self.id_col, queries,
                             qtext_col, qid_col, k1, b, topn)

    def _topn_pruned(self, queries, qtext_col: str, qid_col: str,
                     k1: float, b: float, topn: int):
        from dozer_spark.operators.hints import (
            cache_materialized,
            maybe_broadcast,
        )

        sc = self._scalars
        n_docs = int(sc["n_docs"])
        # exact-integer avgdl: identical to the batch F.avg over
        # integer-valued doubles (see class doc); 0-guard matches the
        # batch path's NULL avgdl (no nonempty docs -> no postings ->
        # empty result either way)
        avgdl = (float(sc["sum_dl"]) / float(sc["n_nonempty"])
                 if sc["n_nonempty"] else 0.0)
        qt = cache_materialized(_query_terms(queries, qtext_col, qid_col))
        terms = [r[0] for r in qt.select("__term").distinct().collect()]
        if len(terms) > self.MAX_PROBE_TERMS:
            tf_full = self._tx_tf.read_live().drop("__dl")
            return _bm25_from_tf(tf_full, n_docs, self.id_col, queries,
                                 qtext_col, qid_col, k1, b, topn)
        if not terms:
            id_type = self._tx_tf.tx._schema()[self.id_col].dataType
            from pyspark.sql import types as T

            return self.spark.createDataFrame([], T.StructType([
                T.StructField("query_id",
                              queries.schema[qid_col].dataType),
                T.StructField(self.id_col, id_type),
                T.StructField("score", T.DoubleType()),
                T.StructField("rank", T.LongType()),
            ]))
        bids = self._tx_tf.bucket_ids_for_values([[t] for t in terms])
        post = (
            self._tx_tf.read_live_pruned(bids)
            .filter(F.col("__term").isin(terms))
        )
        # per-term df is EXACT from the pruned read: every posting of a
        # term lives in the term's own hash bucket
        df_t = post.groupBy("__term").agg(
            F.count(F.lit(1)).cast("double").alias("__df"))
        idf = df_t.select(
            "__term",
            F.log(F.lit(1.0)
                  + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
                  / (F.col("__df") + F.lit(0.5))).alias("__idf"),
        )
        posts = (
            post.join(maybe_broadcast(qt), "__term")
            .join(maybe_broadcast(cache_materialized(idf)), "__term")
            .withColumn("__dl", F.col("__dl").cast("double"))
            .withColumn("__avgdl", F.lit(avgdl))
        )
        return _bm25_rank(posts, self.id_col, k1, b, topn)


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
