"""Wave 7: corpus-assembly operators — token-budget shard packing,
Gopher-style quality rules, segment-level (line) dedup, corpus n-gram
census. The "assemble a training corpus" half of the pipeline family
(SURVEY.md §2 extension list), each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat
from dozer_spark.ops.packing import (
    token_shard_assignment,
    token_shard_assignment_oracle,
)


@_q(
    "pack_token_shards",
    token_shard_assignment_oracle(
        "documents", "doc_id", "text", budget=2000, n_buckets=16
    ),
    headline=True,
)
def pack_token_shards(spark, sf):
    """Deterministic global shuffle + token-budget shard assignment (the
    final packing step of a training-data pipeline). The Spark plan is
    the scalable two-level prefix sum (per-bucket windows + a
    constant-sized offset join); the oracle replays the single global
    running sum it is provably equal to — so the parallel decomposition
    itself is what the hash check verifies."""
    d = _cat(spark, sf).df("documents")
    return token_shard_assignment(d, "doc_id", "text", budget=2000, n_buckets=16)


@_q(
    "text_gopher_quality",
    """
    WITH t AS (
      SELECT doc_id, text,
        list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        list_filter(string_split(lower(text), ' '), x -> x <> '') AS ltoks
      FROM documents
    ), m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(greatest(len(toks), 1) AS DOUBLE) AS nw,
        CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) AS sum_len,
        CAST(len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE) AS n_sym,
        CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
          AS n_alpha,
        CAST(len(list_filter(ltoks, x -> x IN
          ('the','a','of','and','to','in','is','it','that','for'))) AS BIGINT)
          AS n_stop
      FROM t
    )
    SELECT doc_id, n_words,
      coalesce(sum_len, 0) / nw AS mean_word_len,
      n_sym / nw AS symbol_ratio,
      n_alpha / nw AS alpha_frac,
      n_stop,
      (n_words >= 50 AND n_words <= 100000
        AND coalesce(sum_len, 0) / nw >= 3.0 AND coalesce(sum_len, 0) / nw <= 10.0
        AND n_sym / nw <= 0.1
        AND n_alpha / nw >= 0.8
        AND n_stop >= 2) AS passes
    FROM m
    """,
)
def text_gopher_quality(spark, sf):
    """Gopher rule-based quality filter (Rae et al. 2021 A1.1): word
    count bounds, mean word length, symbol-to-word ratio, alphabetic
    fraction, stopword floor — pure Column ops, one scan, no shuffle.
    Every ratio is an int/int IEEE division, so the DuckDB oracle
    matches bit-for-bit."""
    from dozer_spark.ops.text import gopher_quality

    d = _cat(spark, sf).df("documents")
    g = gopher_quality(F.col("text"))
    return d.select(
        "doc_id",
        g["n_words"].alias("n_words"),
        g["mean_word_len"].alias("mean_word_len"),
        g["symbol_ratio"].alias("symbol_ratio"),
        g["alpha_frac"].alias("alpha_frac"),
        g["n_stop"].alias("n_stop"),
        g["passes"].alias("passes"),
    )


@_q(
    "dedup_common_segments",
    """
    WITH s AS (
      SELECT doc_id, string_split_regex(text, '\\. ') AS segs FROM documents
    ), e AS (
      SELECT doc_id, i - 1 AS pos, segs[i] AS seg, md5(segs[i]) AS h
      FROM (SELECT doc_id, segs,
              unnest(generate_series(1, len(segs))) AS i FROM s)
    ), c AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM e)
      GROUP BY h HAVING COUNT(*) >= 2
    ), j AS (
      SELECT e.doc_id, e.pos, e.seg,
             (c.h IS NOT NULL) AS dup
      FROM e LEFT JOIN c ON e.h = c.h
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_segments,
      CAST(COUNT(*) FILTER (WHERE dup) AS BIGINT) AS n_removed,
      md5(coalesce(
        string_agg(seg, '. ' ORDER BY pos) FILTER (WHERE NOT dup), ''))
        AS clean_digest
    FROM j GROUP BY doc_id
    """,
    headline=True,
)
def dedup_common_segments(spark, sf):
    """Segment-level dedup (MassiveText/RefinedWeb boilerplate-line
    filter): segments appearing in >= 2 distinct documents are removed
    from every document; the md5 of each rebuilt document proves the
    surviving segments and their order match the oracle exactly."""
    from dozer_spark.ops.dedup import drop_duplicated_segments

    d = _cat(spark, sf).df("documents")
    return drop_duplicated_segments(d, "text", "doc_id", min_docs=2)


@_q(
    "corpus_top_ngrams",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
          generate_series(1, greatest(len(toks) - 2, 0)),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS gram
      FROM t
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM g GROUP BY gram
    ORDER BY n_docs DESC, gram LIMIT 100
    """,
)
def corpus_top_ngrams(spark, sf):
    """Corpus 3-gram document-frequency census, top 100 (boilerplate /
    contamination audit). Grams are per-doc distinct-reduced before the
    explode; the count shuffle has map-side combine; only 100 rows
    survive the ordered take."""
    from dozer_spark.ops.text import top_ngrams

    d = _cat(spark, sf).df("documents")
    return top_ngrams(d, "text", n=3, k=100)


@_q(
    "temperature_mixture_sample",
    """
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ), q AS (
      SELECT lang,
        CAST(round(200.0 * pow(n, 0.3) / SUM(pow(n, 0.3)) OVER ()) AS BIGINT)
          AS quota
      FROM c
    ), r AS (
      SELECT doc_id, lang,
        row_number() OVER (
          PARTITION BY lang
          ORDER BY md5('temp:' || CAST(doc_id AS VARCHAR)), doc_id
        ) AS rn
      FROM documents
    )
    SELECT r.lang, r.doc_id FROM r JOIN q USING (lang) WHERE rn <= quota
    """,
)
def temperature_mixture_sample(spark, sf):
    """Temperature-based domain rebalancing (alpha=0.3, the standard
    multilingual-LM mixing exponent): per-language keep counts
    proportional to count^alpha toward a 200-doc budget, rows chosen by
    the deterministic (md5, key) rank. The oracle replays the identical
    quota arithmetic and rank cut."""
    from dozer_spark.ops.sampling import temperature_sample

    d = _cat(spark, sf).df("documents")
    return temperature_sample(d, "doc_id", "lang", alpha=0.3, total=200).select(
        "lang", "doc_id"
    )


@_q(
    "asof_join_purchase_last_click",
    """
    WITH r AS (
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), l AS (
      SELECT event_id, user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id,
      strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      l.purchase_value,
      strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      r.click_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    headline=True,
    window=True,
)
def asof_join_purchase_last_click(spark, sf):
    """AS-OF join (nearest prior match): every purchase event joined to
    the user's latest click at-or-before it. The reference rejects
    non-equi joins outright (dozer-sql/src/product/join/factory.rs:
    231-234) — beyond-parity surface. Spark plan: union-window (ONE
    key shuffle, no inequality join); oracle: DuckDB's native ASOF
    LEFT JOIN. The right side is pre-aggregated per (user, ts) so "the
    latest prior row" is unambiguous in both engines."""
    from dozer_spark.operators.temporal import asof_join

    ev = _cat(spark, sf).df("events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(
        left, right, ["user_id"], "ts", "ts", ["click_value"],
        how="left", right_ts_as="__click_ts",
    )
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "purchase_value",
        F.date_format("__click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        "click_value",
    )


@_q(
    "range_join_error_click_followup",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), r AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT l.event_id, CAST(COUNT(*) AS BIGINT) AS n_clicks_12h,
           MIN(r.event_id) AS min_click_id
    FROM l JOIN r ON l.user_id = r.user_id
      AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 12 HOUR
    GROUP BY l.event_id
    """,
)
def range_join_error_click_followup(spark, sf):
    """Range join (interval containment): clicks within 12 hours
    AFTER each error event of the same user, aggregated per error.
    Beyond-parity (factory.rs:231-234 rejects range joins). Spark
    plan: bucketized equi-join on (user, time bucket) — each left row
    duplicates into at most 2 buckets, each true pair produced once,
    no cross join at any scale; oracle: DuckDB's native inequality
    (IE) join."""
    from dozer_spark.operators.temporal import range_join

    ev = _cat(spark, sf).df("events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # right_ts is the PRE-rename name; the collision with left's ts is
    # what renames it to r_ts in the output
    pairs = range_join(left, right, ["user_id"], "ts", "ts", 0, 43200)
    return pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks_12h"),
        F.min("r_event_id").alias("min_click_id"),
    )


@_q(
    "join_full_outer_customer_supplier_nations",
    """
    WITH c AS (
      SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
    )
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer_customer_supplier_nations(spark, sf):
    """FULL OUTER equi-join — rejected outright by the reference
    (dozer-sql/src/product/join/factory.rs:120 allows only INNER/LEFT/
    RIGHT); native in Spark, so beyond-parity for free. Both sides are
    pre-aggregated per nation; the filter on supplier balance makes
    each side's key set a strict subset so both NULL-padded directions
    actually occur in the output."""
    cat = _cat(spark, sf)
    c = (
        cat.df("customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    )
    s = (
        cat.df("supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_supp"))
    )
    return c.join(s, "nationkey", "full_outer").select(
        "nationkey", "n_cust", "n_supp"
    )


@_q(
    "cross_join_region_pairs",
    """
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def cross_join_region_pairs(spark, sf):
    """CROSS join — also rejected by the reference (factory.rs:120).
    Spark-native, but only sane when at least one side is tiny:
    region x region here (the triangular filter halves the output).
    Corpus-sized all-pairs problems use the bucketed joins in
    ops/dedup.py instead — this entry exists to claim the negative-
    space join form, not to encourage cartesian plans at scale."""
    r = _cat(spark, sf).df("region").select("r_regionkey", "r_name")
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(
            F.col("a.r_name").alias("region_a"),
            F.col("b.r_name").alias("region_b"),
        )
    )


@_q(
    "multimodal_audio_rms",
    """
    WITH params AS (
      SELECT doc_id,
             8000 + (doc_id % 5) * 4000 AS rate,
             CAST(1 + doc_id % 2 AS BIGINT) AS channels,
             ((8000 + (doc_id % 5) * 4000) // 10) * (1 + doc_id % 3) AS n
      FROM documents
    ), sq AS (
      SELECT doc_id,
             SUM(CAST((i % 256) * 256 - 32768 AS BIGINT)
                 * CAST((i % 256) * 256 - 32768 AS BIGINT)) AS sum_sq
      FROM (SELECT doc_id, unnest(generate_series(0, n - 1)) AS i FROM params)
      GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n * p.channels AS BIGINT) AS n_values,
           round(sqrt(CAST(sq.sum_sq AS DOUBLE) / p.n), 6) AS rms,
           CAST(32768 AS BIGINT) AS peak
    FROM params p JOIN sq USING (doc_id)
    """,
)
def multimodal_audio_rms(spark, sf):
    """REAL audio decode under the oracle gate: every doc gets a
    deterministic 16-bit PCM sawtooth WAV (rate/channels/length derive
    from doc_id), the pipeline decodes the PCM data chunk (numpy
    frombuffer in Arrow-batched mapInPandas) and reduces to RMS/peak/
    value-count — and the oracle recomputes the identical features in
    closed form from the waveform formula. This is decoded-signal
    parity, not just header metadata: a single wrong sample flips the
    sum of squares. (Compressed codecs remain behind the documented
    stub; uncompressed PCM needs no media library.)"""
    import pandas as pd
    from pyspark.sql import types as T

    from dozer_spark.ops.media_codecs import make_wav
    from dozer_spark.ops.multimodal import extract_audio_features

    def build(ids):
        out = []
        for doc_id in ids:
            rate = 8000 + (doc_id % 5) * 4000
            n = (rate // 10) * (1 + doc_id % 3)
            out.append(
                make_wav(rate, n, channels=1 + doc_id % 2,
                         waveform="sawtooth")
            )
        return pd.Series(out)

    build_udf = F.pandas_udf(build, T.BinaryType())
    d = _cat(spark, sf).df("documents").select("doc_id")
    media = d.withColumn("payload", build_udf(F.col("doc_id")))
    feats = extract_audio_features(media, id_col="doc_id",
                                   payload_col="payload")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_values",
        F.round("rms", 6).alias("rms"),
        "peak",
    )
