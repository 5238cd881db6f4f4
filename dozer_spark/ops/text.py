"""Text analysis operators: tokenization, language ID, quality scoring,
token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python in the hot
path) — at 100 TB these run as a single scan with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Deliberately tiny: language ID here is a cheap scan-time
# signal, not a model.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf"],
}


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def tokens(c) -> Column:
    """Whitespace tokenization with empty-string removal (deterministic
    across engines, unlike regex-split edge semantics)."""
    return F.filter(F.split(_col(c), " "), lambda x: x != "")


def token_count(c) -> Column:
    """Token count — whitespace tokens."""
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(c) -> Column:
    """BPE-ish upper-bound token estimate: words + punctuation runs split
    off, long words count ceil(len/4) subwords (a common ~4-chars/token
    heuristic for byte-pair encodings)."""
    t = tokens(_col(c))
    per_word = F.transform(t, lambda w: F.ceil(F.length(w) / 4.0))
    return F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x)


def stopword_hits(c, lang: str) -> Column:
    """# tokens that are stopwords of `lang` (lowercased exact match)."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens(F.lower(_col(c))), lambda x: x.isin(sw))).cast("long")


def lang_id(c, langs: list[str] | None = None, min_hits: int = 1) -> Column:
    """Stopword-voting language ID; 'und' when no language reaches
    min_hits. Returns the lang with the most stopword hits (ties broken
    by list order via strictly-greater comparison)."""
    col = _col(c)
    langs = langs or list(STOPWORDS)
    best_lang = F.lit("und")
    best_hits = F.lit(min_hits - 1).cast("long")
    # fold left: strictly-greater keeps the earliest max (deterministic)
    for lang in langs:
        h = stopword_hits(col, lang)
        take = h > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, h).otherwise(best_hits)
    return best_lang


def punct_ratio(c) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    col = _col(c)
    stripped = F.regexp_replace(col, r"[!-/:-@\[-`{-~]", "")
    return (
        (F.length(col) - F.length(stripped)).cast("double")
        / F.greatest(F.length(col), F.lit(1)).cast("double")
    )


def quality_score(c) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs,
    penalizes punctuation soup and single-char tokens.

    score = 0.4*len_score + 0.3*(1 - punct_ratio) + 0.3*word_len_score
    All int/int divisions and IEEE ops — bit-deterministic across engines.
    """
    col = _col(c)
    n_chars = F.length(col).cast("double")
    len_score = F.least(n_chars / 500.0, F.lit(1.0))
    t = tokens(col)
    n_tok = F.greatest(F.size(t), F.lit(1)).cast("double")
    avg_word = n_chars / n_tok
    word_len_score = F.least(avg_word / 8.0, F.lit(1.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
        + F.lit(0.3) * word_len_score
    )


def repetition_ratio(c, n: int = 3) -> Column:
    """Fraction of repeated word n-grams: 1 - distinct/total. High values
    flag boilerplate/spam — a standard training-data quality signal.
    int/int division: bit-deterministic across engines."""
    col = _col(c)
    t = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.get(t, i + j - 1) for j in range(n)])
    )
    total = F.greatest(F.size(grams), F.lit(1)).cast("double")
    return F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total


def fingerprint(c) -> Column:
    """Content fingerprint: md5 of case-folded, whitespace-collapsed text.

    (The reference has no document ops at all; this fills the rolling-hash
    fingerprint role for dedup pipelines — md5 is identical across
    engines, making results oracle-checkable.)
    """
    norm = F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))
    return F.md5(norm)


# PII patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# interpret IDENTICALLY: character classes, +, {n,m}, literals. No \b
# (word-boundary semantics differ), no lookaround (RE2 lacks it).
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_counts(c) -> dict[str, Column]:
    """Match counts per PII class (native regexp_count — JVM-side)."""
    col = _col(c)
    return {k: F.regexp_count(col, F.lit(p)) for k, p in PII_PATTERNS.items()}


def redact_pii(c, token: str = "[PII]") -> Column:
    """Replace every PII match with a fixed token. Order matters: SSN
    before phone (an SSN also matches no phone pattern here, but a
    stable order keeps the output deterministic if patterns evolve)."""
    col = _col(c)
    for k in ("email", "ssn", "phone"):
        col = F.regexp_replace(col, PII_PATTERNS[k], token)
    return col


def raw_word_ngrams(c, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined token windows) of a text
    column. Documents shorter than n tokens yield an empty array
    (Spark's sequence(1, 0) counts DOWN, so the short case must be
    guarded explicitly to match SQL generate_series). Single source of
    truth for that guard — word_ngrams/top_ngrams both build on it."""
    t = tokens(c)
    idx = F.sequence(F.lit(1), F.size(t) - F.lit(n - 1))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(c, n: int = 3) -> Column:
    """Distinct md5-hashed word n-grams — the matching unit for
    decontamination. The md5 keeps the shuffle slim (32B per gram
    regardless of text length) and is replayable in the DuckDB
    oracle."""
    return F.transform(raw_word_ngrams(c, n), lambda g: F.md5(g))


def gopher_quality(c) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, public
    paper — "Scaling Language Models: ... Gopher", Appendix A1.1): the
    standard rule-based filter of large-corpus pipelines. All pure
    Column ops (codegen, no shuffle); every ratio is int/int or
    int-sum/int division — bit-deterministic across engines, so the
    whole rule set is exactly oracle-checkable.

    Returns named metric columns plus a `passes` flag:
    - 50 <= n_words <= 100000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio ('#' or '...') <= 0.1
    - >= 80% of words contain an alphabetic character
    - >= 2 stopword hits (en list)
    """
    col = _col(c)
    t = tokens(col)
    n_words = F.size(t).cast("long")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = (
        F.aggregate(
            F.transform(t, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / nw
    )
    symbol_ratio = (
        (F.regexp_count(col, F.lit("#")) + F.regexp_count(col, F.lit(r"\.\.\.")))
        .cast("double")
        / nw
    )
    alpha_frac = (
        F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]"))).cast("double") / nw
    )
    n_stop = stopword_hits(col, "en")
    passes = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_frac": alpha_frac,
        "n_stop": n_stop,
        "passes": passes,
    }


def top_ngrams(docs, text_col: str, n: int = 3, k: int = 100):
    """Corpus-level n-gram document frequency, top k — the contamination
    / boilerplate census of a corpus (which exact phrases dominate).

    100 TB design: grams are distinct-reduced PER DOCUMENT before the
    shuffle (document frequency, not term frequency — and the explode
    never amplifies repeated boilerplate within a doc), the groupBy
    count has map-side partial aggregation, and only k rows survive the
    final (tiny) ordered take. One corpus-sized shuffle whose payload is
    the distinct gram strings. Ties broken by gram text for determinism.
    """
    from dozer_spark.operators.hints import ensure_min_partitions

    return (
        ensure_min_partitions(docs)
        .select(F.explode(raw_word_ngrams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "gram")
        .limit(k)
    )


def unigram_logprob(docs, text_col: str, id_col: str):
    """In-corpus unigram language-model score per document: the average
    natural-log probability of the document's tokens under the corpus's
    own (MLE, unsmoothed) unigram distribution, plus the perplexity
    `exp(-avg_logprob)`. This is the self-contained analog of CCNet's
    LM-perplexity quality filter — documents made of corpus-typical
    words score high (low perplexity), rare-token noise scores low —
    usable as a filter/stratification signal without an external model.
    Unsmoothed is exact here: every scored token is in the census by
    construction.

    Returns (id_col, n_tokens, avg_logprob, perplexity), one row per
    document with at least one token; floats rounded (6/3 places) so
    the score is stable across engines and partitionings.

    100 TB design: one corpus-sized shuffle (the token census, map-side
    combined); the census joins back under the broadcast size gate
    (vocabulary, not corpus, sized); corpus totals arrive via a
    broadcast single-row cross join, never a driver collect; the
    per-doc average uses the identity avg(ln c_t) - ln N so the join
    carries one long per token and no second corpus pass.
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    toks = cache_materialized(
        ensure_min_partitions(docs).select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
        )
    )
    census = toks.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    totals = census.agg(F.sum("__c").cast("double").alias("__n"))
    per_doc = (
        toks.join(maybe_broadcast(census), "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(F.log("__c")).alias("__avg_ln_c"),
        )
    )
    avg_lp = F.col("__avg_ln_c") - F.log(F.col("__n"))
    return (
        per_doc.crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(avg_lp, 6).alias("avg_logprob"),
            # exp over the ROUNDED logprob: both engines exponentiate
            # the identical 6-decimal value, so the 3-decimal
            # perplexity can never straddle a rounding boundary
            F.round(F.exp(-F.round(avg_lp, 6)), 3).alias("perplexity"),
        )
    )


def bigram_logprob(docs, text_col: str, id_col: str, lam: float = 0.75):
    """In-corpus INTERPOLATED bigram LM score per document: the average
    natural-log probability of each token given its predecessor under
    Jelinek-Mercer interpolation of the corpus's own bigram and unigram
    MLEs — `p = lam * c(prev,cur)/c_left(prev) + (1-lam) * c(cur)/N`.
    The bigram term captures local fluency (word-order-scrambled or
    template-stitched text scores low even when its unigrams are
    corpus-typical — exactly what the unigram filter cannot see); the
    unigram backoff keeps every in-corpus pair finite. This is the
    self-contained analog of a KenLM-style perplexity filter, one order
    up from unigram_logprob.

    Returns (id_col, n_bigrams, avg_logprob, perplexity), one row per
    document with >= 2 tokens; rounding contract as unigram_logprob.

    100 TB design: bigram pairs are built PER DOC with native array
    ops (transform over sequence — no window/lag shuffle); the slim
    (id, tokens) projection is cached once and feeds both censuses and
    the scoring join; both censuses are map-side combined and join
    back under the broadcast size gate (vocab/bigram-vocab sized, not
    corpus sized — and volume-bound by the corpus token count); corpus
    totals arrive via a broadcast single-row cross join.
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    d = cache_materialized(
        ensure_min_partitions(docs).select(
            F.col(id_col), tokens(F.col(text_col)).alias("__t")
        )
    )
    toks = d.select(F.col(id_col), F.explode("__t").alias("__tok"))
    pairs = (
        d.filter(F.size("__t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1),"
                    " i -> struct(__t[i-1] AS prev, __t[i] AS cur))"
                )
            ).alias("__p"),
        )
        .select(F.col(id_col), F.col("__p.prev").alias("__prev"),
                F.col("__p.cur").alias("__cur"))
    )
    pairs = cache_materialized(pairs)

    big = pairs.groupBy("__prev", "__cur").agg(
        F.count(F.lit(1)).cast("long").alias("__cb"))
    # c_left(prev) = tokens of `prev` in non-final position — derived
    # from the bigram census (no third corpus pass)
    leftc = big.groupBy("__prev").agg(F.sum("__cb").alias("__cl"))
    uni = toks.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__cu"))
    totals = uni.agg(F.sum("__cu").cast("double").alias("__n"))

    # operand order matches the oracle SQL exactly: (lam*cb)/cl +
    # ((1-lam)*cu)/n — identical IEEE evaluation per row
    lnp = F.log(
        F.lit(lam) * F.col("__cb") / F.col("__cl")
        + F.lit(1.0 - lam) * F.col("__cu") / F.col("__n")
    )
    scored = (
        pairs.join(maybe_broadcast(big), ["__prev", "__cur"])
        .join(maybe_broadcast(leftc), "__prev")
        .join(maybe_broadcast(uni.withColumnRenamed("__tok", "__cur")),
              "__cur")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), lnp.alias("__lnp"))
    )
    avg_lp = F.avg("__lnp")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(avg_lp, 6).alias("avg_logprob"),
        F.round(F.exp(-F.round(avg_lp, 6)), 3).alias("perplexity"),
    )


def eval_ngram_overlap(docs, text_col: str, id_col: str, eval_pred: Column,
                       n: int = 3, bloom_fpp: float | None = None):
    """Decontamination: per corpus document, the number of distinct word
    n-grams it shares with the EVAL split (docs matching `eval_pred`) —
    the standard benchmark-leakage filter of a training-data pipeline
    (filter or downweight documents with n_hits above a policy
    threshold; the threshold is the caller's, the counting is ours).

    100 TB design: the eval gram set is tiny by construction (an eval
    suite is thousands of documents against a corpus of billions), so
    it is distinct-reduced and size-gate broadcast — the corpus side
    streams through one scan + one explode with NO corpus-sized
    shuffle; the groupBy shuffles only matching (doc, gram-hash) pairs.
    Reference scope: beyond dozer's surface — corpus-pipeline family
    (SURVEY.md §2 extension list).

    bloom_fpp engages a broadcast Bloom PREFILTER (ops/bloom.py) ahead
    of the exact confirm join: the corpus side drops
    definitely-uncontaminated grams against a ~1.2-byte-per-gram
    bitmap before any join, and the confirm join then sees only the
    bloom-surviving superset. Output is IDENTICAL to the exact path
    (no false negatives by Bloom construction; false positives die in
    the confirm join) — the bitmap extends the no-corpus-shuffle
    regime ~30x past where the gram TABLE stops being broadcastable.
    """
    from dozer_spark.operators.hints import (
        ensure_min_partitions,
        maybe_broadcast,
    )

    # per-token hashing is CPU-bound: spread a small (few-split) input
    # across the cluster's slots; a real corpus already has more splits
    # than cores and this is a no-op
    # NULL predicate = corpus row: filter(~NULL) is NULL, so without the
    # coalesce a NULL-split document would silently escape BOTH sides of
    # the scan — a contaminated document the filter never sees
    g = ensure_min_partitions(docs).select(
        F.col(id_col),
        F.coalesce(eval_pred, F.lit(False)).alias("__eval"),
        word_ngrams(F.col(text_col), n).alias("__g"),
    )
    from dozer_spark.operators.hints import cache_materialized

    # materialized cache: the gate must see the eval set's REAL bytes —
    # a lazy distinct reports unknown size, the hint is refused, and the
    # join degrades to a corpus-sized shuffle (measured ~600s at the
    # 100x corpus vs seconds broadcast)
    ev = cache_materialized(
        g.filter(F.col("__eval"))
        .select(F.explode("__g").alias("__h"))
        .distinct()
    )
    corpus = g.filter(~F.col("__eval")).select(
        id_col, F.explode("__g").alias("__h")
    )
    if bloom_fpp is not None:
        from dozer_spark.ops.bloom import BloomFilter

        bf = BloomFilter.build(ev, "__h", fpp=bloom_fpp)
        corpus = corpus.filter(bf.contains(F.col("__h")))
    return (
        corpus.join(maybe_broadcast(ev), "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def window_duplication_score(docs, text_col: str, id_col: str,
                             window: int = 20):
    """Substring-level duplication signal: for each document, the
    fraction of its token WINDOWS (md5 rolling fingerprints of `window`
    consecutive tokens) that also occur in at least one OTHER document
    — the fixed-window approximation of suffix-array substring dedup
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"), and the duplication metric of RefinedWeb-style
    corpus reports. Detection-only by design: removal at window
    granularity needs overlap reconciliation, which segment-level
    dedup (drop_duplicated_segments) handles for line-shaped text.

    100 TB design: same shape as the n-gram census — windows are
    per-doc distinct-reduced before the explode, the cross-doc census
    shuffles 32B digests with map-side combine, and the duplicated-
    window set joins back under a size gate. Documents shorter than
    `window` tokens score 0 over 0 windows (reported as 0.0).
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    t = tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(t) - F.lit(window - 1))
    wins = F.when(
        F.size(t) >= window,
        F.array_distinct(
            F.transform(
                idx, lambda i: F.md5(F.array_join(F.slice(t, i, window), " "))
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

    # base feeds both the census and the marked join — cache the slim
    # (id, 32B digest) projection so the window fingerprinting (the
    # dominant cost: ~size(t) md5s per doc) runs once, not twice
    base = cache_materialized(
        ensure_min_partitions(docs).select(
            F.col(id_col), F.explode_outer(wins).alias("__w")
        )
    )
    dup = (
        base.filter(F.col("__w").isNotNull())
        .groupBy("__w")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__w")
    )
    marked = base.join(
        maybe_broadcast(dup.withColumn("__dup", F.lit(True))), "__w", "left"
    )
    n_wins = F.count(F.col("__w")).cast("long")
    return marked.groupBy(id_col).agg(
        n_wins.alias("n_windows"),
        F.count("__dup").cast("long").alias("n_duplicated"),
        (F.count("__dup").cast("double")
         / F.greatest(n_wins, F.lit(1)).cast("double")).alias("dup_score"),
    )


def remove_duplicated_spans(docs, text_col: str, id_col: str,
                            window: int = 20):
    """Exact duplicated-span REMOVAL — the excision counterpart of
    `window_duplication_score` (which only detects). For every
    `window`-token span whose md5 fingerprint occurs MORE THAN ONCE in
    the corpus (within-document repeats count), keep the globally-first
    occurrence (minimum (doc_id, position)) and excise the tokens of
    every other occurrence; overlapping removed windows merge through
    the covered-position union, so a long duplicated region is cut once
    as a span, not window-by-window (the fixed-window form of
    suffix-array substring dedup, Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"; reference parity:
    dozer has no substring-level op — this is the training-data layer).

    Returns (id_col, n_tokens, n_removed, clean_text), one row per
    input document; documents shorter than `window` tokens pass through
    unchanged (clean_text re-joined with single spaces).

    100 TB design: the only corpus-sized shuffle is the occurrence
    census on 32-byte digests (map-side combined); the cached frame is
    the SLIM (id, pos, digest) projection, never token arrays; the
    duplicated-span set joins back under the broadcast size gate; span
    excision is per-row higher-order functions (no second explode, no
    UDF). Keeper selection is a `min(struct(id, pos))` aggregate — one
    pass, no window function over the full census.
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    w = int(window)
    t = tokens(F.col(text_col))
    base = ensure_min_partitions(docs).select(
        F.col(id_col).alias("__id"), t.alias("__t")
    )
    n = F.size(F.col("__t"))
    idx = F.when(n >= w, F.sequence(F.lit(1), n - F.lit(w - 1))).otherwise(
        F.array().cast("array<int>")
    )
    wins = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice(F.col("__t"), i, w), " ")).alias("h"),
        ),
    )
    # slim (id, pos, 32B digest) — cached because it feeds BOTH the
    # census and the removal join; token arrays stay out of the cache
    occ = cache_materialized(
        base.select("__id", F.explode(wins).alias("o")).select(
            "__id", F.col("o.pos").alias("pos"), F.col("o.h").alias("h")
        )
    )
    dup = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(F.struct(F.col("__id").alias("kid"),
                           F.col("pos").alias("kpos"))).alias("k"),
        )
        .filter(F.col("__c") >= 2)
        .select("h", "k")
    )
    rem = occ.join(maybe_broadcast(dup), "h").filter(
        ~((F.col("__id") == F.col("k.kid")) & (F.col("pos") == F.col("k.kpos")))
    )
    cov = rem.groupBy("__id").agg(F.collect_set("pos").alias("__starts"))
    covered = F.array_distinct(
        F.flatten(
            F.transform(F.col("__starts"),
                        lambda s: F.sequence(s, s + F.lit(w - 1)))
        )
    )
    empty = F.array().cast("array<int>")
    positions = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(empty)
    kept = F.array_except(positions, F.coalesce(covered, empty))
    clean = F.transform(kept, lambda p: F.element_at(F.col("__t"), p))
    return (
        base.join(cov, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            n.cast("long").alias("n_tokens"),
            F.coalesce(F.size(covered), F.lit(0)).cast("long").alias("n_removed"),
            F.array_join(clean, " ").alias("clean_text"),
        )
    )


def winnow_fingerprint_score(docs, text_col: str, id_col: str,
                             k: int = 5, w: int = 4):
    """Winnowing document fingerprinting (Schleimer et al. 2003 — the
    MOSS algorithm, public literature): hash every k-token shingle,
    slide a w-hash window, select each window's MINIMUM hash, and keep
    the distinct selected values as the document's fingerprint set.
    Winnowing's guarantee over fixed-stride sampling: any shared run of
    at least w + k - 1 tokens between two documents is caught by a
    shared fingerprint, at an expected density of only 2/(w+1) of the
    shingles — the same detection floor as exhaustive shingle
    comparison at a fraction of the census volume (this module's
    window_duplication_score censuses EVERY window; winnowing censuses
    ~2/(w+1) of them with a guaranteed-gap bound).

    Per document: the fingerprint count, how many fingerprints also
    occur in at least one OTHER document, and the shared fraction —
    a cheaper drop-in for the duplication-report metric. Documents
    with fewer than w shingles contribute their single minimum hash
    (the standard short-document rule); documents under k tokens have
    no shingles and score 0 over 0.

    100 TB design: identical scale shape to window_duplication_score
    — per-doc distinct fingerprints (already ~2/(w+1) the volume),
    8-byte hashes on the wire, map-side-combined census,
    gated-broadcast shared set.
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    t = tokens(F.col(text_col))
    base0 = ensure_min_partitions(docs).select(
        F.col(id_col), t.alias("__t"))
    hs = F.when(
        F.size("__t") >= k,
        F.expr(
            f"transform(sequence(1, size(__t) - {k} + 1),"
            f" i -> cast(conv(substr(md5(array_join(slice(__t, i, {k}),"
            f" ' ')), 1, 8), 16, 10) as bigint))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base1 = base0.select(F.col(id_col), hs.alias("__h"))
    # Window selection via posexplode + a Tungsten rolling min, NOT a
    # transform(j -> array_min(slice(...))) higher-order expression:
    # HOFs evaluate INTERPRETED per element, and the measured cost at
    # 5M docs was 2.4x the exhaustive-window op (SCALING.md round-9
    # winnowing section). The explode shuffles (id, pos, hash) triples
    # once on the doc id and the per-window minima run inside
    # whole-stage codegen; full windows take min over [pos, pos+w-1],
    # short documents (1 <= m < w) contribute their single global
    # minimum (the standard rule), computed by the same window frame
    # clamped at the partition edge.
    from pyspark.sql import Window as _W

    eh = base1.select(
        F.col(id_col), F.size("__h").alias("__m"),
        F.posexplode_outer("__h").alias("__pos", "__hv"),
    )
    roll = _W.partitionBy(id_col).orderBy("__pos").rowsBetween(0, w - 1)
    sel = (
        eh.withColumn("__wmin", F.min("__hv").over(roll))
        .filter(
            F.col("__hv").isNull()
            | (F.col("__pos") <= F.col("__m") - w)
            | ((F.col("__m") < w) & (F.col("__pos") == 0))
        )
        .select(F.col(id_col), F.col("__wmin").alias("__fp"))
        .distinct()
    )
    base = cache_materialized(sel)
    dup = (
        base.filter(F.col("__fp").isNotNull())
        .groupBy("__fp")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__fp")
    )
    marked = base.join(
        maybe_broadcast(dup.withColumn("__dup", F.lit(True))), "__fp", "left"
    )
    n_fp = F.count(F.col("__fp")).cast("long")
    return marked.groupBy(id_col).agg(
        n_fp.alias("n_fingerprints"),
        F.count("__dup").cast("long").alias("n_shared"),
        (F.count("__dup").cast("double")
         / F.greatest(n_fp, F.lit(1)).cast("double")).alias("share_score"),
    )


def ccnet_perplexity_buckets(docs, text_col: str, id_col: str,
                             lang_col: str, n_buckets: int = 3):
    """CCNet-style quality stratification (Wenzek et al. 2020): rank
    each document by in-corpus unigram perplexity WITHIN its language
    and cut the ranking into equal-count buckets — bucket 1 is CCNet's
    "head" (most fluent), the last is its "tail". Per-language buckets
    matter: absolute perplexity is not comparable across languages, so
    a global cut would put entire low-resource languages in the tail.

    One window sort per language on top of the unigram census;
    deterministic under ties (perplexity is rounded upstream, doc id
    breaks ties identically in SQL's ntile). Output: (id, lang,
    perplexity, bucket [1..n_buckets], tier [head/middle/tail]).
    """
    from pyspark.sql import Window

    scored = unigram_logprob(docs, text_col, id_col).select(
        id_col, "perplexity"
    )
    withlang = scored.join(
        docs.select(id_col, F.col(lang_col).alias("lang")), id_col
    )
    w = Window.partitionBy("lang").orderBy("perplexity", id_col)
    b = withlang.withColumn("bucket", F.ntile(n_buckets).over(w))
    tier = (
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == n_buckets, "tail")
        .otherwise("middle")
    )
    return b.select(
        id_col, "lang", "perplexity",
        F.col("bucket").cast("int").alias("bucket"),
        tier.alias("tier"),
    )


def cross_source_dup_matrix(docs, text_col: str, source_col: str):
    """Cross-source exact-duplicate matrix: for every pair of sources,
    how many distinct normalized texts appear in BOTH — the dataset-
    card fact that tells you whether two crawls/feeds overlap before
    you pay for near-dup across them. One digest projection, one
    distinct, one self-equi-join on the digest (a digest shared by k
    sources contributes C(k,2) pairs — bounded by the source-count
    square, not the corpus).
    Output: (source_a, source_b, n_shared_texts), source_a < source_b.
    """
    srcs = docs.select(
        F.md5(F.col(text_col)).alias("__dg"),
        F.col(source_col).alias("__src"),
    ).distinct()
    a, b = srcs.alias("a"), srcs.alias("b")
    return (
        a.join(b, (F.col("a.__dg") == F.col("b.__dg"))
               & (F.col("a.__src") < F.col("b.__src")))
        .groupBy(
            F.col("a.__src").alias("source_a"),
            F.col("b.__src").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_texts"))
    )


def contamination_share(docs, text_col: str, id_col: str,
                        eval_pred, n: int = 3, round_to: int = 6):
    """Per-document contamination SHARE against the eval split — the
    GPT-3-appendix-style dirtiness metric (Brown et al. 2020 measure
    leakage as n-gram overlap with benchmarks): for every NON-eval
    document, the fraction of its distinct word n-grams that appear
    anywhere in the eval set. eval_ngram_overlap reports absolute hit
    counts for docs with at least one hit; policy thresholds are
    usually RELATIVE ("drop if >X% dirty"), which needs the per-doc
    gram denominator and a row for every document, including clean
    ones.

    Output: (id_col, n_grams, n_hits, share), one row per non-eval doc;
    documents shorter than n tokens report (0, 0, 0.0).

    100 TB design: same no-corpus-shuffle shape as eval_ngram_overlap —
    the eval gram set is distinct-reduced and size-gate broadcast; the
    corpus side is one scan + explode; the only corpus-sized shuffle is
    the final map-side-combinable groupBy on the doc id (explode_outer
    keeps gram-less docs in that same pass instead of a second scan +
    join)."""
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )

    g = ensure_min_partitions(docs).select(
        F.col(id_col),
        F.coalesce(eval_pred, F.lit(False)).alias("__eval"),
        word_ngrams(F.col(text_col), n).alias("__g"),
    )
    ev = cache_materialized(
        g.filter(F.col("__eval"))
        .select(F.explode("__g").alias("__h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = g.filter(~F.col("__eval")).select(
        id_col, F.explode_outer("__g").alias("__h")
    )
    per = (
        corpus.join(maybe_broadcast(ev), "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count("__h").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long").alias("n_hits"),
        )
    )
    share = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("n_hits") / F.col("n_grams"), round_to)
    )
    return per.select(id_col, "n_grams", "n_hits", share.alias("share"))
