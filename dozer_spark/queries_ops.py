"""Training-data pipeline queries (dedup / similarity / text analysis) with
DuckDB oracles.

Hash parity trick: every probabilistic structure here (MinHash, SimHash,
LSH bands) is built from md5 — identical in Spark and DuckDB — so even the
"approximate" algorithms are EXACTLY oracle-checkable: the oracle replays
the same bands/signatures in SQL, not just the end condition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat
from dozer_spark.ops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
)
from dozer_spark.ops.similarity import brute_force_topk, lsh_ann_topk
from dozer_spark.ops.text import (
    token_count,
    bpe_ish_token_count,
    fingerprint,
    quality_score,
    lang_id,
    STOPWORDS,
)

# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@_q(
    "dedup_exact",
    """
    SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf):
    d = _cat(spark, sf).df("documents")
    return exact_dedup(d, "text", "doc_id")


def _minhash_oracle(threshold: float, h: int | None = None,
                    bands: int | None = None,
                    prefilter: bool = False) -> str:
    """Must mirror minhash_lsh_pairs exactly, including the prefilter flag
    (both default off) and the threshold-derived banding geometry."""
    from dozer_spark.ops.dedup import prefilter_min_matches

    from dozer_spark.ops.dedup import MINHASH_PRIME, minhash_geometry

    h, bands = minhash_geometry(threshold, h, bands)
    r = h // bands
    # Carter-Wegman family, digit-for-digit the Spark computation:
    # (h1 + i*h2) mod P over per-token md5 halves (minhash_signatures)
    sig_cols = ",\n      ".join(
        "list_aggregate(list_transform(toks_h, d -> "
        f"(CAST('0x' || substr(d, 1, 8) AS BIGINT) + {i} * "
        f"CAST('0x' || substr(d, 9, 8) AS BIGINT)) % {MINHASH_PRIME}), 'min') AS mh{i}"
        for i in range(h)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sigs".format(
            b=b,
            key=" || ':' || ".join(
                f"CAST(mh{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    min_matches = prefilter_min_matches(threshold, h) if prefilter else 0
    match_sum = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(h)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      FROM documents
    ), hashed_toks AS (
      SELECT doc_id, toks, list_transform(toks, t -> md5(t)) AS toks_h FROM toks
    ), htoks AS (
      -- 60-bit md5-prefix token hashes: verification intersects these
      -- (mirrors minhash_signatures.toksh — long arrays, not strings)
      SELECT doc_id,
             list_distinct(list_transform(toks_h,
               d -> CAST('0x' || substr(d, 1, 15) AS BIGINT))) AS toks_h60
      FROM hashed_toks
    ), sigs AS (
      SELECT doc_id, toks,
      {sig_cols}
      FROM hashed_toks
    ), bands AS (
      {band_selects}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), prefiltered AS (
      {"SELECT id_a, id_b FROM cand JOIN sigs sa ON sa.doc_id = cand.id_a "
       "JOIN sigs sb ON sb.doc_id = cand.id_b "
       f"WHERE ({match_sum}) >= {min_matches}"
       if min_matches > 0 else "SELECT id_a, id_b FROM cand"}
    ), verified AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(ta.toks_h60, tb.toks_h60)) AS DOUBLE)
               / len(list_distinct(ta.toks_h60 || tb.toks_h60)) AS j
      FROM prefiltered p
      JOIN htoks ta ON ta.doc_id = p.id_a
      JOIN htoks tb ON tb.doc_id = p.id_b
    )
    SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM verified WHERE j >= {threshold}
    """


@_q("dedup_minhash_lsh", _minhash_oracle(0.9), headline=True)
def dedup_minhash_lsh(spark, sf):
    """shingle -> minhash -> band -> bucket-join -> verify; the oracle
    replays the identical md5-keyed bands in SQL. Threshold 0.9 because
    the synthetic corpus has very high baseline similarity."""
    d = _cat(spark, sf).df("documents")
    return minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9)


def _simhash_oracle(n_bits: int = 60, max_hamming: int = 3) -> str:
    votes = ",\n        ".join(
        f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    sig = " + ".join(f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(n_bits))
    n_chunks = max_hamming + 1
    chunk_bits = n_bits // n_chunks
    mask = (1 << chunk_bits) - 1
    chunk_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, simhash, {ci} AS chunk, (simhash >> {ci * chunk_bits}) & {mask} AS chunk_val FROM sigs"
        for ci in range(n_chunks)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, {(n_bits + 3) // 4})) AS BIGINT) AS h FROM tok
    ), votes AS (
      SELECT doc_id,
        {votes}
      FROM hashed GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, {sig} AS simhash FROM votes
    ), chunks AS (
      {chunk_selects}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sig_a, b.simhash AS sig_b
      FROM chunks a JOIN chunks b
        ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@_q("dedup_simhash", _simhash_oracle(), headline=True)
def dedup_simhash(spark, sf):
    """SimHash near-dup with pigeonhole chunk blocking at the default
    Manku-standard geometry (60-bit signature, hamming<=3, 15-bit
    chunks -> 32k blocking buckets); oracle replays the same md5 vote
    signature in SQL."""
    d = _cat(spark, sf).df("documents")
    return simhash_pairs(d, "text", "doc_id")


@_q(
    "dedup_ngram_jaccard",
    """
    WITH grams AS (
      SELECT doc_id, lang AS blk,
             list_distinct(list_transform(
               generate_series(1, greatest(len(substr(text, 1, 200)) - 3, 0)),
               i -> substr(substr(text, 1, 200), i, 4))) AS grams
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(a.grams || b.grams)), 4) AS jaccard
    FROM grams a JOIN grams b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(a.grams || b.grams)) >= 0.35
    """,
)
def dedup_ngram_jaccard(spark, sf):
    """Char-4-gram Jaccard within a language block (blocking bounds the
    O(n^2) to same-block pairs)."""
    d = _cat(spark, sf).df("documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", "lang", threshold=0.35, n=4, prefix_chars=200)


def _embedding_lsh_oracle(threshold: float = 0.45, n_bands: int = 8,
                          band_bits: int = 8, dim: int = 64) -> str:
    """EXACT oracle for the LSH-bucketed embedding near-dup: the
    hyperplanes are deterministic md5 constants, inlined as one VALUES
    table; bucket assignment + candidate join + exact cosine verify are
    replayed in SQL (same pattern as _lsh_ann_oracle)."""
    from dozer_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(n_bands * band_bits, dim)
    vals = ",\n      ".join(
        f"({p}, [{', '.join(repr(x) for x in row)}])"
        for p, row in enumerate(planes)
    )
    cos = """
        list_sum(list_transform(generate_series(1, 64),
          i -> CAST(va.embedding[i] AS DOUBLE) * CAST(vb.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(va.embedding[i] AS DOUBLE) * CAST(va.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(vb.embedding[i] AS DOUBLE) * CAST(vb.embedding[i] AS DOUBLE)))))"""
    return f"""
    WITH planes(pid, w) AS (VALUES
      {vals}
    ), bits AS (
      SELECT vec_id, pid,
        CASE WHEN list_sum(list_transform(generate_series(1, {dim}),
          i -> CAST(embedding[i] AS DOUBLE) * w[i])) >= 0 THEN 1 ELSE 0 END AS bit
      FROM embeddings CROSS JOIN planes
    ), buckets AS (
      SELECT vec_id, pid // {band_bits} AS band,
             CAST(SUM(bit * (1 << (pid % {band_bits}))) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id, pid // {band_bits}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), verified AS (
      SELECT id_a, id_b, {cos} AS cos_raw
      FROM cand
      JOIN embeddings va ON va.vec_id = cand.id_a
      JOIN embeddings vb ON vb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, ROUND(cos_raw, 6) AS cosine
    FROM verified WHERE cos_raw >= {threshold}
    """


@_q("dedup_embedding_cosine", _embedding_lsh_oracle(band_bits=5))
def dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup via banded hyperplane-LSH candidates +
    exact cosine verify — no cartesian at any scale (the all-pairs
    baseline embedding_neardup_pairs remains the recall-1.0 reference,
    gated behind a fail-fast row bound). band_bits pinned to 5 — the
    auto-derive target (bucket size ~16) for this 500-vector corpus,
    recall 12/14 vs the baseline at the 0.45 borderline — so the
    md5-deterministic buckets replay exactly in the oracle."""
    from dozer_spark.ops.dedup import embedding_neardup_pairs_lsh

    e = _cat(spark, sf).df("embeddings")
    return embedding_neardup_pairs_lsh(
        e, "embedding", "vec_id", threshold=0.45, n_bands=8, band_bits=5
    )


@_q("sample_cluster_balanced", None)  # k-means quantizer -> no SQL oracle
def sample_cluster_balanced(spark, sf):
    """Cluster-balanced diversity sampling (the D4 diversification
    half, Tirumala et al. 2023): k-means cells over the embedding
    space, per-cell quota total * c^alpha / sum(c^alpha) (alpha=0.5
    downweights dominant semantic clusters), rows chosen by the
    deterministic (md5, id) rank. Rows-only gate (k-means); quota
    arithmetic, determinism, and skew-rebalancing pytest-pinned
    (tests/test_semdedup.py)."""
    from dozer_spark.ops.semdedup import cluster_balanced_sample

    e = _cat(spark, sf).df("embeddings")
    return cluster_balanced_sample(e, "embedding", "vec_id", total=100,
                                   n_centroids=8, alpha=0.5)


@_q("dedup_semantic", None)  # k-means quantizer -> no SQL oracle
def dedup_semantic(spark, sf):
    """SemDeDup (Abbas et al. 2023): sample-fit k-means over the
    embedding space, then within each cluster greedily keep items
    farthest from the centroid, dropping any item with a kept duplicate
    at cosine >= 1-eps. Returns the full decision table (one row per
    vector -> rows-only driver gate); policy exactness vs a pure-numpy
    reference and the hot-cell bound are pytest-pinned
    (tests/test_semdedup.py)."""
    from dozer_spark.ops.semdedup import semantic_dedup

    e = _cat(spark, sf).df("embeddings")
    # eps=0.55 -> cosine threshold 0.45, the corpus's planted near-dup
    # level (same threshold dedup_embedding_cosine verifies at), so the
    # driver run exercises real drops, not a kept-everything no-op
    return semantic_dedup(e, "embedding", "vec_id", eps=0.55)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


_BRUTE_FORCE_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
        list_sum(list_transform(generate_series(1, 64),
          i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos_raw
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) <= 5
    """


@_q("ann_brute_force_topk", _BRUTE_FORCE_ORACLE, headline=True)
def ann_brute_force_topk(spark, sf):
    """Exact cosine top-k (k=5) for the vec_id%100==0 query set."""
    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(e, q, "embedding", "vec_id", k=5)


def _lsh_ann_oracle(n_planes: int = 8, dim: int = 64, k: int = 5) -> str:
    """EXACT oracle for hyperplane-LSH ANN: the planes are deterministic
    md5 constants (similarity._hyperplanes), so the oracle embeds them as
    literals and replays bucket assignment + in-bucket cosine top-k in
    SQL. The sign threshold is ulp-sensitive in principle; the plane
    values are exact dyadic rationals and both engines evaluate the same
    sequential sum, so buckets agree in practice (parity-gated)."""
    from dozer_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(n_planes, dim)

    def dot(vcol: str, plane: list[float]) -> str:
        vals = ", ".join(repr(x) for x in plane)
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vcol}[i] AS DOUBLE) * ([{vals}])[i]))"
        )

    def bucket(vcol: str) -> str:
        return " + ".join(
            f"(CASE WHEN {dot(vcol, p)} >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    cos = """
        list_sum(list_transform(generate_series(1, 64),
          i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))"""
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, {bucket("embedding")} AS bucket
      FROM embeddings WHERE vec_id % 100 = 0
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, {bucket("embedding")} AS bucket
      FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id, {cos} AS cos_raw
      FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) <= {k}
    """


@_q("ann_lsh_topk", _lsh_ann_oracle())  # deterministic md5 planes -> exact oracle
def ann_lsh_topk(spark, sf):
    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return lsh_ann_topk(e, q, "embedding", "vec_id", k=5, n_planes=8, dim=64)


def _lsh_multiprobe_oracle(n_planes: int = 8, dim: int = 64, k: int = 5,
                           n_probes: int = 3) -> str:
    """EXACT oracle for multi-probe LSH: replays the per-plane dots, the
    base bucket, the (n_probes-1) smallest-|margin| single-bit flips
    (margin ties break on plane index — both engines sort the same
    (m, i) structs), the probe-bucket fan-out, and the in-bucket cosine
    top-k. Margins are the SAME dyadic sums as the sign bits, so the
    probe set agrees wherever the buckets do."""
    from dozer_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(n_planes, dim)

    def dot(vcol: str, plane: list[float]) -> str:
        vals = ", ".join(repr(x) for x in plane)
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vcol}[i] AS DOUBLE) * ([{vals}])[i]))"
        )

    def bucket(vcol: str) -> str:
        return " + ".join(
            f"(CASE WHEN {dot(vcol, p)} >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    ds = ", ".join(dot("embedding", p) for p in planes)
    base = " + ".join(
        f"(CASE WHEN ds[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    margin_structs = ", ".join(
        f"{{'m': abs(ds[{i + 1}]), 'i': {i}}}" for i in range(n_planes)
    )
    cos = """
        list_sum(list_transform(generate_series(1, 64),
          i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))"""
    return f"""
    WITH qd AS (
      SELECT vec_id AS query_id, embedding AS qv, [{ds}] AS ds
      FROM embeddings WHERE vec_id % 100 = 0
    ), qb AS (
      SELECT query_id, qv,
             CAST({base} AS BIGINT) AS base,
             list_transform(list_slice(list_sort([{margin_structs}]),
               1, {n_probes - 1}), s -> s.i) AS flips
      FROM qd
    ), probes AS (
      SELECT query_id, qv, base AS bucket FROM qb
      UNION ALL
      SELECT query_id, qv,
             xor(base, CAST(1 AS BIGINT) << f) AS bucket
      FROM (SELECT query_id, qv, base, unnest(flips) AS f FROM qb)
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv,
             CAST({bucket("embedding")} AS BIGINT) AS bucket
      FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id, {cos} AS cos_raw
      FROM c JOIN probes USING (bucket) WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id) <= {k}
    """


@_q("ann_lsh_multiprobe_topk", _lsh_multiprobe_oracle(),
    defer=True)  # ANN-LSH family anchored by ann_lsh_topk in-window
def ann_lsh_multiprobe_topk(spark, sf):
    """Multi-probe LSH ANN (Lv et al. 2007): each query probes its own
    bucket plus the buckets across its two thinnest hyperplane margins
    — recall recovers toward brute force at linear extra candidate
    cost with NO corpus-side change (the corpus bucketing is shared
    with ann_lsh_topk). Exact oracle: margins are the same
    dyadic-rational dot products as the sign bits, so the probe set —
    and therefore the result — replays exactly in SQL."""
    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return lsh_ann_topk(e, q, "embedding", "vec_id", k=5, n_planes=8,
                        dim=64, n_probes=3)


@_q("ann_ivf_topk", None)  # approximate (k-means cells) — recall tested in pytest
def ann_ivf_topk(spark, sf):
    from dozer_spark.ops.similarity import ivf_ann_topk

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_ann_topk(e, q, "embedding", "vec_id", k=5, n_centroids=16, n_probe=4)


def _ivf_frozen_oracle(k: int = 5, n_probe: int = 4, dim: int = 64) -> str:
    """EXACT oracle for frozen-quantizer IVF: the centroids are float64
    literals (ops/ivf_frozen.py), so the oracle replays the per-centroid
    squared-euclidean fold, the argmin cell (ties on centroid index —
    both engines sort the same (d, i) structs), the n_probe probe set,
    the probe-cell join, and the in-cell cosine top-k. Distances are the
    same left-fold sums on both sides, so cells — and therefore results
    — agree bit-for-bit."""
    from dozer_spark.ops.ivf_frozen import FROZEN_CENTROIDS_16x64

    cm = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]"
        for row in FROZEN_CENTROIDS_16x64
    ) + "]"
    ncent = len(FROZEN_CENTROIDS_16x64)
    pairs = f"""
        list_transform(generate_series(1, {ncent}), j ->
          {{'d': list_sum(list_transform(generate_series(1, {dim}),
                   i -> (CAST(embedding[i] AS DOUBLE) - c[j][i])
                      * (CAST(embedding[i] AS DOUBLE) - c[j][i]))),
           'i': j - 1}})"""
    cos = f"""
        list_sum(list_transform(generate_series(1, {dim}),
          i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, {dim}),
             i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, {dim}),
             i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))"""
    return f"""
    WITH cm AS (SELECT {cm} AS c),
    probes AS (
      SELECT query_id, qv, unnest(cells) AS cell
      FROM (
        SELECT vec_id AS query_id, embedding AS qv,
               list_transform(list_slice(list_sort({pairs}), 1, {n_probe}),
                              s -> s.i) AS cells
        FROM embeddings, cm WHERE vec_id % 100 = 0
      )
    ), cc AS (
      SELECT vec_id AS neighbor_id, embedding AS cv,
             list_sort({pairs})[1].i AS cell
      FROM embeddings, cm
    ), scored AS (
      SELECT query_id, neighbor_id, {cos} AS cos_raw
      FROM cc JOIN probes USING (cell) WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id) <= {k}
    """


@_q("ann_ivf_topk_frozen", _ivf_frozen_oracle(), window=True)
def ann_ivf_topk_frozen(spark, sf):
    """IVF ANN with a frozen pre-trained quantizer — the serving-index
    shape (train offline, pin the centroids, serve deterministically).
    Because the centroids are literals, this is the one IVF variant
    whose full path (assignment + probing + re-rank) replays EXACTLY in
    SQL; it shares cells with ivf_ann_topk whenever the live fit
    converges to the same centroids (same seed + sample)."""
    from dozer_spark.ops.ivf_frozen import FROZEN_CENTROIDS_16x64
    from dozer_spark.ops.similarity import ivf_ann_topk_frozen

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_ann_topk_frozen(e, q, "embedding", "vec_id",
                               FROZEN_CENTROIDS_16x64, k=5, n_probe=4)


@_q("ann_ivf_topk_fast", _ivf_frozen_oracle(),
    defer=True)  # IVF family anchored by ann_ivf_topk_frozen in-window
def ann_ivf_topk_fast(spark, sf):
    """IVF ANN with per-cell BLAS scoring — the scale path for CLUSTERED
    embedding spaces (centroids adapt to cluster structure; hyperplane
    LSH buckets track cluster mass instead). Runs against the FROZEN
    quantizer (the serving shape): cells and probe sets come from the
    same sequential-fold Column math as ann_ivf_topk_frozen, so the
    entry carries that exact oracle — only the in-cell scoring is BLAS,
    which matches the fold cosine after the shared 6-decimal rounding
    (bit-identical at sf0.001/sf0.01). The live-k-means fast path is
    pinned by cell-agreement tests in tests/test_ann_clusters.py and
    served by ann_ivf_topk's recall gate."""
    from dozer_spark.ops.ivf_frozen import FROZEN_CENTROIDS_16x64
    from dozer_spark.ops.similarity import ivf_ann_topk_fast

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_ann_topk_fast(e, q, "embedding", "vec_id", k=5,
                             n_probe=4, centroids=FROZEN_CENTROIDS_16x64)


@_q("ann_ivf_pq_topk", None)  # k-means cells + PQ candidates -> rows-only
def ann_ivf_pq_topk(spark, sf):
    """IVF-PQ with exact re-rank (Jegou et al. 2011): the compressed-
    index ANN path — the serving index is m_sub bytes of PQ codes per
    vector (32x under raw floats at dim 64), candidates come from
    table-lookup ADC inside the probed cells, and the final top-k is
    exact cosine over the refine*k survivors fetched from the raw
    vectors. Approximate candidate set -> rows-only gate; recall vs
    brute force + split==unsplit equivalence in
    tests/test_ann_clusters.py."""
    from dozer_spark.ops.similarity import ivf_pq_ann_topk

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_pq_ann_topk(e, q, "embedding", "vec_id", k=5,
                           n_centroids=16, n_probe=4, m_sub=8, refine=4)


def _clusters_oracle() -> str:
    pairs = _minhash_oracle(0.9).strip().rstrip()
    return f"""
    WITH RECURSIVE pairs AS (
      {pairs}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
    """


@_q("dedup_minhash_clusters", _clusters_oracle())
def dedup_minhash_clusters(spark, sf):
    """Connected components over the MinHash near-dup pairs: the
    keep-one-per-cluster step. Oracle computes the same components with a
    recursive transitive-closure CTE."""
    from dozer_spark.ops.dedup import dedup_clusters

    d = _cat(spark, sf).df("documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9)
    return dedup_clusters(pairs)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@_q(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(
             list_filter(string_split(text, ' '), x -> x <> ''),
             w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    headline=True,
)
def text_token_stats(spark, sf):
    d = _cat(spark, sf).df("documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").cast("long").alias("n_bpe"),
        fingerprint("text").alias("fp"),
    )


@_q(
    "text_quality_score",
    """
    SELECT doc_id,
           ROUND(
             0.4 * least(CAST(len(text) AS DOUBLE) / 500.0, 1.0)
             + 0.3 * (1.0 - CAST(len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
                            / CAST(greatest(len(text), 1) AS DOUBLE))
             + 0.3 * least((CAST(len(text) AS DOUBLE)
                            / CAST(greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) AS DOUBLE)) / 8.0, 1.0)
           , 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark, sf):
    d = _cat(spark, sf).df("documents")
    return d.select("doc_id", F.round(quality_score("text"), 6).alias("quality"))


def _langid_oracle() -> str:
    hit_cols = []
    for code in STOPWORDS:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[code])
        hit_cols.append(
            f"CAST(len(list_filter(list_filter(string_split(lower(text), ' '), x -> x <> ''), "
            f"x -> x IN ({lst}))) AS BIGINT) AS h_{code}"
        )
    return f"""
    WITH hits AS (
      SELECT doc_id, {', '.join(hit_cols)} FROM documents
    ), pred AS (
      SELECT doc_id,
        CASE WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en > 0 THEN 'en'
             WHEN h_es >= h_fr AND h_es >= h_de AND h_es > 0 THEN 'es'
             WHEN h_fr >= h_de AND h_fr > 0 THEN 'fr'
             WHEN h_de > 0 THEN 'de'
             ELSE 'und' END AS pred_lang
      FROM hits
    )
    SELECT pred_lang, COUNT(*) AS n FROM pred GROUP BY pred_lang
    """


@_q("text_lang_id", _langid_oracle())
def text_lang_id(spark, sf):
    """Stopword-voting language ID; first-max-wins fold is replayed in the
    oracle as an ordered CASE chain."""
    d = _cat(spark, sf).df("documents")
    return d.groupBy(lang_id("text").alias("pred_lang")).agg(F.count(F.lit(1)).alias("n"))


@_q("ann_brute_force_topk_fast", _BRUTE_FORCE_ORACLE, headline=True,
    defer=True)  # brute-force family anchored by ann_brute_force_topk
def ann_brute_force_topk_fast(spark, sf):
    """Vectorized (numpy matmul via mapInPandas) exact top-k. Carries
    the SAME exact oracle as the fold-based sibling: the BLAS cosine
    matches the fold after the shared 6-decimal rounding (bit-identical
    at sf0.001/sf0.01; also pinned by tests/test_ann_clusters.py)."""
    from dozer_spark.ops.similarity import brute_force_topk_fast

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk_fast(e, q, "embedding", "vec_id", k=5)


@_q("ann_lsh_topk_fast", _lsh_ann_oracle(),
    defer=True)  # LSH family anchored by ann_lsh_topk in-window
def ann_lsh_topk_fast(spark, sf):
    """lsh_ann_topk with in-bucket BLAS scoring (one matmul per bucket
    cogroup) — the 100x path: the fold-based cosine is interpreted
    per array element and dominates at corpus scale. Buckets are the
    same deterministic md5-plane Column math as the sibling, so it
    carries the sibling's exact oracle: the BLAS cosine matches the
    fold after the shared 6-decimal rounding (bit-identical at
    sf0.001/sf0.01; also pinned by tests/test_ann_clusters.py)."""
    from dozer_spark.ops.similarity import lsh_ann_topk_fast

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return lsh_ann_topk_fast(e, q, "embedding", "vec_id", k=5, n_planes=8)


@_q(
    "hash_sample_deterministic",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(concat('0x', substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < CAST(0.3 * 4294967296 AS BIGINT)
    """,
)
def hash_sample_deterministic(spark, sf):
    """Deterministic md5-bucket sampling (ops/sampling.py): the oracle
    reproduces the exact member set — impossible with RNG sampling."""
    from dozer_spark.ops.sampling import hash_sample

    d = _cat(spark, sf).df("documents")
    return hash_sample(d, "doc_id", 0.3, salt="s1").select("doc_id", "lang")


@_q(
    "stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(concat('0x', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < CASE WHEN lang = 'en' THEN CAST(0.1 * 4294967296 AS BIGINT)
                 WHEN lang = 'es' THEN CAST(0.5 * 4294967296 AS BIGINT)
                 ELSE CAST(1.0 * 4294967296 AS BIGINT) END
    """,
)
def stratified_sample(spark, sf):
    """Per-language downsampling (dominant 'en' to 10%, 'es' to 50%,
    everything else kept) — reproducible stratified sampling."""
    from dozer_spark.ops.sampling import stratified_hash_sample

    d = _cat(spark, sf).df("documents")
    return stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.1, "es": 0.5}, default_fraction=1.0, salt="strat"
    ).select("doc_id", "lang")


@_q(
    "text_repetition_ratio",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g
      FROM toks
    )
    SELECT doc_id,
           ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                       / greatest(len(g), 1), 6) AS rep_ratio
    FROM grams
    """,
)
def text_repetition_ratio(spark, sf):
    """Repeated-trigram ratio — boilerplate/spam quality signal."""
    from dozer_spark.ops.text import repetition_ratio

    d = _cat(spark, sf).df("documents")
    return d.select("doc_id", F.round(repetition_ratio("text", 3), 6).alias("rep_ratio"))


def _final_corpus_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle(0.9).strip()}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), clusters AS (
      SELECT a AS id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
    )
    SELECT d.doc_id, d.lang
    FROM documents d
    LEFT JOIN clusters c ON d.doc_id = c.id
    WHERE c.id IS NULL OR c.id = c.cluster_id
    """


@_q("dedup_final_corpus", _final_corpus_oracle())
def dedup_final_corpus(spark, sf):
    """The full dedup pipeline end to end: MinHash-LSH pairs -> connected
    components -> keep one canonical doc (min id) per cluster -> surviving
    corpus. Oracle replays every stage in SQL (bands, transitive closure,
    anti-join)."""
    from dozer_spark.ops.dedup import dedup_clusters

    d = _cat(spark, sf).df("documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return d.join(losers, "doc_id", "anti").select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Multimodal metadata (real pure-stdlib codecs, ops/media_codecs.py)
# ---------------------------------------------------------------------------


@_q(
    "multimodal_metadata_probe",
    headline=True,
    oracle="""
    SELECT doc_id,
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
           WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS mime,
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN CAST(16 + doc_id % 97 AS INT)
           WHEN 1 THEN CAST(32 + doc_id % 211 AS INT) END AS width,
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN CAST(8 + doc_id % 53 AS INT)
           WHEN 1 THEN CAST(16 + doc_id % 101 AS INT) END AS height,
      CASE CAST(doc_id % 3 AS INT) WHEN 2
           THEN CAST(100 * (1 + doc_id % 3) AS BIGINT) END AS duration_ms,
      CASE CAST(doc_id % 3 AS INT) WHEN 2
           THEN CAST(8000 + (doc_id % 5) * 4000 AS INT) END AS sample_rate,
      CASE CAST(doc_id % 3 AS INT) WHEN 2
           THEN CAST(1 + doc_id % 2 AS INT) END AS channels
    FROM documents
    """,
)
def multimodal_metadata_probe(spark, sf):
    """End-to-end media metadata roundtrip: payload BYTES are built
    per-doc from deterministic formulas (real PNG with CRCs + zlib IDAT,
    JPEG SOF0 header stream, PCM WAV), then probe_metadata PARSES the
    bytes back with the stdlib codecs (ops/media_codecs.py). The oracle
    recomputes the expected metadata from the same formulas in SQL — any
    builder or parser bug breaks the hash."""
    import pandas as pd

    from dozer_spark.ops.media_codecs import make_jpeg, make_png, make_wav
    from dozer_spark.ops.multimodal import probe_metadata

    def build(col):
        out = []
        for doc_id in col:
            k = doc_id % 3
            if k == 0:
                out.append(make_png(16 + doc_id % 97, 8 + doc_id % 53))
            elif k == 1:
                out.append(make_jpeg(32 + doc_id % 211, 16 + doc_id % 101))
            else:
                rate = 8000 + (doc_id % 5) * 4000
                n = (rate // 10) * (1 + doc_id % 3)
                out.append(make_wav(rate, n, channels=1 + doc_id % 2))
        return pd.Series(out)

    # payload_builder runs INSIDE the probe's batch loop: one Python
    # stage, and the synthesized bytes never ride an Arrow transfer
    # (the old builder-UDF -> probe-UDF chain shipped every payload
    # Python -> JVM -> Python; guide §4.1)
    d = _cat(spark, sf).df("documents").select("doc_id")
    return probe_metadata(d, id_col="doc_id", payload_builder=build).select(
        F.col("media_id").alias("doc_id"), "mime", "width", "height",
        "duration_ms", "sample_rate", "channels",
    )


@_q(
    "text_pii_scan_redact",
    """
    WITH seeded AS (
      SELECT doc_id,
        text || CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
          WHEN 1 THEN ' call 555-867-5309 today'
          WHEN 2 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_email,
      CAST(len(regexp_extract_all(t, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS INT) AS n_phone,
      CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INT) AS n_ssn,
      length(regexp_replace(regexp_replace(regexp_replace(t,
        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[PII]', 'g'),
        '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[PII]', 'g'),
        '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '[PII]', 'g')) AS redacted_len
    FROM seeded
    """,
)
def text_pii_scan_redact(spark, sf):
    """PII detection + redaction (training-data hygiene): emails, phones,
    SSNs seeded deterministically per doc_id, counted with regexp_count
    and redacted with regexp_replace — all JVM-side. Patterns restricted
    to the Java-regex/RE2 common subset so the DuckDB oracle evaluates
    the IDENTICAL semantics; the redacted length proves the replacement
    spans match exactly."""
    from dozer_spark.ops.text import PII_PATTERNS, pii_counts, redact_pii

    d = _cat(spark, sf).df("documents")
    seed = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now")))
        .when(F.col("doc_id") % 4 == 1, F.lit(" call 555-867-5309 today"))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit(" ssn 123-45-"),
                       F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(F.lit(""))
    )
    s = d.select("doc_id", F.concat(F.col("text"), seed).alias("t"))
    counts = pii_counts(F.col("t"))
    return s.select(
        "doc_id",
        counts["email"].cast("int").alias("n_email"),
        counts["phone"].cast("int").alias("n_phone"),
        counts["ssn"].cast("int").alias("n_ssn"),
        F.length(redact_pii(F.col("t"))).alias("redacted_len"),
    )


@_q(
    "decontaminate_eval_ngrams",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(t) - 2, 0)),
          i -> md5(array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), eval_grams AS (
      SELECT DISTINCT unnest(g) AS h FROM grams WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id, unnest(g) AS h FROM grams WHERE doc_id % 97 <> 0
    )
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM corpus c JOIN eval_grams e USING (h)
    GROUP BY c.doc_id
    """,
)
def decontaminate_eval_ngrams(spark, sf):
    """Decontamination (benchmark-leakage scan): count the distinct word
    3-grams each corpus document shares with the eval split (doc_id %
    97 = 0 stands in for a held-out benchmark). The eval gram set is
    distinct-reduced and size-gate BROADCAST — the corpus side is one
    scan + explode with no corpus-sized shuffle. Exact DuckDB oracle:
    identical tokenization, md5-hashed grams, identical join+count."""
    from dozer_spark.ops.text import eval_ngram_overlap

    d = _cat(spark, sf).df("documents")
    return eval_ngram_overlap(d, "text", "doc_id",
                              F.col("doc_id") % 97 == 0, n=3)


@_q(
    "decontaminate_bloom",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(t) - 2, 0)),
          i -> md5(array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), eval_grams AS (
      SELECT DISTINCT unnest(g) AS h FROM grams WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id, unnest(g) AS h FROM grams WHERE doc_id % 97 <> 0
    )
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM corpus c JOIN eval_grams e USING (h)
    GROUP BY c.doc_id
    """,
)
def decontaminate_bloom(spark, sf):
    """Decontamination through the broadcast Bloom PREFILTER
    (ops/bloom.py): corpus grams are screened against a ~1.2-byte-per-
    gram bitmap (1% fpp) before the exact confirm join, which then only
    sees the bloom-surviving superset — the scale path once the eval
    gram TABLE outgrows the broadcast gate (~30x more items fit as a
    bitmap). No false negatives by Bloom construction and false
    positives die in the confirm join, so the oracle is the SAME exact
    SQL as decontaminate_eval_ngrams — the prefilter is provably
    invisible in the output, which is precisely the claim this entry
    gates."""
    from dozer_spark.ops.text import eval_ngram_overlap

    d = _cat(spark, sf).df("documents")
    return eval_ngram_overlap(d, "text", "doc_id",
                              F.col("doc_id") % 97 == 0, n=3,
                              bloom_fpp=0.01)


@_q(
    "quota_mixture_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang, doc_id FROM ranked
    WHERE rn <= CASE lang WHEN 'en' THEN 120 WHEN 'es' THEN 40 ELSE 15 END
    """,
)
def quota_mixture_sample(spark, sf):
    """Domain-mixing quota sampler: exact target COUNT per language
    (120 en / 40 es / 15 everything else), deterministically chosen by
    (md5 hash, key) order — absolute per-domain budgets for corpus
    assembly, reproducible across engines and runs. Exact DuckDB
    oracle runs the same ranked selection."""
    from dozer_spark.ops.sampling import quota_sample

    d = _cat(spark, sf).df("documents")
    return quota_sample(
        d, "doc_id", "lang", {"en": 120, "es": 40}, default_quota=15
    ).select("lang", "doc_id")


def _dsir_weights_sql() -> str:
    """The shared census/log-ratio body of the two DSIR oracles."""
    return """
    WITH toks AS (
      SELECT doc_id, doc_id % 97 = 0 AS is_t,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id, is_t,
             CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 10000 AS b
      FROM (
        SELECT doc_id, is_t,
               unnest(t || list_transform(
                 generate_series(1, greatest(len(t) - 1, 0)),
                 i -> t[i] || ' ' || t[i + 1])) AS g
        FROM toks
      )
    ), tc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM feats WHERE is_t GROUP BY b
    ), rc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM feats WHERE NOT is_t GROUP BY b
    ), nt AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feats WHERE is_t
    ), nr AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feats WHERE NOT is_t
    ), ratio AS (
      SELECT rc.b,
             ln((COALESCE(tc.ct, 0) + 1) / (nt.n + 10000.0))
             - ln((rc.cr + 1) / (nr.n + 10000.0)) AS lw
      FROM rc LEFT JOIN tc ON tc.b = rc.b, nt, nr
    ), weights AS (
      SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             ROUND(SUM(r.lw), 6) AS log_weight
      FROM feats f JOIN ratio r ON r.b = f.b
      WHERE NOT f.is_t
      GROUP BY f.doc_id
    )
    """


@_q(
    "dsir_gumbel_topk_sample",
    _dsir_weights_sql() + """
    , noisy AS (
      SELECT doc_id, n_feats, log_weight,
             ROUND(log_weight - ln(-ln(
               (CAST('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) + 0.5) / 4294967296.0)), 6) AS gumbel_score
      FROM weights
    )
    SELECT doc_id, n_feats, log_weight, gumbel_score
    FROM (SELECT *, row_number() OVER (
            ORDER BY gumbel_score DESC, doc_id) AS rn FROM noisy)
    WHERE rn <= 100
    """,
)
def dsir_gumbel_topk_sample(spark, sf):
    """DSIR resampling via deterministic Gumbel top-k: 100 raw docs
    drawn with probability proportional to their importance weight —
    the noise is inverse-CDF over the doc id's md5 bucket, so this
    *random* sample replays exactly in SQL (scores rounded to 6 places
    before the cut so last-ulp ln() differences cannot flip the
    ordering; ties break on doc_id). The Spark cut is
    orderBy().limit() — a distributed take-ordered, not a global
    sort."""
    from dozer_spark.ops.sampling import dsir_gumbel_topk

    d = _cat(spark, sf).df("documents")
    return dsir_gumbel_topk(d, "text", "doc_id",
                            F.col("doc_id") % 97 == 0, n_select=100,
                            n_buckets=10_000)


@_q(
    "dsir_importance_weights",
    _dsir_weights_sql() + """
    SELECT doc_id, n_feats, log_weight FROM weights
    """,
)
def dsir_importance_weights(spark, sf):
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bucket counts, add-1-smoothed target (doc_id % 97 = 0 split) vs raw
    bucket distributions, per-raw-doc log importance weight
    sum ln(p_target/p_raw) — the data-selection signal for sampling a
    raw corpus toward a target domain. Exact DuckDB oracle replays the
    md5-prefix feature hash, both censuses, and the identically-ordered
    smoothed log-ratio."""
    from dozer_spark.ops.sampling import dsir_log_weights

    d = _cat(spark, sf).df("documents")
    return dsir_log_weights(d, "text", "doc_id",
                            F.col("doc_id") % 97 == 0, n_buckets=10_000)


_BM25_QUERIES = [("q1", "fast join query"), ("q2", "table scan filter"),
                 ("q3", "window agg group")]


@_q(
    "bm25_search_topn",
    """
    WITH q(query_id, qtext) AS (VALUES {values}),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents
      ) GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, CAST(SUM(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT AVG(dl) AS avgdl FROM dl
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
    ), dfr AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term, ln(1.0 + (n.n - dfr.df + 0.5) / (dfr.df + 0.5)) AS idf
      FROM dfr, n
    ), qt AS (
      SELECT query_id,
             unnest(list_distinct(
               list_filter(string_split(qtext, ' '), x -> x <> ''))) AS term
      FROM q
    ), scored AS (
      SELECT qt.query_id, tf.doc_id,
             ROUND(SUM(idf.idf * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6)
               AS score
      FROM qt
      JOIN tf ON tf.term = qt.term
      JOIN idf ON idf.term = qt.term
      JOIN dl ON dl.doc_id = tf.doc_id, stats
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """.format(values=", ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERIES)),
    window=True,
)
def bm25_search_topn(spark, sf):
    """Okapi BM25 top-10 per query (Robertson idf, k1=1.2, b=0.75) —
    the lexical-search face of the engine, complementing the ANN
    family. Scores round to 6 places BEFORE the rank cut (ties break
    on doc_id) so the per-query top-10 is deterministic across engines
    and summation orders; the oracle replays tf/dl/idf and the
    identically-ordered scoring expression in SQL."""
    from dozer_spark.ops.search import bm25_topn

    d = _cat(spark, sf).df("documents")
    q = spark.createDataFrame(_BM25_QUERIES, ["query_id", "qtext"])
    return bm25_topn(d, "text", "doc_id", q, "qtext", "query_id",
                     k1=1.2, b=0.75, topn=10)


def _cross_corpus_oracle() -> str:
    pairs = _minhash_oracle(0.9).strip()
    return f"""
    WITH allpairs AS (
      {pairs}
    )
    SELECT id_a, id_b, jaccard FROM allpairs
    WHERE NOT (id_a % 2 = 0 AND id_b % 2 = 0)
    """


@_q("dedup_cross_corpus", _cross_corpus_oracle())
def dedup_cross_corpus(spark, sf):
    """Cross-corpus dedup: check a NEW corpus (odd doc_ids — "this
    week's crawl") against an EXISTING one (even doc_ids) plus itself,
    WITHOUT re-pairing the existing corpus against itself — the
    incremental-crawl shape of production dedup. Implemented by
    seeding the streaming dedup state with the existing corpus
    (discarding its internal pairs) and processing the new corpus as
    one batch; the oracle is the full batch pair set minus
    existing-internal pairs. Existing-side signatures are computed
    once and never re-verified against each other."""
    from dozer_spark.streaming.dedup import StreamingMinHashDedup

    d = _cat(spark, sf).df("documents")
    smh = StreamingMinHashDedup(spark, "text", "doc_id", threshold=0.9)
    smh.process_batch(d.filter(F.col("doc_id") % 2 == 0))  # seed: existing
    return smh.process_batch(d.filter(F.col("doc_id") % 2 == 1))
