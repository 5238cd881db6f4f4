"""Wave 10: corpus-assembly utilities around the split/pack/mix stages
— leakage-safe cluster-granular splits, static domain-mixture
reweighting, and length-bucketed batch manifests. All exact DuckDB
oracles (the leakage-safe split replays the full MinHash transitive
closure inside its oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.queries import _q, _cat
from dozer_spark.queries_ops import _clusters_oracle


def _leakage_split_oracle() -> str:
    clusters = _clusters_oracle().strip()
    # same cutoffs as split_train_valid_test: int(frac * 2^32) exactly
    return f"""
    WITH RECURSIVE labels AS (
      {clusters}
    ), b AS (
      SELECT d.doc_id,
        CAST(concat('0x', substr(md5('split:' ||
          CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))
          AS BIGINT) AS bucket
      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
    )
    SELECT doc_id,
      CASE WHEN bucket < 3435973836 THEN 'train'
           WHEN bucket < 3865470566 THEN 'valid'
           ELSE 'test' END AS split
    FROM b
    """


@_q("split_leakage_safe", window=True, oracle=_leakage_split_oracle())
def split_leakage_safe(spark, sf):
    """80/10/10 split at near-dup-CLUSTER granularity
    (ops/sampling.py leakage_safe_split): MinHash connected components
    give each doc a cluster representative and the md5 split hashes the
    REPRESENTATIVE, so a near-dup pair can never straddle train/test
    (the memorization-leak channel of row-level splits). Oracle replays
    the full pipeline: LSH pairs -> recursive-CTE components -> rep
    coalesce -> identical integer cutoffs."""
    from dozer_spark.ops.dedup import minhash_lsh_pairs
    from dozer_spark.ops.sampling import leakage_safe_split

    d = _cat(spark, sf).df("documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9)
    return leakage_safe_split(
        d, "doc_id", pairs,
        [("train", 0.8), ("valid", 0.1), ("test", 0.1)], salt="split",
    ).select("doc_id", "split")


_MIX_TARGET = {"en": 0.3, "zh": 0.2, "es": 0.2, "fr": 0.15, "de": 0.15}


def _mixture_oracle() -> str:
    case = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {v!r}" for k, v in _MIX_TARGET.items()
    ) + " ELSE 0.0 END"
    toks = ("CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))"
            " AS DOUBLE)")
    return f"""
    WITH per AS (
      SELECT lang AS domain,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM({toks}) AS mass,
             {case} AS t
      FROM documents GROUP BY lang
    ), tot AS (SELECT SUM(mass) AS tm, SUM(t) AS tt FROM per)
    SELECT domain, n_rows,
           ROUND(mass, 6) AS mass,
           ROUND(mass / tm, 6) AS corpus_share,
           ROUND(t / tt, 6) AS target_share,
           ROUND((t / tt) / (mass / tm), 6) AS weight
    FROM per, tot
    """


@_q("domain_mixture_weights", window=True, oracle=_mixture_oracle())
def domain_mixture_weights_by_lang(spark, sf):
    """Static domain-mixture reweighting (ops/sampling.py
    domain_mixture_weights): token-mass shares per language vs an
    explicit target mixture -> per-domain up/down-sampling weights.
    Token masses are integer-valued doubles (exact under any summation
    order), so the shares replay exactly; rounding shields the
    divisions."""
    from dozer_spark.ops.sampling import domain_mixture_weights
    from dozer_spark.ops.text import token_count

    d = _cat(spark, sf).df("documents")
    return domain_mixture_weights(
        d, "lang", size_col=token_count("text"), target=_MIX_TARGET)


def _length_batch_oracle(edges=(32, 64), batch_tokens=2048,
                         n_sub=16) -> str:
    case = "CASE " + " ".join(
        f"WHEN n_tokens < {e} THEN {i}" for i, e in enumerate(edges)
    ) + f" ELSE {len(edges)} END"
    return f"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS BIGINT) AS n_tokens,
        md5('batch:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), b AS (
      SELECT *,
        CAST(CAST('0x' || substr(h, 1, 4) AS BIGINT) % {n_sub} AS INT)
          AS sub,
        CAST({case} AS INT) AS bucket
      FROM t
    )
    SELECT doc_id, n_tokens, bucket,
      CAST(floor(
        (SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY sub, h, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        / {batch_tokens}) AS BIGINT) AS batch_id
    FROM b
    """


@_q("batch_length_bucketed", window=True, oracle=_length_batch_oracle())
def batch_length_bucketed(spark, sf):
    """Length-bucketed batch manifest (ops/packing.py
    length_bucketed_batches): docs bucketed by token-length range, each
    bucket's deterministically shuffled stream cut into ~2048-token
    batches via the module's two-level prefix sum. The oracle is the
    single-window formulation the two-level plan is provably equal to
    (same pattern as pack_token_shards)."""
    from dozer_spark.ops.packing import length_bucketed_batches

    d = _cat(spark, sf).df("documents")
    return length_bucketed_batches(
        d, "doc_id", "text", bucket_edges=[32, 64], batch_tokens=2048)


def _ivf_pq_frozen_oracle(k: int = 5, n_probe: int = 4, refine: int = 4,
                          dim: int = 64) -> str:
    """EXACT oracle for frozen-geometry IVF-PQ: replays normalization,
    coarse-cell argmin, residual computation, per-subspace code argmin
    (ties on code index), the per-(query, probed-cell) ADC lookup
    tables, the refine*k ADC candidate cut (ties on neighbor id), and
    the exact-cosine re-rank. Every float is the same sequential fold
    on both sides, so codes, ADC, candidates, and the top-k agree
    bit-for-bit."""
    from dozer_spark.ops.pq_frozen import (
        FROZEN_PQ_BOOKS_8x16x8,
        FROZEN_PQ_COARSE_16x64,
    )

    m_sub = len(FROZEN_PQ_BOOKS_8x16x8)
    n_codes = len(FROZEN_PQ_BOOKS_8x16x8[0])
    dsub = len(FROZEN_PQ_BOOKS_8x16x8[0][0])
    ncent = len(FROZEN_PQ_COARSE_16x64)
    cm = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]"
        for row in FROZEN_PQ_COARSE_16x64
    ) + "]"
    bk = "[" + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(repr(x) for x in code) + "]" for code in book
        ) + "]"
        for book in FROZEN_PQ_BOOKS_8x16x8
    ) + "]"

    def cpairs(v: str) -> str:
        return f"""
        list_transform(generate_series(1, {ncent}), jj ->
          {{'d': list_sum(list_transform(generate_series(1, {dim}),
                   i -> ({v}[i] - c[jj][i]) * ({v}[i] - c[jj][i]))),
           'i': jj - 1}})"""

    sub = f"(j-1)*{dsub} + i"
    return f"""
    WITH cm AS (SELECT {cm} AS c, {bk} AS bk),
    q0 AS (
      SELECT vec_id, embedding,
        greatest(sqrt(list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 1e-12) AS nrm
      FROM embeddings WHERE vec_id % 100 = 0
    ), qn AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS qv
      FROM q0
    ), qp AS (
      SELECT query_id, qv, unnest(cells) AS cell
      FROM (
        SELECT query_id, qv,
          list_transform(list_slice(list_sort({cpairs("qv")}),
                                    1, {n_probe}), s -> s.i) AS cells
        FROM qn, cm)
    ), ql AS (
      SELECT query_id, qv, cell,
        list_transform(generate_series(1, {dim}),
                       i -> qv[i] - c[cell + 1][i]) AS qr
      FROM qp, cm
    ), qlut AS (
      SELECT query_id, qv, cell,
        list_transform(generate_series(1, {m_sub}), j ->
          list_transform(bk[j], code ->
            list_sum(list_transform(generate_series(1, {dsub}), i ->
              (qr[{sub}] - code[i]) * (qr[{sub}] - code[i]))))) AS lut
      FROM ql, cm
    ), c0 AS (
      SELECT vec_id, embedding,
        greatest(sqrt(list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 1e-12) AS nrm
      FROM embeddings
    ), cn AS (
      SELECT vec_id AS neighbor_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS cv
      FROM c0
    ), ccell AS (
      SELECT neighbor_id, cv, list_sort({cpairs("cv")})[1].i AS cell
      FROM cn, cm
    ), crv AS (
      SELECT neighbor_id, cv, cell,
        list_transform(generate_series(1, {dim}),
                       i -> cv[i] - c[cell + 1][i]) AS rv
      FROM ccell, cm
    ), ccodes AS (
      SELECT neighbor_id, cv, cell,
        list_transform(generate_series(1, {m_sub}), j ->
          list_sort(list_transform(generate_series(1, {n_codes}), t ->
            {{'d': list_sum(list_transform(generate_series(1, {dsub}), i ->
               (rv[{sub}] - bk[j][t][i]) * (rv[{sub}] - bk[j][t][i]))),
             'i': t - 1}}))[1].i) AS codes
      FROM crv, cm
    ), scored AS (
      SELECT query_id, qv, neighbor_id, cv,
        list_sum(list_transform(generate_series(1, {m_sub}),
                 j -> lut[j][codes[j] + 1])) AS adc
      FROM ccodes JOIN qlut USING (cell)
      WHERE neighbor_id <> query_id
    ), cand AS (
      SELECT * FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_id
        ORDER BY adc, neighbor_id) <= {refine * k}
    ), rer AS (
      SELECT query_id, neighbor_id,
        list_sum(list_transform(generate_series(1, {dim}),
                 i -> qv[i] * cv[i])) AS cos_raw
      FROM cand
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
      CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM rer
    QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id) <= {k}
    """


@_q("ann_ivf_pq_topk_frozen", _ivf_pq_frozen_oracle(), window=True)
def ann_ivf_pq_topk_frozen(spark, sf):
    """IVF-PQ ANN with frozen pre-trained geometry (ops/pq_frozen.py):
    the compressed-index serving shape — coarse centroids + residual
    codebooks pinned at build time — as pure Column math, so the WHOLE
    path (normalize, cell, encode, ADC, candidate cut, exact re-rank)
    replays exactly in SQL. Complements the rows-only live
    ann_ivf_pq_topk (BLAS scale path) with an exactness anchor, the
    same way ann_ivf_topk_frozen anchors the IVF family."""
    from dozer_spark.ops.pq_frozen import (
        FROZEN_PQ_BOOKS_8x16x8,
        FROZEN_PQ_COARSE_16x64,
    )
    from dozer_spark.ops.similarity import ivf_pq_ann_topk_frozen

    e = _cat(spark, sf).df("embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_pq_ann_topk_frozen(
        e, q, "embedding", "vec_id",
        FROZEN_PQ_COARSE_16x64, FROZEN_PQ_BOOKS_8x16x8,
        k=5, n_probe=4, refine=4)


@_q(
    "decontaminate_share",
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
      UNION ALL
      SELECT doc_id, NULL AS h FROM grams
      WHERE doc_id % 97 <> 0 AND len(g) = 0
    ), per AS (
      SELECT c.doc_id,
             CAST(COUNT(c.h) AS BIGINT) AS n_grams,
             CAST(COUNT(e.h) AS BIGINT) AS n_hits
      FROM corpus c LEFT JOIN eval_grams e USING (h)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_grams, n_hits,
           CASE WHEN n_grams = 0 THEN 0.0
                ELSE ROUND(n_hits / n_grams, 6) END AS share
    FROM per
    """,
    window=True,
)
def decontaminate_share(spark, sf):
    """Per-document contamination share (ops/text.py
    contamination_share): fraction of each non-eval doc's distinct
    3-grams present in the eval split (doc_id % 97 = 0) — one row per
    corpus document including clean and gram-less ones, the relative
    metric decontamination policies actually threshold on. Integer/
    integer division replays exactly; oracle keeps gram-less docs via
    an explicit NULL-gram union (DuckDB unnest drops empty lists the
    same way Spark explode does)."""
    from dozer_spark.ops.text import contamination_share

    d = _cat(spark, sf).df("documents")
    return contamination_share(d, "text", "doc_id",
                               F.col("doc_id") % 97 == 0, n=3)


def _pca_frozen_oracle(n_components: int = 8, dim: int = 64) -> str:
    """EXACT oracle for frozen-geometry PCA projection: the centered
    matvec is the same sequential fold on both sides, so each projected
    coordinate agrees bit-for-bit before the shared rounding. Emits one
    SCALAR row per (vec_id, component) — the driver's canonicalizer
    sorts columns with pandas, which cannot factorize array cells, so
    every window query must be atomic-typed (tests/test_registry.py
    pins this for the whole window)."""
    from dozer_spark.ops.pca_frozen import (
        FROZEN_PCA_COMPONENTS_8x64,
        FROZEN_PCA_MEAN_64,
    )

    m = "[" + ", ".join(repr(x) for x in FROZEN_PCA_MEAN_64) + "]"
    p = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]"
        for row in FROZEN_PCA_COMPONENTS_8x64
    ) + "]"
    return f"""
    WITH pm AS (SELECT {m} AS m, {p} AS p),
    ks AS (SELECT unnest(generate_series(1, {n_components})) AS k)
    SELECT vec_id, CAST(k AS INTEGER) AS k,
      round(list_sum(list_transform(generate_series(1, {dim}), i ->
        (CAST(embedding[i] AS DOUBLE) - m[i]) * p[k][i])), 6) AS pc_k
    FROM embeddings, pm, ks
    """


@_q("pca_project_frozen", window=True, oracle=_pca_frozen_oracle())
def pca_project_frozen_query(spark, sf):
    """PCA projection onto frozen geometry (ops/pca_frozen.py): the
    pinned mean + top-8 components make the centered matvec pure
    sequential-fold Column math with an exact SQL replay — the
    exactness anchor for the PCA family (live pca_fit is rows-only:
    partition-order moment sums + BLAS projection). The projection
    array is posexploded to (vec_id, k, pc_k) scalar rows: the driver
    window requires atomic output columns (r11 verdict item 1)."""
    from dozer_spark.ops.embedding import pca_project_frozen
    from dozer_spark.ops.pca_frozen import (
        FROZEN_PCA_COMPONENTS_8x64,
        FROZEN_PCA_MEAN_64,
    )

    e = _cat(spark, sf).df("embeddings")
    out = pca_project_frozen(
        e, "embedding", FROZEN_PCA_MEAN_64, FROZEN_PCA_COMPONENTS_8x64,
        id_col="vec_id")
    return out.select(
        "vec_id", F.posexplode("pc").alias("pos", "pc_k")
    ).select("vec_id", (F.col("pos") + 1).alias("k"), "pc_k")
