"""Wave 12: margin-based bitext mining — the parallel-corpus mining
step (Artetxe & Schwenk 2019, the CCMatrix/LASER scorer) as an exact
DuckDB oracle. The embeddings table splits on `label` into two
"languages" (label < 5 = source space, label >= 5 = target space); the
whole decision path — fold cosines, rank-ordered k-candidate means,
ratio margins, the best-per-source cut and the mutual-best flag — is
sequential-fold float math both engines compute bit-identically, so
the oracle compares raw doubles and rounds only at output (the same
discipline as the frozen-quantizer ANN oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (query modules' norm)

from dozer_spark.queries import _cat, _q

_BMM_K, _BMM_THRESHOLD, _BMM_DIM = 4, 1.0, 64


def _bitext_margin_oracle(k: int, threshold: float, dim: int) -> str:
    cos = f"""
        list_sum(list_transform(generate_series(1, {dim}),
          i -> CAST(s.v[i] AS DOUBLE) * CAST(t.v[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, {dim}),
             i -> CAST(s.v[i] AS DOUBLE) * CAST(s.v[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, {dim}),
             i -> CAST(t.v[i] AS DOUBLE) * CAST(t.v[i] AS DOUBLE)))))"""
    return f"""
    WITH s AS (
      SELECT vec_id AS sid, embedding AS v FROM embeddings WHERE label < 5
    ), t AS (
      SELECT vec_id AS tid, embedding AS v FROM embeddings WHERE label >= 5
    ), pairs AS (
      SELECT sid, tid, {cos} AS c FROM s, t
    ), rnk AS (
      SELECT sid, tid, c,
        row_number() OVER (PARTITION BY sid ORDER BY c DESC, tid) AS rf,
        row_number() OVER (PARTITION BY tid ORDER BY c DESC, sid) AS rb
      FROM pairs
    ), fa AS (
      SELECT sid, list_sum(list(c ORDER BY rf)) / COUNT(*) AS fa
      FROM rnk WHERE rf <= {k} GROUP BY sid
    ), ba AS (
      SELECT tid, list_sum(list(c ORDER BY rb)) / COUNT(*) AS ba
      FROM rnk WHERE rb <= {k} GROUP BY tid
    ), m AS (
      SELECT r.sid, r.tid, r.c, r.c / ((fa.fa + ba.ba) / 2.0) AS mg
      FROM rnk r JOIN fa ON fa.sid = r.sid JOIN ba ON ba.tid = r.tid
      WHERE r.rf <= {k}
    ), mm AS (
      SELECT sid, tid, c, mg,
        row_number() OVER (PARTITION BY sid ORDER BY mg DESC, tid) AS rs,
        row_number() OVER (PARTITION BY tid ORDER BY mg DESC, sid) AS rt
      FROM m
    )
    SELECT sid AS src_id, tid AS tgt_id, ROUND(c, 6) AS cosine,
           ROUND(mg, 6) AS margin, (rs = 1 AND rt = 1) AS mutual
    FROM mm WHERE rs = 1 AND mg >= {threshold!r}
    """


_PPS_K, _PPS_SALT, _PPS_NB = 120, "pps", 16


def _pps_oracle(k: int, salt: str, nb: int) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             md5('{salt}:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE n_chars > 0
    ), b AS (
      SELECT *, CAST(CAST('0x' || substr(h, 1, 4) AS BIGINT) % {nb} AS INT)
        AS bk
      FROM t
    ), c AS (
      SELECT doc_id, w,
        SUM(w) OVER (ORDER BY bk, h, doc_id ROWS UNBOUNDED PRECEDING) - w AS s
      FROM b
    ), tot AS (SELECT SUM(w) AS W FROM t),
    rr AS (
      SELECT CAST('0x' || substr(md5('{salt}:r'), 1, 13) AS BIGINT) % W AS r, W
      FROM tot
    ),
    hits AS (
      SELECT c.doc_id, c.w,
        GREATEST(0, LEAST({k},
          CASE WHEN {k} * (c.s + c.w) - rr.r > 0
               THEN ({k} * (c.s + c.w) - rr.r + rr.W - 1) // rr.W ELSE 0 END)
          - GREATEST(0,
          CASE WHEN {k} * c.s - rr.r > 0
               THEN ({k} * c.s - rr.r + rr.W - 1) // rr.W ELSE 0 END)) AS nh
      FROM c, rr
    )
    SELECT doc_id, w AS weight, nh AS n_hits FROM hits WHERE nh >= 1
    """


@_q("sample_pps_systematic", _pps_oracle(_PPS_K, _PPS_SALT, _PPS_NB))
def sample_pps_systematic(spark, sf):
    """Probability-proportional-to-size systematic sampling: k=120
    length-weighted draws over the md5-shuffled document line — all
    integer arithmetic (prefix sums + floor/ceil divisions), the
    libm-free weighted sampler (ops/sampling.py:pps_systematic_sample;
    heavy docs report draw multiplicity in n_hits)."""
    from dozer_spark.ops.sampling import pps_systematic_sample

    d = _cat(spark, sf).df("documents")
    return pps_systematic_sample(
        d, "n_chars", "doc_id", k=_PPS_K, salt=_PPS_SALT,
        n_buckets=_PPS_NB)


def _prune_prototypes_oracle(prune_frac: float) -> str:
    from dozer_spark.queries_wave11 import _cm_literal, _frozen_assign_ctes

    cm, ncent, dim = _cm_literal()
    return f"""
    WITH {_frozen_assign_ctes(cm, ncent, dim)},
    it AS (
      SELECT id, cell,
        list_sum(list_transform(generate_series(1, {dim}),
          i -> vn[i] * c[cell + 1][i])) AS sim
      FROM asn, cm
    ),
    r AS (
      SELECT id, cell, sim,
        row_number() OVER (PARTITION BY cell
          ORDER BY sim DESC, id ASC) AS rnk,
        COUNT(*) OVER (PARTITION BY cell) AS n
      FROM it
    )
    SELECT id AS vec_id, CAST(cell AS INTEGER) AS cell,
           ROUND(sim, 6) AS centroid_sim,
           rnk > FLOOR({prune_frac!r} * n + 0.5) AS kept
    FROM r
    """


_PPF_FRAC = 0.3


@_q("prune_prototypes_frozen", _prune_prototypes_oracle(_PPF_FRAC))
def prune_prototypes_frozen(spark, sf):
    """SSL-prototype pruning (Sorscher et al. 2022) against the frozen
    spherical quantizer: per cell, the prune_frac most prototypical
    (highest centroid-similarity) items are dropped and the hard tail
    kept — rank-local, no pair join (the scale contrast to SemDeDup's
    pairwise scan). The rank runs on RAW fold similarities both engines
    compute identically; rounding only at output."""
    from dozer_spark.ops.semdedup_frozen import (
        FROZEN_UNIT_CENTROIDS_16x64,
        prune_prototypes_frozen as prune,
    )

    e = _cat(spark, sf).df("embeddings")
    return prune(e, "embedding", "vec_id", FROZEN_UNIT_CENTROIDS_16x64,
                 prune_frac=_PPF_FRAC)


@_q("bitext_margin_mine",
    _bitext_margin_oracle(_BMM_K, _BMM_THRESHOLD, _BMM_DIM))
def bitext_margin_mine(spark, sf):
    """CCMatrix/LASER-style margin mining between the two halves of the
    embedding space: best ratio-margin target per source above the
    threshold, with the mutual-best ("max" strategy) flag. Candidate
    generation here is the gated all-pairs baseline; at corpus scale
    the ANN family supplies the k-candidate lists the margin math
    consumes (ops/similarity.py:bitext_margin_mine docstring)."""
    from dozer_spark.ops.similarity import bitext_margin_mine as mine

    e = _cat(spark, sf).df("embeddings")
    return mine(
        e.filter(F.col("label") < 5),
        e.filter(F.col("label") >= 5),
        "embedding",
        "vec_id",
        k=_BMM_K,
        threshold=_BMM_THRESHOLD,
    )
