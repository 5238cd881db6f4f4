"""Deterministic sampling for training-data pipelines.

df.sample() is seed-and-partitioning dependent — useless for reproducible
dataset cards or cross-engine verification. Hash-based sampling (keep a
row iff md5(key) lands under the cutoff) is:
- deterministic and engine-portable (same md5 everywhere),
- stable under repartitioning/retries,
- composable: the same row is in/out of the sample regardless of when or
  where the pipeline runs (critical for incremental dataset builds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix of 8 hex chars -> uniform 32-bit bucket
_BUCKETS = 1 << 32


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform [0, 2^32) bucket from a row key (md5-based, seeded by salt)."""
    s = F.concat(F.lit(salt + ":"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cutoff = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), salt) < cutoff)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    salt: str = "",
) -> DataFrame:
    """Deterministic N-way dataset split (train/valid/test) by key hash.

    ``splits`` is an ordered list of (name, fraction) summing to 1.0;
    each row lands in the split whose cumulative-fraction interval its
    md5 bucket falls into. Same guarantees as hash_sample: reproducible
    across engines/runs/repartitioning, and a row never migrates between
    splits when the corpus grows (critical for eval-set hygiene —
    yesterday's test doc must not become tomorrow's training doc).

    Adds a ``split`` string column; no shuffle (a pure filter-style
    projection).
    """
    return df.withColumn(
        "split", _split_col(F.col(key_col), splits, salt))


def _split_col(key: Column, splits: list[tuple[str, float]],
               salt: str) -> Column:
    """Split-name Column for a key: md5 bucket against cumulative
    integer cutoffs (shared by hash_split and leakage_safe_split)."""
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    if any(f < 0 for _, f in splits):
        raise ValueError("split fractions must be non-negative")
    bucket = hash_bucket(key, salt)
    expr = None
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cut = F.lit(int(acc * _BUCKETS))
        expr = (
            F.when(bucket < cut, F.lit(name))
            if expr is None
            else expr.when(bucket < cut, F.lit(name))
        )
    last = F.lit(splits[-1][0])
    return last if expr is None else expr.otherwise(last)


def leakage_safe_split(
    df: DataFrame,
    key_col: str,
    pairs: DataFrame,
    splits: list[tuple[str, float]],
    salt: str = "split",
    pair_id_a: str = "id_a",
    pair_id_b: str = "id_b",
) -> DataFrame:
    """Train/valid/test split at near-duplicate-CLUSTER granularity:
    connected components over ``pairs`` (any upstream near-dup pair
    stream — MinHash LSH, SimHash, embedding cosine) give every row a
    cluster representative (min id in its component), and the hash
    split runs on the REPRESENTATIVE — so an entire near-dup cluster
    lands in one split.

    This closes the leakage channel a row-level hash split leaves open:
    two near-identical documents hash independently, one lands in
    train and its twin in test, and the eval set silently measures
    memorization. Splitting by cluster representative makes that
    impossible by construction, deterministically and
    engine-portably. Stability under corpus growth is necessarily
    CLUSTER-scoped, not row-scoped: a doc keeps its split while its
    component is unchanged, but a new pair that MERGES two components
    re-splits the merged cluster as one unit (min-id representative),
    which can migrate members — the unavoidable price of keeping a
    cluster atomic, and the leakage-safe behavior (the alternative,
    pinning old members, would leave the merged near-dup group
    straddling splits).

    Rows that appear in no pair are their own singleton cluster (their
    representative is their own key). Adds the ``split`` column.

    100 TB design: the cluster label table is bounded by the dup tail
    (ids that appear in at least one pair — a few percent of a real
    corpus), so the label join broadcasts; the split itself is the
    same shuffle-free projection as hash_split.
    """
    from dozer_spark.operators.hints import maybe_broadcast
    from dozer_spark.ops.dedup import dedup_clusters

    labels = dedup_clusters(pairs, id_a=pair_id_a, id_b=pair_id_b)
    rep_t = labels.schema["cluster_id"].dataType
    key_t = df.schema[key_col].dataType
    if key_t != rep_t:
        # The singleton path hashes coalesce(rep, key CAST rep_t); if the
        # key type differs from the pair-id type the cast can re-render
        # the key (string canonicalization) or null out under ANSI, so an
        # unpaired row would hash differently than hash_split on the same
        # key. Refuse up front with a clear message instead.
        raise ValueError(
            f"leakage_safe_split: key column {key_col!r} has type "
            f"{key_t.simpleString()} but the pair ids have type "
            f"{rep_t.simpleString()}; cast {key_col!r} (or the pair ids) "
            "so the types match — otherwise singleton rows could hash a "
            "different rendering than hash_split would"
        )
    joined = df.join(
        maybe_broadcast(
            labels.select(F.col("id").alias("__lk"),
                          F.col("cluster_id").alias("__rep"))),
        df[key_col] == F.col("__lk"),
        "left",
    )
    rep = F.coalesce(F.col("__rep"), F.col(key_col).cast(rep_t))
    return (
        joined.withColumn("split", _split_col(rep, splits, salt))
        .drop("__lk", "__rep")
    )


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all rare ones): fraction chosen by strata value."""
    cutoff = None
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        c = F.when(F.col(strata_col) == value, F.lit(int(frac * _BUCKETS)))
        cutoff = c if cutoff is None else cutoff.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        )
    cutoff = (
        cutoff.otherwise(F.lit(int(default_fraction * _BUCKETS)))
        if cutoff is not None
        else F.lit(int(default_fraction * _BUCKETS))
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < cutoff)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, leakage-free split: a key is ALWAYS on the same side
    regardless of runs/engines/partitioning."""
    cutoff = int(test_fraction * _BUCKETS)
    b = hash_bucket(F.col(key_col), salt)
    return df.filter(b >= cutoff), df.filter(b < cutoff)


def quota_sample(
    df: DataFrame, key_col: str, strata_col: str, quotas: dict[str, int],
    default_quota: int = 0, salt: str = "mix",
) -> DataFrame:
    """Target-COUNT mixture sampling (domain mixing): keep exactly
    min(quota, stratum size) rows per stratum, chosen deterministically
    — the "hit this per-domain token budget" step of corpus assembly,
    where fractions don't compose (the budget is absolute, the corpus
    grows).

    Selection order is (md5(salt:key), key): engine-portable (hex-string
    ordering), stable under repartitioning, and total (the key
    tiebreaks hash collisions), so the SAME rows are chosen on every
    engine and every run. Scale: one shuffle on the stratum column for
    the per-stratum rank; quotas are small by definition so the window
    never materializes more than the stratum's rows per task — for
    heavily skewed strata pair with stratified_hash_sample to pre-thin
    before the exact quota cut."""
    for v, q in quotas.items():
        if q < 0:
            raise ValueError(f"quota for {v!r} must be >= 0")
    from pyspark.sql.window import Window

    order = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(order, F.col(key_col))
    quota = None
    for value, q in quotas.items():
        c = F.when(F.col(strata_col) == value, F.lit(q))
        quota = c if quota is None else quota.when(
            F.col(strata_col) == value, F.lit(q)
        )
    quota = (
        quota.otherwise(F.lit(default_quota))
        if quota is not None
        else F.lit(default_quota)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame, key_col: str, domain_col: str, alpha: float,
    total: int, salt: str = "temp",
) -> DataFrame:
    """Temperature-based domain rebalancing: keep ~`total` rows with
    per-domain counts proportional to (domain size)^alpha — the
    standard multilingual/domain-mixing resampler (alpha=1 keeps the
    natural distribution, alpha->0 flattens toward uniform; e.g. the
    alpha=0.3 mixing of multilingual LM training).

    Determinism contract: the ONLY floating-point step is computing the
    integer per-domain quota round(total * c^alpha / sum(c^alpha));
    row selection is then an exact (md5, key)-ranked cut, so results
    are reproducible across engines and runs unless pow() differs
    enough to flip an integer rounding — and the quota arithmetic is
    replayed identically in the oracle, so even that would be caught,
    not silent.

    100 TB design: domain cardinality is tiny by definition (languages,
    sources), so the quota table is a constant-size aggregate
    broadcast back; the rank cut is one shuffle on the domain column,
    identical to quota_sample. Skewed giant domains keep only their
    quota — pair with stratified_hash_sample to pre-thin a dominant
    domain before the exact window if a single domain's rank task is
    too large.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if total <= 0:
        raise ValueError("total must be positive")
    from pyspark.sql.window import Window

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__c"))
    weighted = counts.withColumn("__w", F.pow(F.col("__c").cast("double"), alpha))
    quotas = (
        weighted.withColumn("__wsum", F.sum("__w").over(Window.partitionBy()))
        .select(
            domain_col,
            F.round(F.lit(float(total)) * F.col("__w") / F.col("__wsum"))
            .cast("long")
            .alias("__quota"),
        )
    )
    order = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), domain_col)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def dsir_log_weights(docs: DataFrame, text_col: str, id_col: str,
                     target_pred: Column, n_buckets: int = 10_000):
    """DSIR-style importance weights for data selection (public method:
    Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling"): featurize every document as hashed word unigram +
    bigram counts over `n_buckets` buckets, estimate the TARGET
    (`target_pred` rows — the high-quality/eval-domain split) and RAW
    (everything else) bucket distributions with add-1 smoothing, and
    score each raw document with the log importance weight
    `sum over its feature occurrences of ln(p_target[b] / p_raw[b])`.
    Sampling raw docs with probability proportional to the weight
    (e.g. Gumbel top-k over log_weight) reproduces the paper's
    importance resampling; this op returns the weights and leaves the
    cut policy to the caller.

    Returns (id_col, n_feats, log_weight) for every raw document with
    at least one token, log_weight rounded to 6 places.

    Deterministic and oracle-checkable: the feature hash is the md5
    32-bit prefix mod n_buckets (engine-portable — same idiom as
    hash_bucket), and the smoothed log-ratio is evaluated in the same
    operand order in Spark and SQL.

    100 TB design: one cached slim gram stream feeds both censuses and
    the per-doc aggregation; censuses are map-side combined and
    n_buckets-bounded; the log-ratio table is n_buckets rows —
    broadcast — so the only corpus-sized shuffle is the per-doc
    groupBy; totals arrive via a broadcast single-row cross join.
    """
    from dozer_spark.operators.hints import (
        cache_materialized,
        ensure_min_partitions,
        maybe_broadcast,
    )
    from dozer_spark.ops.text import tokens

    t = tokens(F.col(text_col))
    bigrams = F.when(
        F.size("__t") >= 2,
        F.expr("transform(sequence(1, size(__t) - 1),"
               " i -> __t[i-1] || ' ' || __t[i])"),
    ).otherwise(F.array().cast("array<string>"))
    base = (
        ensure_min_partitions(docs)
        .select(F.col(id_col),
                F.coalesce(target_pred, F.lit(False)).alias("__is_t"),
                t.alias("__t"))
        .withColumn("__g", F.concat(F.col("__t"), bigrams))
    )
    feats = cache_materialized(
        base.select(
            F.col(id_col), F.col("__is_t"),
            F.explode("__g").alias("__gram"))
        .select(
            F.col(id_col), F.col("__is_t"),
            (F.conv(F.substring(F.md5(F.col("__gram")), 1, 8), 16, 10)
             .cast("long") % F.lit(n_buckets)).alias("__b"))
    )
    tc = feats.filter(F.col("__is_t")).groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__ct"))
    rc = feats.filter(~F.col("__is_t")).groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__cr"))
    nt = feats.filter(F.col("__is_t")).agg(
        F.count(F.lit(1)).cast("double").alias("__nt"))
    nr = feats.filter(~F.col("__is_t")).agg(
        F.count(F.lit(1)).cast("double").alias("__nr"))
    # every raw doc's bucket appears in rc by construction, so the
    # ratio table is built on rc with the target side left-joined
    lw = (
        F.log((F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1))
              / (F.col("__nt") + F.lit(float(n_buckets))))
        - F.log((F.col("__cr") + F.lit(1))
                / (F.col("__nr") + F.lit(float(n_buckets))))
    )
    ratio = (
        rc.join(tc, "__b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select("__b", lw.alias("__lw"))
    )
    return (
        feats.filter(~F.col("__is_t"))
        .join(maybe_broadcast(cache_materialized(ratio)), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(F.sum("__lw"), 6).alias("log_weight"),
        )
    )


def dsir_gumbel_topk(docs: DataFrame, text_col: str, id_col: str,
                     target_pred: Column, n_select: int,
                     n_buckets: int = 10_000, salt: str = "dsir"):
    """The resampling half of DSIR: draw `n_select` raw documents with
    probability proportional to their importance weight via the Gumbel
    top-k trick — score = log_weight + Gumbel noise, keep the top
    n_select scores. The noise is DETERMINISTIC (inverse-CDF over the
    md5 hash bucket of the doc id, u = (bucket + 0.5) / 2^32,
    g = -ln(-ln u)), so the drawn sample is reproducible across
    engines, runs, and partitionings — the same contract as every
    sampler in this module, and the property that makes an exact SQL
    oracle possible for a *random* sample.

    Returns (id_col, n_feats, log_weight, gumbel_score) for the
    selected documents. The top-k cut is orderBy().limit() — Spark
    executes it as a distributed take-ordered, never a single-partition
    global sort.
    """
    if n_select <= 0:
        raise ValueError("n_select must be positive")
    w = dsir_log_weights(docs, text_col, id_col, target_pred, n_buckets)
    u = (hash_bucket(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    score = F.col("log_weight") - F.log(-F.log(u))
    return (
        w.withColumn("gumbel_score", F.round(score, 6))
        .orderBy(F.desc("gumbel_score"), F.asc(id_col))
        .limit(n_select)
    )


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str,
    size_col: Column | str | None = None,
    target: dict[str, float] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-domain resampling weights to hit a target mixture — the
    static form of domain reweighting (the DoReMi line of work tunes
    the target itself; given a target, the per-example weight is just
    target_share / corpus_share).

    size_col measures each row's mass (e.g. a token count); None
    weighs rows equally. target maps domain -> desired share (need not
    sum to 1; it is renormalized over the domains PRESENT). target=None
    means uniform over observed domains. Domains absent from an
    explicit target get share 0 -> weight 0 (dropped by the sampler
    consuming the weights).

    Output: (domain, n_rows, mass, corpus_share, target_share, weight),
    one row per observed domain, all shares/weights rounded for
    engine-portable parity. weight > 1 means upsample (repeat/epoch),
    < 1 means downsample — feed to temperature_sample/quota_sample or a
    repetition-factor writer.

    Scale: one aggregation pass (map-side combinable groupBy on the
    domain column) + a single-row totals broadcast — the same shape as
    the BM25 stats join; no shuffle beyond the domain agg.
    """
    mass = (F.lit(1.0) if size_col is None
            else (F.col(size_col) if isinstance(size_col, str)
                  else size_col)).cast("double")
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(mass).alias("mass"),
    )
    if target is not None:
        if not target:
            raise ValueError("target must not be empty (omit it for a "
                             "uniform mixture over observed domains)")
        if all(share == 0 for share in target.values()):
            raise ValueError("target shares must not all be zero")
        tshare = None
        for dom, share in target.items():
            if share < 0:
                raise ValueError(f"target share for {dom!r} must be >= 0")
            c = F.when(F.col("domain") == dom, F.lit(float(share)))
            tshare = c if tshare is None else tshare.when(
                F.col("domain") == dom, F.lit(float(share)))
        tshare = tshare.otherwise(F.lit(0.0))
    else:
        tshare = F.lit(1.0)
    per = per.withColumn("__t", tshare)
    # totals via an unpartitioned window over the PER-DOMAIN frame —
    # n_domains rows, so the single-partition window is bounded by
    # construction and the corpus is scanned exactly once (a crossJoin
    # against per.agg() would recompute the domain agg — two scans)
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    out = per.withColumn("__tot_mass", F.sum("mass").over(w_all)) \
             .withColumn("__tot_t", F.sum("__t").over(w_all))
    # Guard the two plan-level divisions so degenerate inputs surface as
    # clear validation errors / defined values rather than an opaque ANSI
    # DIVIDE_BY_ZERO killing the whole frame:
    #  - a target whose nonzero shares all name ABSENT domains makes
    #    __tot_t = 0 -> raise with an actionable message;
    #  - zero total mass (every row weightless) likewise;
    #  - a present domain with zero mass gets corpus_share 0 and weight 0
    #    (dropped by the consuming sampler) instead of 0-division.
    tot_t_ok = F.when(
        F.col("__tot_t") > 0, F.col("__tot_t")
    ).otherwise(F.raise_error(F.lit(
        "domain_mixture_weights: target matches no observed domain "
        "(every nonzero target share names a domain absent from the corpus)"
    )).cast("double"))
    tot_mass_ok = F.when(
        F.col("__tot_mass") > 0, F.col("__tot_mass")
    ).otherwise(F.raise_error(F.lit(
        "domain_mixture_weights: total corpus mass is zero "
        "(size_col sums to 0 over every domain)"
    )).cast("double"))
    corpus_share = F.col("mass") / tot_mass_ok
    target_share = F.col("__t") / tot_t_ok
    weight = F.when(corpus_share == 0, F.lit(0.0)).otherwise(
        target_share / corpus_share)
    return out.select(
        "domain",
        "n_rows",
        F.round("mass", round_to).alias("mass"),
        F.round(corpus_share, round_to).alias("corpus_share"),
        F.round(target_share, round_to).alias("target_share"),
        F.round(weight, round_to).alias("weight"),
    )


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "pps",
    n_buckets: int = 16,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (the PPS
    scheme of survey statistics / particle filters, applied to corpus
    building): draw k of the stream's weight units at a fixed stride
    with one md5-derived random offset, so each document is selected
    with probability ~ k*w/W (heavy docs can be drawn multiple times —
    n_hits reports the multiplicity, e.g. for epoch repetition counts).
    The token-weighted "sample k documents proportional to length"
    step of mixture building, with none of the libm hazard of
    exponential-race (A-ES) sampling: the whole decision path is
    INTEGER arithmetic (prefix sums, one modulo offset, floor/ceil
    divisions), so it replays bit-for-bit in any engine.

    Docs are laid on a line in the deterministic shuffled order
    (md5 bucket, md5 key, id) — the same two-level prefix sum as
    token_shard_assignment. n_buckets is a pinned parameter of the
    order (like the salt): the bucket is part of the order key, so the
    sample is bit-identical under any partitioning/parallelism, while
    changing n_buckets (like changing the salt) reshuffles the line. With W = total weight and
    r = md5(salt:r) mod W, the k picks are p_j = (r + j*W) div k,
    j in [0, k); doc with span [s, s+w) is hit
    max(0, jhi - jlo) times where jlo/jhi are the ceil-division
    bounds of {j : p_j in [s, s+w)}.

    Returns (id_col, weight, n_hits) for selected docs (n_hits >= 1).
    Rows with weight <= 0 are excluded (zero-width spans can't be
    hit). Requires 1 <= k and k*W below int64 — caller's contract
    (k ~ 1e6 draws against W ~ 1e12 total tokens stays 3 orders of
    magnitude inside; the LONG arithmetic overflows loudly, not
    silently, under ANSI mode otherwise).

    100 TB design: one slim scan (id, weight, hash), the per-bucket
    window + n_buckets-row offset table of the shared prefix-sum
    shape, a broadcast 1-row total, and a per-row closed-form hit
    count — no global single-partition window, no driver state."""
    from dozer_spark.operators.hints import cache_materialized

    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
              % n_buckets).cast("int")
    t = cache_materialized(
        df.filter(F.col(weight_col) > 0).select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("__w"),
            h.alias("__h"),
            bucket.alias("__b"),
        )
    )
    from pyspark.sql import Window

    w_local = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__cum", F.sum("__w").over(w_local))
    w_off = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        t.groupBy("__b")
        .agg(F.sum("__w").alias("__tot"))
        .withColumn("__off", F.sum("__tot").over(w_off) - F.col("__tot"))
        .select("__b", "__off")
    )
    total = t.agg(F.sum("__w").alias("__wtotal"))
    r = F.pmod(
        F.conv(F.substring(F.md5(F.lit(salt + ":r")), 1, 13), 16, 10)
        .cast("long"),
        F.col("__wtotal"),
    )
    placed = (
        local.join(F.broadcast(offsets), "__b")
        .crossJoin(F.broadcast(total))
        .withColumn("__s", F.col("__off") + F.col("__cum") - F.col("__w"))
        .withColumn("__r", r)
    )
    # ceil((k*x - r) / W) via truncating DIV: the numerator is only
    # divided when positive (CASE-guarded), where trunc == floor, so
    # the ceil identity (a + W - 1) DIV W holds exactly
    placed = (
        placed.withColumn("__lon", F.lit(int(k)) * F.col("__s") - F.col("__r"))
        .withColumn("__hin",
                    F.lit(int(k)) * (F.col("__s") + F.col("__w"))
                    - F.col("__r"))
        .withColumn(
            "__jlo",
            F.greatest(
                F.lit(0).cast("long"),
                F.when(F.col("__lon") > 0,
                       F.expr("(__lon + __wtotal - 1) DIV __wtotal"))
                .otherwise(F.lit(0)),
            ),
        )
        .withColumn(
            "__jhi",
            F.least(
                F.lit(int(k)).cast("long"),
                F.when(F.col("__hin") > 0,
                       F.expr("(__hin + __wtotal - 1) DIV __wtotal"))
                .otherwise(F.lit(0)),
            ),
        )
        .withColumn("__nh", F.greatest(F.lit(0).cast("long"),
                                       F.col("__jhi") - F.col("__jlo")))
    )
    return placed.filter(F.col("__nh") >= 1).select(
        F.col(id_col),
        F.col("__w").alias("weight"),
        F.col("__nh").alias("n_hits"),
    )
