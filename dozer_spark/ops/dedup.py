"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the whole point at 100 TB):
- exact:   one hash-groupBy — map-side partial agg, one shuffle on digest.
- minhash: signatures are a single scan (no shuffle); LSH banding turns
  O(n^2) pair search into a shuffle on band keys + per-bucket self-join.
  Candidate verification (true Jaccard) only touches candidate pairs.
- simhash: single scan to a 60-bit signature (the Manku-standard
  geometry); near-dup = same-chunk join + hamming<=k filter.
- All hashing is md5-based so results are engine-deterministic and
  oracle-checkable in DuckDB (same md5, same lexicographic min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dozer_spark.operators.hints import (
    cache_materialized,
    ensure_min_partitions,
    maybe_broadcast,
)
from dozer_spark.ops.text import tokens

# base MinHash geometry: 4 bands; rows-per-band DERIVE from the verify
# threshold (minhash_geometry) unless pinned. 16 hashes = 4x4 is the
# derived geometry for threshold ~0.7.
MINHASH_HASHES = 16
MINHASH_BANDS = 4


def minhash_geometry(threshold: float, n_hashes: int | None = None,
                     n_bands: int | None = None) -> tuple[int, int]:
    """(n_hashes, n_bands) for a verify threshold, unless pinned.

    Rows-per-band r is set so the LSH S-curve half-point (1/b)^(1/r)
    sits at the threshold — the selectivity that makes candidate volume
    track TRUE near-dups instead of the corpus's baseline similarity.
    This is the 100x lever: banding with r too small for the threshold
    admits candidates at P = j_baseline^r per band, which on a corpus
    with moderate baseline similarity (j ~ 0.2) is 1.6e-3 at r=4 —
    ~10^8 candidate pairs at 500k docs (measured: 500s at 100x scale)
    — versus 1e-9 at the r=13 this derives for threshold 0.9 (measured:
    seconds). Recall at the threshold boundary is the S-curve's ~60%
    by construction and rises steeply above it (0.94 at j=0.95);
    verification is exact either way, so precision is always 1.0.
    """
    import math

    if n_bands is None:
        n_bands = MINHASH_BANDS
    if n_hashes is not None:
        return n_hashes, n_bands
    t = min(max(threshold, 0.05), 0.97)
    r = max(2, min(16, round(math.log(n_bands) / -math.log(t))))
    return n_bands * r, n_bands
# Carter-Wegman family modulus: smallest prime above 2^32. h1 + i*h2 for
# i < 16 stays < 2^36 — no 64-bit overflow on either engine.
MINHASH_PRIME = 4_294_967_311


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: groups by content digest, keeps the smallest id as
    canonical. One shuffle on the digest (map-side combine applies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def _token_set(text_col: str) -> Column:
    return F.array_distinct(tokens(F.col(text_col)))


def _token_set_sql(text_col: str) -> str:
    """SQL-string form of `_token_set` (same parsed tree): whitespace
    split, empty strings dropped, distinct."""
    return f"array_distinct(filter(split(`{text_col}`, ' '), x -> x != ''))"


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = MINHASH_HASHES
) -> DataFrame:
    """MinHash signature per document — ONE md5 per token.

    Carter-Wegman 2-universal family: per token, (h1, h2) = the first and
    second 32 hex bits of md5(token); hash_i(token) = (h1 + i*h2) mod P.
    mh_i(doc) = min over tokens. One digest per token plus 16 integer
    ops replaces the previous 16-keyed-md5s-per-token design (the md5s
    dominated the signature scan: ~2.5x on the sf0.1 corpus). The
    arithmetic is integer-exact and engine-portable (the DuckDB oracle
    replays it digit for digit).
    """
    # The WHOLE signature projection is ONE spark.sql template (the
    # previous form — one F.expr per hash column — still paid ~800 py4j
    # round-trips of single-threaded driver time per build across the
    # chained select/withColumn stages; guide §7.3). The parsed plan is
    # identical: same nested Projects, same expressions.
    #
    # mh{i}: h1/h2 are hoisted into __h12 — the hex parse (conv) is the
    # per-token cost, and computing it once per token instead of once
    # per (token, i) keeps wide geometries (52 hashes at threshold 0.9)
    # nearly as cheap as narrow ones.
    #
    # toksh: 60-bit md5-prefix token hashes. Verification intersects
    # THESE instead of the token strings — long-array array_intersect
    # measured ~1.6x the string version over ~1M candidate pairs.
    # Deterministic md5 means the DuckDB oracle replays the identical
    # hash sets, so results stay exactly comparable (a within-pair
    # 60-bit collision would change jaccard identically on both
    # engines; probability is ~1e-15 per pair).
    #
    # hashing is CPU-bound: spread a small (few-split) input over the
    # cluster first; no-op when the corpus already has enough splits.
    # The select("*") guard keeps a persisted input safe as a template
    # arg (see _blocked_self_join_pairs).
    base = ensure_min_partitions(df).select("*")
    mh_cols = ", ".join(
        f"array_min(transform(__h12, s -> (s.h1 + {i} * s.h2) % "
        f"{MINHASH_PRIME})) AS mh{i}"
        for i in range(n_hashes)
    )
    sql = f"""
    SELECT `{id_col}`, toks,
           array_distinct(transform(__digests,
             d -> CAST(conv(substring(d, 1, 15), 16, 10) AS BIGINT))) AS toksh,
           {mh_cols}
    FROM (
      SELECT `{id_col}`, toks, __digests,
             transform(__digests, d -> struct(
               CAST(conv(substring(d, 1, 8), 16, 10) AS BIGINT) AS h1,
               CAST(conv(substring(d, 9, 8), 16, 10) AS BIGINT) AS h2)) AS __h12
      FROM (
        SELECT `{id_col}`, toks, transform(toks, t -> md5(t)) AS __digests
        FROM (
          SELECT `{id_col}`, {_token_set_sql(text_col)} AS toks FROM {{base}}
        )
      )
    )
    """
    return base.sparkSession.sql(sql, base=base)


def prefilter_min_matches(threshold: float, n_hashes: int) -> int:
    """Signature-agreement prefilter bound: candidates whose minhash
    signatures agree on fewer than this many positions skip exact
    verification. E[matches] = threshold*n_hashes; the 0.7 slack keeps
    P(reject a true pair) negligible (Binom(16, 0.9) < 10 ~ 2e-5)."""
    return max(0, int(n_hashes * threshold * 0.7))


def _blocked_self_join_pairs(
    blocked: DataFrame,
    key_cols: list[str],
    id_col: str,
    hot_cap: int,
    broadcast_gate_bytes: int | None = None,
    extra_pred: str | None = None,
    carry: tuple[tuple[str, str, str], ...] = (),
    distinct: bool = True,
    keep_keys: tuple[str, ...] = (),
    final_sql: str | None = None,
    extra_args: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Self-join `blocked` on key_cols -> unordered candidate pairs
    (id_a < id_b), with HOT-BUCKET TRIANGLE-FRAGMENT SPLITTING shared by
    the MinHash band join and the SimHash chunk join.

    A blocking key covering a large slice of the corpus funnels n^2 pair
    work into ONE join partition — AQE cannot split a single key. A slim
    aggregate finds the buckets over `hot_cap`; rows of a hot bucket
    get a deterministic fragment f in [0, s) (s = ceil(n / cap)); the
    left side replays each row into cells (f, j>=f), the right side into
    cells (i<=f, f), and the join key gains (ci, cj) — every unordered
    pair meets in EXACTLY one cell, so results are identical while each
    cell holds ~(n/s)^2 of the work. Cold buckets (s=1) stay single-cell
    with zero replication, so the fragment path IS the plain self-join
    on a corpus with no hot bucket (join key two ints wider, zero
    replication) — which is why there is no driver-side "is anything
    hot?" probe: the old cache_materialized(hot).count() cost one extra
    blocking job + a cache entry PER BUILD (and per STREAMING EPOCH via
    the dedup/fuzzy probe paths) just to pick between two plans with
    identical output. Folding the branch into the plan keeps one job
    end-to-end; the hot list is computed inside it and joined back
    (provably <= corpus/cap rows).

    The whole pair construction past the slim `hot` aggregate is ONE
    spark.sql template: the Column-operator chain it replaced cost
    ~700 py4j round-trips of single-threaded driver time per build (and
    per streaming epoch) — guide §7.3 — while the parsed plan, and
    therefore every result, is identical. `hot` stays a DataFrame for
    `maybe_broadcast`, but note the gate now sees Catalyst's STATIC
    estimate of the unexecuted aggregate (often the child's size), not
    a materialized cache size — when the hint is not applied, AQE's
    runtime-sized decision still picks the join strategy (hint-only
    either way; correctness unaffected).

    extra_pred: extra join predicate (SQL string) over aliases "a"/"b"
    (e.g. the MinHash size-ratio prefilter). carry: (out_a, out_b, src)
    triples — src is carried from the smaller-id side into out_a and the
    larger-id side into out_b.

    distinct=False skips the pair-level DISTINCT: one row per (pair,
    colliding block key) comes out, and keep_keys appends the named key
    columns (equal on both sides, taken from a) so the caller can dedup
    in-stage with a first-matching-key filter instead of paying the
    DISTINCT's exchange (guide §2.4 — the batch minhash/simhash paths
    do exactly that; streaming callers keep the default because they
    union these pairs with the new-vs-old join before their own
    distinct).

    final_sql: optional outer SELECT over the `__pairs` CTE, spliced
    into the SAME template. Each eager DataFrame op downstream would
    re-analyze the whole (wide) pair tree (~60 ms per op at the simhash
    geometry, guide §7.3); a caller that already knows its
    filter/projection folds it into the one analysis pass instead.
    extra_args: additional {name} template args final_sql references
    (e.g. the minhash verify join's per-doc side frames).

    Template-arg discipline (load-bearing): a PERSISTED DataFrame passed
    directly as a {arg} is silently UNPERSISTED when spark.sql drops the
    arg's temp view (dropTempView uncaches the view's plan, which IS the
    cached plan) — and the View wrapper also defeats CacheManager
    substitution. A derived frame (the trivial select("*") below) keeps
    the cache intact AND picks it up in-plan; streaming callers pass
    persisted band/chunk/key frames here every epoch.
    """
    b = blocked.select("*")
    hot = (
        b.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_cap)
        .select(
            *key_cols,
            F.ceil(F.col("__n") / hot_cap).cast("int").alias("__s"),
        )
    )
    hot = maybe_broadcast(hot, broadcast_gate_bytes)

    keys_on = " AND ".join(f"t.`{k}` = h.`{k}`" for k in key_cols)
    keys_ab = " AND ".join(f"a.`{k}` = b.`{k}`" for k in key_cols)
    carry_sql = "".join(
        f", CASE WHEN a.`{id_col}` < b.`{id_col}` "
        f"THEN a.`{src}` ELSE b.`{src}` END AS {oa}"
        for (oa, _, src) in carry
    ) + "".join(
        f", CASE WHEN a.`{id_col}` < b.`{id_col}` "
        f"THEN b.`{src}` ELSE a.`{src}` END AS {ob}"
        for (_, ob, src) in carry
    )
    pred_sql = f" AND ({extra_pred})" if extra_pred is not None else ""
    keep_sql = "".join(f", a.`{k}` AS `{k}`" for k in keep_keys)
    head = "SELECT DISTINCT" if distinct else "SELECT"
    # orientation: a row with fragment fx can meet a row with fragment
    # fy >= fx at cell (fx, fy) — left role for the smaller fragment,
    # right role for the larger. The left side keeps its own fragment in
    # __ff and explodes the cell column __cj in [f, s); the right side
    # keeps __ff and explodes __ci in [0, f] — so the cell equality is
    # a.__ff = b.__ci AND a.__cj = b.__ff. Same-fragment cells would
    # match both orientations, so the id order tie-breaks there;
    # least/greatest canonicalizes the id order afterward.
    sql = f"""
    WITH __frag AS (
      SELECT t.*, coalesce(h.__s, 1) AS __fs,
             CAST(pmod(crc32(CAST(t.`{id_col}` AS STRING)),
                       coalesce(h.__s, 1)) AS INT) AS __ff
      FROM {{blocked}} t LEFT JOIN {{hot}} h ON {keys_on}
    ),
    __L AS (SELECT t.*, explode(sequence(t.__ff, t.__fs - 1)) AS __cj
            FROM __frag t),
    __R AS (SELECT t.*, explode(sequence(0, t.__ff)) AS __ci
            FROM __frag t),
    __pairs AS (
    {head}
      least(a.`{id_col}`, b.`{id_col}`) AS id_a,
      greatest(a.`{id_col}`, b.`{id_col}`) AS id_b
      {carry_sql}{keep_sql}
    FROM __L a JOIN __R b
      ON {keys_ab} AND a.__ff = b.__ci AND a.__cj = b.__ff
      AND (a.__ff < a.__cj OR a.`{id_col}` < b.`{id_col}`){pred_sql}
    )
    {final_sql or "SELECT * FROM __pairs"}
    """
    return b.sparkSession.sql(sql, blocked=b, hot=hot, **(extra_args or {}))


def _band_key_sql(b: int, rows_per_band: int) -> str:
    """SQL for ONE band's LSH key (md5 of the band's minhashes,
    truncated to 64 bits) — the single source of the band-key geometry,
    shared by `minhash_band_table` (batch join + streaming state) and
    the precomputed-key projection in `minhash_lsh_pairs`."""
    cols = ", ".join(
        f"CAST(mh{b * rows_per_band + r} AS STRING)"
        for r in range(rows_per_band)
    )
    return f"substring(md5(concat_ws(':', {cols})), 1, 16)"


def minhash_band_table(sigs: DataFrame, id_col: str,
                       n_hashes: int = MINHASH_HASHES,
                       n_bands: int = MINHASH_BANDS) -> DataFrame:
    """Per-doc LSH band rows (id, sz, band, band_key) from a signature
    table — geometry from `_band_key_sql`, shared by the batch pair join
    and the streaming state so the two can never drift apart."""
    rows_per_band = n_hashes // n_bands

    def band_key(b: int) -> str:
        return _band_key_sql(b, rows_per_band)

    # ONE scan + explode (not n_bands union branches): a union re-reads
    # the signature source per branch and multiplies the partition count
    # by n_bands, widening every downstream stage for no parallelism
    # gain. Built as ONE selectExpr (a DataFrame method, so a PERSISTED
    # sigs keeps and reuses its cache — a spark.sql template arg would
    # drop it, see _blocked_self_join_pairs): inline() explodes the
    # struct array straight into (band, band_key) columns, replacing the
    # old explode + unpack-Project pair and its ~60 py4j round-trips.
    structs = ", ".join(
        f"named_struct('band', {b}, 'band_key', {band_key(b)})"
        for b in range(n_bands)
    )
    return sigs.selectExpr(
        f"`{id_col}`", "size(toksh) AS sz", f"inline(array({structs}))"
    )


def minhash_size_pred(threshold: float) -> str:
    """The size-ratio prefilter (SQL string) over join aliases a/b:
    jaccard <= min(|A|,|B|)/max(|A|,|B|), so size-incompatible pairs can
    never verify. Shared by batch and streaming joins (usable both as
    `_blocked_self_join_pairs` extra_pred and in `.filter(...)`). The
    `D` suffix keeps the threshold a DOUBLE literal — bare `0.9` parses
    as DECIMAL in Spark SQL, which would change the comparison's type
    lattice vs the old F.lit(threshold) Column form. float() first so a
    numpy.float64 (repr 'np.float64(0.9)' under numpy>=2) can't produce
    unparseable SQL — the old Column form accepted any numeric."""
    return (
        "CAST(least(a.sz, b.sz) AS DOUBLE) >= "
        f"{float(threshold)!r}D * CAST(greatest(a.sz, b.sz) AS DOUBLE)"
    )


def simhash_chunk_table(sigs: DataFrame, id_col: str, n_bits: int = 60,
                        max_hamming: int = 3) -> DataFrame:
    """Per-doc pigeonhole chunk rows (id, simhash, chunk, chunk_val) —
    single source of the chunk geometry, shared batch/streaming."""
    n_chunks = max_hamming + 1
    chunk_bits = n_bits // n_chunks
    # one scan + inline-explode via a single selectExpr, same rationale
    # (and the same cache-safety constraint) as minhash_band_table
    mask = (1 << chunk_bits) - 1
    structs = ", ".join(
        f"named_struct('chunk', {ci}, 'chunk_val', "
        f"shiftright(`simhash`, {ci * chunk_bits}) & {mask})"
        for ci in range(n_chunks)
    )
    return sigs.selectExpr(
        f"`{id_col}`", "simhash", f"inline(array({structs}))"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_hashes: int | None = None,
    n_bands: int | None = None,
    prefilter: bool = False,
    broadcast_gate_bytes: int | None = None,
    hot_band_cap: int = 4096,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs with exact-Jaccard verification.

    shingle -> minhash -> band -> bucket-join -> [signature prefilter] ->
    verify. Output: (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold. The band join shuffles on (band, band_key) —
    only colliding docs meet.

    prefilter drops candidates whose signatures agree on too few
    positions before the set-intersection verify. Worth it when docs are
    long (verify dominates); on short docs the wider signature rows
    through the candidate join cost more than they save (measured 1.6x
    SLOWER on the ~30-token corpus), hence default off.

    hot_band_cap: band buckets with more rows than this split into
    fragment-replicated sub-cells (see below) so no single join key owns
    more than ~cap^2 pair work. The default is an ABSOLUTE bound — about
    one task-second of pair enumeration — not a fraction of the corpus:
    splitting smaller buckets costs more in replication and plan width
    than the parallelism returns (measured 2.5x slower at sf0.1 with
    cap=512, where the hottest bucket is 2.3k rows ~ 0.5s of work).
    """
    # persist: the signature scan (md5 per token + the minhash folds)
    # feeds both the band branch and the verification branch — without
    # this Catalyst recomputes it twice. What is CACHED is the slim
    # per-doc replay table (id, toksh, sz, bk0..bk{B-1} [, mh* only when
    # the prefilter needs them]): the band keys are md5'd ONCE here
    # instead of once per join side / hot aggregate (4x at the default
    # geometry), and the band branches scan rows without the token-hash
    # arrays — the bulk of each cached row (guide §2.3 project early).
    # The string token arrays are dropped for the same reason.
    n_hashes, n_bands = minhash_geometry(threshold, n_hashes, n_bands)
    rows_per_band = n_hashes // n_bands
    min_matches = prefilter_min_matches(threshold, n_hashes) if prefilter else 0
    keep_mh = [f"mh{i}" for i in range(n_hashes)] if min_matches > 0 else []
    sigs = (
        minhash_signatures(df, text_col, id_col, n_hashes)
        .selectExpr(
            f"`{id_col}`",
            "toksh",
            "size(toksh) AS sz",
            *[f"{_band_key_sql(b, rows_per_band)} AS bk{b}"
              for b in range(n_bands)],
            *keep_mh,
        )
        .persist()
    )

    # per-doc band rows from the precomputed keys (one scan + inline
    # explode — geometry is _band_key_sql, shared with the streaming
    # operator via minhash_band_table)
    structs = ", ".join(
        f"named_struct('band', {b}, 'band_key', bk{b})" for b in range(n_bands)
    )
    bands = sigs.selectExpr(f"`{id_col}`", "sz", f"inline(array({structs}))")

    # SIZE-RATIO prefilter inside the join: jaccard <= min(|A|,|B|) /
    # max(|A|,|B|), so pairs whose token-set sizes differ by more than
    # the threshold can never verify — they are dropped BEFORE their
    # token arrays enter the verify join. Sound (upper bound), no false
    # negatives; prunes ~45% of raw band collisions at threshold 0.9 on
    # the sf0.1 corpus.
    size_compatible = minhash_size_pred(threshold)

    # verification: re-attach the slim per-doc rows to the candidate
    # table. One row per document — when the size ESTIMATE clears the
    # gate, broadcast it so the 10^6-10^7-row candidate table never
    # shuffles (measured 1.6x on sf0.1); past the gate (real corpora)
    # the hint is dropped and AQE picks a shuffled join keyed on doc id
    # — valid at any scale. The pair search AND the verify are ONE sql
    # template (final_sql): the equivalent join/withColumn/filter chain
    # re-analyzed the whole wide signature tree at every step (~0.5 s
    # of single-threaded driver time per build, guide §7.3). The side
    # frames REORDER the columns they rename: neither a select("*")
    # wrapper NOR a full-width same-order rename protects the cache
    # here — canonicalization strips aliases, so both plans are
    # sameResult to the cached plan and the template formatter's
    # dropTempView cleanup silently UNPERSISTS sigs (measured as a 7x
    # cold blowup: every branch recomputed the signature pipeline from
    # parquet). The reordered projection is structurally different, so
    # the cache survives and is substituted in-plan (pinned by
    # test_optimization_r13.py).
    #
    # distinct=False: multi-band collisions are deduped by the
    # first-matching-band filter in the verify instead of a pair-level
    # DISTINCT — that removes the DISTINCT's exchange and its
    # post-shuffle stage outright (guide §2.4), so verification runs at
    # the probe join's full parallelism.
    #
    # FIRST-MATCHING-BAND filter == the old DISTINCT, row for row: a
    # candidate row exists for exactly the bands whose keys collide
    # (one row per matching band — the triangle fragmentation meets
    # each unordered pair in exactly one cell per band), so keeping the
    # row whose band IS the minimal matching band keeps exactly one row
    # per pair. jaccard uses |A u B| = |A| + |B| - |A n B| (toksh is
    # array_distinct'ed, so exact) — the array_union pass is dropped;
    # row-identity of both rewrites is pinned in
    # tests/test_optimization_r13.py.
    first_band = "CASE " + " ".join(
        f"WHEN ka.a_bk{b} = kb.b_bk{b} THEN {b}" for b in range(n_bands)
    ) + " END"
    pre_sql = ""
    if min_matches > 0:
        match_sum = " + ".join(
            f"(CASE WHEN ka.a_mh{i} = kb.b_mh{i} THEN 1 ELSE 0 END)"
            for i in range(n_hashes)
        )
        pre_sql = f" AND ({match_sum}) >= {min_matches}"
    ka = maybe_broadcast(
        sigs.selectExpr(
            "toksh AS __ta", "sz AS __sa", f"`{id_col}` AS __ida",
            *[f"bk{b} AS a_bk{b}" for b in range(n_bands)],
            *[f"{c} AS a_{c}" for c in keep_mh],
        ),
        broadcast_gate_bytes,
    )
    kb = maybe_broadcast(
        sigs.selectExpr(
            "toksh AS __tb", "sz AS __sb", f"`{id_col}` AS __idb",
            *[f"bk{b} AS b_bk{b}" for b in range(n_bands)],
            *[f"{c} AS b_{c}" for c in keep_mh],
        ),
        broadcast_gate_bytes,
    )
    final_sql = f"""
    SELECT id_a, id_b, round(jaccard, 4) AS jaccard
    FROM (
      SELECT id_a, id_b,
             CAST(__i AS DOUBLE) / CAST(__sza + __szb - __i AS DOUBLE)
               AS jaccard
      FROM (
        SELECT c.id_a, c.id_b,
               size(array_intersect(ka.__ta, kb.__tb)) AS __i,
               ka.__sa AS __sza, kb.__sb AS __szb
        FROM __pairs c
        JOIN {{ka}} ka ON ka.__ida = c.id_a
        JOIN {{kb}} kb ON kb.__idb = c.id_b
        WHERE ({first_band}) = c.band{pre_sql}
      )
    )
    WHERE jaccard >= {float(threshold)!r}D
    """
    return _blocked_self_join_pairs(
        bands,
        ["band", "band_key"],
        id_col,
        hot_cap=hot_band_cap,
        broadcast_gate_bytes=broadcast_gate_bytes,
        extra_pred=size_compatible,
        distinct=False,
        keep_keys=("band",),
        final_sql=final_sql,
        extra_args={"ka": ka, "kb": kb},
    )


def _md5_bits(c: Column, n_bits: int) -> Column:
    """First n_bits (<=60) of md5 as a BIGINT — engine-portable."""
    n_hex = (n_bits + 3) // 4
    return F.conv(F.substring(F.md5(c), 1, n_hex), 16, 10).cast("long")


def simhash(df: DataFrame, text_col: str, id_col: str, n_bits: int = 60) -> DataFrame:
    """SimHash signature: per-token md5 bit votes, sign -> bit.

    Implemented as explode + one groupBy(id) with n_bits conditional sums
    (single shuffle on id; at scale this is a map-side-combinable agg).

    The input IS rebalanced (ensure_min_partitions): the per-token md5
    happens BEFORE the groupBy's shuffle, so an unbalanced scan pins
    the whole hashing pass to however many tasks hold rows — measured
    as a 27M-token single task (80s) on a one-row-group 100x corpus.
    The rebalance shuffle costs ~0.3s warm at sf0.1 and is skipped
    past the cheap-rebalance byte bound where real inputs carry enough
    splits.
    """
    # the WHOLE pipeline (tokenize -> per-token md5 bits -> 60 vote sums
    # -> signature) is ONE spark.sql template: the previous form (60
    # F.expr vote columns + groupBy/agg/select Column ops) still paid
    # ~130 py4j round-trips and re-analysis of the exploded-token tree
    # per build (guide §7.3). The parsed tree — explode, conv(md5),
    # sum(CASE...), signature chain — is identical, so plans and results
    # are unchanged (pinned by test_simhash_expr_equals_column_operator_
    # form).
    base = ensure_min_partitions(df).select("*")
    n_hex = (n_bits + 3) // 4
    votes = ",\n               ".join(
        f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        f" AS v{b}"
        for b in range(n_bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for b in range(n_bits)
    )
    sql = f"""
    SELECT `{id_col}`, {sig} AS simhash
    FROM (
      SELECT `{id_col}`,
               {votes}
      FROM (
        SELECT `{id_col}`,
               CAST(conv(substring(md5(tok), 1, {n_hex}), 16, 10) AS BIGINT)
                 AS h
        FROM (
          SELECT `{id_col}`, explode({_token_set_sql(text_col)}) AS tok
          FROM {{base}}
        )
      )
      GROUP BY `{id_col}`
    )
    """
    return base.sparkSession.sql(sql, base=base)


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bits: int = 60,
    hot_chunk_cap: int = 4096,
    broadcast_gate_bytes: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Blocking: two docs within hamming<=k share at least one of k+1 equal
    signature chunks (pigeonhole) — join per chunk, then verify hamming.

    DEFAULT GEOMETRY is the published near-duplicate standard (Manku,
    Jain, Sarma, WWW'07: 64-bit fingerprint, k=3 — here 60 bits, the
    widest an md5-prefix BIGINT carries): 4 chunks x 15 bits = 32768
    blocking buckets per chunk, so candidate volume is ~n^2/2^15 — a
    128x reduction over the old 32-bit default's 4x256 buckets, which
    funneled ~n^2/256 pair work through the join at corpus scale.
    hot_chunk_cap additionally routes any bucket over the cap through
    the triangle-fragment split the MinHash band join uses — identical
    pairs, bounded per-cell work (~cap^2). Hamming thresholds are
    RELATIVE to n_bits (each bit is a vote sign, so a given text
    perturbation flips a constant FRACTION of bits): k=3 at 60 bits is
    stricter than k=3 at 32 — scale max_hamming with n_bits if you
    lower n_bits.
    """
    # persist: the signature table feeds n_chunks union branches AND both
    # sides of the self-join — without it the explode+groupBy recomputes
    # per branch
    sigs = simhash(df, text_col, id_col, n_bits).persist()
    # chunk geometry shared with the streaming operator
    chunks = simhash_chunk_table(sigs, id_col, n_bits, max_hamming)
    # distinct=False: multi-chunk collisions are deduped by the
    # first-matching-chunk filter — the carried signatures hold
    # everything the filter needs (chunk equality IS a bit-slice
    # comparison of the sigs), so unlike minhash no re-attach join is
    # required and the pair-level DISTINCT's exchange disappears
    # outright (guide §2.4). Row-identity with the DISTINCT form is
    # pinned in tests/test_optimization_r13.py. The filter + hamming
    # verify ride the SAME template as final_sql: the old
    # where/withColumn/filter/select tail re-analyzed the wide pair
    # tree four times (~240 ms of driver time per build, guide §7.3).
    n_chunks = max_hamming + 1
    chunk_bits = n_bits // n_chunks
    mask = (1 << chunk_bits) - 1
    first_chunk = "CASE " + " ".join(
        f"WHEN (shiftright(sig_a, {ci * chunk_bits}) & {mask}) = "
        f"(shiftright(sig_b, {ci * chunk_bits}) & {mask}) THEN {ci}"
        for ci in range(n_chunks)
    ) + " END"
    final_sql = f"""
    SELECT id_a, id_b, hamming
    FROM (
      SELECT id_a, id_b,
             CAST(bit_count(sig_a ^ sig_b) AS BIGINT) AS hamming
      FROM __pairs
      WHERE ({first_chunk}) = chunk
    )
    WHERE hamming <= {max_hamming}
    """
    return _blocked_self_join_pairs(
        chunks,
        ["chunk", "chunk_val"],
        id_col,
        hot_cap=hot_chunk_cap,
        broadcast_gate_bytes=broadcast_gate_bytes,
        carry=(("sig_a", "sig_b", "simhash"),),
        distinct=False,
        keep_keys=("chunk",),
        final_sql=final_sql,
    )


def char_ngrams(c: Column, n: int = 4) -> Column:
    """Distinct character n-gram shingles (native sequence+transform)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.6,
    n: int = 4,
    prefix_chars: int = 200,
    broadcast_gate_bytes: int | None = None,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup within a blocking key.

    Blocking bounds the O(n^2): pairs are only compared inside the same
    block (e.g. language or length bucket). Shingling is capped at
    prefix_chars to bound per-row cost.
    """
    g = df.select(
        F.col(id_col),
        F.col(block_col).alias("blk"),
        char_ngrams(F.substring(F.col(text_col), 1, prefix_chars), n).alias("grams"),
    ).persist()
    # pair formation on slim (id, blk) rows; gram arrays are attached
    # afterwards (size-gated broadcast) so they never ride the skewed
    # per-block shuffle. Past the gate, AQE picks the join strategy.
    ids = g.select(F.col(id_col), F.col("blk"))
    a, b = ids.alias("a"), ids.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias("__ia"), F.col(f"b.{id_col}").alias("__ib"))
    ga = maybe_broadcast(
        g.select(F.col(id_col).alias("__ia"), F.col("grams").alias("a_grams")),
        broadcast_gate_bytes,
    )
    gb = maybe_broadcast(
        g.select(F.col(id_col).alias("__ib"), F.col("grams").alias("b_grams")),
        broadcast_gate_bytes,
    )
    return (
        pairs.join(ga, "__ia")
        .join(gb, "__ib")
        .withColumnRenamed("__ia", "a_id")
        .withColumnRenamed("__ib", "b_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a_grams", "b_grams")).cast("double")
            / F.size(F.array_union("a_grams", "b_grams")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a_id").alias("id_a"),
            F.col("b_id").alias("id_b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                   max_iter: int = 20,
                   driver_max_edges: int | None = 200_000) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id) with
    cluster_id = min id in the component; the canonical "keep one per
    cluster" step after any pairwise dedup.

    SIZE-GATED DRIVER FAST PATH: near-dup edge sets are usually tiny
    relative to the corpus (dups are the exception, and upstream LSH
    already filtered to verified pairs). When a limit-probe shows at
    most driver_max_edges edges, they are collected and resolved with
    union-find in one pass — two jobs total instead of O(diameter)
    two-shuffle label-propagation rounds, with IDENTICAL output
    (min-id-per-component either way). Past the bound — or with
    driver_max_edges=None — the distributed path runs unchanged:
    iterative min-label propagation, each round two shuffles, converges
    in O(diameter) rounds (~log n for dedup graphs, which are mostly
    tiny cliques) — the standard large-graph CC pattern without
    requiring GraphFrames.
    """
    # unify the endpoint types up front: mixed id_a/id_b types (e.g.
    # int pairs against a long corpus id) would otherwise build a
    # driver-path schema from id_a alone and fail or silently coerce.
    # F.array() applies Spark's own common-type coercion and raises
    # loudly when none exists.
    id_type = pairs.schema[id_a].dataType
    if id_type != pairs.schema[id_b].dataType:
        id_type = pairs.select(
            F.array(F.col(id_a), F.col(id_b)).alias("__ab")
        ).schema["__ab"].dataType.elementType
    edges_slim = pairs.select(F.col(id_a).cast(id_type).alias("a"),
                              F.col(id_b).cast(id_type).alias("b"))
    # persist BEFORE the limit-probe: when the probe overflows, the
    # distributed path below reuses the already-computed partitions
    # instead of recomputing the upstream pair pipeline (typically a
    # full LSH run) from scratch. The whole remainder runs under
    # try/finally so NO exit — driver fast path, distributed path, or
    # an exception anywhere between — leaks the persisted edges for
    # the session. (Both returns are materialized frames: the driver
    # path returns a LocalRelation, the distributed path an eager
    # localCheckpoint — unpersisting in finally cannot invalidate
    # them.)
    persisted = driver_max_edges is not None
    if persisted:
        edges_slim = edges_slim.persist()
    try:
        return _dedup_clusters_resolve(
            pairs, edges_slim, id_type, driver_max_edges, max_iter)
    finally:
        if persisted:
            edges_slim.unpersist()


def _dedup_clusters_resolve(pairs, edges_slim, id_type,
                            driver_max_edges, max_iter):
    if driver_max_edges is not None:
        probed = edges_slim.limit(driver_max_edges + 1).collect()
        if len(probed) <= driver_max_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in probed:
                a, b = r.a, r.b
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by label order keeps the min id at the root
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            out_schema = T.StructType([
                T.StructField("id", id_type),
                T.StructField("cluster_id", id_type),
            ])
            rows = [(n, find(n)) for n in parent]
            return pairs.sparkSession.createDataFrame(rows, out_schema)

    edges = (
        edges_slim
        .unionByName(edges_slim.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "nl"), "b")
                .groupBy("a")
                .agg(F.min("nl").alias("nmin"))
                .withColumnRenamed("a", "id")
            )
            # carry the previous label through the checkpoint so convergence
            # detection is a scan of the materialized frame, not another
            # full self-join + shuffle per round
            new_labels = (
                labels.join(neighbor_min, "id", "left")
                .select(
                    "id",
                    F.col("label").alias("__prev"),
                    F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.filter(F.col("label") != F.col("__prev")).limit(1).count()
            )
            labels = new_labels.drop("__prev")
            if changed == 0:
                break
    finally:
        edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def embedding_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.45,
    max_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force all-pairs).

    Exact-recall baseline: O(n^2) self-join. That is the DESIGN — it is
    the verification reference for embedding_neardup_pairs_lsh (the
    scale path) and the only variant with recall 1.0 — and max_rows
    ENFORCES the contract (same treatment as brute_force_topk_fast):
    past the bound the call fails fast pointing at the LSH pipeline
    instead of launching a 10^18-pair cartesian.
    """
    from dozer_spark.ops.similarity import _dot, _norm

    probed = df.limit(max_rows + 1).count()
    if probed > max_rows:
        raise ValueError(
            f"corpus exceeds max_rows={max_rows}: embedding_neardup_pairs "
            "is the O(n^2) exact-recall baseline; use "
            "embedding_neardup_pairs_lsh (bucketed candidates + exact "
            "cosine verify) at corpus scale, or raise max_rows "
            "deliberately"
        )
    # per-side norms below the join: same bits as the per-pair
    # cosine_sim, 2/3 less interpreted fold work (guide §2.3)
    v = df.select(
        F.col(id_col), F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn(
            "cosine",
            _dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.n") * F.col("b.n")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.45,
    n_bands: int = 8,
    band_bits: int | None = None,
    dim: int = 64,
    hot_bucket_cap: int = 4096,
    broadcast_gate_bytes: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: banded random-hyperplane LSH
    blocking + exact cosine verification — the minhash_lsh_pairs shape
    for vectors, replacing the all-pairs cartesian.

    Each vector gets n_bands bucket ids (band b = the sign bits of its
    band_bits hyperplanes, planes md5-deterministic — the oracle replays
    them as SQL literals); candidate generation is a per-(band, bucket)
    BLAS self-score (row-blocked matmul) whose survivors are confirmed
    with the EXACT sequential-fold cosine — identical results to a
    fold-only pipeline, see the inline margin argument. Buckets over
    hot_bucket_cap split into triangle-fragment cells (the
    _blocked_self_join_pairs scheme) BEFORE the pandas grouping, so no
    single task ever materializes more than ~2*cap rows — clustered
    embedding spaces concentrate bucket mass and would otherwise pin a
    memory ceiling and a straggler on one task. Recall < 1 by construction (a pair missed by all
    bands is never scored): P[pair found] = 1-(1-p^band_bits)^n_bands
    with p = 1 - acos(cos)/pi, so high-cosine near-dups are found with
    high probability and the band count tunes the knee.

    band_bits=None derives the geometry from a corpus count: bucket
    size ~16 (band_bits = log2(n/16), clamped [8, 26]), making expected
    candidate volume ~8n per band — LINEAR in the corpus, vs n^2/2 for
    the brute-force baseline. Pass band_bits explicitly for a
    replayable oracle.
    """
    import math

    from dozer_spark.ops.similarity import _bucket_sql, _hyperplanes, cosine_sim

    if band_bits is None:
        n = df.count()
        band_bits = min(26, max(8, math.ceil(math.log2(max(n, 32) / 16))))
    planes = _hyperplanes(n_bands * band_bits, dim)
    v = ensure_min_partitions(df).select(
        F.col(id_col), F.col(vec_col).alias("__v")
    )
    # all n_bands*band_bits sign bits in ONE projection (one scan, one
    # inline-explode) — no per-band union branches recomputing the dot
    # folds. The projection is ONE parsed SQL expression: the per-plane
    # Column loop it replaces issued n_bands*band_bits*(dim+4) py4j
    # round-trips (~2,600 at the dedup_embedding_cosine geometry —
    # measured 6.1 s of single-threaded driver time PER BUILD, guide
    # §7.3); trees and bucket ids are identical (sign bits pinned by
    # test_optimization_r13.py, end-to-end by the DuckDB oracle).
    band_structs = ", ".join(
        "named_struct('band', {b}, 'bucket', {bucket})".format(
            b=b,
            bucket=_bucket_sql(
                "__v", planes[b * band_bits:(b + 1) * band_bits]
            ),
        )
        for b in range(n_bands)
    )
    rows = cache_materialized(
        v.selectExpr(f"`{id_col}`", f"inline(array({band_structs}))")
    )
    # BLAS PRE-VERIFY, fold CONFIRM. The native cosine fold (zip_with +
    # aggregate) runs INTERPRETED per array element — at 10M in-bucket
    # candidates that is ~10 minutes of lambda dispatch. Instead each
    # (band, bucket) group scores itself with one numpy matmul (row-
    # blocked to bound memory) and keeps pairs >= threshold - margin;
    # the few survivors get the EXACT sequential-fold cosine, which is
    # both the output value and the filter — so results are identical
    # to the fold-only pipeline (BLAS error ~1e-12 << margin 1e-4: no
    # true pair can be dropped, near-misses are re-checked and
    # rejected), and the md5-replayed DuckDB oracle still matches.
    import numpy as np
    import pandas as pd

    slim = rows.join(
        maybe_broadcast(
            df.select(F.col(id_col), F.col(vec_col).alias("__v2")),
            broadcast_gate_bytes,
        ),
        id_col,
    )
    # HOT-BUCKET FRAGMENT SPLIT for the pandas groups: applyInPandas
    # materializes each group on one task, so a bucket holding a big
    # slice of the corpus (clustered embeddings concentrate mass) would
    # be both a memory ceiling and a straggler. Reuse the triangle-cell
    # scheme from _blocked_self_join_pairs: rows of a bucket over
    # hot_bucket_cap get fragment f; the LEFT role replays into cells
    # (f, j>=f), the RIGHT role into (i<=f, f); every unordered pair
    # meets in exactly one cell, each cell holds <= ~2*cap rows. Cold
    # buckets (s=1) collapse to a single (0,0) cell with every row in
    # both roles — the plain within-bucket triangle.
    hot = cache_materialized(
        slim.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_bucket_cap)
        .select(
            "band", "bucket",
            F.ceil(F.col("__n") / hot_bucket_cap).cast("int").alias("__s"),
        )
    )
    frag = (
        slim.join(maybe_broadcast(hot, broadcast_gate_bytes),
                  ["band", "bucket"], "left")
        .withColumn("s", F.coalesce(F.col("__s"), F.lit(1)))
        .withColumn(
            "f", F.pmod(F.crc32(F.col(id_col).cast("string")),
                        F.col("s")).cast("int")
        )
    )
    left = (
        frag.withColumn("cj", F.explode(F.sequence(F.col("f"), F.col("s") - 1)))
        .withColumnRenamed("f", "ci").withColumn("__side", F.lit(0))
    )
    right = (
        frag.withColumn("ci", F.explode(F.sequence(F.lit(0), F.col("f"))))
        .withColumnRenamed("f", "cj").withColumn("__side", F.lit(1))
    )
    cells = left.unionByName(right).select(
        "band", "bucket", "ci", "cj", "__side", id_col, "__v2"
    )
    id_type = df.schema[id_col].dataType
    pair_schema = T.StructType([
        T.StructField("id_a", id_type), T.StructField("id_b", id_type),
    ])
    margin = 1e-4

    def cell_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": []})
        same_cell = key[2] == key[3]  # (band, bucket, ci, cj)
        a = pdf[pdf["__side"] == 0]
        b = pdf[pdf["__side"] == 1]
        if a.empty or b.empty:
            return empty
        A = np.array([list(map(float, v)) for v in a["__v2"]])
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        B = np.array([list(map(float, v)) for v in b["__v2"]])
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        ida = a[id_col].to_numpy()
        idb = b[id_col].to_numpy()
        out_a, out_b = [], []
        block = 1024  # bounds the score matrix at block x |B| doubles
        for s in range(0, len(ida), block):
            e = min(s + block, len(ida))
            S = An[s:e] @ Bn.T
            for i in range(s, e):
                js = np.nonzero(S[i - s] >= threshold - margin)[0]
                for j in js:
                    x, y = ida[i], idb[j]
                    if same_cell:
                        # both roles hold the same rows: emit once
                        if x < y:
                            out_a.append(x)
                            out_b.append(y)
                    elif x != y:
                        out_a.append(min(x, y))
                        out_b.append(max(x, y))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = (
        cells.groupBy("band", "bucket", "ci", "cj")
        .applyInPandas(cell_pairs, pair_schema)
        .distinct()
    )
    # exact verify: re-attach vectors (one row per vector vs the larger
    # candidate table — size-gated broadcast, shuffled join past the gate)
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(maybe_broadcast(va, broadcast_gate_bytes), "id_a")
        .join(maybe_broadcast(vb, broadcast_gate_bytes), "id_b")
        .withColumn("cosine", cosine_sim(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select(
            "id_a", "id_b", F.round("cosine", 6).alias("cosine")
        )
    )


def drop_duplicated_segments(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    sep: str = r"\. ",
    joiner: str = ". ",
) -> DataFrame:
    """Segment-level (line-level) dedup: remove from every document the
    segments that appear verbatim in >= min_docs DISTINCT documents —
    the MassiveText / RefinedWeb boilerplate-line filter (cookie
    banners, nav bars, license headers) applied at corpus scale.

    Returns (id_col, n_segments, n_removed, clean_digest) where
    clean_digest = md5 of the document rebuilt from its surviving
    segments in original order.

    100 TB design: ONE text scan, two shuffles, both honest. The
    exploded base (doc id, position, segment, 32B digest) is CACHED and
    feeds both the census and the removal join, so the text scan, the
    regex split, and the per-segment md5 are genuinely paid once (the
    previous slim-digest-only cache recomputed all three for the join
    side — a second full-corpus scan, the wrong trade at any scale;
    MEMORY_AND_DESERIALIZED spills to disk past executor memory).
    count_distinct(doc) dedupes intra-doc repeats with partial
    aggregation, so the census shuffle never amplifies repeated
    segments within one doc. The rebuild regroups (doc, pos, segment)
    — the same volume as the input scan, no amplification. The
    common-segment set (boilerplate is rare relative to the corpus) is
    size-gate broadcast into the removal join; if it is ever NOT
    small, the gate falls back to a shuffled join instead of pinning a
    broadcast.
    """
    segs = F.split(F.col(text_col), sep, -1)
    src = ensure_min_partitions(df)
    base = cache_materialized(
        src.select(
            F.col(id_col), F.posexplode(segs).alias("__pos", "__seg")
        ).withColumn("__h", F.md5(F.col("__seg")))
    )

    common = (
        base.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )

    marked = base.join(
        maybe_broadcast(common.withColumn("__dup", F.lit(True))), "__h", "left"
    )
    kept = F.when(F.col("__dup").isNull(), F.struct("__pos", "__seg"))
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.count("__dup").cast("long").alias("n_removed"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept)), lambda s: s["__seg"]
                    ),
                    joiner,
                )
            ).alias("clean_digest"),
        )
    )
