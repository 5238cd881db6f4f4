"""Corpus packing: deterministic global shuffle + token-budget shard
assignment — the "final packing" step of a training-data pipeline
(shuffle documents reproducibly, then cut the stream into shards of
~budget tokens each so every training shard costs the same).

100 TB design: the naive formulation is a single global running sum
(one window over the whole corpus = one task doing a total sort — a
non-starter). Instead this uses the classic two-level prefix sum:

1. every doc gets a deterministic order key ``h = md5(salt || doc_id)``
   and a bucket = (first 16 bits of h) mod n_buckets;
2. within each bucket a window computes the local running sum (buckets
   are hash-balanced, so each is ~corpus/n_buckets — one ordinary
   sort-window task per bucket, all parallel);
3. bucket totals (n_buckets rows — a constant, NOT corpus-sized) get
   their own prefix sum in one trivial task and are broadcast-joined
   back as offsets.

offset(bucket) + local_cumsum == the exact global running sum ordered
by (bucket, h, doc_id), so the result is IDENTICAL to the single-window
formulation (which is what the DuckDB oracle runs) while every
corpus-sized step stays parallel. Reference scope: beyond dozer's
surface — corpus-pipeline family (SURVEY.md §2 extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dozer_spark.ops.text import token_count


def token_shard_assignment(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    n_buckets: int = 16,
    salt: str = "shard",
) -> DataFrame:
    """Assign every document to a token-budgeted output shard.

    Returns (id_col, n_tokens, shard_id) where shard_id =
    floor(start_offset / budget) and start_offset is the number of
    tokens strictly before this doc in the deterministic global order
    (bucket, md5 order key, id). A doc whose tokens straddle a budget
    boundary belongs to the shard its first token lands in — shards are
    contiguous spans of the shuffled stream.

    n_buckets trades parallelism against the (constant-sized) offset
    step; at cluster scale set it to a few × the executor count. The
    result is bit-identical for ANY n_buckets only when the order key
    includes the bucket — which it does, by construction.
    """
    starts = _global_token_offsets(docs, id_col, text_col, n_buckets, salt)
    return starts.select(
        id_col,
        "n_tokens",
        F.floor(F.col("__start") / budget).cast("long").alias("shard_id"),
    )


def _global_token_offsets(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(id, n_tokens, __start): the exact global token offset of each
    doc in the deterministic shuffled order (bucket, md5 key, id), via
    the two-level prefix sum described in the module docstring. Shared
    by shard assignment and chunk-manifest construction."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_buckets).cast(
        "int"
    )
    from dozer_spark.operators.hints import cache_materialized

    # t is consumed twice (per-bucket window + bucket totals); without
    # caching, the full-text scan and tokenization would run twice. The
    # cached projection is slim — (id, count, hash, bucket), no text.
    t = cache_materialized(
        docs.select(
            F.col(id_col),
            token_count(text_col).alias("n_tokens"),
            h.alias("__h"),
            bucket.alias("__b"),
        )
    )

    # (2) per-bucket local running sum — parallel across buckets
    w_local = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__cum", F.sum("n_tokens").over(w_local))

    # (3) bucket offsets: n_buckets rows, one tiny window task, then a
    # broadcast join back (always small — gate not needed: n_buckets is
    # a code constant, not data-dependent)
    w_off = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        t.groupBy("__b")
        .agg(F.sum("n_tokens").alias("__tot"))
        .withColumn("__off", F.sum("__tot").over(w_off) - F.col("__tot"))
        .select("__b", "__off")
    )

    start = F.col("__off") + F.col("__cum") - F.col("n_tokens")
    return local.join(F.broadcast(offsets), "__b").select(
        id_col, "n_tokens", start.alias("__start")
    )


def chunk_assembly_manifest(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_buckets: int = 16,
    salt: str = "shard",
) -> DataFrame:
    """Concat-and-chunk manifest: cut the deterministically shuffled
    token stream into fixed seq_len training sequences and say, for
    every (chunk, document) intersection, which token span of the doc
    lands where in the chunk — the assembly plan a tokenizer-sharding
    job executes to build packed training sequences (docs straddling a
    boundary are split, the standard GPT-style packing; no padding
    except in the final chunk).

    Output: (chunk_id, id, doc_from, doc_to, chunk_pos) with
    [doc_from, doc_to) the doc's token span and chunk_pos its start
    inside the chunk. Invariants: each doc's spans tile [0, n_tokens);
    each chunk's segments tile [0, seq_len) (last chunk may end short).

    Scale shape: the offsets are the same two-level prefix sum as shard
    assignment; the explode emits ceil(n_tokens/seq_len)+1 rows per doc
    at most — output is O(total_tokens / seq_len + n_docs).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    t = _global_token_offsets(docs, id_col, text_col, n_buckets, salt).filter(
        F.col("n_tokens") > 0
    )
    first = F.floor(F.col("__start") / seq_len).cast("long")
    last = F.floor((F.col("__start") + F.col("n_tokens") - 1) / seq_len).cast(
        "long"
    )
    e = t.withColumn("chunk_id", F.explode(F.sequence(first, last)))
    seg_start = F.greatest(F.col("__start"), F.col("chunk_id") * seq_len)
    seg_end = F.least(
        F.col("__start") + F.col("n_tokens"),
        (F.col("chunk_id") + 1) * seq_len,
    )
    return e.select(
        F.col("chunk_id").cast("long").alias("chunk_id"),
        id_col,
        (seg_start - F.col("__start")).cast("long").alias("doc_from"),
        (seg_end - F.col("__start")).cast("long").alias("doc_to"),
        (seg_start - F.col("chunk_id") * seq_len).cast("long")
        .alias("chunk_pos"),
    )


def token_shard_assignment_oracle(
    table: str,
    id_col: str,
    text_col: str,
    budget: int,
    n_buckets: int = 16,
    salt: str = "shard",
) -> str:
    """DuckDB replay: the single-global-window formulation the two-level
    Spark plan is provably equal to. Kept next to the op so the bucket
    arithmetic can never drift from the oracle."""
    return f"""
    WITH t AS (
      SELECT {id_col},
        CAST(len(list_filter(string_split({text_col}, ' '), x -> x <> '')) AS BIGINT)
          AS n_tokens,
        md5('{salt}:' || CAST({id_col} AS VARCHAR)) AS h
      FROM {table}
    ), b AS (
      SELECT *, CAST(CAST('0x' || substr(h, 1, 4) AS BIGINT) % {n_buckets} AS INT)
        AS bucket
      FROM t
    )
    SELECT {id_col}, n_tokens,
      CAST(floor(
        (SUM(n_tokens) OVER (ORDER BY bucket, h, {id_col}
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        / {budget}) AS BIGINT) AS shard_id
    FROM b
    """


def length_bucketed_batches(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bucket_edges: list[int],
    batch_tokens: int,
    n_subbuckets: int = 16,
    salt: str = "batch",
) -> DataFrame:
    """Length-bucketed batch manifest: group documents into LENGTH
    buckets (batching similar lengths together is the standard
    padding-waste fix for non-packed training and inference), then cut
    each bucket's deterministically shuffled stream into batches of
    ~batch_tokens.

    bucket_edges are ascending upper bounds: with edges [16, 64],
    bucket 0 holds n_tokens < 16, bucket 1 holds [16, 64), bucket 2 the
    rest. Output: (id_col, n_tokens, bucket, batch_id) with batch_id
    local to its bucket: floor(start_offset / batch_tokens) over the
    bucket's stream ordered by (SUBBUCKET, md5 key, id) — the hash
    subbucket is the LEADING sort key, so n_subbuckets is part of the
    manifest's identity: changing it reorders the stream and reassigns
    batch ids. Pin n_subbuckets (and salt) when a committed manifest
    must be reproducible; tune parallelism within a pinned value, not
    by changing it.

    Scale shape: the per-bucket running sum would be one task per
    LENGTH bucket (a handful of huge stragglers at corpus scale), so it
    uses the module's two-level prefix sum WITHIN each length bucket:
    hash subbuckets carry parallel local cumsums, per-(bucket,
    subbucket) totals — a constant-size table — prefix-sum in one tiny
    task and broadcast back. Identical output to the single-window
    formulation, which is what the DuckDB oracle runs.
    """
    if sorted(bucket_edges) != list(bucket_edges) or not bucket_edges:
        raise ValueError("bucket_edges must be a non-empty ascending list")
    if batch_tokens < 1:
        raise ValueError("batch_tokens must be >= 1")
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    sub = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
           % n_subbuckets).cast("int")
    bucket = F.lit(len(bucket_edges))
    for i, edge in reversed(list(enumerate(bucket_edges))):
        bucket = F.when(F.col("n_tokens") < edge, F.lit(i)).otherwise(bucket)

    from dozer_spark.operators.hints import cache_materialized

    t = cache_materialized(
        docs.select(
            F.col(id_col),
            token_count(text_col).alias("n_tokens"),
            h.alias("__h"),
            sub.alias("__s"),
        ).withColumn("__lb", bucket)
    )
    w_local = (
        Window.partitionBy("__lb", "__s")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__cum", F.sum("n_tokens").over(w_local))
    w_off = (
        Window.partitionBy("__lb")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        t.groupBy("__lb", "__s")
        .agg(F.sum("n_tokens").alias("__tot"))
        .withColumn("__off", F.sum("__tot").over(w_off) - F.col("__tot"))
        .select("__lb", "__s", "__off")
    )
    start = F.col("__off") + F.col("__cum") - F.col("n_tokens")
    return local.join(F.broadcast(offsets), ["__lb", "__s"]).select(
        id_col,
        "n_tokens",
        F.col("__lb").cast("int").alias("bucket"),
        F.floor(start / batch_tokens).cast("long").alias("batch_id"),
    )
