"""Measured scale evidence for the wave-9 operators: FastSS fuzzy join,
distributed PCA, and time-series gap-fill, each end-to-end (trigger =
count()) on deterministic synthetic corpora at two tiers.

Corpus shapes mirror the realistic regime the ops target:
- fuzzy: mostly-unique two-word entity names with ~1% planted
  single-edit typo copies -> O(n) true pairs (a heavily-duplicated name
  column would make the OUTPUT quadratic, which no algorithm fixes).
- pca: n x 64 float32 normal vectors (the driver corpus geometry).
- gapfill: n events over 30 days across n/500 users (hourly spine rows
  bounded by users x 720).

Usage: python tools/wave9_scale_run.py [tier ...]   # default: 200000 2000000
Prints one JSON line per tier for SCALING.md / ARTIFACTS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dozer_spark import get_spark
from dozer_spark.ops.embedding import pca_fit, pca_project
from dozer_spark.ops.fuzzy import fuzzy_self_join_dist1
from dozer_spark.ops.timeseries import gap_fill_interpolate

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "wave9")

FIRST = ["ava", "ben", "carla", "dmitri", "elena", "farid", "grace", "hiro",
         "ines", "jonas", "kira", "liam", "maya", "nadia", "omar", "priya",
         "quinn", "rosa", "sven", "tara", "ulrich", "vera", "wen", "xenia",
         "yusuf", "zoe"]
LAST = ["anders", "baptiste", "chen", "duarte", "eriksen", "fofana", "garcia",
        "haddad", "ivanov", "jensen", "kowalski", "lindgren", "moreau",
        "novak", "okafor", "petrov", "quintero", "rossi", "schmidt", "tanaka",
        "ueda", "varga", "weber", "xu", "yamada", "zhang"]
ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def gen_names(n: int, path: str, typo_rate: float = 0.01) -> None:
    rng = np.random.default_rng(42)
    f = rng.integers(0, len(FIRST), n)
    la = rng.integers(0, len(LAST), n)
    suffix = rng.integers(0, 10 * n, n)
    names = [f"{FIRST[f[i]]} {LAST[la[i]]} {suffix[i]}" for i in range(n)]
    # plant ~typo_rate single-edit copies of earlier rows
    n_typos = int(n * typo_rate)
    targets = rng.integers(0, n, n_typos)
    victims = rng.integers(0, n, n_typos)
    for t, v in zip(targets, victims):
        s = names[v]
        pos = int(rng.integers(0, len(s)))
        kind = int(rng.integers(0, 3))
        ch = ALPHABET[int(rng.integers(0, 26))]
        if kind == 0:  # substitute
            names[t] = s[:pos] + ch + s[pos + 1:]
        elif kind == 1:  # delete
            names[t] = s[:pos] + s[pos + 1:]
        else:  # insert
            names[t] = s[:pos] + ch + s[pos:]
    pq.write_table(
        pa.table({"id": pa.array(range(n), pa.int64()),
                  "name": pa.array(names, pa.string())}),
        path, row_group_size=65536,
    )


def gen_vectors(n: int, path: str, dim: int = 64) -> None:
    rng = np.random.default_rng(7)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(list(m), pa.list_(pa.float32()))}),
        path, row_group_size=65536,
    )


def gen_events(n: int, path: str) -> None:
    rng = np.random.default_rng(13)
    users = max(n // 500, 1)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 86400, n).astype("timedelta64[s]").astype(
        "timedelta64[us]")
    pq.write_table(
        pa.table({
            "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2), pa.float64()),
        }),
        path, row_group_size=65536,
    )


def run_tier(spark, n: int) -> dict:
    os.makedirs(SCRATCH, exist_ok=True)
    out = {"tier_rows": n}

    p = os.path.join(SCRATCH, f"names_{n}.parquet")
    if not os.path.exists(p):
        gen_names(n, p)
    names = spark.read.parquet(p)
    t0 = time.perf_counter()
    out["fuzzy_pairs"] = fuzzy_self_join_dist1(names, "id", "name").count()
    out["fuzzy_sec"] = round(time.perf_counter() - t0, 2)

    from pyspark.sql import functions as F

    p = os.path.join(SCRATCH, f"vecs_{n}.parquet")
    if not os.path.exists(p):
        gen_vectors(n, p)
    vecs = spark.read.parquet(p)
    t0 = time.perf_counter()
    model = pca_fit(vecs, "embedding", dim=64, n_components=8)
    out["pca_fit_sec"] = round(time.perf_counter() - t0, 2)
    # checksum over the projection, NOT count(): a bare count lets
    # Catalyst prune the projected column and skip the matmul entirely
    t0 = time.perf_counter()
    row = pca_project(vecs, "embedding", model).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.element_at("pc", 1)).alias("ck"),
    ).first()
    out["pca_project_rows"] = row["n"]
    out["pca_project_sec"] = round(time.perf_counter() - t0, 2)

    p = os.path.join(SCRATCH, f"events_{n}.parquet")
    if not os.path.exists(p):
        gen_events(n, p)
    ev = spark.read.parquet(p)
    t0 = time.perf_counter()
    row = gap_fill_interpolate(ev, "user_id", "ts", "value").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_filled").alias("ck"),
    ).first()
    out["gapfill_rows"] = row["n"]
    out["gapfill_sec"] = round(time.perf_counter() - t0, 2)
    return out


def run_streaming_fuzzy(spark, n: int, epochs: int = 5) -> dict:
    """Per-epoch wall time of StreamingFuzzyIndex as the accumulated
    state grows — each epoch's batch probes ALL prior variants."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dozer_spark.streaming.fuzzy import StreamingFuzzyIndex

    p = os.path.join(SCRATCH, f"names_{n}.parquet")
    if not os.path.exists(p):
        gen_names(n, p)
    names = spark.read.parquet(p).persist()
    names.count()
    sd = tempfile.mkdtemp(prefix="fzscale_", dir=SCRATCH)
    try:
        fz = StreamingFuzzyIndex(spark, "name", "id",
                                 state_dir=os.path.join(sd, "state"))
        times, pairs = [], 0
        for k in range(epochs):
            batch = names.filter(F.col("id") % epochs == k)
            t0 = time.perf_counter()
            pairs += fz.process_batch(batch).count()
            times.append(round(time.perf_counter() - t0, 2))
        return {"tier_rows": n, "op": "streaming_fuzzy",
                "epochs": epochs, "epoch_sec": times, "total_pairs": pairs}
    finally:
        names.unpersist()
        shutil.rmtree(sd, ignore_errors=True)


def run_textops(spark, corpus_dir: str) -> dict:
    """The wave-9 text/profiling ops on a generated documents corpus
    (checksum aggregates throughout — see the count() lesson above)."""
    from pyspark.sql import functions as F

    from dozer_spark.ops.quality import (
        completeness, data_quality_report, in_range, uniqueness,
        value_histogram,
    )
    from dozer_spark.ops.text import (
        ccnet_perplexity_buckets,
        cross_source_dup_matrix,
    )

    d = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    out = {"corpus": corpus_dir, "docs": d.count()}

    t0 = time.perf_counter()
    row = ccnet_perplexity_buckets(d, "text", "doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("bucket").alias("ck")).first()
    out["ccnet_rows"] = row["n"]
    out["ccnet_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rep = data_quality_report(d, [
        completeness("text"), uniqueness("doc_id"),
        in_range("n_chars", 0, 10000, min_value=0.5),
    ]).collect()
    out["quality_constraints"] = len(rep)
    out["quality_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    row = value_histogram(d, "n_chars", 0, 5000, 25).agg(
        F.sum("n").alias("ck")).first()
    out["histogram_rows_bucketed"] = row["ck"]
    out["histogram_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["cross_source_pairs"] = cross_source_dup_matrix(
        d, "text", "source").count()
    out["cross_source_sec"] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    argv = sys.argv[1:]
    streaming = "--streaming" in argv
    argv = [a for a in argv if a != "--streaming"]
    textops_dirs = []
    while "--textops" in argv:
        i = argv.index("--textops")
        textops_dirs.append(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    spark = get_spark("wave9_scale")
    for cd in textops_dirs:
        print(json.dumps(run_textops(spark, cd)), flush=True)
    tiers = [int(a) for a in argv] or ([] if textops_dirs
                                       else [200_000, 2_000_000])
    for n in tiers:
        if streaming:
            print(json.dumps(run_streaming_fuzzy(spark, n)), flush=True)
        else:
            print(json.dumps(run_tier(spark, n)), flush=True)


if __name__ == "__main__":
    main()
