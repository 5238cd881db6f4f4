"""Measured scale evidence for the round-9 text/selection operators:
bigram LM scoring, DSIR importance weights, BM25 retrieval, and
Bloom-prefiltered decontamination, each end-to-end (trigger = count())
on the generated Zipf corpora.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/textops_scale_run.py \
           .scratch/scale10 [.scratch/scale100 ...]
Prints one JSON line per corpus for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dozer_spark import get_spark
from dozer_spark.ops.sampling import dsir_log_weights
from dozer_spark.ops.search import bm25_topn
from dozer_spark.ops.text import bigram_logprob, eval_ngram_overlap


def run(spark, sf_dir: str) -> dict:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = d.count()
    out = {"corpus": sf_dir, "docs": n}

    t0 = time.perf_counter()
    out["bigram_logprob_rows"] = bigram_logprob(d, "text", "doc_id").count()
    out["bigram_logprob_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["dsir_weights_rows"] = dsir_log_weights(
        d, "text", "doc_id", F.col("doc_id") % 97 == 0).count()
    out["dsir_weights_sec"] = round(time.perf_counter() - t0, 2)

    q = spark.createDataFrame(
        [("q1", "fast join query"), ("q2", "table scan filter"),
         ("q3", "window agg group")], ["query_id", "qtext"])
    t0 = time.perf_counter()
    out["bm25_rows"] = bm25_topn(
        d, "text", "doc_id", q, "qtext", "query_id", topn=10).count()
    out["bm25_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["decon_bloom_rows"] = eval_ngram_overlap(
        d, "text", "doc_id", F.col("doc_id") % 97 == 0, n=3,
        bloom_fpp=0.01).count()
    out["decon_bloom_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["decon_exact_rows"] = eval_ngram_overlap(
        d, "text", "doc_id", F.col("doc_id") % 97 == 0, n=3).count()
    out["decon_exact_sec"] = round(time.perf_counter() - t0, 2)

    from dozer_spark.ops.text import winnow_fingerprint_score

    t0 = time.perf_counter()
    out["winnow_rows"] = winnow_fingerprint_score(
        d, "text", "doc_id", k=5, w=4).count()
    out["winnow_sec"] = round(time.perf_counter() - t0, 2)

    from dozer_spark.queries import registry as _registry

    t0 = time.perf_counter()
    out["dataset_card_rows"] = _registry()["corpus_dataset_card"].build(
        spark, sf_dir).count()
    out["dataset_card_sec"] = round(time.perf_counter() - t0, 2)
    return out


def run_decon_ab(spark, sf_dir: str) -> dict:
    """The Bloom win-regime A/B: disable every broadcast (our gate AND
    Spark's auto threshold) so the exact path's eval-gram join degrades
    to a corpus-sized shuffle — the regime a too-big-to-broadcast eval
    set puts a real cluster in — and measure exact vs bloom-prefiltered
    decontamination. The bloom bitmap still broadcasts (it is a Python
    broadcast variable, not a join side), which is the entire point."""
    from dozer_spark.operators import hints

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {"corpus": sf_dir, "mode": "no_broadcast_ab", "docs": d.count()}
    prev_gate = hints.BROADCAST_GATE_BYTES
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        hints.BROADCAST_GATE_BYTES = 0
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        t0 = time.perf_counter()
        out["decon_exact_rows"] = eval_ngram_overlap(
            d, "text", "doc_id", F.col("doc_id") % 97 == 0, n=3).count()
        out["decon_exact_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        out["decon_bloom_rows"] = eval_ngram_overlap(
            d, "text", "doc_id", F.col("doc_id") % 97 == 0, n=3,
            bloom_fpp=0.01).count()
        out["decon_bloom_sec"] = round(time.perf_counter() - t0, 2)
    finally:
        hints.BROADCAST_GATE_BYTES = prev_gate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    return out


def run_winnow_card(spark, sf_dir: str) -> dict:
    """Measure only the winnowing report and the dataset card (added
    after the main sweep — keeps re-measurement incremental)."""
    from dozer_spark.ops.text import winnow_fingerprint_score
    from dozer_spark.queries import registry as _registry

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {"corpus": sf_dir, "mode": "winnow_card", "docs": d.count()}
    t0 = time.perf_counter()
    out["winnow_rows"] = winnow_fingerprint_score(
        d, "text", "doc_id", k=5, w=4).count()
    out["winnow_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["dataset_card_rows"] = _registry()["corpus_dataset_card"].build(
        spark, sf_dir).count()
    out["dataset_card_sec"] = round(time.perf_counter() - t0, 2)
    return out


def main():
    spark = get_spark("textops_scale_run")
    spark.sparkContext.setLogLevel("ERROR")
    ab = "--decon-ab" in sys.argv
    wc = "--winnow-card" in sys.argv
    for sf_dir in [a for a in sys.argv[1:] if not a.startswith("--")]:
        if ab:
            print(json.dumps(run_decon_ab(spark, sf_dir)), flush=True)
        elif wc:
            print(json.dumps(run_winnow_card(spark, sf_dir)), flush=True)
        else:
            print(json.dumps(run(spark, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
