"""BM25 compaction A/B (round 12): the append_fresh fast path on a
SECOND index family at corpus scale. StreamingBm25Index's postings
state is the biggest streaming state in the repo (~60 postings/doc);
its ingest epochs are append-only (resend-free runs are all-fresh
windows), so compaction now routes through append_fresh. Protocol:
ingest the corpus in equal epochs with compact_every=2 (compactions
fire INSIDE epochs 3, 5, 7, ...), once with append compaction and once
with the pre-r12 merge path forced, then probe three fixed queries.
Per-epoch walls + probe result equality are the evidence.

Usage: python tools/bm25_compact_ab_run.py [corpus_dir=.scratch/scale10]
           [--epochs 8] [--compact-every 2]
Prints one JSON line per mode for SCALING.md / ARTIFACTS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dozer_spark import get_spark


def run_mode(spark, docs, epochs, compact_every, append, root):
    from dozer_spark.ops.search import StreamingBm25Index

    sd = os.path.join(root, "append" if append else "merge")
    idx = StreamingBm25Index(spark, "text", "doc_id", state_dir=sd)
    for t in (idx._tx_tf, idx._tx_docs):
        t.compact_every = compact_every
        t.append_fresh_compaction = append
    times = []
    for i in range(epochs):
        part = docs.filter(F.pmod(F.xxhash64("doc_id"), epochs) == i)
        t0 = time.perf_counter()
        idx.add_batch(part)
        times.append(round(time.perf_counter() - t0, 2))
    q = spark.createDataFrame(
        [("q1", "fast join query"), ("q2", "table scan filter"),
         ("q3", "window agg group")], ["query_id", "qtext"])
    t0 = time.perf_counter()
    probe = sorted(map(tuple, idx.topn(q, "qtext", "query_id",
                                       topn=10).collect()))
    probe_sec = round(time.perf_counter() - t0, 2)
    return {
        "mode": "append" if append else "merge",
        "epochs": epochs, "compact_every": compact_every,
        "per_epoch_sec": times, "total_ingest_sec": round(sum(times), 2),
        "base_version": idx._tx_tf.tx.version,
        "probe_sec": probe_sec, "probe_rows": len(probe),
    }, probe


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    corpus = args[0] if args else ".scratch/scale10"
    epochs, compact_every = 8, 2
    argv = sys.argv[1:]
    for flag, default in (("--epochs", 8), ("--compact-every", 2)):
        if flag in argv:
            v = int(argv[argv.index(flag) + 1])
            if flag == "--epochs":
                epochs = v
            else:
                compact_every = v
    spark = get_spark("bm25_compact_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.path.join(corpus, "documents.parquet")).persist()
    n = docs.count()
    root = tempfile.mkdtemp(prefix="bm25ab_")
    try:
        rec_a, probe_a = run_mode(spark, docs, epochs, compact_every,
                                  True, root)
        rec_a["corpus"] = corpus
        rec_a["n_docs"] = n
        print(json.dumps(rec_a), flush=True)
        rec_m, probe_m = run_mode(spark, docs, epochs, compact_every,
                                  False, root)
        rec_m["corpus"] = corpus
        rec_m["n_docs"] = n
        print(json.dumps(rec_m), flush=True)
        print(json.dumps({"probe_results_identical": probe_a == probe_m}),
              flush=True)
    finally:
        docs.unpersist()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
