"""Streaming-family scale evidence (round-8, r6 verdict ask #2): run
the durable-state streaming operators over the generated corpora at the
10x/100x tiers, splitting the corpus into epochs, and record per-epoch
wall time — flat-ish per-epoch cost as the ACCUMULATED state grows is
the scale property that matters (each epoch probes all prior state).

Operators exercised, all with durable DiffStateTable state:
- StreamingMinHashDedup  (documents, threshold 0.9)
- StreamingSimHashDedup  (documents, default geometry)
- StreamingClusters      (fed by the simhash pair stream)
- StreamingAnnIndex      (embeddings; add_batch per epoch + a probe)

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/streaming_scale_run.py \
           .scratch/scale10 [.scratch/scale100] [--epochs 5]
Prints one JSON line per (corpus, operator) for SCALING.md.
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


def _epoch_times(fn, frames):
    times = []
    for part in frames:
        t0 = time.perf_counter()
        fn(part)
        times.append(round(time.perf_counter() - t0, 2))
    return times


def run(spark, sf_dir: str, epochs: int, ops: set | None = None) -> list[dict]:
    from dozer_spark.streaming.dedup import StreamingMinHashDedup

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).persist()
    n_docs = docs.count()
    vecs = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).persist()
    n_vecs = vecs.count()
    doc_parts = [
        docs.filter(F.pmod(F.xxhash64("doc_id"), epochs) == i)
        for i in range(epochs)
    ]
    vec_parts = [
        vecs.filter(F.pmod(F.xxhash64("vec_id"), epochs) == i)
        for i in range(epochs)
    ]
    def want(name: str) -> bool:
        return ops is None or name in ops

    out = []
    root = tempfile.mkdtemp(prefix="stream_scale_")
    try:
        if want("minhash"):
            smh = StreamingMinHashDedup(
                spark, "text", "doc_id", threshold=0.9,
                state_dir=os.path.join(root, "smh"))
            times = _epoch_times(lambda p: smh.process_batch(p).count(),
                                 doc_parts)
            out.append({"corpus": sf_dir, "op": "StreamingMinHashDedup",
                        "rows": n_docs, "epochs": epochs,
                        "per_epoch_sec": times})

        if want("simhash"):
            _run_simhash_clusters(spark, root, doc_parts, sf_dir, n_docs,
                                  epochs, out)
        if want("ann"):
            _run_ann(spark, root, vecs, vec_parts, sf_dir, n_vecs,
                     epochs, out)
        if want("ivf"):
            _run_ivf(spark, root, vecs, vec_parts, sf_dir, n_vecs,
                     epochs, out)
        if want("bm25"):
            _run_bm25(spark, root, doc_parts, sf_dir, n_docs,
                      epochs, out)
    finally:
        docs.unpersist()
        vecs.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return out


def _run_simhash_clusters(spark, root, doc_parts, sf_dir, n_docs,
                          epochs, out):
    from dozer_spark.streaming.dedup import (
        StreamingClusters,
        StreamingSimHashDedup,
    )

    ssh = StreamingSimHashDedup(
        spark, "text", "doc_id", state_dir=os.path.join(root, "ssh"))
    cc = StreamingClusters(spark, state_dir=os.path.join(root, "cc"))
    ssh_times, cc_times = [], []
    for part in doc_parts:
        t0 = time.perf_counter()
        pairs = ssh.process_batch(part)
        pairs = pairs.localCheckpoint(eager=True)
        ssh_times.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        cc.process_batch(pairs).count()
        cc_times.append(round(time.perf_counter() - t0, 2))
    out.append({"corpus": sf_dir, "op": "StreamingSimHashDedup",
                "rows": n_docs, "epochs": epochs,
                "per_epoch_sec": ssh_times})
    out.append({"corpus": sf_dir, "op": "StreamingClusters",
                "rows": n_docs, "epochs": epochs,
                "per_epoch_sec": cc_times})


def _run_ann(spark, root, vecs, vec_parts, sf_dir, n_vecs, epochs, out):
    from dozer_spark.ops.similarity import StreamingAnnIndex

    ann = StreamingAnnIndex(spark, "embedding", "vec_id",
                            n_planes=12,
                            dim=len(vecs.select("embedding")
                                    .first()[0]),
                            state_dir=os.path.join(root, "ann"))
    times = _epoch_times(lambda p: ann.add_batch(p), vec_parts)
    t0 = time.perf_counter()
    probe_n = ann.topk(
        vecs.filter(F.col("vec_id") % 1000 == 0), k=5).count()
    out.append({"corpus": sf_dir, "op": "StreamingAnnIndex",
                "rows": n_vecs, "epochs": epochs,
                "per_epoch_sec": times,
                "probe_sec": round(time.perf_counter() - t0, 2),
                "probe_rows": probe_n})


def _run_ivf(spark, root, vecs, vec_parts, sf_dir, n_vecs, epochs, out):
    """IvfAnnIndex amortization evidence: epoch 1 pays the sample-fit
    (the only super-batch cost in the design), epochs 2..N are
    assignment-only — the per-epoch numbers should DROP after the
    first, unlike a rebuild-per-batch design whose cost would track the
    accumulated corpus."""
    from dozer_spark.ops.similarity import IvfAnnIndex

    ivf = IvfAnnIndex(spark, "embedding", "vec_id",
                      state_dir=os.path.join(root, "ivf"))
    times = _epoch_times(lambda p: ivf.add_batch(p), vec_parts)
    t0 = time.perf_counter()
    probe_n = ivf.topk(
        vecs.filter(F.col("vec_id") % 1000 == 0), k=5, n_probe=4).count()
    out.append({"corpus": sf_dir, "op": "IvfAnnIndex",
                "rows": n_vecs, "epochs": epochs,
                "n_centroids": len(ivf._centroids),
                "per_epoch_sec": times,
                "probe_sec": round(time.perf_counter() - t0, 2),
                "probe_rows": probe_n})


def _run_bm25(spark, root, doc_parts, sf_dir, n_docs, epochs, out):
    """StreamingBm25Index: per-epoch cost should track the BATCH (one
    tf aggregation + one live-postings probe + O(batch) delta append),
    not the accumulated corpus; the probe scores three fixed queries
    against the full accumulated index."""
    from dozer_spark.ops.search import StreamingBm25Index

    idx = StreamingBm25Index(spark, "text", "doc_id",
                             state_dir=os.path.join(root, "bm25"))
    times = _epoch_times(lambda p: idx.add_batch(p), doc_parts)
    q = spark.createDataFrame(
        [("q1", "fast join query"), ("q2", "table scan filter"),
         ("q3", "window agg group")], ["query_id", "qtext"])
    t0 = time.perf_counter()
    probe_n = idx.topn(q, "qtext", "query_id", topn=10).count()
    out.append({"corpus": sf_dir, "op": "StreamingBm25Index",
                "rows": n_docs, "epochs": epochs,
                "per_epoch_sec": times,
                "probe_sec": round(time.perf_counter() - t0, 2),
                "probe_rows": probe_n})


def crash_rewind(spark, sf_dir: str, epochs: int) -> dict:
    """Crash-rewind equivalence at scale: an interrupted run (a FRESH
    StreamingSimHashDedup instance resumed from the durable state_dir
    before EVERY epoch — maximal crash frequency) must emit exactly the
    pair multiset of an uninterrupted run over the same epochs."""
    from dozer_spark.streaming.dedup import StreamingSimHashDedup

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).persist()
    parts = [docs.filter(F.pmod(F.xxhash64("doc_id"), epochs) == i)
             for i in range(epochs)]

    def pairs_of(make):
        got = []
        for i, part in enumerate(parts):
            inst = make()
            got.extend((r["id_a"], r["id_b"], r["hamming"])
                       for r in inst.process_batch(part).collect())
        return sorted(got)

    root = tempfile.mkdtemp(prefix="crash_rewind_")
    try:
        base_dir = os.path.join(root, "base")
        base = StreamingSimHashDedup(spark, "text", "doc_id",
                                     state_dir=base_dir)
        uninterrupted = pairs_of(lambda: base)
        crash_dir = os.path.join(root, "crash")
        crashed = pairs_of(lambda: StreamingSimHashDedup(
            spark, "text", "doc_id", state_dir=crash_dir))
        docs.unpersist()
        return {"corpus": sf_dir, "check": "crash_rewind_simhash",
                "epochs": epochs, "pairs": len(uninterrupted),
                "equal": uninterrupted == crashed}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    argv = sys.argv[1:]
    epochs = 5
    ops = None
    if "--epochs" in argv:
        i = argv.index("--epochs")
        epochs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--ops" in argv:
        i = argv.index("--ops")
        ops = set(argv[i + 1].split(","))  # minhash,simhash,ann,ivf
        argv = argv[:i] + argv[i + 2:]
    do_crash = "--crash-rewind" in argv
    argv = [a for a in argv if a != "--crash-rewind"]
    args = argv
    spark = get_spark("streaming_scale_run")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in args:
        if do_crash:
            print(json.dumps(crash_rewind(spark, sf_dir, epochs)),
                  flush=True)
            continue
        for rec in run(spark, sf_dir, epochs, ops):
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
