"""Wave-10 operator scale evidence: run the round-10 corpus-assembly
ops over the generated Zipf corpora (500k and 5M docs — 100x and 1000x
the sf0.1 driver corpus) and print one JSON line per (corpus, op) with
wall time + sanity counts.

Ops measured:
- contamination_share (per-doc dirtiness vs a doc_id%97 eval split)
- length_bucketed_batches (edges [32, 64], 1M-token batches)
- domain_mixture_weights (lang mass shares vs uniform target)
- leakage_safe_split (MinHash pairs -> components -> cluster-granular
  80/10/10; run at the 500k tier — pair generation dominates, and the
  pair pipeline itself is already measured to 5M docs in SCALING.md)

Usage: python tools/wave10_scale_run.py .scratch/scale10 [.scratch/scale100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dozer_spark import get_spark


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 2), out


def run(spark, sf_dir: str, with_split: bool) -> list[dict]:
    from dozer_spark.ops.packing import length_bucketed_batches
    from dozer_spark.ops.sampling import domain_mixture_weights
    from dozer_spark.ops.text import contamination_share, token_count

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).persist()
    n = docs.count()
    out = []

    secs, rows = _timed(lambda: contamination_share(
        docs, "text", "doc_id", F.col("doc_id") % 97 == 0, n=3).count())
    out.append({"corpus": sf_dir, "op": "contamination_share",
                "rows_in": n, "rows_out": rows, "secs": secs})

    secs, rows = _timed(lambda: length_bucketed_batches(
        docs, "doc_id", "text", [32, 64], batch_tokens=1_000_000).count())
    out.append({"corpus": sf_dir, "op": "length_bucketed_batches",
                "rows_in": n, "rows_out": rows, "secs": secs})

    secs, res = _timed(lambda: domain_mixture_weights(
        docs, "lang", size_col=token_count("text")).collect())
    out.append({"corpus": sf_dir, "op": "domain_mixture_weights",
                "rows_in": n, "rows_out": len(res), "secs": secs})

    if with_split:
        from dozer_spark.ops.dedup import minhash_lsh_pairs
        from dozer_spark.ops.sampling import leakage_safe_split

        def split_run():
            pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                                      threshold=0.9)
            s = leakage_safe_split(
                docs, "doc_id", pairs,
                [("train", 0.8), ("valid", 0.1), ("test", 0.1)])
            return s.groupBy("split").count().collect()

        secs, res = _timed(split_run)
        out.append({"corpus": sf_dir, "op": "leakage_safe_split",
                    "rows_in": n,
                    "split_counts": {r["split"]: r["count"] for r in res},
                    "secs": secs})
    docs.unpersist()
    return out


def main():
    dirs = sys.argv[1:] or [".scratch/scale10"]
    spark = get_spark("wave10_scale")
    spark.sparkContext.setLogLevel("ERROR")
    for i, d in enumerate(dirs):
        # full split pipeline only at the first (500k) tier
        for rec in run(spark, d, with_split=(i == 0)):
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
