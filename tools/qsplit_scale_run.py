"""A/B the two-sided BLAS cogroup bound (r12): a fat serving batch
(200k queries) against the scale10 corpus (200k vectors), with the
query side (a) unsplit — every corpus-block task materializes the
whole query batch in pandas — vs (b) split at qcap=65536. Results must
be bit-identical (per-pair scores are blocking-independent); the
artifact records walls and the per-task row bounds implied by the
plan.

Usage: python tools/qsplit_scale_run.py [out_jsonl]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dozer_spark import get_spark  # noqa: E402
from dozer_spark.ops.similarity import brute_force_topk_fast  # noqa: E402

CORPUS = "/root/repo/.scratch/scale10/embeddings.parquet"
K = 5


def run(out_path: str):
    spark = get_spark("qsplit_scale")
    e = spark.read.parquet(CORPUS)
    n = e.count()
    q = e  # the whole corpus as the serving batch — the fat-query shape
    results = {}
    rows = {}
    for name, qbr in (("unsplit_queries", 1 << 30),
                      ("qcap_65536", None)):
        t0 = time.time()
        out = brute_force_topk_fast(
            e, q, "embedding", "vec_id", k=K, query_block_rows=qbr)
        cnt = out.count()
        wall = round(time.time() - t0, 1)
        results[name] = {"wall_s": wall, "rows": cnt}
        rows[name] = out
        print(json.dumps({name: results[name]}), flush=True)
    t0 = time.time()
    diff = (rows["unsplit_queries"].exceptAll(rows["qcap_65536"]).count()
            + rows["qcap_65536"].exceptAll(rows["unsplit_queries"]).count())
    rec = {
        "corpus_rows": n,
        "query_rows": n,
        "k": K,
        "results": results,
        "bit_identical": diff == 0,
        "diff_rows": diff,
        "compare_wall_s": round(time.time() - t0, 1),
    }
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else
        "/root/repo/ARTIFACTS/qsplit_scale_r12.jsonl")
