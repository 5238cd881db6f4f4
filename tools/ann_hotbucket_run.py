"""Measured evidence for the bounded ANN fast paths (round-8 fix of the
r6/r7 standing weak): on the generated clustered embedding corpora,
report (a) the LARGEST unsplit LSH bucket / IVF cell — what a single
applyInPandas task used to materialize — vs (b) the largest
(group, block) after _split_hot_groups, and (c) end-to-end wall time of
lsh_ann_topk_fast / ivf_ann_topk_fast at the derived geometry.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/ann_hotbucket_run.py \
           .scratch/scale10 [.scratch/scale100 ...]
Prints one JSON line per corpus for SCALING.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dozer_spark import get_spark
from dozer_spark.ops.similarity import (
    _hyperplanes,
    _split_hot_groups,
    ivf_ann_topk_fast,
    lsh_ann_topk_fast,
    lsh_bucket,
)

CAP = 65536  # the fast paths' default hot_bucket_cap / hot_cell_cap


def run(spark, sf_dir: str) -> dict:
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e = e.persist()
    n = e.count()
    dim = len(e.select("embedding").first()[0])
    n_planes = min(24, max(8, math.ceil(math.log2(max(n, 128) / 64))))
    planes = _hyperplanes(n_planes, dim)
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        lsh_bucket("embedding", planes).alias("bucket"),
    )
    q = e.filter(F.col("vec_id") % 1000 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        lsh_bucket("embedding", planes).alias("bucket"),
    )
    # (a) what one task USED to get: the hottest bucket
    hot = (c.groupBy("bucket").count()
           .agg(F.max("count").alias("m")).first()["m"])
    # (b) what one task gets now: the hottest (bucket, block)
    c2, _ = _split_hot_groups(c, q, ["bucket"], "neighbor_id", CAP)
    hot_blk = (c2.groupBy("bucket", "__blk").count()
               .agg(F.max("count").alias("m")).first()["m"])

    t0 = time.perf_counter()
    lsh_n = lsh_ann_topk_fast(
        e, e.filter(F.col("vec_id") % 1000 == 0), "embedding", "vec_id",
        k=5).count()
    t_lsh = time.perf_counter() - t0

    t_ivf = ivf_n = None
    if not os.environ.get("SKIP_IVF"):
        t0 = time.perf_counter()
        ivf_n = ivf_ann_topk_fast(
            e, e.filter(F.col("vec_id") % 1000 == 0), "embedding",
            "vec_id", k=5).count()
        t_ivf = round(time.perf_counter() - t0, 2)

    t_pq = pq_n = None
    if not os.environ.get("SKIP_PQ"):
        from dozer_spark.ops.similarity import ivf_pq_ann_topk

        t0 = time.perf_counter()
        pq_n = ivf_pq_ann_topk(
            e, e.filter(F.col("vec_id") % 1000 == 0), "embedding",
            "vec_id", k=5).count()
        t_pq = round(time.perf_counter() - t0, 2)
    e.unpersist()
    return {
        "corpus": sf_dir, "vectors": n, "n_planes": n_planes,
        "cap": CAP, "hottest_bucket_rows": hot,
        "hottest_block_rows": hot_blk,
        "block_bound_ok": hot_blk <= 2 * CAP,
        "lsh_fast_sec": round(t_lsh, 2), "lsh_rows": lsh_n,
        "ivf_fast_sec": t_ivf, "ivf_rows": ivf_n,
        "ivf_pq_sec": t_pq, "ivf_pq_rows": pq_n,
        # compressed-index footprint: m_sub=8 code bytes + 4B cell vs
        # 4B * dim raw floats per vector
        "pq_index_bytes_per_vec": 12, "raw_bytes_per_vec": 4 * dim,
    }


def main():
    spark = get_spark("ann_hotbucket_run")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:]:
        print(json.dumps(run(spark, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
