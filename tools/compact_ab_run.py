"""Isolated compaction A/B (round 12): fold ONE 10M-variant-row
fresh window into a bucketed base of growing size, through (a)
TransactionalTable.append_fresh (one clustering shuffle + one write +
hardlink carry-forward) and (b) merge (touched-bucket rewrite — for a
uniform window, the whole base). The in-epoch walls of
bulk_ingest_profile mix probe/nn/dedup noise into the comparison; this
run times NOTHING but the two compaction shapes on identical state.

The merge side runs on a `cp -al` hardlink clone of the state dir so
both shapes see byte-identical input and the growing base stays
append-built between tiers. Row-count equality of both results is
asserted per tier.

Usage: python tools/compact_ab_run.py [n_names=2000000] [--tiers 4]
Prints one JSON line per tier for SCALING.md / ARTIFACTS.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dozer_spark import get_spark
from tools.wave9_scale_run import SCRATCH, gen_names


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 2_000_000
    tiers = 4
    for a in sys.argv[1:]:
        if a.startswith("--tiers"):
            tiers = int(a.split("=", 1)[1] if "=" in a
                        else sys.argv[sys.argv.index(a) + 1])
    spark = get_spark("compact_ab")
    spark.sparkContext.setLogLevel("ERROR")

    from dozer_spark.ops.fuzzy import deletion_variants
    from dozer_spark.storage import TransactionalTable
    from dozer_spark.streaming.changelog import row_digest

    os.makedirs(SCRATCH, exist_ok=True)
    p = os.path.join(SCRATCH, f"names_{n}.parquet")
    if not os.path.exists(p):
        gen_names(n, p)
    names = spark.read.parquet(p).persist()
    names.count()

    sd = tempfile.mkdtemp(prefix="compab_", dir=SCRATCH)
    base_dir = os.path.join(sd, "base")
    t = TransactionalTable(spark, base_dir, pk=["__fk"], n_buckets=256,
                           bucket_cols=["__k"])
    try:
        for tier in range(tiers):
            batch = (
                names.filter(F.col("id") % tiers == tier)
                .select("id", F.col("name").alias("__str"),
                        F.explode(deletion_variants(F.col("name")))
                        .alias("__k"))
                .withColumn("__fk", row_digest(["__k", "id"]))
            ).persist()
            batch_rows = batch.count()
            base_rows = t.read().count() if t.version > 0 else 0

            # (b) merge on a hardlink clone of the same state
            clone = os.path.join(sd, f"clone_{tier}")
            subprocess.run(["cp", "-al", base_dir, clone], check=True)
            tm = TransactionalTable(spark, clone, pk=["__fk"],
                                    n_buckets=256, bucket_cols=["__k"])
            t0 = time.perf_counter()
            tm.merge(batch)
            merge_sec = round(time.perf_counter() - t0, 2)
            merged_rows = tm.read().count()
            shutil.rmtree(clone, ignore_errors=True)

            # (a) append_fresh on the live state (advances the base)
            t0 = time.perf_counter()
            t.append_fresh(batch)
            append_sec = round(time.perf_counter() - t0, 2)
            appended_rows = t.read().count()

            assert appended_rows == merged_rows == base_rows + batch_rows
            batch.unpersist()
            rec = {
                "tier": tier + 1, "base_rows": base_rows,
                "window_rows": batch_rows,
                "append_fresh_sec": append_sec,
                "merge_sec": merge_sec,
                "rows_after": appended_rows,
            }
            print(json.dumps(rec), flush=True)
    finally:
        names.unpersist()
        shutil.rmtree(sd, ignore_errors=True)


if __name__ == "__main__":
    main()
