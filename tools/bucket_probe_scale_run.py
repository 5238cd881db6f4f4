"""Bucket-pruned state-probe evidence (round-11, r10 verdict task 1):
measure the per-epoch new-vs-old probe cost of StreamingFuzzyIndex in
the TRICKLE regime (a small CDC batch probing a large accumulated
corpus — the serving shape of full-history entity matching) as the
state grows, A/B'd against the pre-round-11 probe shape (full
read_live + sort-merge join) rebuilt inline on the same state.

Protocol per tier: bulk-index the corpus in `stages` equal epochs with
durable state; after EACH stage, (a) time a trickle probe —
process_batch of `trickle` FRESH names — through the production path
(bucket-pruned read + gated batch broadcast), and (b) time the same
probe join built the old way (full-state read, merge-hinted SMJ) as a
plan-only A/B that leaves state untouched. Sub-linear pruned-probe
wall vs state size, against linear-ish full-probe wall, is the claim
under test; pair counts from the bulk epochs double as the
exactly-once regression check (2M tier must emit 31,098 total, the
r9/r10 constant).

Usage: python tools/bucket_probe_scale_run.py [n_names ...] \
           [--stages 4] [--trickle 200]
Prints one JSON line per (tier, stage) for SCALING.md / ARTIFACTS.
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
from tools.wave9_scale_run import SCRATCH, gen_names


def run_tier(spark, n: int, stages: int, trickle: int) -> list[dict]:
    from dozer_spark.ops.fuzzy import deletion_variants
    from dozer_spark.streaming.fuzzy import StreamingFuzzyIndex

    os.makedirs(SCRATCH, exist_ok=True)
    p = os.path.join(SCRATCH, f"names_{n}.parquet")
    if not os.path.exists(p):
        gen_names(n, p)
    names = spark.read.parquet(p).persist()
    names.count()

    out = []
    sd = tempfile.mkdtemp(prefix="bktprobe_", dir=SCRATCH)
    try:
        fz = StreamingFuzzyIndex(spark, "name", "id",
                                 state_dir=os.path.join(sd, "state"))
        pairs_total = 0
        for stage in range(stages):
            batch = names.filter(F.col("id") % stages == stage)
            t0 = time.perf_counter()
            pairs_total += fz.process_batch(batch).count()
            bulk_sec = round(time.perf_counter() - t0, 2)

            # trickle probe ids live OUTSIDE the corpus id space, and
            # the "xq" suffix keeps them >= 2 edits from every corpus
            # name so they never perturb the corpus pair total
            tr = names.filter(F.col("id") % (n // trickle) == 1) \
                .limit(trickle) \
                .select((F.col("id") + n * 10 * (stage + 1)).alias("id"),
                        F.concat(F.col("name"), F.lit("xq")).alias("name"))
            tr = tr.localCheckpoint(eager=True)
            keys_new = tr.select(
                "id", F.col("name").alias("__str"),
                F.explode(deletion_variants(F.col("name"))).alias("__k"),
            ).persist()
            keys_new.count()  # materialize so the broadcast gate sees bytes

            # (a) the round-11 probe join: bucket-pruned state read +
            # broadcast batch side (the exact plan process_batch builds)
            from dozer_spark.operators.hints import maybe_broadcast

            t0 = time.perf_counter()
            bids = fz._tx.touched_bucket_ids(keys_new.select("__k"))
            pruned = fz._tx.read_live_pruned(bids)
            (maybe_broadcast(keys_new, None).alias("a")
             .join(pruned.alias("o"), F.col("a.__k") == F.col("o.__k"))
             .filter(F.col("a.id") != F.col("o.id"))
             .count())
            pruned_sec = round(time.perf_counter() - t0, 2)

            # (b) the pre-round-11 probe shape on the same state: full
            # read_live, merge-hinted SMJ (plan-only A/B, no state write)
            t0 = time.perf_counter()
            old = fz._tx.read_live()
            (keys_new.hint("merge").alias("a")
             .join(old.alias("o"), F.col("a.__k") == F.col("o.__k"))
             .filter(F.col("a.id") != F.col("o.id"))
             .count())
            full_sec = round(time.perf_counter() - t0, 2)

            # (c) end-to-end trickle epoch through the production path
            # (probe + within-batch join + state advance + commit)
            t0 = time.perf_counter()
            fz.process_batch(tr).count()
            epoch_sec = round(time.perf_counter() - t0, 2)

            state_rows = old.count()
            keys_new.unpersist()
            out.append({
                "tier_rows": n, "stage": stage + 1, "stages": stages,
                "bulk_epoch_sec": bulk_sec,
                "state_variant_rows": state_rows,
                "trickle": trickle,
                "pruned_probe_sec": pruned_sec,
                "full_probe_sec": full_sec,
                "trickle_epoch_sec": epoch_sec,
                "buckets_touched": len(bids),
                "n_buckets": fz._tx.tx.n_buckets,
                "pairs_total": pairs_total,
            })
            print(json.dumps(out[-1]), flush=True)
    finally:
        names.unpersist()
        shutil.rmtree(sd, ignore_errors=True)
    return out


def main():
    argv = sys.argv[1:]
    stages, trickle = 4, 20
    if "--stages" in argv:
        i = argv.index("--stages")
        stages = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--trickle" in argv:
        i = argv.index("--trickle")
        trickle = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    tiers = [int(a) for a in argv] or [2_000_000]
    spark = get_spark("bucket_probe_scale_run")
    spark.sparkContext.setLogLevel("ERROR")
    for n in tiers:
        run_tier(spark, n, stages, trickle)


if __name__ == "__main__":
    main()
