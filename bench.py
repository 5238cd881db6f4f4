"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "...", "value": <total_sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed via the noop sink (measures scan+compute+shuffle,
not driver-side collect serialization). A warmup pass initializes the JVM and
fills the file-listing caches so numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dozer_spark import get_spark
from dozer_spark.queries import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("dozer_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    headline = {n: q for n, q in reg.items() if q.headline}

    # warmup: JVM/codegen/file-listing
    run_query(next(iter(headline.values())).build(spark, SF_DIR))

    # Median-of-3 per query AFTER a per-query untimed warmup pass:
    # single-pass numbers on a shared host swing ±25% artifact-to-
    # artifact (adjudicated rounds 5/7/8/9), and a query's FIRST
    # execution pays its own whole-stage-codegen/JIT (measured 19.4s
    # vs 4.6s steady-state for dedup_minhash_lsh at sf0.1), which one
    # global warmup does not cover. The warmup pass absorbs the JIT;
    # the per-query median of the remaining passes is then robust to a
    # one-off GC/IO stall in either direction, unlike min (optimistic)
    # or mean (stall-polluted).
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, q in headline.items():
        # the per-query warmup pass doubles as the COLD single-pass
        # reading (first execution in this JVM: pays whole-stage-
        # codegen/JIT) — recorded alongside the warm median so
        # round-over-round deltas can separate plan changes from JIT
        # effects (r10 verdict task: keep the bench honest)
        t0 = time.perf_counter()
        run_query(q.build(spark, SF_DIR))
        cold[name] = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(n_passes):
            t0 = time.perf_counter()
            run_query(q.build(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "passes": n_passes,
        "agg": "median",
        "warm": True,  # shared JVM; per-query untimed JIT warmup pass
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,  # first-execution pass (JIT included)
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
