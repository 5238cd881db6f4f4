"""Profile DRIVER-side plan-construction time (q.build wall clock) for
named queries — the metric the single-SQL-template rewrites target
(guide §7.3: single-threaded driver work). No action is executed; this
times only what the driver does before any job starts.

Usage: python tools/build_profile_ab.py [sf_dir] query [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dozer_spark import get_spark  # noqa: E402
from dozer_spark.queries import registry  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    spark = get_spark("build_profile_ab")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for n in names:
        # warm-up build absorbs first-touch catalog/py4j costs
        reg[n].build(spark, sf_dir)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            reg[n].build(spark, sf_dir)
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{n}: median build {times[2]:.3f}s (min {times[0]:.3f}, "
              f"max {times[-1]:.3f})", flush=True)


if __name__ == "__main__":
    main()
