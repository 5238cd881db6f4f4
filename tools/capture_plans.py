"""Capture .explain("formatted") for headline (or named) queries into
plans/$PLANS_ROUND (default r13)/<query>_<tag>.txt — the judge checks plan claims against
these files (guide §7.2).

Usage: python tools/capture_plans.py <tag> [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dozer_spark import get_spark  # noqa: E402
from dozer_spark.queries import registry  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("PLANS_ROUND", "r13"))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    reg = registry()
    names = [n for n, q in reg.items() if (n in only if only else q.headline)]
    for n in names:
        df = reg[n].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT_DIR, f"{n}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("wrote", n, tag, flush=True)


if __name__ == "__main__":
    main()
