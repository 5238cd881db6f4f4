"""Driver-window simulation (round 12): run the FIRST 50 registry
entries — the exact set the driver's CORRECTNESS artifact samples —
through the driver's canonicalization (columns sorted by name, pandas
sort_values over ALL columns, positional value compare) against their
DuckDB oracles at sf0.01. This is stricter than tools/parity_check.py's
repr-canon (which swallowed the r11 array-shape failure): a query that
passes here passes the driver's rows+schema+hash gate.

Usage: python tools/driver_window_sim.py [sf_dir] [window_size]
Prints one line per query + a summary; nonzero exit on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from dozer_spark import get_spark
from dozer_spark.queries import registry

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    return pdf.reset_index(drop=True)


def _eq(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            if not np.array_equal(av, bv, equal_nan=True):
                return False
        else:
            amask, bmask = pd.isna(a[c]), pd.isna(b[c])
            if not (amask.to_numpy() == bmask.to_numpy()).all():
                return False
            if not (a[c][~amask].astype(str).to_numpy()
                    == b[c][~bmask].astype(str).to_numpy()).all():
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("driver_window_sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    entries = list(registry().items())[:window]
    failures = []
    for name, q in entries:
        t0 = time.perf_counter()
        try:
            spdf = _canon(q.build(spark, sf_dir).toPandas())
            opdf = _canon(con.execute(q.oracle).df())
            ok = _eq(spdf, opdf)
            dt = time.perf_counter() - t0
            print(f"{'ok  ' if ok else 'FAIL'} {name}: rows={len(spdf)}/"
                  f"{len(opdf)} cols={list(spdf.columns) == list(opdf.columns)}"
                  f" ({dt:.1f}s)", flush=True)
            if not ok:
                failures.append(name)
        except Exception as e:  # the r11 failure mode: canon crash
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            failures.append(name)
    print(f"TOTAL {len(entries)} window queries, "
          f"{len(entries) - len(failures)} pass, failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
