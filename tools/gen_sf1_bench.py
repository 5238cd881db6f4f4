"""Generate a full 10x ("sf1") bench directory — ALL ten tables — so
bench.py can produce a reading where the 8-vs-32-core scaling block is
informative (at sf0.1 the corpus is ~17 MB and every headline query is
driver/overhead-bound; PERF_r12 scaling ratios ~1 say cores no longer
matter there).

documents/embeddings come from tools/gen_scale_corpus.py (10k-word
Zipf vocabulary + PLANTED 2%/0.2% near/exact dups — the O(n)-true-pairs
regime real corpora have; the driver corpus's 31-word vocabulary makes
near-dup output Theta(n^2), which at 10x would measure pair EMISSION,
not the algorithms). The eight relational tables replicate sf0.1 rows
10x with per-replica key offsets: primary and foreign keys stay
consistent within a replica (replica i's orders reference replica i's
customers, lineitems reference replica i's orders/parts/suppliers,
events keep their timestamps but use replica-offset user/event ids),
so join selectivities and per-key group sizes match sf0.1 while table
sizes are 10x. region/nation are fixed dimensions and copy unchanged.

Usage: python tools/gen_sf1_bench.py [out_dir] [multiplier]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_CPUS=N python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_scale_corpus import gen_documents, gen_embeddings  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-replica offset bases (the sf0.1 key ranges are dense 0..n-1;
# round up so offsets stay readable in explain output)
OFFS = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "event_id": 100_000,
    "user_id": 1_500,
}

# table -> (key columns to offset, passthrough columns)
PLAN = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
}


def replicate(con, table: str, out_dir: str, mult: int) -> int:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    remap = PLAN[table]
    selects = []
    for i in range(mult):
        exprs = []
        for c in cols:
            if c in remap:
                exprs.append(f"{c} + {i * OFFS[remap[c]]} AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'"
        )
    union = " UNION ALL ".join(selects)
    con.execute(
        f"COPY ({union}) TO '{out_dir}/{table}.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
    )
    return con.execute(
        f"SELECT count(*) FROM '{out_dir}/{table}.parquet'").fetchone()[0]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1_bench")
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t in PLAN:
        n = replicate(con, t, out_dir, mult)
        print(f"{t}: {n} rows")
    rng = np.random.RandomState(42)
    nd = gen_documents(out_dir, 5000 * mult, rng)
    nv = gen_embeddings(out_dir, 2000 * mult, rng)
    print(f"documents: {nd} rows\nembeddings: {nv} rows\n-> {out_dir}")


if __name__ == "__main__":
    main()
