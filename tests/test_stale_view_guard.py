"""Stale-view guard for the lazy catalog (round-13, VERDICT item 3).

Lazily-loaded tables register no temp view; every spark.sql query path
must (re)bind its views via cat.view()/load_all() per build. A path
that forgets the rebind silently reads whatever view a PREVIOUS build
left — possibly a different sf_dir — instead of erroring.

This builds one representative query per rebinding site at sf0.001,
then IMMEDIATELY at sf0.01 in the same session, and checks the sf0.01
output against the DuckDB oracle over sf0.01 (ground truth no stale
view can satisfy: the corpora differ), then re-builds at sf0.001 and
checks it flipped back. Removing any cat.view()/load_all() call from
these sites makes this fail.
"""

from __future__ import annotations

import math
import os

import pytest

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

# one per rebinding site: wave4 _sql, wave5 _sql, wave3 rollup,
# queries_extra UDF view bind, queries_extra dialect load_all
GUARDED = [
    "q2_min_cost_supplier_shape",
    "q6_forecast_revenue",
    "rollup_aggregation",
    "python_udf_roundtrip",
    "dialect_tumble_group",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0.0"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck_b():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_B}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", GUARDED)
def test_sql_view_paths_track_the_sf_dir_just_built(spark, duck_b, name):
    from dozer_spark.queries import registry

    q = registry()[name]

    # poison the session's views with sf0.001 bindings
    small = q.build(spark, SF_A)
    small_rows = _multiset(small.columns, small.collect())

    # the very next build must see sf0.01 data — oracle is ground truth
    big = q.build(spark, SF_B)
    got = _multiset(big.columns, big.collect())
    cur = duck_b.execute(q.oracle)
    want = _multiset([d[0] for d in cur.description], cur.fetchall())
    assert got == want, (
        f"{name} built at {SF_B} does not match the sf0.01 oracle — "
        "a spark.sql path is reading a stale view from the previous build"
    )

    # and flipping back must track again
    small2 = q.build(spark, SF_A)
    assert _multiset(small2.columns, small2.collect()) == small_rows
