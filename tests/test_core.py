"""Core smoke tests: session, registry, operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.operators import (
    tumble,
    hop,
    ttl,
    equi_join,
    group_aggregate,
    union_all,
    union_distinct,
)
from dozer_spark.operators.window import interval_ms
from dozer_spark.operators.aggregate import agg_fn


def test_catalog_loads(catalog):
    assert set(catalog.tables) >= {"region", "nation", "orders", "lineitem"}
    assert catalog.pk("lineitem") == ["l_orderkey", "l_linenumber"]
    assert catalog.df("region").count() == 5


def test_interval_parse():
    assert interval_ms("5 MINUTES") == 300_000
    assert interval_ms("1 hour") == 3_600_000
    assert interval_ms("250 milliseconds") == 250


def test_tumble_assigns_single_window(catalog):
    ev = catalog.df("events")
    w = tumble(ev, "ts", "1 HOUR")
    assert w.count() == ev.count()  # tumble never duplicates
    row = w.select("ts", "window_start", "window_end").first()
    assert row.window_start <= row.ts < row.window_end
    assert (row.window_end - row.window_start).total_seconds() == 3600


def test_hop_duplicates_into_overlapping_windows(catalog):
    ev = catalog.df("events")
    w = hop(ev, "ts", "30 MINUTES", "1 HOUR")
    # size/hop = 2 -> every record in exactly 2 windows
    assert w.count() == 2 * ev.count()
    bad = w.filter(
        ~((F.col("window_start") <= F.col("ts")) & (F.col("ts") < F.col("window_end")))
    ).count()
    assert bad == 0


def test_ttl_batch_filters_old_rows(catalog):
    ev = catalog.df("events")
    kept = ttl(ev, "ts", "1 DAY")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    expected = ev.filter(F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 1 DAY")).count()
    assert kept.count() == expected
    assert 0 < kept.count() < ev.count()


def test_equi_join_inner_left(catalog):
    c, o = catalog.df("customer"), catalog.df("orders")
    inner = equi_join(o, c, [("o_custkey", "c_custkey")], "inner")
    left = equi_join(c, o, [("c_custkey", "o_custkey")], "left", broadcast_left=True)
    assert inner.count() == o.count()  # every order has a customer
    assert left.count() >= c.count()


def test_group_aggregate_having(catalog):
    o = catalog.df("orders")
    g = group_aggregate(
        o,
        ["o_orderstatus"],
        [agg_fn("count", F.lit(1)).alias("n"), agg_fn("sum", F.col("o_totalprice")).alias("s")],
        having=F.col("n") > 0,
    )
    rows = {r.o_orderstatus: r.n for r in g.collect()}
    assert sum(rows.values()) == o.count()


def test_min_value_max_value(catalog):
    o = catalog.df("orders")
    g = group_aggregate(
        o,
        ["o_orderstatus"],
        [
            agg_fn("max_value", F.col("o_totalprice"), F.col("o_orderkey")).alias("k_at_max"),
            agg_fn("min_value", F.col("o_totalprice"), F.col("o_orderkey")).alias("k_at_min"),
        ],
    )
    first = g.first()
    assert first.k_at_max != first.k_at_min


def test_union_semantics(catalog):
    n = catalog.df("nation").select(F.col("n_regionkey").alias("k"))
    r = catalog.df("region").select(F.col("r_regionkey").alias("k"))
    assert union_all(n, r).count() == 30
    assert union_distinct(n, r).count() == 5


def test_hop_non_divisible_intervals(catalog):
    """HOP where size is not a multiple of hop: every output window must
    contain its record's ts, and each record lands in floor(size/hop) or
    ceil(size/hop) windows."""
    from dozer_spark.operators import hop

    ev = catalog.df("events").limit(200)
    w = hop(ev, "ts", "20 MINUTES", "50 MINUTES")
    bad = w.filter(
        ~((F.col("window_start") <= F.col("ts")) & (F.col("ts") < F.col("window_end")))
    ).count()
    assert bad == 0
    counts = [r.n for r in w.groupBy("event_id").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert set(counts) <= {2, 3}  # floor(50/20)=2, ceil=3
