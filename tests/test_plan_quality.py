"""Plan-quality regression tests.

Correctness tests can stay green while a plan silently degrades (lost
pushdown, broadcast turned into sort-merge, pruning gone). These tests
pin the physical-plan properties the scale story depends on, via
explain("formatted") text.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from dozer_spark.queries import registry


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    df = registry()["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed to scan"
    # column pruning: the scan schema must not include unused columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q5_all_dimension_joins_broadcast(spark):
    df = registry()["join_multiway_q5_shape"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, "dimension joins lost broadcast"
    assert "CartesianProduct" not in plan


def test_filter_reaches_scan_for_selection(spark):
    df = registry()["filter_where"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "GreaterThan(l_quantity,30.0)" in plan.replace(" ", "") or "GreaterThan(l_quantity" in plan


def test_tumble_adds_no_shuffle(spark):
    """The window operator itself must not introduce an Exchange — only
    the downstream aggregation may."""
    from dozer_spark.operators import tumble
    from dozer_spark.registry import Catalog

    ev = Catalog.from_testdata(spark, "/root/testdata/sf0.001").df("events")
    plan = _plan(tumble(ev, "ts", "1 HOUR"))
    assert "Exchange" not in plan


def test_partitioned_sink_prunes(spark, tmp_path):
    from dozer_spark.sinks import write_table
    from dozer_spark.registry import Catalog

    o = Catalog.from_testdata(spark, "/root/testdata/sf0.001").df("orders")
    p = str(tmp_path / "by_status")
    write_table(o, p, partition_by=["o_orderstatus"])
    back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_q6_pure_pushdown_scan(spark):
    """q6 is the pushdown benchmark: every predicate reaches the parquet
    scan and the plan has no join."""
    df = registry()["q6_forecast_revenue"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    assert "Join" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema  # pruning holds


def test_q17_correlated_avg_decorrelates(spark):
    """q17's per-part AVG subquery must become one grouped aggregate
    joined back — never a per-row probe, never a cartesian."""
    df = registry()["q17_small_quantity_order"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # the decorrelated AVG + outer SUM


def test_q19_or_of_ands_single_join(spark):
    """q19's OR-of-ANDs must stay ONE join with a residual disjunction
    (three unions would triple the fact scan)."""
    df = registry()["q19_discounted_revenue"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # formatted explain prints each scan twice (tree + detail section):
    # exactly lineitem + part, no union-tripled fact scan
    import re

    scans = set(re.findall(r"\(\d+\) Scan parquet", plan))
    assert len(scans) <= 2, f"fact scan duplicated: {scans}"
    assert "CartesianProduct" not in plan


def test_subquery_shapes_decorrelate(spark):
    """The wave-4 subquery queries must decorrelate: the physical plan
    runs semi/anti/aggregate JOINS, never a per-row subquery, and no
    CartesianProduct appears."""
    for name in ("q4_order_priority_exists", "q21_waiting_supplier_exists_chain",
                 "q22_global_sales_opportunity", "q18_large_volume_in_having"):
        df = registry()[name].build(spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "LeftSemi" in plan or "LeftAnti" in plan or "Join" in plan, name
    # the EXISTS/NOT EXISTS chain specifically becomes semi + anti joins
    p21 = _plan(registry()["q21_waiting_supplier_exists_chain"].build(
        spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in p21 and "LeftAnti" in p21


def test_q11_scalar_threshold_not_correlated(spark):
    """q11's HAVING threshold is a scalar subquery — it must plan as a
    1-row reusable aggregate (a Subquery/broadcast), never a per-group
    re-scan join explosion or a cartesian."""
    df = registry()["q11_important_stock"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # two aggregation pipelines: the per-part value and the global total
    assert plan.count("HashAggregate") >= 2
    # dimension joins stay broadcast (supplier/nation are tiny)
    assert "BroadcastHashJoin" in plan


def test_q13_left_join_keeps_nonkey_predicate_in_join(spark):
    """q13's non-key priority predicate belongs IN the left join (a
    post-join filter would wrongly drop customers with zero matching
    orders); the outer aggregation must stay a hash aggregate."""
    df = registry()["q13_customer_distribution"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "LeftOuter" in plan
    # the priority predicate sits on the orders SIDE (pushed into the
    # scan — safe on the right input of a left join), never as a filter
    # above the join where it would drop zero-order customers
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l
              and "o_orderpriority" in l]
    assert pushed, "priority predicate not pushed to the orders scan"


def test_q15_scalar_max_single_row(spark):
    """q15's MAX(total_revenue) is a scalar subquery over the revenue
    view — the equality must not become a cartesian or a per-row probe."""
    df = registry()["q15_top_supplier"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_embedding_cosine_registry_has_no_cartesian(spark):
    """The registry entry must route through LSH buckets — the r5 weak
    item was an all-pairs crossJoin wired into the public registry."""
    df = registry()["dedup_embedding_cosine"].build(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round9_text_ops_no_cartesian_and_broadcast_joins(spark):
    """The round-9 text/selection operators: no CartesianProduct
    anywhere (the totals cross-joins must plan as broadcast
    nested-loop over 1-row frames) and the census/ratio/idf join-backs
    stay broadcast at test scale."""
    for name in ("text_bigram_logprob", "dsir_importance_weights",
                 "bm25_search_topn", "text_winnow_fingerprints",
                 "decontaminate_bloom"):
        df = registry()[name].build(spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
    # the BM25 idf/query-term joins are broadcast at this scale
    df = registry()["bm25_search_topn"].build(spark, "/root/testdata/sf0.001")
    assert _plan(df).count("BroadcastHashJoin") >= 2


def test_frozen_ann_plans_broadcast_queries_once(spark):
    """Both frozen ANN variants must broadcast the (small) query side
    into the cell join and never cartesian: the corpus is scanned once,
    column-pruned, with top-k pushed as WindowGroupLimit."""
    for name in ("ann_ivf_topk_frozen", "ann_ivf_pq_topk_frozen"):
        df = registry()[name].build(spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "WindowGroupLimit" in plan, name
        import re

        # formatted explain lists each scan twice (tree + detail); the
        # "(N) Scan parquet" detail headers count actual scans
        scans = re.findall(r"\(\d+\) Scan parquet", plan)
        assert len(scans) <= 2, (name, scans)  # corpus + query sides


def test_length_bucketed_batches_no_global_window(spark):
    """The batch manifest must keep both running sums PARTITIONED (no
    single-partition global window) and broadcast the constant-size
    offset table."""
    df = registry()["batch_length_bucketed"].build(
        spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # BOTH running sums stay partitioned: the doc-level window hashes on
    # (__lb, __s) and the offsets window on __lb (its input is the
    # constant-size per-(bucket, sub) aggregate) — no single-partition
    # exchange may appear anywhere, because the only candidate would be
    # a corpus-sized global window, the exact straggler the two-level
    # prefix sum exists to avoid
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__lb" in plan


def test_domain_mixture_single_agg_pass(spark):
    """Domain weights = ONE map-side-combinable agg over the corpus;
    the totals window runs over the n_domains-row result (bounded), so
    the corpus parquet is scanned exactly once."""
    df = registry()["domain_mixture_weights"].build(
        spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, "corpus scanned more than once"
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan
