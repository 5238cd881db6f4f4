"""Wave 6: the last three classic TPC-H shapes — q11, q13, q15 — which
completes all 22 TPC-H query structures in the registry (the corpus has
no partsupp table and orders lacks o_comment, so q11 prices parts from
shipped lineitems and q13's comment filter becomes a priority filter;
each query's PLAN STRUCTURE is faithful: q11's HAVING against a scalar
subquery that re-aggregates the same join, q13's left outer join with a
non-key join predicate feeding a double aggregation, q15's view reused
by both the join and the scalar MAX).

Spark runs spark.sql over temp views; the DuckDB oracle runs the SAME
ANSI text, so Catalyst's planning of these shapes is what is under test.

Scale notes: q11 aggregates the fact once per branch with broadcastable
supplier/nation dims — the scalar subquery is a 1-row broadcast, not a
per-row correlation. q13's left join shuffles on the customer key once;
the second aggregation is over one row per customer (tiny). q15's
revenue view is a single partial-aggregated shuffle; the MAX is a 1-row
reduction broadcast back. Reference parity: completes the SELECT
surface of dozer-sql/src/planner (same dialect the reference tests run,
dozer-sql/src/tests).
"""

from __future__ import annotations

from dozer_spark.queries import _q
from dozer_spark.queries_wave5 import _sql

Q11 = """
SELECT l_partkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS part_value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_3'
GROUP BY l_partkey
HAVING SUM(l_extendedprice * (1 - l_discount)) > (
  SELECT 0.0015 * SUM(l_extendedprice * (1 - l_discount))
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
)
"""


@_q("q11_important_stock", Q11)
def q11_important_stock(spark, sf):
    """TPC-H q11 shape: per-part value with a HAVING threshold that is a
    scalar subquery re-aggregating the same nation-filtered join (the
    partsupp value stands in as shipped lineitem revenue)."""
    return _sql(spark, sf, Q11)


Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@_q("q13_customer_distribution", Q13)
def q13_customer_distribution(spark, sf):
    """TPC-H q13: order-count histogram — LEFT OUTER join whose join
    condition carries a non-key predicate (priority filter standing in
    for the o_comment NOT LIKE), then a COUNT-of-COUNTs."""
    return _sql(spark, sf, Q13)


Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@_q("q15_top_supplier", Q15)
def q15_top_supplier(spark, sf):
    """TPC-H q15: top supplier — a revenue view consumed twice (once by
    the supplier join, once by the scalar MAX); revenue is rounded to
    cents inside the view so the equality predicate is exact and
    engine-independent."""
    return _sql(spark, sf, Q15)
