"""Wave 5: the remaining classic TPC-H shapes expressible over this
corpus (no partsupp table; lineitem lacks shipmode/commitdate and part
lacks container — shapes substitute equivalent predicates over existing
columns, keeping each query's PLAN STRUCTURE faithful: q6's pure
pushdown scan, q7/q8/q9's multi-join aggregations, q14's conditional
ratio, q17's correlated per-part average, q19's OR-of-ANDs pushdown,
q20's nested semi-join chain).

Spark runs spark.sql over temp views; the DuckDB oracle runs the SAME
ANSI text (wave-4 pattern), so Catalyst's decorrelation/pushdown is what
is under test.

Scale notes: q6/q19 are scan+filter+aggregate — zero shuffle beyond the
final partial-agg exchange, filters reach the parquet scan. q7/q8/q9
join the fact once per dimension with broadcastable dims. q17
decorrelates the per-part AVG into one aggregate + join (no per-row
subquery). q20's IN-chains become semi-joins on supplier/part keys.
Reference parity: these complete the SELECT surface of
dozer-sql/src/planner (same SQL dialect the reference's tests run).
"""

from __future__ import annotations

from dozer_spark.queries import _cat, _q

_TABLES = ("part", "supplier", "nation", "region", "orders", "lineitem",
           "customer")


def _sql(spark, sf, text):
    # view() loads the table and (re)binds its temp view to this sf_dir
    cat = _cat(spark, sf)
    for t in _TABLES:
        cat.view(t)
    return spark.sql(text)


Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@_q("q6_forecast_revenue", Q6)
def q6_forecast_revenue(spark, sf):
    """TPC-H q6: pure pushdown scan — every predicate reaches the
    parquet reader, one map-side-combined aggregate, no join."""
    return _sql(spark, sf, Q6)


Q7 = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@_q("q7_volume_shipping", Q7)
def q7_volume_shipping(spark, sf):
    """TPC-H q7: two-nation flow — fact joined to two broadcastable
    nation lookups through supplier/customer."""
    return _sql(spark, sf, Q7)


Q8 = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) all_nations
GROUP BY o_year
"""


@_q("q8_market_share", Q8, headline=True)
def q8_market_share(spark, sf):
    """TPC-H q8: national market share — conditional-sum ratio over a
    7-table star join (every dimension broadcastable)."""
    return _sql(spark, sf, Q8)


Q9 = """
SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@_q("q9_product_profit", Q9)
def q9_product_profit(spark, sf):
    """TPC-H q9 shape: profit by nation/year (supplycost term stands in
    as a retailprice fraction — no partsupp in the corpus)."""
    return _sql(spark, sf, Q9)


Q12 = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_linestatus
"""


@_q("q12_late_shipment_priority", Q12)
def q12_late_shipment_priority(spark, sf):
    """TPC-H q12 shape: priority-bucketed counts of late shipments
    (shipmode column absent — linestatus plays the grouping role; the
    date-arithmetic join predicate survives)."""
    return _sql(spark, sf, Q12)


Q14 = """
SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


@_q("q14_promo_effect", Q14)
def q14_promo_effect(spark, sf):
    """TPC-H q14: promotion revenue ratio — one broadcast join + a
    conditional-sum ratio."""
    return _sql(spark, sf, Q14)


Q17 = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#9' AND p_size < 20
  AND l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@_q("q17_small_quantity_order", Q17)
def q17_small_quantity_order(spark, sf):
    """TPC-H q17: correlated per-part average — decorrelates to one
    grouped AVG over lineitem joined back on partkey."""
    return _sql(spark, sf, Q17)


Q19 = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


@_q("q19_discounted_revenue", Q19, headline=True)
def q19_discounted_revenue(spark, sf):
    """TPC-H q19: OR-of-ANDs predicate — planner must keep it a single
    join with a residual disjunction, not three unions."""
    return _sql(spark, sf, Q19)


Q20 = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%green%' OR p_name LIKE '%red%'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 100
  )
"""


@_q("q20_excess_stock_suppliers", Q20)
def q20_excess_stock_suppliers(spark, sf):
    """TPC-H q20 shape: nested IN over a grouped HAVING — a semi-join
    against an aggregate, the partsupp availqty check replaced by the
    shipped-quantity threshold the corpus supports."""
    return _sql(spark, sf, Q20)
