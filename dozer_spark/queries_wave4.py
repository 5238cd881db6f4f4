"""Wave 4: subquery-heavy TPC-H shapes. These exercise the decorrelation
surface (correlated scalar subqueries, [NOT] EXISTS, IN over grouped
HAVING) — the SQL a reference user reaches for next after the q1/q3/q5/
q10 shapes already covered. Spark side uses spark.sql over registered
temp views so Catalyst's subquery decorrelation is what's under test;
the DuckDB oracle runs the very same ANSI text.

Scale notes: every subquery here decorrelates to a join/aggregate (check
.explain — no per-row subquery execution); the aggregates are map-side
combinable and the joins are on the same keys the tables would be
bucketed by in a warehouse deployment.
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


Q2_SHAPE = """
SELECT s.s_name, s.s_acctbal, n.n_name, p.p_partkey, p.p_brand, p.p_type
FROM part p
JOIN supplier s ON s.s_suppkey % 100 = p.p_partkey % 100
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_size IN (15, 25, 35)
  AND s.s_acctbal = (
    SELECT MAX(s2.s_acctbal)
    FROM supplier s2
    WHERE s2.s_suppkey % 100 = p.p_partkey % 100
  )
"""


@_q("q2_min_cost_supplier_shape", Q2_SHAPE)
def q2_min_cost_supplier_shape(spark, sf):
    """TPC-H q2 shape: correlated scalar subquery (per-part best
    supplier) — decorrelates to an aggregate + join, not a per-row probe
    (no partsupp table in the corpus; the suppkey%1000 equi-link plays
    its role)."""
    return _sql(spark, sf, Q2_SHAPE)


Q4_SHAPE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@_q("q4_order_priority_exists", Q4_SHAPE)
def q4_order_priority_exists(spark, sf):
    """TPC-H q4: correlated EXISTS -> left-semi join + aggregate."""
    return _sql(spark, sf, Q4_SHAPE)


Q16_SHAPE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT s_suppkey) AS supplier_cnt
FROM part
JOIN supplier ON s_suppkey % 100 = p_partkey % 100
WHERE p_brand <> 'Brand#45'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND s_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


@_q("q16_parts_supplier_not_in", Q16_SHAPE)
def q16_parts_supplier_not_in(spark, sf):
    """TPC-H q16 shape: NOT IN subquery (null-aware anti join) + COUNT
    DISTINCT over a grouped join."""
    return _sql(spark, sf, Q16_SHAPE)


Q18_SHAPE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 200
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@_q("q18_large_volume_in_having", Q18_SHAPE)
def q18_large_volume_in_having(spark, sf):
    """TPC-H q18: IN over a grouped-HAVING subquery -> semi join against
    an aggregate."""
    return _sql(spark, sf, Q18_SHAPE)


Q21_SHAPE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
"""


@_q("q21_waiting_supplier_exists_chain", Q21_SHAPE, headline=True)
def q21_waiting_supplier_exists_chain(spark, sf):
    """TPC-H q21: EXISTS + NOT EXISTS over the same fact table — the
    hardest decorrelation shape in the suite (semi + anti join against
    two differently-filtered self-scans)."""
    return _sql(spark, sf, Q21_SHAPE)


Q22_SHAPE = """
SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(c_acctbal) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey % 10 IN (1, 3, 5, 7)
  AND c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer
    WHERE c_acctbal > 0.00 AND c_nationkey % 10 IN (1, 3, 5, 7)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000
  )
GROUP BY c_nationkey % 10
"""


@_q("q22_global_sales_opportunity", Q22_SHAPE)
def q22_global_sales_opportunity(spark, sf):
    """TPC-H q22 shape (cntrycode from nationkey; corpus has no phone):
    uncorrelated scalar subquery (global AVG threshold,
    broadcast as a literal at runtime) + NOT EXISTS anti join."""
    return _sql(spark, sf, Q22_SHAPE)
