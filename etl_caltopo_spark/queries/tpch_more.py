"""Additional TPC-H-shaped queries (Q4/Q10/Q12/Q14 analogs) through
the SQL front-end.  Sum discipline: revenue expressions are on the
1e-4 grid (2dp price × 2dp discount), so round(sum, 4) recovers the
exact decimal in both engines; ratios of recovered sums are
bit-identical doubles and need no further rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], text: str) -> DataFrame:
    apply_runtime_conf(spark)
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(text)


_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@query("q_sql_tpch_q4", oracle=_Q4)
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered priority counts (de-correlates
    to a semi-join)."""
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q4)


_Q10 = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query("q_sql_tpch_q10", oracle=_Q10, headline=True)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    return _sql(spark, sf_dir, ("customer", "orders", "lineitem", "nation"), _Q10)


_Q12 = """
SELECT l.l_returnflag AS shipgroup,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@query("q_sql_tpch_q12", oracle=_Q12)
def q_sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-bucketed line counts per ship group."""
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q12)


_Q14 = """
SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END), 4) * 100.0
       / round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
"""


@query("q_sql_tpch_q14", oracle=_Q14)
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — a ratio of two
    exactly-recovered grid sums (bit-identical across engines)."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q14)


_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@query("q_sql_tpch_q7", oracle=_Q7)
def q_sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume (nation joined
    twice under different roles)."""
    return _sql(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"), _Q7
    )


_Q15 = """
WITH revenue AS (
    SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
"""


@query("q_sql_tpch_q15", oracle=_Q15)
def q_sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue (CTE + scalar
    subquery over the same CTE; exact grid sums make the max stable)."""
    return _sql(spark, sf_dir, ("supplier", "lineitem"), _Q15)


_Q18 = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       round(o.o_totalprice, 2) AS total,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
HAVING sum(l.l_quantity) > 150
"""


@query("q_sql_tpch_q18", oracle=_Q18)
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (HAVING over a grid sum —
    quantities are integral so the threshold cannot sit on an error
    boundary)."""
    return _sql(spark, sf_dir, ("customer", "orders", "lineitem"), _Q18)


_Q19 = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'BRAND0' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'BRAND1' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 40)
"""


@query("q_sql_tpch_q19", oracle=_Q19)
def q_sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicates across
    the join (Catalyst splits the common join key out of the OR)."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q19)


_Q22 = """
SELECT substring(c_name, 10, 2) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT round(sum(c_acctbal), 2) / count(*) FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY substring(c_name, 10, 2)
"""


@query("q_sql_tpch_q22", oracle=_Q22)
def q_sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders
    (scalar subquery + anti join; the mean is an exact-grid
    round(sum)/count so the boundary is engine-stable)."""
    return _sql(spark, sf_dir, ("customer", "orders"), _Q22)
