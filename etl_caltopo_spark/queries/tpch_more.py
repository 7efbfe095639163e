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
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
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


# --- remaining TPC-H shapes, adapted to the synthetic schema ---------------
# The driver tables have no partsupp and no commit/receipt dates
# (TESTDATA.md), so Q2/Q11/Q16/Q20 use lineitem as the part<->supplier
# link and Q21 rebuilds the "one bad supplier in a multi-supplier
# order" shape on l_returnflag.  Each keeps the defining plan feature
# of its original (correlated scalar min, market-share ratio, profit
# rollup, HAVING vs global scalar, outer-join histogram, NOT IN +
# count-distinct, correlated avg threshold, nested IN chain,
# EXISTS/NOT-EXISTS pair).

_Q2 = """
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
       round(l.l_extendedprice, 2) AS best_price
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE' AND p.p_size = 25
  AND l.l_extendedprice = (
      SELECT min(l2.l_extendedprice)
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
"""


@query("q_sql_tpch_q2", oracle=_Q2)
def q_sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional offer per part.  The oracle
    states it as a correlated scalar-min subquery; the Spark plan
    replaces the decorrelated double-pass (aggregate + rejoin over the
    same join tree) with a single pass: broadcast the filtered
    dimensions onto one lineitem scan, then a min() window over
    l_partkey — one shuffle total, half the fact-table I/O.  Safe
    because the per-part min over EUROPE offers is unaffected by the
    p_size semi-filter on which parts are kept."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    nat_eu = nat.join(
        F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
        nat["n_regionkey"] == reg["r_regionkey"],
    ).select("n_nationkey", "n_name")
    supp_eu = supp.join(
        F.broadcast(nat_eu), supp["s_nationkey"] == nat_eu["n_nationkey"]
    ).select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    parts25 = part.filter(F.col("p_size") == 25).select("p_partkey", "p_name")

    offers = li.join(
        F.broadcast(supp_eu), li["l_suppkey"] == supp_eu["s_suppkey"]
    ).join(F.broadcast(parts25), li["l_partkey"] == parts25["p_partkey"])
    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("_minp", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_minp"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "nation",
            F.round(F.col("l_extendedprice"), 2).alias("best_price"),
        )
    )


_Q8 = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END), 4)
       / round(sum(volume), 4) AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n2.n_name AS nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) allnations
GROUP BY o_year
"""


@query("q_sql_tpch_q8", oracle=_Q8)
def q_sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — an 8-table join whose
    share is a ratio of two exactly-recovered grid sums."""
    return _sql(
        spark,
        sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
        _Q8,
    )


_Q9 = """
SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
FROM (
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity
           AS amount
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@query("q_sql_tpch_q9", oracle=_Q9, headline=True)
def q_sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by nation and year (cost
    term uses p_retailprice*l_quantity since partsupp is absent; both
    terms sit on the 1e-4 grid so round(sum,4) is exact)."""
    return _sql(
        spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation"), _Q9
    )


_Q11 = """
SELECT l.l_partkey, round(sum(l.l_extendedprice * l.l_quantity), 2) AS value
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY l.l_partkey
HAVING round(sum(l.l_extendedprice * l.l_quantity), 2) > (
    SELECT round(sum(l2.l_extendedprice * l2.l_quantity), 2) * 0.001
    FROM lineitem l2
    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    WHERE n2.n_name = 'NATION_3')
"""


@query("q_sql_tpch_q11", oracle=_Q11)
def q_sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock per part vs a global scalar
    threshold (HAVING against an uncorrelated subquery; both sides
    compare exactly-recovered 2-dp grid sums so the boundary is
    engine-stable)."""
    return _sql(spark, sf_dir, ("lineitem", "supplier", "nation"), _Q11)


_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query("q_sql_tpch_q13", oracle=_Q13)
def q_sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution (left outer
    join with an extra ON predicate, then a histogram over the
    grouped counts)."""
    return _sql(spark, sf_dir, ("customer", "orders"), _Q13)


_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("q_sql_tpch_q16", oracle=_Q16)
def q_sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier diversity per part class (NOT IN
    anti-subquery + COUNT(DISTINCT) — the distinct forces a second
    shuffle keyed on the group)."""
    return _sql(spark, sf_dir, ("lineitem", "part", "supplier"), _Q16)


_Q17 = """
SELECT round(sum(l.l_extendedprice), 2) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
  AND l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey)
"""


@query("q_sql_tpch_q17", oracle=_Q17)
def q_sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity revenue vs a per-part
    correlated average (quantities are integral so the avg is a
    single exact division and the < boundary is engine-stable; the
    final division of an exact grid sum needs no outer round)."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q17)


_Q20 = """
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_regionkey = 2
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 50)
"""


@query("q_sql_tpch_q20", oracle=_Q20)
def q_sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with excess shipped volume of a part
    class (nested IN chain -> two stacked semi-joins; quantity sums
    are exact integers)."""
    return _sql(spark, sf_dir, ("supplier", "nation", "lineitem", "part"), _Q20)


_Q21 = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n.n_regionkey = 1
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
"""


@query("q_sql_tpch_q21", oracle=_Q21)
def q_sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole at-fault supplier in multi-supplier
    orders (EXISTS + NOT EXISTS pair on the same fact table; the
    'kept waiting' flag is rebuilt on l_returnflag since the
    synthetic schema has no commit/receipt dates).

    Deliberately left declarative: a hand-rolled one-pass rewrite
    (per-order supplier counts via two-level aggregation) measured
    2.45 s vs 1.91 s for this form at sf0.1, because AQE broadcasts
    the decorrelated semi/anti build sides and lineitem stays
    map-only.  At cluster scale the planner will pick shuffled semi
    joins from the same plan — adapting per scale is exactly what the
    declarative form buys."""
    return _sql(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"), _Q21)
