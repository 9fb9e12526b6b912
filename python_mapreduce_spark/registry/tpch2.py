"""Third-wave TPC-H-style coverage: the classic decision-support shapes
not yet exercised — outer-join count distributions (Q13), correlated
scalar subqueries (Q17), HAVING + IN-subquery (Q18), disjunctive
multi-column predicates (Q19), and anti-join + uncorrelated scalar
subquery (Q22) — adapted to this schema (FIXTURES.md; no
commitdate/receiptdate/shipmode/phone columns).

Reference parity: all of these are user map/reduce programs in the
reference — tagged repartition joins plus reduce-side conditional logic
(SURVEY.md §2.2 join/aggregation patterns, reference mapper.py:41-73,
reducer.py:73-93). Here each is one declarative plan: Catalyst picks
broadcast vs shuffle joins, pushes the disjunctive predicates to the
parquet scan, and rewrites the subqueries into joins.

Scale notes: Q13's left join shuffles on custkey (both sides large at
100 TB — sort-merge is right); Q17/Q22's scalar aggregates are one-row
broadcasts; Q18's HAVING filter is a pre-join reduction so only
qualifying orderkeys reach the 3-way join; Q19's OR-of-ANDs predicate
stays scan-side (row-group pruning on p_size/l_quantity min-max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, dsum, sql_dround, sql_dsum
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table


def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q13: distribution of orders-per-customer INCLUDING zero-order
    # customers — the left outer join + count(col) null-skipping pattern.
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_Q13 = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q17: revenue impact of small-quantity orders for one brand — the
    # correlated scalar subquery (per-part avg) expressed as a pre-agg
    # joined back; Catalyst performs the same de-correlation on the SQL
    # form. The per-part limit table is tiny relative to lineitem at any
    # scale -> broadcast.
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    qlim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("q_limit")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(qlim), "l_partkey")
        .filter(F.col("l_quantity") < F.col("q_limit"))
        .agg(dround(dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


SQL_Q17 = f"""
SELECT {sql_dround(sql_dsum('l_extendedprice') + ' / 7.0')} AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q18: orders whose total quantity exceeds a threshold, with their
    # customer — GROUP BY + HAVING feeding an IN-subquery, done as a
    # pre-aggregated reduction joined into the 3-way join so only
    # qualifying orderkeys ever shuffle.
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180.0)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            dround("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


SQL_Q18 = f"""
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {sql_dround('o_totalprice')} AS totalprice,
       total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180.0) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q19: OR-of-ANDs predicate spanning both join sides — the shape that
    # tests predicate normalization/pushdown (each conjunct's part-side
    # and lineitem-side halves are pushed to their scans as
    # row-group-prunable range filters).
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_Q19 = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q22: above-average-balance customers who never placed an urgent
    # order — uncorrelated scalar subquery (global avg, a one-row
    # broadcast cross join) + filtered anti join, aggregated per market
    # segment. (Adaptation: in this dataset every customer has orders,
    # so the anti-join side is restricted to urgent ones to keep the
    # predicate discriminating.)
    c = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


SQL_Q22 = f"""
SELECT c_mktsegment, count(*) AS numcust, {sql_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


QUERIES: dict[str, Query] = {
    "q13_order_count_dist": Query(
        q13_order_count_dist, SQL_Q13, "orders-per-customer distribution (outer join + count)"
    ),
    "q17_small_quantity_revenue": Query(
        q17_small_quantity_revenue, SQL_Q17, "correlated scalar subquery as pre-agg join"
    ),
    "q18_large_volume_orders": Query(
        q18_large_volume_orders, SQL_Q18, "HAVING + IN-subquery as pre-join reduction"
    ),
    "q19_disjunctive_revenue": Query(
        q19_disjunctive_revenue, SQL_Q19, "OR-of-ANDs predicate pushdown"
    ),
    "q22_dormant_customers": Query(
        q22_dormant_customers, SQL_Q22, "anti join + scalar subquery"
    ),
}
