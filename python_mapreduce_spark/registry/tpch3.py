"""Fourth-wave TPC-H-style coverage: the remaining classic
decision-support shapes, adapted to this schema (FIXTURES.md — no
partsupp table, so supply cost derives from lineitem unit prices; no
commitdate/receiptdate, so Q21's lateness becomes returnflag-based).

Reference parity: every one of these is a multi-stage user map/reduce
pipeline in the reference — chained tagged repartition joins with
reduce-side conditional emission (SURVEY.md §2.2; reference
mapper.py:41-73, reducer.py:73-93). Here each is one declarative plan.

Cross-engine determinism: every money aggregate sums in DECIMAL(18,6)
(exact, associative — see functions/scalar.dsum) so comparisons against
per-group minima/maxima/thresholds can't flip with partition order;
min-by selections carry an explicit key tiebreak.

Scale notes (100 TB): dimension joins (supplier/nation/region/part) are
broadcasts; only lineitem⋈orders shuffles on orderkey. The correlated
aggregates (Q2 min cost, Q15 max revenue, Q11 global share) reduce to
dimension-sized or single-row tables before rejoining — broadcast back,
no second fact shuffle. Q21's per-order exists/not-exists is one
conditional aggregation over a single orderkey shuffle, not N² self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_mapreduce_spark.functions.scalar import dround, dsum, sql_dround, sql_dsum
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table


def _dec_ratio(num, den):
    """Deterministic double ratio of two DECIMAL-exact sums."""
    return F.sum(num.cast("decimal(18,6)")).cast("double") / F.sum(
        den.cast("decimal(18,6)")
    ).cast("double")


def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q2 shape: for each qualifying part, the EUROPE supplier with the
    # minimal unit cost — the correlated-min subquery. No partsupp table
    # here, so unit cost = lineitem extendedprice/quantity per
    # (part, supplier). The min-cost pick is a per-part window with a
    # suppkey tiebreak (dedups exact-cost ties deterministically).
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")

    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(_dec_ratio(F.col("l_extendedprice"), F.col("l_quantity")).alias("unit_cost"))
        .join(F.broadcast(eu_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(
                p.filter((F.col("p_size") < 10) & (F.col("p_type") == "STANDARD"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_cost"), F.col("s_suppkey"))
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_name", dround(F.col("unit_cost"), 4).alias("unit_cost")
        )
    )


SQL_Q02 = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), ranked AS (
  SELECT p_partkey, p_name, s_name, unit_cost,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY unit_cost, s_suppkey) AS rn
  FROM cost
  JOIN eu ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey AND p_size < 10 AND p_type = 'STANDARD'
)
SELECT p_partkey, p_name, s_name, {sql_dround('unit_cost', 4)} AS unit_cost
FROM ranked WHERE rn = 1
"""


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q8 shape: NATION_5 suppliers' share of AMERICA customers' revenue
    # per order-year — conditional-sum ratio over a star join. Customer
    # side restricts the orders; supplier side tags the volume.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")

    cust_america = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    sup_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")

    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_america), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(sup_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("supp_nation"),
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return (
        vol.groupBy("o_year")
        .agg(dround(_dec_ratio(target, F.col("volume")), 6).alias("mkt_share"))
    )


SQL_Q08 = f"""
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year,
       {sql_dround("CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)", 6)} AS mkt_share
FROM vol GROUP BY o_year
"""


def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q9 shape: profit by supplier nation and order-year for a part-name
    # slice. No partsupp supplycost -> cost proxy is p_retailprice per
    # unit. Profit stays a 6-decimal-exact product -> DECIMAL sum.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    profit = (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%red%"))),
            li.l_partkey == p.p_partkey,
        )
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(dsum(F.col("amount")).alias("sum_profit"))


SQL_Q09 = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {sql_dsum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
"""


def q11_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q11 shape: groups exceeding a fraction of the GLOBAL total — the
    # uncorrelated scalar subquery in HAVING. Per-part revenue kept when
    # > 0.06% of total revenue (≈1.2× the uniform share). The total is a one-row broadcast; both
    # sides are DECIMAL-exact so the threshold can't flip cross-engine.
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev.cast("decimal(18,6)")).alias("value_dec")
    )
    # Global total as a second agg branch over per_part, broadcast back
    # as a 1-row cross join. Catalyst's ReuseExchange shares the
    # partial-agg shuffle between the branches (plan-asserted in
    # tests/test_sinks_and_plans.py), so the fact is scanned ONCE; unlike the
    # unpartitioned-window form this never funnels the part-sized
    # rollup through a single task.
    total = per_part.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.0006)).alias("__threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("__threshold"))
        .select("l_partkey", dround(F.col("value_dec").cast("double")).alias("value"))
    )


SQL_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value_dec
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, {sql_dround('CAST(value_dec AS DOUBLE)')} AS value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.0006 FROM per_part)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q15 shape: the revenue view + "revenue = (SELECT max(revenue))"
    # scalar equality. DECIMAL-exact revenue makes the equality safe.
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).alias("total_dec")
        )
    )
    # Global max as a second agg branch over rev, broadcast back as a
    # 1-row cross join; ReuseExchange shares the partial-agg shuffle so
    # lineitem is scanned once, and no single task ever sees the whole
    # supplier-sized rollup (the unpartitioned-window alternative does).
    # The explicit isNotNull is a semantic no-op that keeps the two
    # branches byte-identical after pushdown: the supplier join pushes
    # isnotnull(l_suppkey) into the filter branch only, and any scan-
    # filter asymmetry defeats exchange-reuse canonicalization.
    rev = rev.filter(F.col("l_suppkey").isNotNull())
    mx = rev.agg(F.max("total_dec").alias("__max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("__max_dec"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", dround(F.col("total_dec").cast("double")).alias("total_revenue")
        )
    )


SQL_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {sql_dround('CAST(total_dec AS DOUBLE)')} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_dec = (SELECT max(total_dec) FROM rev)
"""


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q16 shape: distinct-supplier counts per part attribute group with a
    # NOT IN exclusion subquery. Excluded list (name suffix '7') is tiny
    # -> broadcast anti join; the count-distinct shuffles once on the
    # part attributes.
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    excluded = s.filter(F.col("s_name").like("%7")).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(p.filter(F.col("p_size").isin(1, 5, 9, 13))),
            li.l_partkey == p.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
"""


def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q20 shape: the nested IN chain — suppliers who shipped > 50 units
    # of some PROMO part during 1997, as semi-join reductions: part
    # filter (broadcast) -> per (supp, part) HAVING -> distinct suppkeys
    # -> semi join supplier. Nothing rejoins the fact table.
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    qualifying = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO").select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


SQL_Q20 = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50)
"""


def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q21 shape (EXISTS + NOT EXISTS over sibling rows): suppliers who,
    # in finished multi-supplier orders, are the ONLY supplier with a
    # returned line. No receipt/commit dates in this schema -> lateness
    # becomes returnflag = 'R'. Expressed as ONE conditional aggregation
    # per (order, supplier) then per order — a single orderkey shuffle —
    # instead of the textbook pair of correlated self-joins, which at
    # 100 TB would shuffle lineitem three times.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    per_os = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returned"))
    )
    # Per-order totals as a WINDOW over the (order, supplier) rollup, not
    # a groupBy + self-join back: Catalyst does not share the per_os
    # subtree between branches, so the join form scans lineitem TWICE.
    # The window keeps one fact scan; its extra exchange moves only
    # order×supplier rows (≪ lineitem).
    w = Window.partitionBy("l_orderkey")
    culprit = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_ret", F.sum("returned").over(w))
        .filter((F.col("returned") == 1) & (F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return culprit.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey).select(
        "s_name", "numwait"
    )


SQL_Q21 = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(returned) AS n_ret
  FROM per_os GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_os
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE per_os.returned = 1 AND n_supp > 1 AND n_ret = 1
GROUP BY s_name
"""


QUERIES: dict[str, Query] = {
    "q02_min_cost_supplier": Query(q02_min_cost_supplier, SQL_Q02, "Q2-style correlated min"),
    "q08_market_share": Query(q08_market_share, SQL_Q08, "Q8-style market-share ratio"),
    "q09_product_profit": Query(q09_product_profit, SQL_Q09, "Q9-style profit rollup"),
    "q11_revenue_share": Query(q11_revenue_share, SQL_Q11, "Q11-style HAVING vs global total"),
    "q15_top_supplier": Query(q15_top_supplier, SQL_Q15, "Q15-style max-revenue view"),
    "q16_supplier_counts": Query(q16_supplier_counts, SQL_Q16, "Q16-style NOT IN + count-distinct"),
    "q20_volume_suppliers": Query(q20_volume_suppliers, SQL_Q20, "Q20-style nested semi-join chain"),
    "q21_sole_returner": Query(q21_sole_returner, SQL_Q21, "Q21-style exists/not-exists"),
}
