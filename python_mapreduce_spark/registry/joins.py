"""Join queries: equi / broadcast / semi / anti / outer / theta / range /
as-of, plus multiway TPC-H-style showcases.

Reference coverage: all joins are user patterns, not operators — the
reduce-side repartition join (tag both inputs, pair in reduce), the
aux-data broadcast probe (mapper.py:150-157), and nothing at all for
non-equi (SURVEY.md §2.2). Every query here is a named operator from
operators/joins.py running through Catalyst's join selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, dsum, sql_dround, sql_dsum
from python_mapreduce_spark.operators.joins import (
    asof_join,
    broadcast_join,
    equi_join,
    range_join,
    theta_join,
)
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q_join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    return (
        equi_join(li, o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_JOIN_EQUI = f"""
SELECT o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Star-schema probe: fact stays in place, dims broadcast — zero
    # shuffle of lineitem before the aggregate (the aux-data pattern,
    # reference mapper.py:150-157, minus the manual dict plumbing).
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        broadcast_join(
            broadcast_join(
                broadcast_join(li, s, li.l_suppkey == s.s_suppkey),
                n,
                F.col("s_nationkey") == n.n_nationkey,
            ),
            r,
            F.col("n_regionkey") == r.r_regionkey,
        )
        .groupBy("r_name", "n_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )


SQL_JOIN_BROADCAST = f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        equi_join(c, o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_JOIN_SEMI = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        equi_join(c, o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_JOIN_ANTI = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        equi_join(c, o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("sum_total"),
        )
    )


SQL_JOIN_OUTER = f"""
SELECT c_custkey, c_mktsegment,
       count(o_orderkey) AS n_orders,
       {sql_dround('coalesce(sum(o_totalprice), 0.0)')} AS sum_total
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, p = table(spark, sf_dir, "supplier"), table(spark, sf_dir, "part")
    cond = (p.p_retailprice >= s.s_acctbal * 0.1) & (p.p_retailprice <= s.s_acctbal * 0.3)
    return theta_join(p, s, cond).groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dround(F.avg("p_retailprice")).alias("avg_price"),
    )


SQL_JOIN_THETA = f"""
SELECT s_suppkey, count(*) AS n_parts, {sql_dround('avg(p_retailprice)')} AS avg_price
FROM part JOIN supplier
  ON p_retailprice BETWEEN s_acctbal * 0.1 AND s_acctbal * 0.3
GROUP BY s_suppkey
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1000.0, "high")],
        "lo double, hi double, tier string",
    )
    return range_join(e, tiers, "value", "lo", "hi").groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(F.sum("value")).alias("sum_value"),
    )


SQL_JOIN_RANGE = f"""
SELECT tier, count(*) AS n_events, {sql_dround('sum(value)')} AS sum_value
FROM events
JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 200.0, 'mid'), (200.0, 1000.0, 'high'))
     AS tiers(lo, hi, tier)
  ON value >= lo AND value < hi
GROUP BY tier
"""


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit skew-salted join (operators/joins.py::salted_join): the
    # fact side's key gets a deterministic salt, the dimension side is
    # replicated across all salt values, so one hot key spreads over 8
    # tasks. The oracle is the PLAIN join — salting must not change the
    # answer. (AQE skew-split is the first-choice mechanism; this is the
    # pinned-layout variant.)
    from python_mapreduce_spark.operators.joins import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey", salt_buckets=8
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        dround(F.sum("l_quantity")).alias("sum_qty"),
    )


SQL_JOIN_SALTED = f"""
SELECT p_brand, count(*) AS n_items, {sql_dround('sum(l_quantity)')} AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same tiers, same answer as q_join_range, but via the big-big form:
    # hash equi-join on a shared bucket grid + residual filter (no
    # nested loop anywhere — asserted in tests). The oracle is the plain
    # range-join SQL, so the rewrite must be result-identical.
    from python_mapreduce_spark.operators.joins import bucketed_range_join

    e = table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1000.0, "high")],
        "lo double, hi double, tier string",
    )
    joined = bucketed_range_join(e, tiers, "value", "lo", "hi", bucket_width=50.0)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(F.sum("value")).alias("sum_value"),
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # For each error event: the most recent click by the same user at or
    # before the error. Union+window formulation — one shuffle on
    # user_id, streams at any scale (operators/joins.py::asof_join).
    e = table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    )
    joined = asof_join(
        errors, clicks, key="user_id", left_ts="ts", right_ts="ts", right_cols=["click_id"]
    )
    return joined.select("event_id", "user_id", F.col("click_id_asof").alias("click_id"))


SQL_JOIN_ASOF = """
SELECT e.event_id, e.user_id, c.click_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN
     (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Forward as-of: for each error event, the NEXT click by the same
    # user at or after the error — same union+window plan, leading frame.
    e = table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    )
    joined = asof_join(
        errors,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", F.col("click_id_asof").alias("click_id"))


SQL_JOIN_ASOF_FWD = """
SELECT e.event_id, e.user_id, c.click_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN
     (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts <= c.ts
"""


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3-style: segment filter -> 3-way join -> top 10 orders by
    # revenue. Orders/customer shuffle on their join keys; ordering by the
    # ROUNDED revenue keeps top-10 selection identical across engines.
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_Q03 = f"""
SELECT l_orderkey, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5-style: local-supplier volume. Fact-fact join shuffles on
    # orderkey; all dims broadcast; the c_nationkey = s_nationkey
    # "locality" predicate closes the snowflake loop.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )


SQL_Q05 = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Interval-overlap join (operators/joins.py::interval_overlap_join):
    # per-user error windows [ts, ts+30m] x purchase windows
    # [ts, ts+10m] — which purchases ran inside an error window. The
    # bucket-grid equi-join emits each overlapping pair exactly once
    # (overlap-start bucket rule); the oracle is the direct inequality
    # join.
    from python_mapreduce_spark.operators.joins import interval_overlap_join  # noqa: PLC0415

    ev = table(spark, sf_dir, "events")

    def spans(etype: str, mins: int) -> DataFrame:
        ms = F.unix_millis(F.col("ts"))
        return ev.filter(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id"),
            ms.alias("start"),
            (ms + mins * 60_000).alias("end"),
        )

    return interval_overlap_join(
        spans("error", 30), spans("purchase", 10),
        ["user_id"], "event_id", "event_id", bucket_width=3_600_000,
    )


SQL_INTERVAL_JOIN = """
WITH err AS (
  SELECT user_id, event_id, epoch_ms(ts) AS s, epoch_ms(ts) + 1800000 AS e
  FROM events WHERE event_type = 'error'
),
pur AS (
  SELECT user_id, event_id, epoch_ms(ts) AS s, epoch_ms(ts) + 600000 AS e
  FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       greatest(a.s, b.s) AS overlap_start,
       least(a.e, b.e) AS overlap_end,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_ms
FROM err a JOIN pur b
  ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
"""


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sorted-neighborhood blocking (operators/joins.py::
    # sorted_neighborhood_pairs): documents ordered by the (lang,
    # n_chars, doc_id) blocking key, each paired with its 2 successors
    # — O(n*w) ER candidate pairs via ONE global rank (range exchange,
    # no single-task window) + ONE explode/equi-join; never per-block
    # quadratic, robust to skewed blocks.
    from python_mapreduce_spark.operators.joins import sorted_neighborhood_pairs  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(docs, "doc_id", ["lang", "n_chars"], window=2)


SQL_SORTED_NEIGHBORHOOD = """
WITH rk AS (
  -- NULLS FIRST pins DuckDB to Spark's ascending default (NULLS LAST
  -- would silently reorder any NULL-lang rows and shift every pair)
  SELECT doc_id, row_number() OVER (
      ORDER BY lang NULLS FIRST, n_chars NULLS FIRST, doc_id) AS rn
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(b.rn - a.rn AS BIGINT) AS rank_gap
FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 2
"""


QUERIES: dict[str, Query] = {
    "q_interval_join": Query(
        q_interval_join, SQL_INTERVAL_JOIN, "interval-overlap join via bucket grid (big-big safe)"
    ),
    "q_join_equi": Query(q_join_equi, SQL_JOIN_EQUI, "reduce-side equi-join -> shuffle join"),
    "q_join_broadcast": Query(q_join_broadcast, SQL_JOIN_BROADCAST, "star-schema broadcast joins"),
    "q_join_semi": Query(q_join_semi, SQL_JOIN_SEMI, "left semi (EXISTS)"),
    "q_join_anti": Query(q_join_anti, SQL_JOIN_ANTI, "left anti (NOT EXISTS)"),
    "q_join_outer": Query(q_join_outer, SQL_JOIN_OUTER, "left outer + null-aware agg"),
    "q_join_theta": Query(q_join_theta, SQL_JOIN_THETA, "non-equi theta join (BNLJ)"),
    "q_join_range": Query(q_join_range, SQL_JOIN_RANGE, "range/interval join to tiers"),
    "q_join_range_bucketed": Query(q_join_range_bucketed, SQL_JOIN_RANGE, "big-big range join via bucket-grid equi-join"),
    "q_join_salted": Query(q_join_salted, SQL_JOIN_SALTED, "skew-salted join (oracle: plain join)"),
    "q_join_asof": Query(q_join_asof, SQL_JOIN_ASOF, "as-of join via union+window"),
    "q_join_asof_fwd": Query(q_join_asof_fwd, SQL_JOIN_ASOF_FWD, "forward as-of join"),
    "q03_shipping_priority": Query(q03_shipping_priority, SQL_Q03, "TPC-H Q3-style top-10"),
    "q05_region_revenue": Query(q05_region_revenue, SQL_Q05, "TPC-H Q5-style snowflake"),
    "q_sorted_neighborhood": Query(
        q_sorted_neighborhood,
        SQL_SORTED_NEIGHBORHOOD,
        "sorted-neighborhood ER blocking (O(n*w) candidate pairs)",
    ),
}
