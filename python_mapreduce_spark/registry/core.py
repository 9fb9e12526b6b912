"""Core relational queries: scan/filter/project/sample, aggregation,
distinct, sort/limit, set ops, grouping sets, scalar functions.

Reference coverage (SURVEY.md §2.2): projection and filtering are map-fn
patterns (README.txt:254-261); distinct is "emit (value,1), reduce once";
sampling is file-level downsample (mapper.py:103-108); union is multi-dir
scan (mapper.py:75-78); everything else (rollup/cube, global sort,
grouping sets) is absent from the reference and a capability upgrade.

Oracle-parity conventions: double aggregates go through dround /
sql_dround (bit-deterministic cross-engine rounding, functions/scalar.py)
and every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, dsum, sql_dround, sql_dsum
from python_mapreduce_spark.operators.aggregates import (
    count_distinct_by,
    cube_agg,
    distinct_rows,
    group_agg,
    pricing_summary,
    rollup_agg,
    numeric_histogram,
    quantile_rank_flag,
    sketch_distinct_rollup,
    sketch_quantile_rollup,
    sketch_topk_rollup,
    table_profile,
    zscore_outliers,
)
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table


# --- flagship -------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(table(spark, sf_dir, "lineitem"))


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dround('sum(l_quantity)')}                                       AS sum_qty,
       {sql_dsum('l_extendedprice')}                                  AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')}               AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_dround('avg(l_quantity)')}                                       AS avg_qty,
       {sql_dround('avg(l_extendedprice)')}                                  AS avg_price,
       {sql_dround('avg(l_discount)', 4)}                                    AS avg_disc,
       count(*)                                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- filter / project / sample -------------------------------------------

def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)).select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


SQL_FILTER_PROJECT = f"""
SELECT l_orderkey, l_linenumber,
       {sql_dround('l_extendedprice * (1 - l_discount)')} AS net_price
FROM lineitem
WHERE l_quantity > 30 AND l_discount < 0.05
"""


def q_sample_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic downsample (reference O5's testing facility,
    # mapper.py:103-108; README.txt:24) expressed as a key-mod filter so
    # the oracle can reproduce it exactly. Row-level df.sample(fraction)
    # is the production path (see operators/relational.py).
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.pmod(F.col("l_orderkey"), F.lit(20)) == 0)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dround(F.sum("l_quantity")).alias("sum_qty"),
        )
    )


SQL_SAMPLE_AGG = f"""
SELECT l_returnflag, count(*) AS n_rows, {sql_dround('sum(l_quantity)')} AS sum_qty
FROM lineitem WHERE l_orderkey % 20 = 0
GROUP BY l_returnflag
"""


# --- distinct / count-distinct --------------------------------------------

def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_rows(table(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"])


SQL_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return count_distinct_by(table(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_partkey")


SQL_COUNT_DISTINCT = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_l_partkey
FROM lineitem GROUP BY l_returnflag
"""


# --- global sort + limit (top-k) -------------------------------------------

def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global total-order sort is absent in the reference (hash-split
    # partitions, SURVEY.md §2.2 "Sort (global)"). Spark range-partitions
    # the sort; LIMIT is pushed into a TakeOrderedAndProject at scale.
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", dround(F.col("o_totalprice")).alias("total"), "o_orderstatus")
        .limit(10)
    )


SQL_TOPK_ORDERS = f"""
SELECT o_orderkey, {sql_dround('o_totalprice')} AS total, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- date-bucketed aggregation ---------------------------------------------

def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return group_agg(
        o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM")),
        ["month"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum("o_totalprice")).alias("sum_total"),
            dround(F.avg("o_totalprice")).alias("avg_total"),
        ],
    )


SQL_ORDERS_BY_MONTH = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       {sql_dround('sum(o_totalprice)')} AS sum_total,
       {sql_dround('avg(o_totalprice)')} AS avg_total
FROM orders GROUP BY 1
"""


# --- rollup / cube / grouping sets ------------------------------------------

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.count(F.lit(1)).alias("n_rows"),
            dround(F.sum("l_quantity")).alias("sum_qty"),
        ],
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
        "n_rows",
        "sum_qty",
    )


SQL_ROLLUP = f"""
SELECT coalesce(l_returnflag, 'ALL') AS rflag,
       coalesce(l_linestatus, 'ALL') AS lstatus,
       count(*) AS n_rows,
       {sql_dround('sum(l_quantity)')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return cube_agg(
        o,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum("o_totalprice")).alias("sum_total"),
        ],
    ).select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "n_orders",
        "sum_total",
    )


SQL_CUBE = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       {sql_dround('sum(o_totalprice)')} AS sum_total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS rflag,
               coalesce(l_linestatus, 'ALL') AS lstatus,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


SQL_GROUPING_SETS = """
SELECT coalesce(l_returnflag, 'ALL') AS rflag,
       coalesce(l_linestatus, 'ALL') AS lstatus,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


# --- set operators -----------------------------------------------------------

def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference: union = concatenating input_dirs into one bag
    # (mapper.py:75-78); set-union requires the tag-and-reduce pattern.
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


SQL_UNION = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SQL_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.distinct().subtract(s.distinct())


SQL_EXCEPT = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


# --- scalar function veneer ---------------------------------------------------

def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
    )


SQL_SCALAR_STRING = """
SELECT p_partkey,
       upper(p_name)                   AS name_upper,
       length(p_name)                  AS name_len,
       substr(p_name, 1, 8)            AS name_head,
       concat_ws('|', p_brand, p_type) AS brand_type,
       len(string_split(p_name, ' '))  AS n_words
FROM part
"""


def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


SQL_SCALAR_DATETIME = """
SELECT o_orderkey,
       year(o_orderdate)                                       AS yr,
       month(o_orderdate)                                      AS mon,
       day(o_orderdate)                                        AS dom,
       quarter(o_orderdate)                                    AS qtr,
       strftime(o_orderdate, '%Y-%m-%d')                       AS d_str,
       date_diff('day', DATE '1995-01-01', o_orderdate::DATE)  AS days_since
FROM orders
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        dround(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        dround(F.log("p_retailprice"), 6).alias("ln_price"),
        F.pow("p_size", F.lit(2)).cast("long").alias("size_sq"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
    )


SQL_SCALAR_MATH = f"""
SELECT p_partkey,
       {sql_dround('sqrt(p_retailprice)', 6)}    AS sqrt_price,
       {sql_dround('ln(p_retailprice)', 6)}      AS ln_price,
       CAST(pow(p_size, 2) AS BIGINT)            AS size_sq,
       CAST(abs(p_size - 25) AS BIGINT)          AS size_dev,
       CAST(ceil(p_retailprice) AS BIGINT)       AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT)      AS price_floor
FROM part
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's values are schemaless ujson blobs (shuffler.py:75);
    # the Spark-native pattern keeps a JSON-string column and extracts
    # lazily (SURVEY.md §1.4 "schemaless dynamic typing"). from_json with
    # an explicit schema parses once, typed (get_json_object benchmarked
    # 20-60x slower here for the same plan).
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.from_json("props", "k BIGINT")["k"])
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("value")).alias("sum_value"))
    )


SQL_JSON_EXTRACT = f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       count(*) AS n,
       {sql_dround('sum(value)')} AS sum_value
FROM events GROUP BY 1
"""


def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return c.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n_cust"),
        dround(F.avg("c_acctbal")).alias("avg_bal"),
    )


SQL_CASE_WHEN = f"""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS tier,
       count(*) AS n_cust,
       {sql_dround('avg(c_acctbal)')} AS avg_bal
FROM customer GROUP BY 1
"""


# --- array / map scalar veneer ----------------------------------------------

def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array-function veneer (reference: arbitrary Python list handling
    # inside map fns, README.txt:254-261): size, distinct+sort+slice,
    # membership, element access — all JVM-side Catalyst expressions, no
    # higher-order-function lambdas (those run interpreted — measured
    # 50-75x penalty, README "Scale design").
    from python_mapreduce_spark.functions.scalar import tokenize

    d = table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    # Array results are emitted as ','-joined strings: the driver's
    # canonicalizer (pandas sort_values over every column) cannot hash
    # ndarray cells, so complex-typed outputs must be stringified on both
    # the Spark and DuckDB sides (CORRECTNESS_r01 lesson).
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
        F.element_at(toks, 1).alias("first_tok"),
    )


SQL_SCALAR_ARRAY = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS toks FROM documents
)
SELECT doc_id, len(toks) AS n_tokens,
       coalesce(array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), ','), '') AS first3,
       list_contains(toks, 'the') AS has_the,
       toks[1] AS first_tok
FROM t
"""


def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Map-function veneer: construct, key-extract, enumerate keys. The
    # schemaless-payload pattern (SURVEY.md §1.2) without JSON parsing.
    o = table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("total"), F.col("o_totalprice"),
        F.lit("key"), F.col("o_orderkey").cast("double"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "total").alias("total_val"),
        # stringified for the driver canonicalizer (see q_scalar_array)
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


SQL_SCALAR_MAP = """
WITH t AS (
  SELECT o_orderkey,
         MAP {'total': o_totalprice, 'key': CAST(o_orderkey AS DOUBLE)} AS m
  FROM orders
)
SELECT o_orderkey, m['total'][1] AS total_val,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
FROM t
"""


# --- pivot -------------------------------------------------------------------

def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dround(F.sum("l_quantity")))
    )
    return p.select("l_returnflag", F.col("F").alias("ls_f"), F.col("O").alias("ls_o"))


SQL_PIVOT = f"""
SELECT l_returnflag,
       {sql_dround("sum(l_quantity) FILTER (WHERE l_linestatus = 'F')")} AS ls_f,
       {sql_dround("sum(l_quantity) FILTER (WHERE l_linestatus = 'O')")} AS ls_o
FROM lineitem GROUP BY l_returnflag
"""


# --- scalar subquery -----------------------------------------------------------

def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_big
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )


SQL_SCALAR_SUBQUERY = """
SELECT o_orderstatus, count(*) AS n_big
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
"""


# --- exact percentiles ----------------------------------------------------------

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (Spark `percentile` == DuckDB
    # quantile_cont). The approximate variant (percentile_approx /
    # approx_count_distinct sketches) is q_approx_distinct — sketch
    # internals differ per engine, so that one is pytest-pinned instead.
    # The quartile array is emitted as a ','-joined DECIMAL(18,2) string:
    # the driver canonicalizer can't hash array cells, and decimal→string
    # gives an identical text repr in both engines (double→string differs:
    # Java scientific notation vs DuckDB plain).
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               array_join(transform(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D)),
                          x -> CAST(CAST(floor(x * 100.0D + 0.5D) / 100.0D
                                    AS DECIMAL(18,2)) AS STRING)), ',') AS price_quartiles
        FROM orders GROUP BY o_orderstatus
        """
    )


SQL_PERCENTILES = """
SELECT o_orderstatus,
       array_to_string(list_transform(quantile_cont(o_totalprice, [0.25, 0.5, 0.75]),
                       x -> CAST(CAST(floor(x * 100.0 + 0.5) / 100.0
                                 AS DECIMAL(18,2)) AS VARCHAR)), ',') AS price_quartiles
FROM orders GROUP BY o_orderstatus
"""


# --- TPC-H Q6-style forecast revenue --------------------------------------------

def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


SQL_Q06 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- salted aggregation (skew pattern) ------------------------------------------

def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Three hot keys over the whole table = the skew fixture
    # (FIXTURES.md B.5). Salting must not change the answer.
    from python_mapreduce_spark.operators.aggregates import salted_group_agg

    li = table(spark, sf_dir, "lineitem")
    out = salted_group_agg(li, ["l_returnflag"], "l_quantity", salt_buckets=8)
    return out.select(
        "l_returnflag", dround("sum_l_quantity").alias("sum_qty"), "n_rows"
    )


SQL_SALTED_AGG = f"""
SELECT l_returnflag, {sql_dround('sum(l_quantity)')} AS sum_qty, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- approximate percentile (sketch; pytest-pinned) ----------------------------

def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KLL-style quantile sketch (percentile_approx) — one-pass, fixed
    # memory, mergeable across partitions: the 100 TB quantile path where
    # exact percentiles would need a full sort. Sketch boundaries are
    # engine-specific, so the oracle contract is tolerance-style: emit the
    # EXACT interpolated quartiles (DuckDB-replicable) plus a boolean
    # asserting the sketch landed within 5% relative error of each — the
    # oracle computes the exact quartiles and literal TRUE.
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", [0.25, 0.5, 0.75], 10000
        ).alias("approx_q"),
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))"
        ).alias("exact_q"),
    )
    return agg.select(
        "l_returnflag",
        F.expr(
            "array_join(transform(exact_q,"
            " x -> CAST(CAST(floor(x * 100.0D + 0.5D) / 100.0D"
            " AS DECIMAL(18,2)) AS STRING)), ',')"
        ).alias("exact_quartiles"),
        F.expr(
            "forall(zip_with(approx_q, exact_q,"
            " (a, e) -> abs(a - e) / e <= 0.05D), b -> b)"
        ).alias("approx_ok"),
    )


SQL_APPROX_PERCENTILE = """
SELECT l_returnflag,
       array_to_string(list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
                       x -> CAST(CAST(floor(x * 100.0 + 0.5) / 100.0
                                 AS DECIMAL(18,2)) AS VARCHAR)), ',') AS exact_quartiles,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


# --- approximate distinct (HLL++ sketch; tolerance-style oracle) ----------------

def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL++ sketch — the one-pass cardinality path for 100 TB. Sketch
    # values are engine-specific, so the oracle contract is tolerance-
    # style: one pass computes both the exact per-key distinct count
    # (DuckDB-replicable) and the sketch, and we emit a boolean asserting
    # <=5% relative error (HLL++ at rsd 0.01 is deterministic — hash-based,
    # no RNG). The standalone sketch operator stays pytest-pinned
    # (count_distinct_by, tests/test_operators.py).
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("__approx"),
    )
    return agg.select(
        "l_returnflag",
        "n_exact",
        (F.abs(F.col("__approx") - F.col("n_exact")) / F.col("n_exact") <= 0.05)
        .alias("approx_ok"),
    )


SQL_APPROX_DISTINCT = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable-sketch rollup (operators/aggregates.py::
    # sketch_distinct_rollup): distinct users per event type computed by
    # UNIONING per-(type, day) HLL sketches — the maintain-daily-sketches
    # -and-roll-up pattern. Sketches are deterministic (hash-based), so
    # the tolerance flag is stable; the oracle contract is the same
    # exact + TRUE shape as q_approx_distinct. Union losslessness vs a
    # direct coarse sketch is pytest-pinned.
    ev = table(spark, sf_dir, "events")
    roll = sketch_distinct_rollup(ev, "event_type", F.to_date("ts"), "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(roll, "event_type").select(
        "event_type",
        "n_exact",
        "n_cells",
        (F.abs(F.col("approx_distinct") - F.col("n_exact")) / F.col("n_exact") <= 0.05)
        .alias("sketch_ok"),
    )


SQL_HLL_ROLLUP = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_cells,
       TRUE AS sketch_ok
FROM events GROUP BY event_type
"""


def q_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable heavy-hitter rollup (operators/aggregates.py::
    # sketch_topk_rollup): per-(type, day) frequent-items sketches
    # COMBINED to per-type top-5 pages. max_items=1024 >= the 499
    # distinct items, so every cell sketch tracks every item, counts are
    # exact, and the combine is lossless — the oracle is therefore a
    # hard exact GROUP BY + row_number, not a tolerance flag. The page
    # column derives from user_id with a sign-safe mod shared with the
    # SQL twin.
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    page = F.concat(F.lit("p"), F.pmod(F.col("user_id"), F.lit(499)).cast("string"))
    return sketch_topk_rollup(
        ev, "event_type", F.to_date("ts"), page, k=5, max_items=1024
    ).withColumn("est_count", F.col("est_count").cast("long"))


SQL_TOPK_ROLLUP = """
SELECT event_type, rank, item, est_count FROM (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY est_count DESC, item) AS INTEGER) AS rank,
         item, est_count
  FROM (SELECT event_type,
               concat('p', CAST(((user_id % 499) + 499) % 499 AS VARCHAR)) AS item,
               CAST(count(*) AS BIGINT) AS est_count
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
) WHERE rank <= 5
"""


def q_kll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable quantile rollup (operators/aggregates.py::
    # sketch_quantile_rollup): per-(type, day) KLL sketches merged to
    # per-type quartiles. KLL compaction is randomized (estimates vary
    # run-to-run), so the oracle contract is rank-based tolerance: the
    # EXACT rank of each estimated quartile (one broadcast join back to
    # events) must sit within 0.05 of its target — 3x the sketch's
    # 1.65% @ 99% guarantee at k=200, so the flag is stable-TRUE when
    # healthy and flips on any broken merge. Exact quartiles ride along
    # for the hash (same DECIMAL rendering as q_approx_percentile).
    ev = table(spark, sf_dir, "events")
    # roll feeds the rank-flag broadcast AND the output join; uncut,
    # each consumer replays the corpus-wide sketch pass (with fresh KLL
    # randomization). One cut of the per-type frame runs it once.
    roll = sketch_quantile_rollup(
        ev, "event_type", F.to_date("ts"), "value"
    ).localCheckpoint(eager=False)
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))").alias("__exact_q")
    )
    flag = quantile_rank_flag(ev, "event_type", "value", roll, flag_name="rollup_ok")
    return (
        exact.join(roll.select("event_type", "n_cells"), "event_type")
        .join(flag, "event_type")
        .select(
            "event_type",
            "n_cells",
            F.expr(
                "array_join(transform(__exact_q,"
                " x -> CAST(CAST(floor(x * 100.0D + 0.5D) / 100.0D"
                " AS DECIMAL(18,2)) AS STRING)), ',')"
            ).alias("exact_quartiles"),
            "rollup_ok",
        )
    )


SQL_KLL_ROLLUP = """
SELECT event_type,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_cells,
       array_to_string(list_transform(quantile_cont(value, [0.25, 0.5, 0.75]),
                       x -> CAST(CAST(floor(x * 100.0 + 0.5) / 100.0
                                 AS DECIMAL(18,2)) AS VARCHAR)), ',') AS exact_quartiles,
       TRUE AS rollup_ok
FROM events GROUP BY event_type
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-range distribution profile (operators/aggregates.py::
    # numeric_histogram): events.value over [0, 100) in 20 buckets,
    # overflow buckets -1/20. The bucket rule is explicit IEEE floor
    # arithmetic replayed identically by the oracle.
    return numeric_histogram(table(spark, sf_dir, "events"), "value", 0.0, 100.0, 20)


SQL_HISTOGRAM = f"""
WITH b AS (
  SELECT CASE WHEN value < 0.0 THEN -1
              WHEN value >= 100.0 THEN 20
              ELSE CAST(floor((value - 0.0) / 5.0) AS INTEGER) END AS bucket
  FROM events WHERE value IS NOT NULL
)
SELECT bucket,
       CASE WHEN bucket BETWEEN 0 AND 19
            THEN {sql_dround('0.0 + bucket * 5.0', 6)} END AS lo_edge,
       CASE WHEN bucket BETWEEN 0 AND 19
            THEN {sql_dround('0.0 + (bucket + 1) * 5.0', 6)} END AS hi_edge,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bucket
"""


def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Joint distribution heatmap (operators/aggregates.py::histogram2d):
    # events value x hour-of-day under the shared fixed-range bucket
    # rule — one scan, one (x_bucket, y_bucket)-keyed map-side-combined
    # agg, at most (bins+2)^2 keys shuffle at any input size.
    from python_mapreduce_spark.operators.aggregates import histogram2d  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").withColumn("hour", F.hour("ts"))
    return histogram2d(
        ev, "value", "hour", x_range=(0.0, 100.0, 10), y_range=(0.0, 24.0, 8)
    )


SQL_HISTOGRAM2D = """
SELECT CASE WHEN value < 0.0 THEN -1
            WHEN value >= 100.0 THEN 10
            ELSE CAST(floor((value - 0.0) / 10.0) AS INTEGER) END AS x_bucket,
       CASE WHEN hour < 0.0 THEN -1
            WHEN hour >= 24.0 THEN 8
            ELSE CAST(floor((hour - 0.0) / 3.0) AS INTEGER) END AS y_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT value, CAST(extract(hour FROM ts) AS DOUBLE) AS hour FROM events)
WHERE value IS NOT NULL AND hour IS NOT NULL
GROUP BY 1, 2
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Privacy release gate (operators/aggregates.py::k_anonymity_audit):
    # are documents re-identifiable by the (lang, source, length-bucket)
    # quasi-identifier combination? One group-size agg + one
    # re-aggregation of the group frame; NULL quasi-values are buckets.
    from python_mapreduce_spark.operators.aggregates import k_anonymity_audit  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.expr("n_chars DIV 200")
    )
    return k_anonymity_audit(docs, ["lang", "source", "len_bucket"], k=5)


SQL_K_ANONYMITY = f"""
WITH g AS (
  SELECT lang, source, n_chars // 200 AS nb, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2, 3
)
SELECT n_rows, n_groups, n_groups_at_risk, n_rows_at_risk,
       {sql_dround("CAST(n_rows_at_risk AS DOUBLE) / n_rows", 6)} AS rows_at_risk_share,
       n_groups_at_risk = 0 AS k_anonymous
FROM (
  SELECT 1 AS grp,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_at_risk,
         CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk
  FROM g GROUP BY grp
)
"""


def q_missingness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Structured-missingness audit (operators/aggregates.py::
    # missingness_pattern): NULL co-occurrence across events' nullable
    # columns — correlated missingness is one upstream bug, not three.
    # All pairwise co-null counts from ONE scan/agg; the pair table is
    # exploded from that single row.
    from python_mapreduce_spark.operators.aggregates import missingness_pattern  # noqa: PLC0415

    return missingness_pattern(
        table(spark, sf_dir, "events"), ["value", "props", "user_id"]
    )


def _sql_missingness() -> str:
    cols = ["value", "props", "user_id"]
    nulls = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 END), 0) AS BIGINT) AS n_{c}"
        for c in cols
    )
    boths = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {a} IS NULL AND {b} IS NULL THEN 1 END), 0)"
        f" AS BIGINT) AS b_{a}_{b}"
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    )
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            for x, y in ((a, b), (b, a)):
                union = f"(n_{x} + n_{y} - b_{a}_{b})"
                rows.append(
                    f"SELECT '{x}' AS col_a, '{y}' AS col_b, n_rows,"
                    f" n_{x} AS nulls_a, n_{y} AS nulls_b, b_{a}_{b} AS nulls_both,"
                    f" CASE WHEN {union} > 0 THEN"
                    f" {sql_dround(f'b_{a}_{b} / CAST({union} AS DOUBLE)', 6)}"
                    f" END AS jaccard FROM s"
                )
    return (
        "WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        + nulls + ", " + boths + " FROM events)\n"
        + "\nUNION ALL\n".join(rows)
    )


SQL_MISSINGNESS = _sql_missingness()


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-proportion z-test (operators/aggregates.py::
    # ab_test_proportions): user-bucket variants (md-free: user_id % 3)
    # on click->purchase conversion; ONE variant count agg, control row
    # broadcast back, fixed IEEE z expression.
    from python_mapreduce_spark.operators.aggregates import ab_test_proportions  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("user_id").isNotNull()
    )
    scored = ev.select(
        F.concat(F.lit("v"), (F.col("user_id") % 3).cast("string")).alias("variant"),
        (F.col("event_type") == "purchase").alias("converted"),
    )
    return ab_test_proportions(scored, "variant", "converted", control="v0")


SQL_AB_TEST = f"""
WITH base AS (
  SELECT 'v' || CAST(user_id % 3 AS VARCHAR) AS variant,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL
),
counts AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS conv
  FROM base GROUP BY variant
),
ctrl AS (SELECT n AS n_control, conv AS conv_control FROM counts WHERE variant = 'v0'),
t AS (SELECT * FROM counts CROSS JOIN ctrl WHERE variant != 'v0'),
m AS (
  SELECT *,
         conv / CAST(n AS DOUBLE) AS rt,
         conv_control / CAST(n_control AS DOUBLE) AS rc,
         (conv + conv_control) / CAST(n + n_control AS DOUBLE) AS pooled
  FROM t
)
SELECT variant, n, conv, {sql_dround("rt", 6)} AS rate,
       n_control, conv_control, {sql_dround("rc", 6)} AS rate_control,
       {sql_dround("rt - rc", 6)} AS abs_lift,
       CASE WHEN conv_control > 0 THEN {sql_dround("rt / rc - 1.0", 6)} END AS rel_lift,
       CASE WHEN n > 0 AND n_control > 0 AND pooled > 0 AND pooled < 1 THEN
         {sql_dround(
             "(rt - rc) / sqrt(pooled * (1.0 - pooled)"
             " * (1.0 / n + 1.0 / n_control))", 6)}
       END AS z,
       coalesce(abs(CASE WHEN n > 0 AND n_control > 0 AND pooled > 0 AND pooled < 1 THEN
         {sql_dround(
             "(rt - rc) / sqrt(pooled * (1.0 - pooled)"
             " * (1.0 / n + 1.0 / n_control))", 6)}
       END) >= 1.96, FALSE) AS significant
FROM m
"""


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bloom-pre-filtered semi join (operators/joins.py::
    # bloom_semi_join): lineitem rows whose order is URGENT — the
    # seeded-xxhash64 Bloom broadcast screens the probe side inside the scan stage
    # before the exact semi join; results are bit-identical to the
    # plain semi join, which IS the oracle.
    from python_mapreduce_spark.operators.joins import bloom_semi_join  # noqa: PLC0415

    li = table(spark, sf_dir, "lineitem")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    hit = bloom_semi_join(li, urgent, "l_orderkey")
    return hit.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        dround(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias(
            "sum_qty"
        ),
    )


SQL_BLOOM_SEMI_JOIN = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
       {sql_dround("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS sum_qty
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-weighted average (operators/events.py::time_weighted_avg):
    # per event_type, value weighted by how long it remained current —
    # the gauge-correct mean a plain AVG gets wrong on bursty samples.
    # One per-key lead window + one keyed agg; DECIMAL term sums.
    from python_mapreduce_spark.operators.events import time_weighted_avg  # noqa: PLC0415

    return time_weighted_avg(table(spark, sf_dir, "events"), ["event_type"], "ts", "value")


SQL_TIME_WEIGHTED_AVG = f"""
WITH base AS (
  SELECT event_type, epoch_ms(ts) AS t, CAST(value AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
w AS (
  SELECT event_type, v,
         coalesce(lead(t) OVER (PARTITION BY event_type ORDER BY t, v) - t, 0) AS dt
  FROM base
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(coalesce(sum(dt), 0) AS BIGINT) AS span_ms,
         sum(CAST({sql_dround("v * dt", 6)} AS DECIMAL(28,6))) AS ws
  FROM w GROUP BY event_type
)
SELECT event_type, n_samples, span_ms,
       CASE WHEN span_ms > 0
            THEN {sql_dround("CAST(ws AS DOUBLE) / span_ms", 6)} END AS twavg
FROM agg
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # OHLC compaction (operators/events.py::ohlc_bars): 6-hour candles
    # per event_type — open/close ride min/max over a packed (ts, value)
    # struct inside ONE map-side-combined agg; no window, no per-bucket
    # sort. Tie rule pinned: min (max) value at the open (close) ts.
    from python_mapreduce_spark.operators.events import ohlc_bars  # noqa: PLC0415

    return ohlc_bars(
        table(spark, sf_dir, "events"), ["event_type"], "ts", "value", bucket="6 hours"
    )


SQL_OHLC_BARS = f"""
WITH base AS (
  SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS b,
         epoch_ms(ts) AS t, {sql_dround("CAST(value AS DOUBLE)", 6)} AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
ext AS (
  SELECT event_type, b, CAST(count(*) AS BIGINT) AS n,
         max(v) AS high, min(v) AS low, min(t) AS mn, max(t) AS mx
  FROM base GROUP BY 1, 2
)
SELECT base.event_type, strftime(base.b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       n,
       min(CASE WHEN t = mn THEN v END) AS open,
       high, low,
       max(CASE WHEN t = mx THEN v END) AS close
FROM base JOIN ext ON base.event_type = ext.event_type AND base.b = ext.b
GROUP BY 1, 2, 3, 5, 6
"""


def q_er_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ER verify stage (operators/joins.py::er_match_score) over the
    # sorted-neighborhood candidate pairs: weighted field similarity
    # (levenshtein on the short title prefix + lang/source/n_chars) —
    # every similarity a JVM built-in, replayed exactly by DuckDB's
    # levenshtein.
    from python_mapreduce_spark.operators.joins import (  # noqa: PLC0415
        er_match_score,
        sorted_neighborhood_pairs,
    )

    docs = table(spark, sf_dir, "documents").withColumn(
        "title", F.substring("text", 1, 40)
    )
    pairs = sorted_neighborhood_pairs(docs, "doc_id", ["lang", "n_chars"], window=2)
    return er_match_score(
        pairs,
        docs,
        "doc_id",
        [("lang", 1.0), ("source", 1.0), ("n_chars", 1.0), ("title", 2.0)],
        threshold=0.75,
    )


def _sql_er_match() -> str:
    str_sim = lambda a, b: (  # noqa: E731
        f"CASE WHEN {a} IS NULL AND {b} IS NULL THEN 1.0"
        f" WHEN {a} IS NULL OR {b} IS NULL THEN 0.0"
        f" WHEN greatest(length({a}), length({b})) > 0 THEN"
        f" 1.0 - levenshtein({a}, {b})"
        f" / CAST(greatest(length({a}), length({b})) AS DOUBLE)"
        f" ELSE 1.0 END"
    )
    eq_sim = lambda a, b: (  # noqa: E731
        f"CASE WHEN {a} IS NULL AND {b} IS NULL THEN 1.0"
        f" WHEN {a} IS NULL OR {b} IS NULL THEN 0.0"
        f" WHEN {a} = {b} THEN 1.0 ELSE 0.0 END"
    )
    s_lang = str_sim("ra.lang", "rb.lang")
    s_source = str_sim("ra.source", "rb.source")
    s_nchars = eq_sim("ra.n_chars", "rb.n_chars")
    s_title = str_sim("ra.title", "rb.title")
    score = f"(({s_lang}) + ({s_source}) + ({s_nchars}) + 2.0 * ({s_title})) / 5.0"
    return f"""
WITH rec AS (
  SELECT doc_id, lang, source, n_chars, substring(text, 1, 40) AS title
  FROM documents
),
rk AS (
  SELECT doc_id, row_number() OVER (
      ORDER BY lang NULLS FIRST, n_chars NULLS FIRST, doc_id) AS rn
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 2
)
SELECT id_a, id_b,
       {sql_dround(s_lang, 6)} AS sim_lang,
       {sql_dround(s_source, 6)} AS sim_source,
       {sql_dround(s_nchars, 6)} AS sim_n_chars,
       {sql_dround(s_title, 6)} AS sim_title,
       {sql_dround(score, 6)} AS score,
       {sql_dround(score, 6)} >= 0.75 AS matched
FROM pairs JOIN rec ra ON pairs.id_a = ra.doc_id
           JOIN rec rb ON pairs.id_b = rb.doc_id
"""


SQL_ER_MATCH = _sql_er_match()


_PROFILE_COLS = [
    ("l_orderkey", True),
    ("l_quantity", True),
    ("l_discount", True),
    ("l_returnflag", False),
    ("l_shipdate", False),
]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-pass, one-scan data-quality profile (operators/aggregates.py::
    # table_profile) over a numeric + string + timestamp column mix; the
    # oracle is a per-column UNION ALL over the same statistics.
    return table_profile(
        table(spark, sf_dir, "lineitem"), [c for c, _ in _PROFILE_COLS]
    )


SQL_TABLE_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
       (SELECT CAST(count(*) - count({c}) AS BIGINT) FROM lineitem) AS n_nulls,
       (SELECT CAST(count(DISTINCT {c}) AS BIGINT) FROM lineitem) AS n_distinct,
       {f"(SELECT {sql_dround(f'min(CAST({c} AS DOUBLE))', 4)} FROM lineitem)" if num else "CAST(NULL AS DOUBLE)"} AS min_v,
       {f"(SELECT {sql_dround(f'max(CAST({c} AS DOUBLE))', 4)} FROM lineitem)" if num else "CAST(NULL AS DOUBLE)"} AS max_v,
       {f"(SELECT {sql_dround(f'avg(CAST({c} AS DOUBLE))', 4)} FROM lineitem)" if num else "CAST(NULL AS DOUBLE)"} AS mean_v"""
    for c, num in _PROFILE_COLS
)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ordered view -> click -> purchase funnel (operators/events.py::
    # funnel): per-user earliest qualifying time per level, each level a
    # user-keyed narrow join; the oracle replays the sequential-min
    # CTEs. Strictly-after semantics on both sides.
    from python_mapreduce_spark.operators.events import funnel  # noqa: PLC0415

    return funnel(
        table(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )


SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
)
SELECT 1 AS step, 'view' AS step_name, CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
"""


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The conversion-window variant: each step must land strictly after
    # the previous step's earliest time AND within 6 hours of it — the
    # "converted within X" product question. Same sequential-min CTEs
    # in the oracle with the bound applied on both sides.
    from python_mapreduce_spark.operators.events import funnel  # noqa: PLC0415

    return funnel(
        table(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within_seconds=6 * 3600,
    )


SQL_FUNNEL_WINDOWED = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t
    AND e.ts <= s1.t + INTERVAL 6 HOUR GROUP BY 1
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
    AND e.ts <= s2.t + INTERVAL 6 HOUR GROUP BY 1
)
SELECT 1 AS step, 'view' AS step_name, CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Day-cohort retention at day+1 and day+7 (operators/events.py::
    # cohort_retention): cohort = first-activity date, every
    # intermediate one-row-per-user; the oracle replays the
    # first/activity/horizon-join construction.
    from python_mapreduce_spark.operators.events import cohort_retention  # noqa: PLC0415

    out = cohort_retention(table(spark, sf_dir, "events"), "user_id", "ts")
    # dates emit as formatted strings (registry convention: pandas
    # date-to-datetime promotion otherwise skews the value hash)
    return out.withColumn("cohort", F.date_format("cohort", "yyyy-MM-dd"))


SQL_COHORT_RETENTION = f"""
WITH f AS (
  SELECT user_id AS u, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
),
act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
j AS (
  SELECT f.cohort,
         (a1.u IS NOT NULL) AS f1,
         (a7.u IS NOT NULL) AS f7
  FROM f
  LEFT JOIN act a1 ON a1.u = f.u AND a1.d = f.cohort + 1
  LEFT JOIN act a7 ON a7.u = f.u AND a7.d = f.cohort + 7
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n_day1,
       CAST(sum(CASE WHEN f7 THEN 1 ELSE 0 END) AS BIGINT) AS n_day7,
       {sql_dround('sum(CASE WHEN f1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)', 4)} AS ret_day1,
       {sql_dround('sum(CASE WHEN f7 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)', 4)} AS ret_day7
FROM j GROUP BY cohort
"""


def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hypertable-style gap-filled resample (operators/windows.py::
    # resample_locf): hourly grid per event_type, last observation per
    # bucket (ms-exact order, value tiebreak), empty buckets forward-
    # filled. The oracle replays bucket/tiebreak/grid/LOCF; bucket_ts
    # emits as a formatted string per the registry convention.
    from python_mapreduce_spark.operators.windows import resample_locf  # noqa: PLC0415

    out = resample_locf(
        table(spark, sf_dir, "events"), ["event_type"], "ts", "value",
        interval_seconds=3600,
    )
    return out.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "value",
        "filled",
    )


SQL_RESAMPLE_LOCF = """
WITH obs AS (
  SELECT event_type, b, v FROM (
    SELECT event_type,
           (epoch_ms(ts) // 3600000) * 3600 AS b,
           value AS v,
           row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // 3600000
                              ORDER BY epoch_ms(ts) DESC, value DESC) AS rn
    FROM events)
  WHERE rn = 1
),
span AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1),
grid AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS b FROM span),
j AS (
  SELECT g.event_type, g.b, o.v
  FROM grid g LEFT JOIN obs o ON g.event_type = o.event_type AND g.b = o.b
)
SELECT event_type,
       strftime(to_timestamp(b), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       (v IS NULL) AS filled
FROM j
"""


def q_counter_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Prometheus-style counter increase with reset handling
    # (operators/windows.py::counter_increase) over each event_type's
    # value series; ts emits as epoch-ms so the row is integer-exact.
    from python_mapreduce_spark.operators.windows import counter_increase  # noqa: PLC0415

    out = counter_increase(
        table(spark, sf_dir, "events"), ["event_type"], "ts", "value"
    )
    return out.select(
        "event_type", F.unix_millis("ts").alias("ts_ms"), "value", "increase"
    )


SQL_COUNTER_INCREASE = """
SELECT event_type,
       epoch_ms(ts) AS ts_ms,
       CAST(value AS DOUBLE) AS value,
       CASE WHEN prev IS NULL THEN NULL
            WHEN value >= prev THEN value - prev
            ELSE value END AS increase
FROM (
  SELECT event_type, ts, value,
         lag(value) OVER (PARTITION BY event_type
                          ORDER BY epoch_ms(ts), value NULLS FIRST) AS prev
  FROM events
)
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group tail clipping (operators/aggregates.py::winsorize):
    # events.value clamped to each type's [p05, p95], bounds rounded
    # before clamping so both engines clip against identical numbers.
    from python_mapreduce_spark.operators.aggregates import winsorize  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    return winsorize(ev, ["event_type"], "value", lo=0.05, hi=0.95)


SQL_WINSORIZE = f"""
WITH stats AS (
  SELECT event_type,
         {sql_dround('quantile_cont(value, 0.05)', 6)} AS plo,
         {sql_dround('quantile_cont(value, 0.95)', 6)} AS phi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(e.value AS DOUBLE) AS value,
       greatest(least(CAST(e.value AS DOUBLE), s.phi), s.plo) AS clipped
FROM events e JOIN stats s USING (event_type)
"""


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Smoothed target encoding (operators/aggregates.py::target_encode):
    # orders' priority encoded against a derived binary label
    # (high-value order). DECIMAL label sums + rounded encoding keep it
    # engine-exact; rows emit (key, category, label, te).
    from python_mapreduce_spark.operators.aggregates import target_encode  # noqa: PLC0415

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_totalprice") > 150000.0).cast("double").alias("label"),
    )
    return target_encode(o, "prio", "label", smoothing=10.0)


SQL_TARGET_ENCODE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(o_totalprice > 150000.0 AS DOUBLE) AS label
  FROM orders
),
per_cat AS (
  SELECT prio AS cat, CAST(count(label) AS DOUBLE) AS n,
         coalesce(sum(CAST(label AS DECIMAL(18,6))), 0) AS s
  FROM base GROUP BY prio
),
gl AS (
  SELECT CAST(count(label) AS DOUBLE) AS gn,
         coalesce(sum(CAST(label AS DECIMAL(18,6))), 0) AS gs
  FROM base
)
SELECT b.o_orderkey, b.prio, b.label,
       {sql_dround('(CAST(p.s AS DOUBLE) + 10.0 * (CAST(g.gs AS DOUBLE) / greatest(g.gn, 1.0)))'
                   ' / (p.n + 10.0)', 6)} AS te
FROM base b
LEFT JOIN per_cat p ON b.prio IS NOT DISTINCT FROM p.cat
CROSS JOIN gl g
"""


def q_diff_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed snapshot reconciliation (operators/relational.py::
    # diff_tables): documents vs a deterministically perturbed copy —
    # every 13th text rewritten (changed), every 29th dropped (only_a),
    # and a shifted-id slice added (only_b). The oracle replays the
    # perturbation and the null-safe comparison.
    from python_mapreduce_spark.operators.relational import diff_tables  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    b = docs.filter(F.col("doc_id") % 29 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" EDITED")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return diff_tables(docs, b.unionByName(added), "doc_id", ["text"])


SQL_DIFF_TABLES = """
WITH a AS (SELECT doc_id, text FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' EDITED' ELSE text END AS text
  FROM documents WHERE doc_id % 29 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 41 = 0
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'only_a'
            WHEN a.doc_id IS NULL THEN 'only_b'
            WHEN a.text IS NOT DISTINCT FROM b.text THEN 'same'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id IS NOT DISTINCT FROM b.doc_id
"""


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Outlier-resistant feature scaling (operators/aggregates.py::
    # robust_scale): per-type (x - median)/IQR with stats rounded to
    # 1e-6 before the arithmetic so both engines scale from identical
    # numbers. The compare is multiset-exact over (type, value, scaled).
    from python_mapreduce_spark.operators.aggregates import robust_scale  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    return robust_scale(ev, ["event_type"], "value")


SQL_ROBUST_SCALE = f"""
WITH stats AS (
  SELECT event_type,
         {sql_dround('quantile_cont(value, 0.5)', 6)} AS med,
         {sql_dround('quantile_cont(value, 0.75) - quantile_cont(value, 0.25)', 6)} AS iqr
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(e.value AS DOUBLE) AS value,
       CASE WHEN s.iqr > 0
            THEN {sql_dround('(e.value - s.med) / s.iqr', 6)}
            ELSE 0.0 END AS scaled
FROM events e JOIN stats s USING (event_type)
"""


def q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trending items: top-3 pages per day by event count — the
    # windowed-heavy-hitter analytics staple, via the existing
    # topk_per_group operator (WindowGroupLimit pre-trims per
    # partition). Day emits as a string per the registry convention.
    from python_mapreduce_spark.operators.windows import topk_per_group  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    counts = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.concat(F.lit("p"), F.pmod("user_id", F.lit(37)).cast("string")).alias("page"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    top = topk_per_group(counts, ["day"], [F.desc("n"), F.asc("page")], k=3)
    return top.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "page", "n",
        F.col("rn").cast("int").alias("rn"),
    )


SQL_TRENDING = """
SELECT strftime(day, '%Y-%m-%d') AS day, page, n, rn FROM (
  SELECT day, page, n,
         CAST(row_number() OVER (PARTITION BY day ORDER BY n DESC, page) AS INTEGER) AS rn
  FROM (SELECT CAST(ts AS DATE) AS day,
               concat('p', CAST(((user_id % 37) + 37) % 37 AS VARCHAR)) AS page,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
) WHERE rn <= 3
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDC -> SCD2 validity intervals (operators/windows.py::
    # scd2_history): each user's event_type change points with
    # valid_from/valid_to/is_current; event_id breaks same-ms ties.
    # Timestamps emit as epoch-ms for integer-exact rows.
    from python_mapreduce_spark.operators.windows import scd2_history  # noqa: PLC0415

    out = scd2_history(
        table(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        tiebreak="event_id",
    )
    return out.select(
        F.col("key").alias("user_id"),
        "attr",
        F.unix_millis("valid_from").alias("from_ms"),
        F.unix_millis("valid_to").alias("to_ms"),
        "is_current",
    )


SQL_SCD2_HISTORY = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type AS attr,
       epoch_ms(ts) AS from_ms,
       epoch_ms(lead(ts) OVER w2) AS to_ms,
       (lead(ts) OVER w2 IS NULL) AS is_current
FROM chg
WINDOW w2 AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
"""


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-key z-score anomaly surface (operators/aggregates.py::
    # zscore_outliers): one grouped stats pass broadcast back onto the
    # stream; threshold decided at full double precision on both sides.
    return zscore_outliers(
        table(spark, sf_dir, "events"), ["event_type"], "event_id", "value", z=3.0
    )


SQL_ZSCORE_OUTLIERS = f"""
WITH stats AS (
  SELECT event_type, avg(CAST(value AS DOUBLE)) AS mu,
         stddev_samp(CAST(value AS DOUBLE)) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.event_id AS id, CAST(e.value AS DOUBLE) AS value,
       {sql_dround('(e.value - s.mu) / s.sd', 4)} AS zscore
FROM events e JOIN stats s USING (event_type)
WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) >= 3.0
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Population Stability Index drift monitor (operators/aggregates.py
    # ::psi_drift): events before Jan 15 are the reference snapshot,
    # events from Jan 15 on are the current snapshot; per event_type,
    # value distributions compare over the REFERENCE's decile buckets.
    # Each bucket's PSI term rounds to 1e-8 before a DECIMAL sum (the
    # perplexity-filter ln scheme), so the oracle replays it exactly.
    from python_mapreduce_spark.operators.aggregates import psi_drift  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    ref = ev.filter(F.col("ts") < "2024-01-15").select("event_type", "value")
    cur = ev.filter(F.col("ts") >= "2024-01-15").select("event_type", "value")
    return psi_drift(ref, cur, ["event_type"], "value", n_bins=10)


SQL_PSI_DRIFT = f"""
WITH ref AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
             WHERE ts < TIMESTAMP '2024-01-15' AND value IS NOT NULL),
cur AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        WHERE ts >= TIMESTAMP '2024-01-15' AND value IS NOT NULL),
thr AS (
  SELECT event_type,
         list_value({", ".join(sql_dround(f"quantile_cont(v, {i / 10})", 6) for i in range(1, 10))}) AS t
  FROM ref GROUP BY event_type
),
counts AS (
  SELECT event_type, b, CAST(sum(nr) AS BIGINT) AS nr, CAST(sum(nc) AS BIGINT) AS nc
  FROM (
    SELECT r.event_type, 1 + len(list_filter(thr.t, x -> x < r.v)) AS b, 1 AS nr, 0 AS nc
    FROM ref r JOIN thr USING (event_type)
    UNION ALL
    SELECT c.event_type, 1 + len(list_filter(thr.t, x -> x < c.v)), 0, 1
    FROM cur c JOIN thr USING (event_type)
  ) GROUP BY event_type, b
),
tot AS (
  SELECT event_type, CAST(sum(nr) AS DOUBLE) AS tr, CAST(sum(nc) AS DOUBLE) AS tc
  FROM counts GROUP BY event_type
),
terms AS (
  SELECT c.event_type,
         CAST({sql_dround("(greatest(c.nc / t.tc, 1e-4) - greatest(c.nr / t.tr, 1e-4))"
                          " * ln(greatest(c.nc / t.tc, 1e-4) / greatest(c.nr / t.tr, 1e-4))", 8)}
              AS DECIMAL(18,8)) AS term,
         t.tr, t.tc
  FROM counts c JOIN tot t USING (event_type)
)
SELECT event_type, CAST(max(tr) AS BIGINT) AS n_ref, CAST(max(tc) AS BIGINT) AS n_cur,
       {sql_dround("CAST(sum(term) AS DOUBLE)", 6)} AS psi,
       {sql_dround("CAST(sum(term) AS DOUBLE)", 6)} >= 0.2 AS drifted
FROM terms GROUP BY event_type
"""


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-sample Kolmogorov-Smirnov statistic (operators/aggregates.py
    # ::ks_statistic): click vs purchase value distributions. The sup
    # over the merged value order runs as ONE distributed running sum
    # (global_running_sum with both sides' counts packed into a single
    # long) — the oracle's plain window is the semantic twin only.
    from python_mapreduce_spark.operators.aggregates import ks_statistic  # noqa: PLC0415

    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("value")
    b = ev.filter(F.col("event_type") == "purchase").select("value")
    return ks_statistic(a, b, "value")


SQL_KS_TEST = f"""
WITH a AS (SELECT CAST(value AS DOUBLE) AS v FROM events
           WHERE event_type = 'click' AND value IS NOT NULL),
b AS (SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
counts AS (
  SELECT v, CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb
  FROM (
    SELECT v, 1 AS ca, 0 AS cb FROM a
    UNION ALL
    SELECT v, 0, 1 FROM b
  ) GROUP BY v
),
cum AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cca, sum(cb) OVER (ORDER BY v) AS ccb
  FROM counts
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS na FROM a),
totb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM b)
SELECT CAST(tot.na AS BIGINT) AS n_a, CAST(totb.nb AS BIGINT) AS n_b,
       {sql_dround("max(abs(cum.cca / tot.na - cum.ccb / totb.nb))", 6)} AS ks_stat
FROM cum, tot, totb GROUP BY tot.na, totb.nb
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Last-touch attribution (operators/events.py::
    # last_touch_attribution): each purchase credits the same user's
    # most recent click at-or-before it if within 2 hours. Runs as the
    # scalable as-of join after touches pre-reduce to one row per
    # (user, ts); the oracle replays it with an explicit ranked lateral.
    from python_mapreduce_spark.operators.events import last_touch_attribution  # noqa: PLC0415

    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase")
    tch = ev.filter(F.col("event_type") == "click")
    return last_touch_attribution(conv, tch, "user_id", "ts", "event_id", window_minutes=120)


SQL_ATTRIBUTION = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id AS "user", epoch_ms(ts) AS conv_ts_ms
  FROM events WHERE event_type = 'purchase'
),
tch AS (
  SELECT user_id AS "user", epoch_ms(ts) AS touch_ts_ms,
         CAST(max(event_id) AS BIGINT) AS touch_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
best AS (
  SELECT c.conv_id, t.touch_id, t.touch_ts_ms,
         row_number() OVER (PARTITION BY c.conv_id ORDER BY t.touch_ts_ms DESC) AS rn
  FROM conv c JOIN tch t ON c."user" = t."user" AND t.touch_ts_ms <= c.conv_ts_ms
)
SELECT c.conv_id, c."user", c.conv_ts_ms,
       CASE WHEN c.conv_ts_ms - b.touch_ts_ms <= 7200000 THEN b.touch_id END AS touch_id,
       CASE WHEN c.conv_ts_ms - b.touch_ts_ms <= 7200000
            THEN {sql_dround("CAST(c.conv_ts_ms - b.touch_ts_ms AS DOUBLE) / 60000.0", 4)}
       END AS mins_since,
       coalesce(c.conv_ts_ms - b.touch_ts_ms <= 7200000, FALSE) AS attributed
FROM conv c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (conv_id)
"""


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Association rules (operators/events.py::assoc_rules): per-user
    # event-type baskets, ordered-pair support/confidence/lift. One
    # distinct (basket, item) frame feeds the self-join AND every count.
    from python_mapreduce_spark.operators.events import assoc_rules  # noqa: PLC0415

    return assoc_rules(table(spark, sf_dir, "events"), "user_id", "event_type")


SQL_ASSOC_RULES = f"""
WITH items AS (SELECT DISTINCT user_id AS b, event_type AS i FROM events),
n_item AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY i),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM items),
pairs AS (
  SELECT a.i AS antecedent, c.i AS consequent, CAST(count(*) AS BIGINT) AS n_both
  FROM items a JOIN items c ON a.b = c.b AND a.i <> c.i
  GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.n_both,
       {sql_dround("CAST(p.n_both AS DOUBLE) / CAST(b.n AS DOUBLE)", 6)} AS support,
       {sql_dround("CAST(p.n_both AS DOUBLE) / CAST(na.n AS DOUBLE)", 6)} AS confidence,
       {sql_dround("CAST(p.n_both AS DOUBLE) / CAST(na.n AS DOUBLE)"
                   " / (CAST(nc.n AS DOUBLE) / CAST(b.n AS DOUBLE))", 6)} AS lift
FROM pairs p
JOIN n_item na ON p.antecedent = na.i
JOIN n_item nc ON p.consequent = nc.i
CROSS JOIN nb b
"""


def q_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mix-balance entropy (operators/aggregates.py::mix_entropy): per
    # source, the Shannon entropy of its language distribution plus the
    # ln(k)-normalized form — one (source, lang) agg feeds everything.
    from python_mapreduce_spark.operators.aggregates import mix_entropy  # noqa: PLC0415

    return mix_entropy(table(spark, sf_dir, "documents"), ["source"], "lang")


SQL_MIX_ENTROPY = f"""
WITH counts AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS DOUBLE) AS t FROM counts GROUP BY source),
terms AS (
  SELECT c.source, t.t,
         CAST({sql_dround("-(CAST(c.n AS DOUBLE) / t.t) * ln(CAST(c.n AS DOUBLE) / t.t)", 8)}
              AS DECIMAL(18,8)) AS term
  FROM counts c JOIN tot t USING (source)
),
agg AS (
  SELECT source, CAST(max(t) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_categories,
         {sql_dround("CAST(sum(term) AS DOUBLE)", 6)} AS entropy
  FROM terms GROUP BY source
)
SELECT source, n_rows, n_categories, entropy,
       CASE WHEN n_categories > 1
            THEN {sql_dround("entropy / ln(CAST(n_categories AS DOUBLE))", 6)}
            ELSE 0.0 END AS entropy_norm
FROM agg
"""


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Seasonal-naive anomaly detection (operators/windows.py::
    # seasonal_residual): per event_type daily DECIMAL totals, baseline
    # = the same weekday exactly 7 CALENDAR days back (self-join on
    # day - 7, so a gap in the series can't misalign the weekday),
    # anomaly when |residual| >= 3 x the type's median absolute
    # residual. The oracle replays the calendar join + MAD rule.
    from python_mapreduce_spark.operators.windows import seasonal_residual  # noqa: PLC0415

    out = seasonal_residual(
        table(spark, sf_dir, "events"), ["event_type"], "ts", "value", period_days=7
    )
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


SQL_SEASONAL_ANOMALY = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(value AS DECIMAL(18,6))) AS tot
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT d.event_type, d.day, d.tot, b.tot AS base
  FROM daily d
  LEFT JOIN daily b ON b.event_type = d.event_type AND b.day = d.day - 7
),
r2 AS (SELECT *, CAST(tot AS DOUBLE) - CAST(base AS DOUBLE) AS resid FROM r),
mad AS (
  SELECT event_type, {sql_dround("quantile_cont(abs(resid), 0.5)", 6)} AS m
  FROM r2 WHERE resid IS NOT NULL GROUP BY event_type
)
SELECT r2.event_type, strftime(r2.day, '%Y-%m-%d') AS day,
       {sql_dround("CAST(r2.tot AS DOUBLE)", 2)} AS daily_total,
       {sql_dround("CAST(r2.base AS DOUBLE)", 2)} AS baseline,
       {sql_dround("r2.resid", 2)} AS residual,
       coalesce(r2.resid IS NOT NULL AND mad.m > 0 AND abs(r2.resid) >= 3.0 * mad.m,
                FALSE) AS is_anomaly
FROM r2 LEFT JOIN mad USING (event_type)
"""


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Survivorship merge (operators/relational.py::golden_record): one
    # surviving event per (user_id, event_type) by (completeness over
    # value/props, recency, event_id) — a single max(struct) hash agg,
    # survivors picked map-side; the oracle replays the rule as a
    # ranked window.
    from python_mapreduce_spark.operators.relational import golden_record  # noqa: PLC0415

    return golden_record(
        table(spark, sf_dir, "events"),
        ["user_id", "event_type"],
        ["value", "props"],
        "ts",
        "event_id",
        ["value", "props"],
    )


SQL_GOLDEN_RECORD = """
WITH scored AS (
  SELECT user_id, event_type,
         CAST((CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS completeness,
         coalesce(epoch_ms(ts), -1) AS recency_ms,
         event_id AS tiebreak, value, props,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY (CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
                    + (CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) DESC,
                    coalesce(epoch_ms(ts), -1) DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, event_type, completeness, recency_ms, tiebreak, value, props
FROM scored WHERE rn = 1
"""


def q_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group OLS trend (operators/aggregates.py::group_ols): per
    # event_type, value regressed on the day index — slope/intercept/r²
    # from ONE aggregation of DECIMAL-exact sufficient statistics; the
    # oracle replays the sums and the fixed-shape closed form.
    from python_mapreduce_spark.operators.aggregates import group_ols  # noqa: PLC0415

    ev = table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    return group_ols(ev, ["event_type"], x, F.col("value"))


SQL_GROUP_OLS = f"""
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DECIMAL(18,6))
                       * CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DECIMAL(18,6))
                       * CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DECIMAL(18,6))
                       AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
                       AS DECIMAL(28,8))) AS DOUBLE) AS syy
  FROM events GROUP BY event_type
),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * sxy - sx * sy AS cov_n,
         CAST(n AS DOUBLE) * sxx - sx * sx AS var_x,
         CAST(n AS DOUBLE) * syy - sy * sy AS var_y,
         sx, sy
  FROM stats
)
SELECT event_type, n,
       CASE WHEN var_x > 0 THEN {sql_dround("cov_n / var_x", 6)} END AS slope,
       CASE WHEN var_x > 0
            THEN {sql_dround("(sy - (cov_n / var_x) * sx) / CAST(n AS DOUBLE)", 6)} END AS intercept,
       CASE WHEN var_x > 0 AND var_y > 0
            THEN {sql_dround("cov_n * cov_n / (var_x * var_y)", 6)} END AS r2
FROM d
"""


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trailing 7-day distinct users per event_type per day (operators/
    # events.py::rolling_distinct) — the WAU staple, exact and
    # distributed: distinct (key, day, id) frame fans out to the days
    # it covers, no COUNT(DISTINCT) RANGE window anywhere. The oracle
    # is the direct inequality-join replay.
    from python_mapreduce_spark.operators.events import rolling_distinct  # noqa: PLC0415

    out = rolling_distinct(
        table(spark, sf_dir, "events"), ["event_type"], "ts", "user_id", window_days=7
    )
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


SQL_ROLLING_DISTINCT = """
WITH daily AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id AS id FROM events
),
days AS (SELECT DISTINCT event_type, day FROM daily)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT a.id) AS BIGINT) AS rolling_distinct
FROM days d
JOIN daily a ON a.event_type = d.event_type
            AND a.day >= d.day - 6 AND a.day <= d.day
GROUP BY d.event_type, d.day
"""


def q_decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exponentially-decayed trending (operators/events.py::
    # decayed_trending): top-10 pages by half-life-24h decayed score as
    # of the stream's latest event. pow() terms round to 1e-8 before a
    # DECIMAL sum (the ln scheme), so the oracle replays bit-for-bit;
    # the global rank is the scalable global_row_number.
    from python_mapreduce_spark.operators.events import decayed_trending  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    item = F.concat(F.lit("p"), F.pmod("user_id", F.lit(37)).cast("string"))
    return decayed_trending(ev, item, "ts", halflife_hours=24.0, k=10)


SQL_DECAYED_TRENDING = f"""
WITH amax AS (SELECT max(epoch_ms(ts)) AS a FROM events WHERE user_id IS NOT NULL),
terms AS (
  SELECT 'p' || CAST(user_id % 37 AS VARCHAR) AS item,
         CAST({sql_dround("pow(2.0, -CAST(amax.a - epoch_ms(ts) AS DOUBLE) / 86400000.0)", 8)}
              AS DECIMAL(28,8)) AS term
  FROM events, amax WHERE user_id IS NOT NULL
),
scored AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_events,
         {sql_dround("CAST(sum(term) AS DOUBLE)", 6)} AS score
  FROM terms GROUP BY item
)
SELECT item, n_events, score, rank FROM (
  SELECT item, n_events, score,
         CAST(row_number() OVER (ORDER BY score DESC, item ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 10
"""


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group rank transform (operators/windows.py::
    # quantile_normalize): event values to their percent_rank within
    # each event_type — score calibration across heterogeneous scorers.
    # Rank semantics make ties order-independent, so both engines agree
    # with no tiebreak column.
    from python_mapreduce_spark.operators.windows import quantile_normalize  # noqa: PLC0415

    return quantile_normalize(
        table(spark, sf_dir, "events"), ["event_type"], "event_id", "value"
    )


SQL_QUANTILE_NORMALIZE = f"""
SELECT event_type, event_id AS id, CAST(value AS DOUBLE) AS value,
       {sql_dround("percent_rank() OVER (PARTITION BY event_type ORDER BY CAST(value AS DOUBLE))", 6)} AS pctile
FROM events
"""


def q_time_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Purged temporal split (operators/relational.py::
    # time_split_embargo): train before Jan 20, a 2-day embargo buffer,
    # test from Jan 22 — the leakage-safe split for time-correlated
    # data. Pure projection; the oracle replays the CASE rule.
    from python_mapreduce_spark.operators.relational import time_split_embargo  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    out = time_split_embargo(ev, "ts", train_end="2024-01-20", test_start="2024-01-22")
    return out.select(F.col("event_id").alias("id"), "split", "purged")


SQL_TIME_SPLIT_EMBARGO = """
SELECT event_id AS id,
       CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
            WHEN ts >= TIMESTAMP '2024-01-22' THEN 'test'
            ELSE 'embargo' END AS split,
       ts >= TIMESTAMP '2024-01-20' AND ts < TIMESTAMP '2024-01-22' AS purged
FROM events
"""


def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Balanced class weights (operators/aggregates.py::class_weights):
    # N / (k * n_label) per event_type — the loss-weighting table for a
    # skewed label distribution; one count agg, totals re-aggregated
    # from it.
    from python_mapreduce_spark.operators.aggregates import class_weights  # noqa: PLC0415

    return class_weights(table(spark, sf_dir, "events"), "event_type")


SQL_CLASS_WEIGHTS = f"""
WITH counts AS (
  SELECT event_type AS label, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(count(*) AS DOUBLE) AS kk FROM counts)
SELECT counts.label, counts.n,
       {sql_dround("CAST(counts.n AS DOUBLE) / tot.nn", 6)} AS freq,
       {sql_dround("tot.nn / (tot.kk * CAST(counts.n AS DOUBLE))", 6)} AS weight
FROM counts, tot
"""


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distributed ROC AUC (operators/aggregates.py::auc_score): does
    # event value rank purchases above clicks? Scores round to 0.1 so
    # the tie half-credit path is exercised; the rank identity runs as
    # per-distinct-value counts + ONE distributed running sum — no
    # global sort, no single-task window.
    from python_mapreduce_spark.operators.aggregates import auc_score  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    scored = ev.select(
        dround(F.col("value"), 1).alias("score"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return auc_score(scored, "score", "is_pos")


SQL_AUC = f"""
WITH base AS (
  SELECT {sql_dround("CAST(value AS DOUBLE)", 1)} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
counts AS (
  SELECT s, CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS ng
  FROM base GROUP BY s
),
cum AS (SELECT p, ng, sum(ng) OVER (ORDER BY s) AS cn FROM counts)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN {sql_dround("num2 / (2.0 * n_pos * n_neg)", 6)} END AS auc
FROM (
  SELECT 1 AS g,
         CAST(sum(p) AS BIGINT) AS n_pos,
         CAST(sum(ng) AS BIGINT) AS n_neg,
         CAST(sum(p * (2 * (cn - ng) + ng)) AS DOUBLE) AS num2
  FROM cum GROUP BY g
)
"""


def q_auc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group (sliced) AUC: the same rank identity per day — the
    # slice-level eval that catches a model good on average but broken
    # on a segment. Grouped path: the cumulative count is a window
    # PARTITIONED BY day over the per-(day, score) count frame.
    from python_mapreduce_spark.operators.aggregates import auc_score  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    scored = ev.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        dround(F.col("value"), 1).alias("score"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return auc_score(scored, "score", "is_pos", group_cols=["day"])


SQL_AUC_DAILY = f"""
WITH base AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         {sql_dround("CAST(value AS DOUBLE)", 1)} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
counts AS (
  SELECT day, s, CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS ng
  FROM base GROUP BY 1, 2
),
cum AS (
  SELECT day, p, ng, sum(ng) OVER (PARTITION BY day ORDER BY s) AS cn FROM counts
)
SELECT day, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN {sql_dround("num2 / (2.0 * n_pos * n_neg)", 6)} END AS auc
FROM (
  SELECT day,
         CAST(sum(p) AS BIGINT) AS n_pos,
         CAST(sum(ng) AS BIGINT) AS n_neg,
         CAST(sum(p * (2 * (cn - ng) + ng)) AS DOUBLE) AS num2
  FROM cum GROUP BY day
)
"""


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Precision-recall sweep (operators/aggregates.py::pr_curve): one
    # row per distinct threshold over the q_auc scoring task. The
    # cumulative predicted/true-positive counts ride ONE multi-weight
    # distributed running sum over descending score — no global sort,
    # no single-task window.
    from python_mapreduce_spark.operators.aggregates import pr_curve  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    scored = ev.select(
        dround(F.col("value"), 1).alias("score"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return pr_curve(scored, "score", "is_pos")


SQL_PR_CURVE = f"""
WITH base AS (
  SELECT {sql_dround("CAST(value AS DOUBLE)", 1)} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
counts AS (
  SELECT s, CAST(sum(y) AS BIGINT) AS p, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY s
),
cum AS (
  SELECT s, sum(p) OVER (ORDER BY s DESC) AS cp,
         sum(c) OVER (ORDER BY s DESC) AS np
  FROM counts
),
tot AS (SELECT CAST(sum(y) AS BIGINT) AS tp_all FROM base)
SELECT s AS threshold,
       CAST(np AS BIGINT) AS n_pred,
       CAST(cp AS BIGINT) AS tp,
       {sql_dround("CAST(cp AS DOUBLE) / np", 6)} AS precision,
       CASE WHEN tp_all > 0 THEN {sql_dround("CAST(cp AS DOUBLE) / tp_all", 6)} END AS recall,
       CASE WHEN tp_all > 0 AND cp > 0 THEN
         {sql_dround(
             "2.0 * (CAST(cp AS DOUBLE) / np) * (CAST(cp AS DOUBLE) / tp_all)"
             " / (CAST(cp AS DOUBLE) / np + CAST(cp AS DOUBLE) / tp_all)", 6)}
       END AS f1
FROM cum CROSS JOIN tot
"""


def q_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decile lift/gain table (operators/aggregates.py::lift_gain) for
    # the q_auc scoring task: exact equal-size buckets via integer
    # arithmetic on aggregated (score, label) stripes — rows never
    # shuffle by bucket, the exploded frame is stripe-count-sized.
    from python_mapreduce_spark.operators.aggregates import lift_gain  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    scored = ev.select(
        dround(F.col("value"), 1).alias("score"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return lift_gain(scored, "score", "is_pos", n_buckets=10)


SQL_LIFT_GAIN = f"""
WITH base AS (
  SELECT {sql_dround("CAST(value AS DOUBLE)", 1)} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
rk AS (
  SELECT y, row_number() OVER (ORDER BY s DESC, y ASC) - 1 AS r FROM base
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all, CAST(sum(y) AS BIGINT) AS p_all FROM base),
b AS (
  SELECT CAST((r * 10) // n_all AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM rk CROSS JOIN tot GROUP BY 1
)
SELECT bucket, n, n_pos,
       CAST(sum(n_pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos,
       CASE WHEN p_all > 0 THEN
         {sql_dround("CAST(sum(n_pos) OVER (ORDER BY bucket) AS DOUBLE) / p_all", 6)}
       END AS gain,
       CASE WHEN p_all > 0 THEN
         {sql_dround("(CAST(n_pos AS DOUBLE) / n) / (CAST(p_all AS DOUBLE) / n_all)", 6)}
       END AS lift
FROM b CROSS JOIN tot
"""


def q_auc_disparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fairness-slice eval (operators/aggregates.py::auc_disparity):
    # per-user-cohort AUC beside the overall AUC and the gap — catches
    # a model good on average, broken on a segment. Both AUC plans are
    # the sort-free rank identity; the overall row broadcasts.
    from python_mapreduce_spark.operators.aggregates import auc_disparity  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("user_id").isNotNull()
    )
    scored = ev.select(
        F.concat(F.lit("s"), (F.col("user_id") % 4).cast("string")).alias("segment"),
        dround(F.col("value"), 1).alias("score"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return auc_disparity(scored, "score", "is_pos", "segment")


SQL_AUC_DISPARITY = f"""
WITH base AS (
  SELECT 's' || CAST(user_id % 4 AS VARCHAR) AS segment,
         {sql_dround("CAST(value AS DOUBLE)", 1)} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        AND user_id IS NOT NULL
),
counts AS (
  SELECT segment, s, CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS ng
  FROM base GROUP BY 1, 2
),
cum AS (
  SELECT segment, p, ng,
         sum(ng) OVER (PARTITION BY segment ORDER BY s) AS cn
  FROM counts
),
per AS (
  SELECT segment,
         CAST(sum(p) AS BIGINT) AS n_pos,
         CAST(sum(ng) AS BIGINT) AS n_neg,
         CAST(sum(p * (2 * (cn - ng) + ng)) AS DOUBLE) AS num2
  FROM cum GROUP BY segment
),
ocounts AS (
  SELECT s, CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS ng
  FROM base GROUP BY s
),
ocum AS (SELECT p, ng, sum(ng) OVER (ORDER BY s) AS cn FROM ocounts),
ov AS (
  SELECT CASE WHEN sum(p) > 0 AND sum(ng) > 0 THEN
           {sql_dround("CAST(sum(p * (2 * (cn - ng) + ng)) AS DOUBLE)"
                       " / (2.0 * sum(p) * sum(ng))", 6)}
         END AS auc_overall
  FROM ocum
)
SELECT segment, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN {sql_dround("num2 / (2.0 * n_pos * n_neg)", 6)} END AS auc,
       auc_overall,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         {sql_dround(
             "CASE WHEN n_pos > 0 AND n_neg > 0"
             " THEN " + sql_dround("num2 / (2.0 * n_pos * n_neg)", 6)
             + " END - auc_overall", 6)}
       END AS auc_gap
FROM per CROSS JOIN ov
"""


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kaplan-Meier churn curve (operators/events.py::survival_curve):
    # per-user lifetime = days between first and last activity, event
    # = went quiet before Jan 25 (else right-censored at the
    # observation edge). The product runs as a running sum of 1e-8-
    # scaled ln terms — exact long arithmetic through two distributed
    # running sums — so the oracle replays it digit-for-digit.
    from python_mapreduce_spark.operators.events import survival_curve  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"), F.max(F.to_date("ts")).alias("ld")
    )
    obs = per_user.select(
        F.datediff("ld", "fd").cast("double").alias("dur"),
        (F.col("ld") < F.to_date(F.lit("2024-01-25"))).alias("churned"),
    )
    return survival_curve(obs, "dur", "churned")


SQL_SURVIVAL_CURVE = f"""
WITH pu AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS fd, max(CAST(ts AS DATE)) AS ld
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
obs AS (
  -- ld IS NOT NULL mirrors the operator's isNotNull duration/flag
  -- filters (ADVICE r7): a user whose every ts is NULL must not
  -- inflate n or emit a NULL-duration row on the oracle side only
  SELECT CAST(ld - fd AS DOUBLE) AS t,
         CASE WHEN ld < DATE '2024-01-25' THEN 1 ELSE 0 END AS e
  FROM pu WHERE ld IS NOT NULL
),
counts AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d, CAST(sum(1 - e) AS BIGINT) AS c
  FROM obs GROUP BY t
),
cum AS (SELECT *, sum(d + c) OVER (ORDER BY t) AS cumdc FROM counts),
tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM counts),
r AS (SELECT t, d, c, n - (cumdc - d - c) AS nrisk FROM cum CROSS JOIN tot),
term AS (
  SELECT *, CASE WHEN d = 0 THEN 0
                 WHEN d < nrisk THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / nrisk)
                                                * 100000000.0 + 0.5) AS BIGINT)
                 ELSE -1000000000000 END AS t8
  FROM r
),
s AS (SELECT *, sum(t8) OVER (ORDER BY t) AS cln8 FROM term)
SELECT t AS duration, CAST(nrisk AS BIGINT) AS n_risk, d AS n_events,
       c AS n_censored,
       {sql_dround("exp(CAST(cln8 AS DOUBLE) / 100000000.0)", 6)} AS survival
FROM s
"""


def q_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    # First-order Markov transition matrix (operators/events.py::
    # markov_transitions) over per-user event sequences ordered by
    # (ts, event_id) — next-event probabilities from one per-user
    # window + one state^2-sized agg.
    from python_mapreduce_spark.operators.events import markov_transitions  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return markov_transitions(ev, "user_id", ["ts", "event_id"], "event_type")


SQL_MARKOV = f"""
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
counts AS (
  SELECT prev AS from_state, event_type AS to_state, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_state, CAST(sum(n) AS DOUBLE) AS t FROM counts GROUP BY 1)
SELECT from_state, to_state, n, {sql_dround("n / t", 6)} AS prob
FROM counts JOIN tot USING (from_state)
"""


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session-depth summary (operators/events.py::session_stats):
    # count, events/session, exact duration percentiles over 30-minute
    # gap sessions — sessionize's one shuffle + ONE global aggregate.
    from python_mapreduce_spark.operators.events import session_stats  # noqa: PLC0415

    return session_stats(table(spark, sf_dir, "events"), "user_id", "ts")


SQL_SESSION_STATS = f"""
WITH base AS (
  SELECT user_id AS u, epoch_ms(ts) AS ms FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
seq AS (
  SELECT u, ms,
         CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS nw
  FROM base WINDOW w AS (PARTITION BY u ORDER BY ms)
),
sess AS (
  SELECT u, ms,
         sum(nw) OVER (PARTITION BY u ORDER BY ms
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
),
per AS (
  SELECT u, sid, CAST(count(*) AS BIGINT) AS n,
         CAST(max(ms) - min(ms) AS DOUBLE) / 60000.0 AS dur
  FROM sess GROUP BY 1, 2
)
SELECT n_sessions, n_events,
       {sql_dround("CAST(n_events AS DOUBLE) / n_sessions", 6)} AS events_per_session,
       CAST(CAST(q[1] AS DECIMAL(18,4)) AS VARCHAR) AS dur_p50,
       CAST(CAST(q[2] AS DECIMAL(18,4)) AS VARCHAR) AS dur_p90,
       CAST(CAST(q[3] AS DECIMAL(18,4)) AS VARCHAR) AS dur_p99
FROM (
  SELECT 1 AS g, CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(n) AS BIGINT) AS n_events,
         quantile_cont(dur, [0.5, 0.9, 0.99]) AS q
  FROM per GROUP BY g
)
"""


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFM segmentation (operators/events.py::rfm_segments): per-user
    # recency/frequency/monetary scored 1..5 by global exact quantile
    # thresholds broadcast back onto the user frame; segment sizes.
    from python_mapreduce_spark.operators.events import rfm_segments  # noqa: PLC0415

    return rfm_segments(table(spark, sf_dir, "events"), "user_id", "ts", "value")


SQL_RFM = """
WITH base AS (
  SELECT user_id AS u, epoch_ms(ts) AS ms, value FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
mx AS (SELECT max(ms) AS am FROM base),
users AS (
  SELECT u, CAST(floor((am - max(ms)) / 86400000.0) AS BIGINT) AS r,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(floor(coalesce(value, 0.0) * 10000.0 + 0.5) / 10000.0
                       AS DECIMAL(28,4))) AS DOUBLE) AS m
  FROM base, mx GROUP BY u, am
),
thr AS (
  SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS tr,
         quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS tf,
         quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS tm
  FROM users
),
scored AS (
  SELECT CAST(6 - (1 + len(list_filter(tr, t -> t < r))) AS INT) AS r_score,
         CAST(1 + len(list_filter(tf, t -> t < f)) AS INT) AS f_score,
         CAST(1 + len(list_filter(tm, t -> t < m)) AS INT) AS m_score
  FROM users, thr
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users
FROM scored GROUP BY 1, 2, 3
"""


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairwise Pearson correlations (operators/aggregates.py::
    # correlation_matrix) across the four lineitem measures — ONE
    # global agg of DECIMAL-exact sufficient statistics, pair table
    # exploded from the single result row.
    from python_mapreduce_spark.operators.aggregates import correlation_matrix  # noqa: PLC0415

    return correlation_matrix(
        table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _sql_corr_matrix() -> str:
    cs = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(i, j) for i in range(len(cs)) for j in range(len(cs)) if i < j]

    def r4(e: str) -> str:
        return f"floor(CAST({e} AS DOUBLE) * 10000.0 + 0.5) / 10000.0"

    def r8(e: str) -> str:
        return f"floor(({e}) * 100000000.0 + 0.5) / 100000000.0"

    stats, rows = [], []
    for i, j in pairs:
        a, b = cs[i], cs[j]
        t = f"{i}_{j}"
        both = f"{a} IS NOT NULL AND {b} IS NOT NULL"
        x, y = r4(a), r4(b)
        stats.append(f"CAST(sum(CASE WHEN {both} THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}")
        stats.append(f"sum(CASE WHEN {both} THEN CAST({x} AS DECIMAL(38,8)) END) AS sx_{t}")
        stats.append(f"sum(CASE WHEN {both} THEN CAST({y} AS DECIMAL(38,8)) END) AS sy_{t}")
        stats.append(f"sum(CASE WHEN {both} THEN CAST({r8(f'({x}) * ({y})')} AS DECIMAL(38,8)) END) AS sxy_{t}")
        stats.append(f"sum(CASE WHEN {both} THEN CAST({r8(f'({x}) * ({x})')} AS DECIMAL(38,8)) END) AS sxx_{t}")
        stats.append(f"sum(CASE WHEN {both} THEN CAST({r8(f'({y}) * ({y})')} AS DECIMAL(38,8)) END) AS syy_{t}")
        covn = f"(CAST(n_{t} AS DOUBLE) * CAST(sxy_{t} AS DOUBLE) - CAST(sx_{t} AS DOUBLE) * CAST(sy_{t} AS DOUBLE))"
        varx = f"(CAST(n_{t} AS DOUBLE) * CAST(sxx_{t} AS DOUBLE) - CAST(sx_{t} AS DOUBLE) * CAST(sx_{t} AS DOUBLE))"
        vary = f"(CAST(n_{t} AS DOUBLE) * CAST(syy_{t} AS DOUBLE) - CAST(sy_{t} AS DOUBLE) * CAST(sy_{t} AS DOUBLE))"
        corr = sql_dround(f"{covn} / sqrt({varx} * {vary})", 6)
        rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n_{t} AS n,\n"
            f"       CASE WHEN n_{t} >= 2 AND {varx} > 0 AND {vary} > 0\n"
            f"            THEN {corr} END AS corr FROM wide"
        )
    return "WITH wide AS (\n  SELECT " + ",\n         ".join(stats) + "\n  FROM lineitem\n)\n" + "\nUNION ALL\n".join(rows)


SQL_CORR_MATRIX = _sql_corr_matrix()


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-digit audit (operators/aggregates.py::
    # benford_audit) of order totals — the fabricated-data / unit-mixup
    # screen beside q_dq_audit. Expected shares are Python-precomputed
    # literals interpolated into BOTH engines, so log10's 1-ulp
    # engine variance can't flip the hash.
    from python_mapreduce_spark.operators.aggregates import benford_audit  # noqa: PLC0415

    return benford_audit(table(spark, sf_dir, "orders"), "o_totalprice")


def _sql_benford() -> str:
    from python_mapreduce_spark.operators.aggregates import BENFORD_EXPECTED  # noqa: PLC0415

    values = ", ".join(f"({d}, {p!r})" for d, p in sorted(BENFORD_EXPECTED.items()))
    return f"""
WITH base AS (
  SELECT CAST(NULLIF(regexp_extract(
           CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS VARCHAR), '[1-9]'), '') AS INT)
         AS digit
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
),
counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM base
  WHERE digit IS NOT NULL GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM counts),
exp(digit, p) AS (VALUES {values})
SELECT digit, n,
       {sql_dround("n / t", 6)} AS share,
       {sql_dround("p", 6)} AS expected,
       {sql_dround("(n - p * t) * (n - p * t) / (p * t)", 6)} AS chi2_term
FROM counts JOIN exp USING (digit), tot
"""


SQL_BENFORD = _sql_benford()


def q_user_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Daily churn triplet (operators/events.py::user_churn): retained /
    # new / churned distinct users per active day, via the two-row
    # fan-out — no day-over-day set self-join.
    from python_mapreduce_spark.operators.events import user_churn  # noqa: PLC0415

    return user_churn(table(spark, sf_dir, "events"), "user_id", "ts")


SQL_USER_CHURN = """
WITH days AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
fan AS (
  SELECT u, d AS cmp, 1 AS cur, 0 AS prev FROM days
  UNION ALL
  SELECT u, d + INTERVAL 1 DAY, 0, 1 FROM days
),
flags AS (
  SELECT cmp, u, max(cur) AS c, max(prev) AS p FROM fan GROUP BY 1, 2
),
agg AS (
  SELECT cmp, CAST(sum(c) AS BIGINT) AS active,
         CAST(sum(c * p) AS BIGINT) AS retained,
         CAST(sum(c * (1 - p)) AS BIGINT) AS new_users,
         CAST(sum((1 - c) * p) AS BIGINT) AS churned
  FROM flags GROUP BY 1
)
SELECT strftime(CAST(cmp AS DATE), '%Y-%m-%d') AS day, active, retained, new_users, churned
FROM agg WHERE active > 0
"""


def q_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-completeness audit (operators/events.py::gap_report): per
    # event_type, missing daily buckets between first and last activity
    # — the "did ingestion skip a day" freshness check; one (key, day)
    # agg + one re-agg, no calendar explode.
    from python_mapreduce_spark.operators.events import gap_report  # noqa: PLC0415

    return gap_report(table(spark, sf_dir, "events"), "event_type", "ts")


SQL_GAP_REPORT = f"""
WITH days AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS d
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2
),
agg AS (
  SELECT key, min(d) AS fd, max(d) AS ld, CAST(count(*) AS BIGINT) AS n_observed
  FROM days GROUP BY 1
)
SELECT key, strftime(fd, '%Y-%m-%d') AS first_day, strftime(ld, '%Y-%m-%d') AS last_day,
       CAST(date_diff('day', fd, ld) + 1 AS BIGINT) AS n_expected,
       n_observed,
       CAST(date_diff('day', fd, ld) + 1 - n_observed AS BIGINT) AS n_missing,
       {sql_dround("CAST(n_observed AS DOUBLE) / (date_diff('day', fd, ld) + 1)", 6)}
         AS coverage
FROM agg
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Click-to-purchase latency distribution (operators/events.py::
    # conversion_lag): exact p50/p90/p99 of the attributed lag + the
    # attach rate, over the same 2h last-touch rule as q_attribution.
    # One as-of join + ONE global aggregate; percentiles ship as
    # DECIMAL(18,4) strings (the q_percentiles cross-engine trick).
    from python_mapreduce_spark.operators.events import conversion_lag  # noqa: PLC0415

    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase")
    tch = ev.filter(F.col("event_type") == "click")
    return conversion_lag(conv, tch, "user_id", "ts", "event_id", window_minutes=120)


SQL_CONVERSION_LAG = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id AS u, epoch_ms(ts) AS cts
  FROM events WHERE event_type = 'purchase'
),
tch AS (
  SELECT user_id AS u, epoch_ms(ts) AS tts
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
best AS (
  SELECT c.conv_id, t.tts,
         row_number() OVER (PARTITION BY c.conv_id ORDER BY t.tts DESC) AS rn
  FROM conv c JOIN tch t ON c.u = t.u AND t.tts <= c.cts
),
att AS (
  SELECT c.conv_id,
         CASE WHEN c.cts - b.tts <= 7200000
              THEN {sql_dround("CAST(c.cts - b.tts AS DOUBLE) / 60000.0", 4)} END AS mins,
         coalesce(c.cts - b.tts <= 7200000, FALSE) AS attributed
  FROM conv c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (conv_id)
)
SELECT n_conversions, n_attributed,
       {sql_dround("CAST(n_attributed AS DOUBLE) / n_conversions", 6)} AS attach_rate,
       CAST(CAST(q[1] AS DECIMAL(18,4)) AS VARCHAR) AS lag_p50,
       CAST(CAST(q[2] AS DECIMAL(18,4)) AS VARCHAR) AS lag_p90,
       CAST(CAST(q[3] AS DECIMAL(18,4)) AS VARCHAR) AS lag_p99
FROM (
  SELECT 1 AS g, CAST(count(*) AS BIGINT) AS n_conversions,
         CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         quantile_cont(CASE WHEN attributed THEN mins END, [0.5, 0.9, 0.99]) AS q
  FROM att GROUP BY g
)
"""


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-10 session-opening paths (operators/events.py::top_paths):
    # each user's first three event types joined with '>' — per-key
    # window + map-side path counts + the scalable global rank.
    from python_mapreduce_spark.operators.events import top_paths  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return top_paths(ev, "user_id", ["ts", "event_id"], "event_type", depth=3, k=10)


SQL_TOP_PATHS = """
WITH headed AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL
),
p AS (
  SELECT user_id, string_agg(coalesce(event_type, ''), '>' ORDER BY rn) AS path
  FROM headed WHERE rn <= 3 GROUP BY 1
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_keys FROM p GROUP BY 1)
SELECT path, n_keys, rank FROM (
  SELECT path, n_keys,
         CAST(row_number() OVER (ORDER BY n_keys DESC, path) AS BIGINT) AS rank
  FROM c
) WHERE rank <= 10
"""


def q_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Categorical drift (operators/aggregates.py::jsd_drift): the
    # event-type MIX before vs from Jan 15 — the symmetric, ln2-bounded
    # companion to q_psi_drift (numeric deciles) and q_ks_test
    # (binning-free numeric); well-defined for one-sided categories.
    from python_mapreduce_spark.operators.aggregates import jsd_drift  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    ref = ev.filter(F.col("ts") < "2024-01-15").select("event_type")
    cur = ev.filter(F.col("ts") >= "2024-01-15").select("event_type")
    return jsd_drift(ref, cur, "event_type")


SQL_JSD_DRIFT = f"""
WITH ca AS (
  SELECT event_type AS c, CAST(count(*) AS BIGINT) AS na FROM events
  WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1
),
cb AS (
  SELECT event_type AS c, CAST(count(*) AS BIGINT) AS nb FROM events
  WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1
),
merged AS (
  SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
  FROM ca FULL OUTER JOIN cb ON ca.c IS NOT DISTINCT FROM cb.c
),
tot AS (SELECT CAST(sum(na) AS DOUBLE) AS ta, CAST(sum(nb) AS DOUBLE) AS tb
        FROM merged),
terms AS (
  SELECT na, nb,
         CAST(floor((
             CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
           + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END
         ) * 100000000.0 + 0.5) / 100000000.0 AS DECIMAL(18,8)) AS term
  FROM (
    SELECT na, nb,
           CASE WHEN ta > 0 THEN na / ta ELSE 0.0 END AS p,
           CASE WHEN tb > 0 THEN nb / tb ELSE 0.0 END AS q
    FROM merged, tot
  )
)
SELECT n_a, n_b, n_categories,
       CASE WHEN n_a > 0 AND n_b > 0 THEN jsd END AS jsd
FROM (
  SELECT 1 AS g, CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b,
         CAST(count(*) AS BIGINT) AS n_categories,
         {sql_dround("CAST(sum(term) AS DOUBLE)", 6)} AS jsd
  FROM terms GROUP BY g
)
"""


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Declarative data-quality suite (operators/aggregates.py::
    # dq_audit, the Deequ/great_expectations shape): five constraint
    # rules over orders — completeness, range, set membership, pattern
    # conformance (all in ONE scan/agg) plus key uniqueness. NULL
    # predicates count as violations.
    from python_mapreduce_spark.operators.aggregates import dq_audit  # noqa: PLC0415

    o = table(spark, sf_dir, "orders")
    checks = [
        ("not_null(o_custkey)", F.col("o_custkey").isNotNull()),
        ("range(o_totalprice)", F.col("o_totalprice").between(0, 600000)),
        ("in_set(o_orderstatus)", F.col("o_orderstatus").isin("O", "F", "P")),
        ("pattern(o_orderpriority)", F.col("o_orderpriority").rlike("^[1-5]-")),
        ("recent(o_orderdate)", F.col("o_orderdate") >= F.lit("1992-01-01")),
    ]
    return dq_audit(o, checks, unique_cols=["o_orderkey"])


SQL_DQ_AUDIT = f"""
WITH wide AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
    CAST(sum(CASE WHEN o_totalprice BETWEEN 0 AND 600000 THEN 0 ELSE 1 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS v2,
    CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 0 ELSE 1 END) AS BIGINT) AS v3,
    CAST(sum(CASE WHEN o_orderdate >= DATE '1992-01-01' THEN 0 ELSE 1 END) AS BIGINT) AS v4
  FROM orders
),
uniq AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v
  FROM orders WHERE o_orderkey IS NOT NULL
),
longf AS (
  SELECT 'not_null(o_custkey)' AS rule, n AS n_checked, v0 AS n_violations FROM wide
  UNION ALL SELECT 'range(o_totalprice)', n, v1 FROM wide
  UNION ALL SELECT 'in_set(o_orderstatus)', n, v2 FROM wide
  UNION ALL SELECT 'pattern(o_orderpriority)', n, v3 FROM wide
  UNION ALL SELECT 'recent(o_orderdate)', n, v4 FROM wide
  UNION ALL SELECT 'unique(o_orderkey)', n, v FROM uniq
)
SELECT rule, n_checked, n_violations,
       CASE WHEN n_checked > 0
            THEN {sql_dround("CAST(n_violations AS DOUBLE) / n_checked", 6)}
            ELSE 0.0 END AS violation_rate
FROM longf
"""


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Metadata-dependence audit (operators/aggregates.py::
    # mutual_information): how much of `source` is explained by `lang`?
    # One (lang, source) agg; marginals/entropies re-derive from the
    # class^2 frame; p*ln terms ride the 1e-8 DECIMAL scheme.
    from python_mapreduce_spark.operators.aggregates import mutual_information  # noqa: PLC0415

    return mutual_information(table(spark, sf_dir, "documents"), "lang", "source")


SQL_MUTUAL_INFO = f"""
WITH conf AS (
  SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM conf),
ma AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM conf GROUP BY 1),
mb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM conf GROUP BY 1),
mi AS (
  SELECT 1 AS g, CAST(max(t) AS BIGINT) AS n,
         CAST(sum(CAST(floor((conf.n / t) * ln(conf.n * t / (na * nb))
                             * 100000000.0 + 0.5) / 100000000.0
                       AS DECIMAL(18,8))) AS DOUBLE) AS mi
  FROM conf
  JOIN ma ON conf.a IS NOT DISTINCT FROM ma.a
  JOIN mb ON conf.b IS NOT DISTINCT FROM mb.b
  CROSS JOIN tot GROUP BY g
),
ha AS (
  SELECT CAST(sum(CAST(floor(-(na / t) * ln(na / t) * 100000000.0 + 0.5)
                       / 100000000.0 AS DECIMAL(18,8))) AS DOUBLE) AS h
  FROM ma CROSS JOIN (SELECT CAST(sum(na) AS DOUBLE) AS t FROM ma)
),
hb AS (
  SELECT CAST(sum(CAST(floor(-(nb / t) * ln(nb / t) * 100000000.0 + 0.5)
                       / 100000000.0 AS DECIMAL(18,8))) AS DOUBLE) AS h
  FROM mb CROSS JOIN (SELECT CAST(sum(nb) AS DOUBLE) AS t FROM mb)
)
SELECT n, {sql_dround("ha.h", 6)} AS h_a, {sql_dround("hb.h", 6)} AS h_b,
       {sql_dround("mi.mi", 6)} AS mi,
       CASE WHEN ha.h > 0 AND hb.h > 0
            THEN {sql_dround("mi.mi / sqrt(ha.h * hb.h)", 6)} END AS nmi
FROM mi, ha, hb
"""


def q_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weight-of-evidence + information value (operators/aggregates.py::
    # woe_encode) of `source` against the lang='en' outcome — the
    # tabular encode/feature-screen table; one conditional-count agg.
    from python_mapreduce_spark.operators.aggregates import woe_encode  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents").select(
        "source", (F.coalesce(F.col("lang"), F.lit("")) == "en").alias("is_en")
    )
    return woe_encode(docs, "source", "is_en", eps=0.5)


SQL_WOE = f"""
WITH counts AS (
  SELECT source AS category, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN coalesce(lang, '') = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN coalesce(lang, '') = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(n_pos) AS DOUBLE) AS pt, CAST(sum(n_neg) AS DOUBLE) AS nt
        FROM counts)
SELECT category, n, n_pos, n_neg,
  CASE WHEN pt > 0 AND nt > 0 THEN
    {sql_dround("ln(((n_pos + 0.5) / pt) / ((n_neg + 0.5) / nt))", 6)} END AS woe,
  CASE WHEN pt > 0 AND nt > 0 THEN
    {sql_dround(
        "(n_pos / pt - n_neg / nt)"
        " * (" + sql_dround("ln(((n_pos + 0.5) / pt) / ((n_neg + 0.5) / nt))", 6) + ")", 6)}
  END AS iv
FROM counts, tot
"""


def q_nucleus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-p domain truncation (operators/relational.py::
    # nucleus_categories): per lang, the smallest set of sources
    # covering 90% of documents — the long-tail cut before mixing
    # weights are assigned. Count agg + group-partitioned running sum.
    from python_mapreduce_spark.operators.relational import nucleus_categories  # noqa: PLC0415

    return nucleus_categories(
        table(spark, sf_dir, "documents"), ["lang"], "source", p=0.9
    )


SQL_NUCLEUS = f"""
WITH counts AS (
  SELECT lang, source AS category, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM counts GROUP BY 1),
cum AS (
  SELECT lang, category, n,
         sum(n) OVER (PARTITION BY lang ORDER BY n DESC, category) AS c
  FROM counts
)
SELECT cum.lang, category, n,
       {sql_dround("CAST(n AS DOUBLE) / t", 6)} AS share,
       {sql_dround("CAST(c AS DOUBLE) / t", 6)} AS cum_share,
       CAST(c - n AS DOUBLE) < 0.9 * t AS kept
FROM cum JOIN tot ON cum.lang IS NOT DISTINCT FROM tot.lang
"""


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reliability diagram rows (operators/aggregates.py::
    # calibration_report): document length scaled to [0,1] as the
    # "confidence" against the lang='en' outcome, 10 equal-width bins —
    # one projection + one bin-keyed hash agg.
    from python_mapreduce_spark.operators.aggregates import calibration_report  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents").select(
        (F.col("n_chars") / F.lit(600.0)).alias("score"),
        (F.coalesce(F.col("lang"), F.lit("")) == "en").alias("is_en"),
    )
    return calibration_report(docs, "score", "is_en", n_bins=10)


_SQL_CALIB_BASE = """
base AS (
  SELECT least(greatest(CAST(n_chars AS DOUBLE) / 600.0, 0.0), 1.0) AS s,
         CASE WHEN coalesce(lang, '') = 'en' THEN 1 ELSE 0 END AS y
  FROM documents WHERE n_chars IS NOT NULL
),
bins AS (
  SELECT least(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(floor(s * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS ss,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(floor((s - y) * (s - y) * 100000000.0 + 0.5) / 100000000.0
             AS DECIMAL(28,8))) AS ssq
  FROM base GROUP BY 1
)
"""

SQL_CALIBRATION_BINS = f"""
WITH {_SQL_CALIB_BASE}
SELECT bin, n,
       {sql_dround("CAST(ss AS DOUBLE) / n", 6)} AS conf,
       {sql_dround("CAST(sy AS DOUBLE) / n", 6)} AS acc,
       {sql_dround("abs(CAST(ss AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)", 6)} AS gap
FROM bins
"""


def q_calibration_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-row Brier + ECE over the same bins (summary=True re-aggs the
    # bin frame; the data is scanned once).
    from python_mapreduce_spark.operators.aggregates import calibration_report  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents").select(
        (F.col("n_chars") / F.lit(600.0)).alias("score"),
        (F.coalesce(F.col("lang"), F.lit("")) == "en").alias("is_en"),
    )
    return calibration_report(docs, "score", "is_en", n_bins=10, summary=True)


SQL_CALIBRATION_SUMMARY = f"""
WITH {_SQL_CALIB_BASE}
SELECT CAST(sum(n) AS BIGINT) AS n,
       {sql_dround("CAST(sum(ssq) AS DOUBLE) / sum(n)", 6)} AS brier,
       {sql_dround("CAST(sum(abs(ss - CAST(sy AS DECIMAL(28,6)))) AS DOUBLE) / sum(n)", 6)} AS ece
FROM (SELECT 1 AS g, * FROM bins) GROUP BY g
"""


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l-diversity release gate (operators/aggregates.py::
    # l_diversity_audit), k-anonymity's complement: within each
    # (nation, market-segment) quasi-identifier group, do customers
    # carry at least 2 DISTINCT account-balance buckets, or does the
    # group leak its members' balance band? Same one-scan group-frame
    # re-agg shape as q_k_anonymity.
    from python_mapreduce_spark.operators.aggregates import l_diversity_audit  # noqa: PLC0415

    cust = table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000.0)
    )
    return l_diversity_audit(cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", l=2)


SQL_L_DIVERSITY = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT floor(c_acctbal / 1000.0)) AS BIGINT) AS d
  FROM customer GROUP BY 1, 2
)
SELECT n_rows, n_groups, min_distinct_sensitive, n_groups_below_l, n_rows_below_l,
       {sql_dround("CAST(n_rows_below_l AS DOUBLE) / n_rows", 6)} AS rows_below_l_share,
       n_groups_below_l = 0 AS l_diverse
FROM (
  SELECT 1 AS grp,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(min(d) AS BIGINT) AS min_distinct_sensitive,
         CAST(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_below_l,
         CAST(sum(CASE WHEN d < 2 THEN n ELSE 0 END) AS BIGINT) AS n_rows_below_l
  FROM g GROUP BY grp
)
"""


def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Whole-schema FK audit (operators/aggregates.py::
    # referential_integrity_audit): one orphan-count row per edge of
    # the TPC-H-ish star — the DQ gate that catches a broken ingest
    # before a join silently drops rows. Each edge is one keys-only
    # equi-join + one agg; the union is four 1-row frames.
    from python_mapreduce_spark.operators.aggregates import referential_integrity_audit  # noqa: PLC0415

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    p = table(spark, sf_dir, "part")
    edges = [
        referential_integrity_audit(li, "l_orderkey", o, "o_orderkey", edge="lineitem->orders"),
        referential_integrity_audit(li, "l_partkey", p, "p_partkey", edge="lineitem->part"),
        referential_integrity_audit(o, "o_custkey", c, "c_custkey", edge="orders->customer"),
        referential_integrity_audit(c, "c_nationkey", n, "n_nationkey", edge="customer->nation"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


def _sql_ref_edge(edge: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    share = sql_dround("CAST(n_orphans AS DOUBLE) / (n_child - n_null_keys)", 6)
    return f"""
  SELECT '{edge}' AS edge, n_child, n_null_keys, n_orphans,
         CASE WHEN n_child - n_null_keys > 0 THEN {share} END AS orphan_share,
         n_orphans = 0 AS ok
  FROM (
    SELECT CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN ch.{ckey} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys,
           CAST(sum(CASE WHEN ch.{ckey} IS NOT NULL AND pr.hit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {child} ch LEFT JOIN (SELECT DISTINCT {pkey} AS k, 1 AS hit FROM {parent}) pr
      ON ch.{ckey} = pr.k
  )"""


SQL_REF_INTEGRITY = (
    _sql_ref_edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
    + "\nUNION ALL\n"
    + _sql_ref_edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey")
    + "\nUNION ALL\n"
    + _sql_ref_edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey")
    + "\nUNION ALL\n"
    + _sql_ref_edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey")
)


def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Proper-scoring-rule readout (operators/aggregates.py::
    # brier_score) on the same purchase-vs-click truth set as q_auc:
    # value clamps to a [0,1] pseudo-probability (no transcendentals —
    # bit-identical in both engines), Brier MSE + Murphy skill vs the
    # climatology baseline. ONE map-side-combined agg.
    from python_mapreduce_spark.operators.aggregates import brier_score  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    scored = ev.select(
        dround(F.least(F.greatest(F.col("value") / 100.0, F.lit(0.0)), F.lit(1.0)), 4).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return brier_score(scored, "p", "y")


SQL_BRIER_SCORE = f"""
WITH base AS (
  SELECT {sql_dround("least(greatest(CAST(value AS DOUBLE) / 100.0, 0.0), 1.0)", 4)} AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         avg(CAST(y AS DOUBLE)) AS rate,
         avg((p - y) * (p - y)) AS brier
  FROM base
)
SELECT n,
       {sql_dround("rate", 6)} AS base_rate,
       {sql_dround("brier", 6)} AS brier,
       {sql_dround("rate * (1.0 - rate)", 6)} AS brier_ref,
       CASE WHEN rate * (1.0 - rate) > 0
            THEN {sql_dround("1.0 - brier / (rate * (1.0 - rate))", 6)} END AS skill
FROM a
"""


def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling-band anomaly screen (operators/events.py::
    # bollinger_bands): per event_type, the daily mean value against
    # its trailing-7-day mean +- 2 population stddevs; bands are NULL
    # until a full window exists. Partitioned running window — no
    # single-task window at any series length.
    from python_mapreduce_spark.operators.events import bollinger_bands  # noqa: PLC0415

    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type", F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.avg("value").alias("daily_avg"))
    )
    return bollinger_bands(daily, ["event_type"], "day", "daily_avg", window=7, k=2.0)


SQL_BOLLINGER_BANDS = f"""
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         avg(CAST(value AS DOUBLE)) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, v,
         count(v) OVER win >= 7 AS full_w,
         avg(v) OVER win AS raw_ma,
         stddev_pop(v) OVER win AS sd
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT event_type, day, v,
         CASE WHEN full_w THEN {sql_dround("raw_ma", 6)} END AS ma,
         CASE WHEN full_w THEN sd END AS sd
  FROM w
)
SELECT event_type, day,
       {sql_dround("v", 6)} AS value,
       ma,
       {sql_dround("ma + 2.0 * sd", 6)} AS upper,
       {sql_dround("ma - 2.0 * sd", 6)} AS lower,
       coalesce(v > {sql_dround("ma + 2.0 * sd", 6)}
                OR v < {sql_dround("ma - 2.0 * sd", 6)}, FALSE) AS outlier
FROM b
"""


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Order-invariant replication audit (operators/aggregates.py::
    # table_checksum): per-priority content digest of orders — run the
    # same digest on both sides of a 100 TB copy and diff rows-count +
    # two DECIMAL words per group instead of the data. Columns are
    # projected to types whose string forms are engine-identical first
    # (DOUBLE -> DECIMAL(18,2), TIMESTAMP -> DATE); the digest itself
    # is md5-per-column -> md5-per-row -> two 8-hex-word sums, ONE
    # map-side-combined agg.
    from python_mapreduce_spark.operators.aggregates import table_checksum  # noqa: PLC0415

    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    # Driver contract (VERDICT r8): the digest words stay DECIMAL(38,0)
    # inside the library (exact + additive for replication_audit), but
    # the REGISTRY output emits them as STRING — Spark's toPandas hands
    # the driver decimal.Decimal objects while DuckDB's pandas path
    # hands it float64, and the driver's value hash is
    # representation-sensitive (r8's one red row). STRING is exact past
    # 2^53 where a double cast would not be.
    return table_checksum(
        o,
        ["o_orderkey", "o_custkey", "o_orderstatus", "price", "odate"],
        group_by=["o_orderpriority"],
    ).select(
        "o_orderpriority",
        "n_rows",
        F.col("checksum_hi").cast("string").alias("checksum_hi"),
        F.col("checksum_lo").cast("string").alias("checksum_lo"),
    )


SQL_TABLE_CHECKSUM = """
WITH canon AS (
  SELECT o_orderpriority,
         md5(concat_ws('|',
           coalesce(md5(CAST(o_orderkey AS VARCHAR)), 'N'),
           coalesce(md5(CAST(o_custkey AS VARCHAR)), 'N'),
           coalesce(md5(o_orderstatus), 'N'),
           coalesce(md5(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)), 'N'),
           coalesce(md5(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)), 'N')
         )) AS rd
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(coalesce(sum(CAST(('0x' || substr(rd, 1, 8)) AS BIGINT)), 0)
            AS DECIMAL(38,0)) AS VARCHAR) AS checksum_hi,
       CAST(CAST(coalesce(sum(CAST(('0x' || substr(rd, 9, 8)) AS BIGINT)), 0)
            AS DECIMAL(38,0)) AS VARCHAR) AS checksum_lo
FROM canon GROUP BY o_orderpriority
"""


QUERIES: dict[str, Query] = {
    "q01_pricing_summary": Query(q_pricing_summary, SQL_PRICING_SUMMARY, "TPC-H Q1-style flagship"),
    "q_pivot": Query(q_pivot, SQL_PIVOT, "pivot to columns"),
    "q_scalar_subquery": Query(q_scalar_subquery, SQL_SCALAR_SUBQUERY, "scalar subquery filter"),
    "q_percentiles": Query(q_percentiles, SQL_PERCENTILES, "exact interpolated percentiles"),
    "q06_forecast_revenue": Query(q06_forecast_revenue, SQL_Q06, "TPC-H Q6-style filter agg"),
    "q_salted_agg": Query(q_salted_agg, SQL_SALTED_AGG, "two-stage salted agg (skew)"),
    "q_approx_distinct": Query(q_approx_distinct, SQL_APPROX_DISTINCT, "HLL++ approx count-distinct (tolerance oracle)"),
    "q_hll_rollup": Query(q_hll_rollup, SQL_HLL_ROLLUP, "mergeable HLL sketch rollup (tolerance oracle)"),
    "q_topk_rollup": Query(q_topk_rollup, SQL_TOPK_ROLLUP, "mergeable frequent-items sketch rollup (exact within max_items)"),
    "q_kll_rollup": Query(q_kll_rollup, SQL_KLL_ROLLUP, "mergeable KLL quantile sketch rollup (rank-tolerance oracle)"),
    "q_histogram": Query(q_histogram, SQL_HISTOGRAM, "fixed-range numeric histogram (explicit bucket rule)"),
    "q_table_profile": Query(q_table_profile, SQL_TABLE_PROFILE, "one-pass per-column data-quality profile"),
    "q_zscore_outliers": Query(q_zscore_outliers, SQL_ZSCORE_OUTLIERS, "per-key z-score anomaly detection"),
    "q_psi_drift": Query(q_psi_drift, SQL_PSI_DRIFT, "population-stability-index distribution drift"),
    "q_ks_test": Query(q_ks_test, SQL_KS_TEST, "two-sample Kolmogorov-Smirnov statistic (distributed ECDF)"),
    "q_attribution": Query(q_attribution, SQL_ATTRIBUTION, "last-touch conversion attribution (as-of join)"),
    "q_assoc_rules": Query(q_assoc_rules, SQL_ASSOC_RULES, "association rules: support/confidence/lift"),
    "q_mix_entropy": Query(q_mix_entropy, SQL_MIX_ENTROPY, "per-group categorical mix entropy (data-card balance)"),
    "q_seasonal_anomaly": Query(q_seasonal_anomaly, SQL_SEASONAL_ANOMALY, "seasonal-naive daily anomaly detection (MAD rule)"),
    "q_golden_record": Query(q_golden_record, SQL_GOLDEN_RECORD, "survivorship merge via one max(struct) agg"),
    "q_group_ols": Query(q_group_ols, SQL_GROUP_OLS, "per-group OLS trend from DECIMAL sufficient statistics"),
    "q_rolling_distinct": Query(q_rolling_distinct, SQL_ROLLING_DISTINCT, "exact trailing-7-day distinct users (WAU)"),
    "q_decayed_trending": Query(q_decayed_trending, SQL_DECAYED_TRENDING, "half-life-decayed trending top-k"),
    "q_quantile_normalize": Query(q_quantile_normalize, SQL_QUANTILE_NORMALIZE, "per-group percent-rank score calibration"),
    "q_time_split_embargo": Query(q_time_split_embargo, SQL_TIME_SPLIT_EMBARGO, "purged temporal split with embargo buffer"),
    "q_class_weights": Query(q_class_weights, SQL_CLASS_WEIGHTS, "balanced class-weight table (inverse frequency)"),
    "q_auc": Query(q_auc, SQL_AUC, "distributed rank-based ROC AUC with tie half-credit"),
    "q_auc_daily": Query(q_auc_daily, SQL_AUC_DAILY, "per-slice (daily) AUC via group-partitioned windows"),
    "q_histogram2d": Query(q_histogram2d, SQL_HISTOGRAM2D, "joint 2-D fixed-range histogram (heatmap profiling pass)"),
    "q_survival_curve": Query(q_survival_curve, SQL_SURVIVAL_CURVE, "Kaplan-Meier churn curve with censoring (exact ln-sum replay)"),
    "q_k_anonymity": Query(q_k_anonymity, SQL_K_ANONYMITY, "k-anonymity release gate over quasi-identifier group sizes"),
    "q_missingness": Query(q_missingness, SQL_MISSINGNESS, "NULL co-occurrence audit (structured-missingness detector)"),
    "q_ab_test": Query(q_ab_test, SQL_AB_TEST, "two-proportion z-test per variant vs control with lift"),
    "q_bloom_semi_join": Query(q_bloom_semi_join, SQL_BLOOM_SEMI_JOIN, "Bloom-pre-filtered big-big semi join (exact result)"),
    "q_time_weighted_avg": Query(q_time_weighted_avg, SQL_TIME_WEIGHTED_AVG, "time-weighted average over irregular gauge samples"),
    "q_ohlc_bars": Query(q_ohlc_bars, SQL_OHLC_BARS, "OHLC candle compaction in one struct-packed agg"),
    "q_er_match": Query(q_er_match, SQL_ER_MATCH, "weighted field-similarity ER match scoring over blocked pairs"),
    "q_pr_curve": Query(q_pr_curve, SQL_PR_CURVE, "precision-recall sweep via one multi-weight running sum"),
    "q_lift_gain": Query(q_lift_gain, SQL_LIFT_GAIN, "decile lift/gain table with exact integer bucket boundaries"),
    "q_auc_disparity": Query(q_auc_disparity, SQL_AUC_DISPARITY, "per-segment AUC vs overall with fairness gap"),
    "q_markov": Query(q_markov, SQL_MARKOV, "first-order Markov transition matrix over event sequences"),
    "q_jsd_drift": Query(q_jsd_drift, SQL_JSD_DRIFT, "Jensen-Shannon categorical drift between snapshots"),
    "q_conversion_lag": Query(q_conversion_lag, SQL_CONVERSION_LAG, "attributed click-to-purchase latency percentiles + attach rate"),
    "q_gap_report": Query(q_gap_report, SQL_GAP_REPORT, "per-key missing-day completeness audit"),
    "q_benford": Query(q_benford, SQL_BENFORD, "Benford first-digit audit with chi2 contributions"),
    "q_session_stats": Query(q_session_stats, SQL_SESSION_STATS, "session count/depth/duration percentiles"),
    "q_rfm": Query(q_rfm, SQL_RFM, "RFM segmentation by global quantile scores"),
    "q_corr_matrix": Query(q_corr_matrix, SQL_CORR_MATRIX, "pairwise Pearson correlation matrix from one agg"),
    "q_user_churn": Query(q_user_churn, SQL_USER_CHURN, "daily retained/new/churned distinct users"),
    "q_top_paths": Query(q_top_paths, SQL_TOP_PATHS, "top-k session-opening event paths"),
    "q_dq_audit": Query(q_dq_audit, SQL_DQ_AUDIT, "declarative data-quality constraint suite (Deequ shape)"),
    "q_mutual_info": Query(q_mutual_info, SQL_MUTUAL_INFO, "mutual information + entropies between two categoricals"),
    "q_woe": Query(q_woe, SQL_WOE, "weight-of-evidence + information value encode table"),
    "q_nucleus": Query(q_nucleus, SQL_NUCLEUS, "top-p (nucleus) truncation of a categorical distribution per group"),
    "q_calibration_bins": Query(q_calibration_bins, SQL_CALIBRATION_BINS, "reliability-diagram calibration bins"),
    "q_calibration_summary": Query(q_calibration_summary, SQL_CALIBRATION_SUMMARY, "one-row Brier score + expected calibration error"),
    "q_funnel": Query(q_funnel, SQL_FUNNEL, "ordered funnel conversion (sequential per-user mins)"),
    "q_funnel_windowed": Query(q_funnel_windowed, SQL_FUNNEL_WINDOWED, "funnel with a per-step conversion window"),
    "q_resample_locf": Query(q_resample_locf, SQL_RESAMPLE_LOCF, "gap-filled resample with forward fill (LOCF)"),
    "q_counter_increase": Query(q_counter_increase, SQL_COUNTER_INCREASE, "counter increase with reset handling"),
    "q_scd2_history": Query(q_scd2_history, SQL_SCD2_HISTORY, "CDC change stream to SCD2 validity intervals"),
    "q_robust_scale": Query(q_robust_scale, SQL_ROBUST_SCALE, "per-group robust (median/IQR) feature scaling"),
    "q_diff_tables": Query(q_diff_tables, SQL_DIFF_TABLES, "keyed snapshot reconciliation (same/changed/only_a/only_b)"),
    "q_target_encode": Query(q_target_encode, SQL_TARGET_ENCODE, "smoothed target encoding of a categorical"),
    "q_winsorize": Query(q_winsorize, SQL_WINSORIZE, "per-group percentile tail clipping"),
    "q_trending": Query(q_trending, SQL_TRENDING, "top-k trending items per day"),
    "q_cohort_retention": Query(q_cohort_retention, SQL_COHORT_RETENTION, "day-cohort retention at +1/+7"),
    "q_approx_percentile": Query(q_approx_percentile, SQL_APPROX_PERCENTILE, "quantile-sketch percentiles (tolerance oracle)"),
    "q_filter_project": Query(q_filter_project, SQL_FILTER_PROJECT, "filter + projection, pushed to scan"),
    "q_sample_agg": Query(q_sample_agg, SQL_SAMPLE_AGG, "deterministic downsample + agg (O5)"),
    "q_distinct": Query(q_distinct, SQL_DISTINCT, "DISTINCT pairs"),
    "q_count_distinct": Query(q_count_distinct, SQL_COUNT_DISTINCT, "exact count-distinct per key"),
    "q_topk_orders": Query(q_topk_orders, SQL_TOPK_ORDERS, "global sort + limit"),
    "q_orders_by_month": Query(q_orders_by_month, SQL_ORDERS_BY_MONTH, "date-bucketed agg"),
    "q_rollup": Query(q_rollup, SQL_ROLLUP, "ROLLUP subtotals"),
    "q_cube": Query(q_cube, SQL_CUBE, "CUBE over two dims"),
    "q_grouping_sets": Query(q_grouping_sets, SQL_GROUPING_SETS, "GROUPING SETS"),
    "q_union": Query(q_union, SQL_UNION, "set union"),
    "q_intersect": Query(q_intersect, SQL_INTERSECT, "set intersect"),
    "q_except": Query(q_except, SQL_EXCEPT, "set except"),
    "q_scalar_string": Query(q_scalar_string, SQL_SCALAR_STRING, "string function veneer"),
    "q_scalar_datetime": Query(q_scalar_datetime, SQL_SCALAR_DATETIME, "datetime function veneer"),
    "q_scalar_math": Query(q_scalar_math, SQL_SCALAR_MATH, "math function veneer"),
    "q_json_extract": Query(q_json_extract, SQL_JSON_EXTRACT, "schemaless JSON payload extraction"),
    "q_case_when": Query(q_case_when, SQL_CASE_WHEN, "CASE/conditional buckets"),
    "q_scalar_array": Query(q_scalar_array, SQL_SCALAR_ARRAY, "array function veneer"),
    "q_scalar_map": Query(q_scalar_map, SQL_SCALAR_MAP, "map function veneer"),
    "q_l_diversity": Query(q_l_diversity, SQL_L_DIVERSITY, "l-diversity release gate over quasi-identifier groups"),
    "q_ref_integrity": Query(q_ref_integrity, SQL_REF_INTEGRITY, "whole-schema FK orphan audit (one row per edge)"),
    "q_brier_score": Query(q_brier_score, SQL_BRIER_SCORE, "Brier score + Murphy skill vs climatology"),
    "q_bollinger_bands": Query(q_bollinger_bands, SQL_BOLLINGER_BANDS, "rolling mean +- 2 sigma bands with outlier verdict"),
    "q_table_checksum": Query(q_table_checksum, SQL_TABLE_CHECKSUM, "order-invariant per-group table content digest (replication audit)"),
}
