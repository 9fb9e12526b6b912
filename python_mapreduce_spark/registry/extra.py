"""Second-wave relational coverage: bag set-ops, ordered collect
aggregates, posexplode (UDTF analog), null handling, mode, and further
TPC-H-style classics (Q4/Q12/Q14 adaptations to this schema).

Reference coverage: all user patterns inside map/reduce (SURVEY.md §2.2)
— explode is the flatMap output fan-out (O6), collect is a whole-group
reduce building a list, set-ops are tag-and-reduce emission rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, dsum, sql_dround, sql_dsum, tokenize
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table


# --- bag (ALL) set operators --------------------------------------------------

def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return a.intersectAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


SQL_INTERSECT_ALL = """
SELECT k, count(*) AS n FROM (
  SELECT l_suppkey AS k FROM lineitem
  INTERSECT ALL
  SELECT s_suppkey AS k FROM supplier
) GROUP BY k
"""


def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multiset difference: lineitem suppkey occurrences minus one per
    # matching supplier row.
    a = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return a.exceptAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


SQL_EXCEPT_ALL = """
SELECT k, count(*) AS n FROM (
  SELECT l_suppkey AS k FROM lineitem
  EXCEPT ALL
  SELECT s_suppkey AS k FROM supplier
) GROUP BY k
"""


# --- collect_list / collect_set (ordered for determinism) -----------------------

def q_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Whole-group list building — the reference's reduce returning a list
    # per key. Sorted so output is order-insensitive-hash stable.
    # Collected lists are emitted as ','-joined strings: the driver's
    # canonicalizer can't hash array cells (CORRECTNESS_r01 lesson).
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",")
        .alias("statuses"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list("o_custkey")), 1, 5),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("first_custkeys"),
    )


SQL_COLLECT_AGG = """
SELECT o_orderpriority,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
       array_to_string(list_transform(list_sort(list(o_custkey))[1:5],
                       x -> CAST(x AS VARCHAR)), ',') AS first_custkeys
FROM orders GROUP BY o_orderpriority
"""


# --- sink roundtrip (O21 driver coverage) ---------------------------------------

def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partitioned parquet sink -> scan -> aggregate (reference O21,
    # reducer.py:90-139). The oracle runs the same aggregate on the
    # SOURCE table, so anything the sink/scan roundtrip loses or mangles
    # (partition-column encoding, compression, schema drift) breaks the
    # hash match.
    import os  # noqa: PLC0415
    from python_mapreduce_spark.scratch import scratch_dir  # noqa: PLC0415

    from python_mapreduce_spark.sources.readers import read_parquet  # noqa: PLC0415
    from python_mapreduce_spark.sources.sinks import write_parquet  # noqa: PLC0415

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(scratch_dir("spark_sink_rt"), "orders")
    write_parquet(o, path, partition_by=["o_orderstatus"])
    # Explicit schema on the read-back: skips footer sampling (the
    # at-scale default) and keeps the roundtrip well-defined even when
    # the source is empty (an empty partitioned write emits no footers).
    back = read_parquet(spark, path, schema=o.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_total"),
    )


SQL_SINK_ROUNDTRIP = f"""
SELECT o_orderstatus, count(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS sum_total
FROM orders GROUP BY o_orderstatus
"""


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Schema-evolved ingest: generation 1 of the corpus was written
    # BEFORE the lang column existed (doc_id, n_chars only), generation
    # 2 carries it. A mergeSchema read unions the footers so both
    # generations scan as the superset schema with the absent column
    # NULL — the long-lived-dataset situation every 100 TB ingest hits.
    # The aggregate distinguishes pre-lang rows via the NULL, and the
    # oracle replays the generation rule on the source table, so a
    # merged read that dropped rows, mixed up columns, or fabricated
    # values breaks the hash.
    import os  # noqa: PLC0415
    from python_mapreduce_spark.scratch import scratch_dir  # noqa: PLC0415

    from python_mapreduce_spark.sources.readers import read_parquet  # noqa: PLC0415
    from python_mapreduce_spark.sources.sinks import write_parquet  # noqa: PLC0415

    d = table(spark, sf_dir, "documents")
    base = scratch_dir("spark_schema_evo")
    gen1, gen2 = os.path.join(base, "gen1"), os.path.join(base, "gen2")
    write_parquet(d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars"), gen1)
    write_parquet(
        d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "n_chars", "lang"), gen2
    )
    merged = read_parquet(spark, [gen1, gen2], merge_schema=True)
    return merged.groupBy(
        F.coalesce("lang", F.lit("<pre-lang>")).alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# A mergeSchema consumer cannot distinguish gen-1's ABSENT column from
# a NULL lang VALUE in gen-2 — both scan as NULL — so the oracle replays
# exactly that observable: any NULL after the generation rule labels
# '<pre-lang>' (caught by the NULL-text robustness sweep, where injected
# NULL langs in gen-2 rows diverged).
SQL_SCHEMA_EVOLUTION = """
SELECT coalesce(CASE WHEN doc_id % 2 = 1 THEN lang END, '<pre-lang>') AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


# --- posexplode (UDTF / flatMap fan-out analog) ---------------------------------

def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = d.select("doc_id", tokenize("text").alias("toks"))
    return toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


SQL_POSEXPLODE = """
SELECT doc_id,
       unnest(generate_series(0, len(toks) - 1)) AS pos,
       unnest(toks) AS tok
FROM (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS toks
      FROM documents WHERE doc_id < 50)
"""


# --- null handling (fillna / coalesce over outer join) --------------------------

def q_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    last_order = o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("max_price"))
    joined = c.join(last_order, c.c_custkey == last_order.o_custkey, "left")
    return joined.fillna({"max_price": -1.0}).select(
        "c_custkey", dround("max_price").alias("max_price")
    )


SQL_FILLNA = f"""
SELECT c_custkey,
       {sql_dround('coalesce(mp.max_price, -1.0)')} AS max_price
FROM customer
LEFT JOIN (SELECT o_custkey, max(o_totalprice) AS max_price
           FROM orders GROUP BY o_custkey) mp
  ON c_custkey = mp.o_custkey
"""


# --- mode (most frequent value) -------------------------------------------------

def q_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's mode() breaks frequency ties arbitrarily; make the answer
    # well-defined via explicit count + deterministic tiebreak instead.
    e = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), "cnt")
    )


SQL_MODE_AGG = """
SELECT user_id, event_type AS top_event, cnt FROM (
  SELECT user_id, event_type, count(*) AS cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""


# --- TPC-H-style classics -------------------------------------------------------

def q04_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q4 adaptation: orders (in a date range) having at least one line
    # item shipped more than 60 days after the order date, counted by
    # priority — EXISTS-style semi join.
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select("l_orderkey")
        .distinct()
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_Q04 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60)
GROUP BY o_orderpriority
"""


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q12 adaptation (no shipmode column): per line status, how many
    # high- vs low-priority orders' items shipped in 1997 — conditional
    # counts over a fact-fact join.
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_priority"),
            F.sum(1 - high).alias("low_priority"),
        )
    )


SQL_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_priority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q14 adaptation: share of 1997 revenue from PROMO-type parts —
    # conditional aggregate ratio over a broadcast dim join.
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(dround(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_share_pct"))
    )


SQL_Q14 = f"""
SELECT {sql_dround('''100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount))''', 4)} AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q7 adaptation: shipping volume between supplier-nation and
    # customer-nation pairs for 1997 — two dim joins on both fact sides.
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(dsum(rev).alias("volume"), F.count(F.lit(1)).alias("n_items"))
    )


SQL_Q07 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND n1.n_name != n2.n_name
GROUP BY 1, 2
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q10 adaptation: top 20 customers by revenue lost to returns —
    # filtered fact join + top-k on the rounded measure.
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(dsum(rev).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_Q10 = f"""
SELECT c_custkey, c_name, c_mktsegment,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Melt lineitem's four measure columns into (measure, value) rows
    # (Expand node — scan-stage fan-out, no shuffle), then one
    # partial+final agg per measure. DECIMAL sum for order-independence.
    from python_mapreduce_spark.operators.relational import unpivot

    li = table(spark, sf_dir, "lineitem")
    long = unpivot(
        li,
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("total"),
    )


SQL_UNPIVOT = f"""
WITH long AS (
  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT measure, count(*) AS n, {sql_dsum('value')} AS total
FROM long GROUP BY measure
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic stratified downsample (O5 upgraded to per-stratum
    # rates): whole orders are sampled per return-flag stratum via
    # key-mod so the oracle reproduces it exactly. The seeded sampleBy
    # production path is unit-tested (tests/test_operators.py).
    from python_mapreduce_spark.operators.relational import stratified_sample

    li = table(spark, sf_dir, "lineitem")
    sampled = stratified_sample(
        li,
        "l_returnflag",
        {"A": 0.1, "N": 0.05, "R": 0.02},
        key="l_orderkey",
    )
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dround(F.sum("l_quantity"), 1).alias("sum_qty"),
    )


SQL_SAMPLE_STRATIFIED = f"""
SELECT l_returnflag, count(*) AS n_rows, {sql_dround('sum(l_quantity)', 1)} AS sum_qty
FROM lineitem
WHERE (l_returnflag = 'A' AND l_orderkey % 10 = 0)
   OR (l_returnflag = 'N' AND l_orderkey % 20 = 0)
   OR (l_returnflag = 'R' AND l_orderkey % 50 = 0)
GROUP BY l_returnflag
"""


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Statistical aggregates (stddev/variance/correlation/covariance) —
    # all partial+final JVM aggregates; rounded at 4-6 decimals to
    # absorb engine-side summation-order drift in the low bits.
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        dround(F.var_samp("l_discount"), 6).alias("var_disc"),
        dround(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        dround(F.covar_samp("l_quantity", "l_tax"), 6).alias("covar_qty_tax"),
    )


SQL_STATS_AGG = f"""
SELECT l_returnflag,
       {sql_dround('stddev_samp(l_quantity)', 4)} AS sd_qty,
       {sql_dround('var_samp(l_discount)', 6)} AS var_disc,
       {sql_dround('corr(l_quantity, l_extendedprice)', 6)} AS corr_qty_price,
       {sql_dround('covar_samp(l_quantity, l_tax)', 6)} AS covar_qty_tax
FROM lineitem GROUP BY l_returnflag
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shuffle-key pre-flight diagnostic (operators/aggregates.py::
    # key_skew_report): key cardinality, max/avg per-key rows, straggler
    # ratio, heaviest keys — what you run BEFORE a 100 TB groupBy to
    # decide between plain shuffle, salting, and AQE skew handling.
    from python_mapreduce_spark.operators.aggregates import key_skew_report

    return key_skew_report(
        table(spark, sf_dir, "lineitem"), ["l_suppkey"], top_n=5
    )


SQL_SKEW_REPORT = f"""
WITH c AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS cnt
  FROM lineitem GROUP BY l_suppkey
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(cnt) AS BIGINT) AS max_per_key,
         {sql_dround('avg(cnt)')} AS avg_per_key,
         {sql_dround('CAST(max(cnt) AS DOUBLE) / avg(cnt)')} AS skew_ratio
  FROM c
),
t AS (
  SELECT array_to_string(list(k || ':' || CAST(cnt AS VARCHAR) ORDER BY cnt DESC, k), ',')
           AS top_keys
  FROM (SELECT * FROM c ORDER BY cnt DESC, k LIMIT 5)
)
SELECT * FROM s, t
"""


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed MERGE/upsert (operators/relational.py::upsert): a
    # deterministic "corrections batch" (every 7th order, price doubled,
    # status 'U') replaces same-key base rows; unmatched rows pass
    # through. The oracle replays updates-UNION-(base-anti-updates) in
    # SQL and aggregates the merged table.
    from python_mapreduce_spark.operators.relational import upsert

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    merged = upsert(o, updates, "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_total"),
    )


SQL_UPSERT = f"""
WITH updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
merged AS (
  SELECT * FROM updates
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
)
SELECT o_orderstatus, count(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_total
FROM merged GROUP BY o_orderstatus
"""


def q_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Frequent-items sketch (Karp-Shenker-Papadimitriou via
    # df.stat.freqItems) — one-pass, fixed memory, the heavy-hitters
    # path for corpus analytics (hot sources/domains/tokens) at 100 TB.
    # The sketch guarantees a SUPERSET of the true > support items, so
    # the tolerance oracle is: exact heavy-hitter count (SQL-replicable)
    # plus a boolean that every true heavy hitter appears in the sketch
    # output. Deterministic (no RNG in the algorithm).
    d = table(spark, sf_dir, "documents")
    support = 0.03  # sources are ~uniform at ~5% each, so all qualify
    sketch = [r for r in d.freqItems(["source"], support=support).collect()][0][0]
    total = d.count()
    exact = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > support * total)
    )
    return exact.agg(
        F.count(F.lit(1)).cast("long").alias("n_heavy"),
        F.coalesce(F.every(F.col("source").isin(list(sketch))), F.lit(True)).alias(
            "all_found"
        ),
    )


SQL_FREQ_ITEMS = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT count(*) AS total FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_heavy, TRUE AS all_found
FROM c, t WHERE n > 0.03 * total
"""


def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first_value / last_value / nth_value over a full-partition frame:
    # each user's first, last, and second event value in time order.
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    ).distinct()


SQL_WINDOW_FIRSTLAST = """
SELECT DISTINCT user_id,
       first_value(value) OVER w AS first_val,
       last_value(value)  OVER w AS last_val,
       nth_value(value, 2) OVER w AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROLLUP with GROUPING() indicators — distinguishes "subtotal row"
    # from "NULL-valued group" (the classic rollup ambiguity).
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_prio"),
    )


SQL_ROLLUP_GROUPING = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_window_cume_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DEMO SHAPE: dense_rank + cume_dist — the remaining ranking/
    # distribution functions (rank/percent_rank/ntile live in
    # q_window_rank_dist_demo). Unpartitioned windows imply a single-
    # partition global sort: fine on dimension-sized inputs like
    # customer, dead at 100 TB. registry/windows.py::
    # q_window_cume_scalable computes the identical answer with
    # global_row_number (range-partitioned, no single-task window).
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.dense_rank().over(Window.orderBy("c_mktsegment")).cast("long").alias("seg_rank"),
        dround(
            F.cume_dist().over(Window.orderBy("c_acctbal", "c_custkey")), 6
        ).alias("bal_cume"),
    )


SQL_WINDOW_CUME = f"""
SELECT c_custkey,
       dense_rank() OVER (ORDER BY c_mktsegment) AS seg_rank,
       {sql_dround('cume_dist() OVER (ORDER BY c_acctbal, c_custkey)', 6)} AS bal_cume
FROM customer
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # listagg/string_agg: ordered string concatenation per group —
    # collect_list + array_sort + array_join keeps the agg partial+final
    # and the ordering explicit (engines disagree on implicit order).
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


SQL_STRING_AGG = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Boolean aggregates: every/any/conditional-count per group.
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


SQL_BOOL_AGG = """
SELECT l_returnflag,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
FROM lineitem GROUP BY l_returnflag
"""


def q_median_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact median (interpolated at even counts in both engines).
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        dround(F.median("c_acctbal"), 4).alias("median_bal"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_MEDIAN_AGG = f"""
SELECT c_mktsegment, {sql_dround('median(c_acctbal)', 4)} AS median_bal,
       count(*) AS n
FROM customer GROUP BY c_mktsegment
"""


def q_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pagination: total-ordered sort + OFFSET + LIMIT (page 2 of 10).
    # The tiebreak makes the page identity deterministic; Spark plans
    # a global sort only for the first offset+limit rows.
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
        .select("o_orderkey", "o_custkey", dround("o_totalprice").alias("price"))
    )


SQL_OFFSET_PAGE = f"""
SELECT o_orderkey, o_custkey, {sql_dround('o_totalprice')} AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 10
"""


def q_visible_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O4 driver-verifiable form: convention-based input visibility
    # (reference mapper.py:159-181 lock-probe, re-expressed as
    # write-then-rename + _SUCCESS gating — see sources/readers.py::
    # visible_files). Nation rows land as per-region JSONL files:
    # regions 0-2 committed in a _SUCCESS'd directory, region 3 as an
    # in-flight ``.tmp`` (skipped), region 4 once as a hidden ``_`` file
    # (skipped) and once in a directory with no _SUCCESS (skipped under
    # require_success). Only regions 0-2 may reach the output; the
    # oracle recomputes them straight from nation. The 25-row collect is
    # contract-small (dimension table, same as the mr aux demo).
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415
    from python_mapreduce_spark.scratch import scratch_dir  # noqa: PLC0415

    from python_mapreduce_spark.sources.readers import (  # noqa: PLC0415
        read_jsonl,
        visible_files,
    )

    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey").collect()
    by_region: dict[int, list] = {}
    for r in nation:
        by_region.setdefault(r.n_regionkey, []).append(r)

    def write(path: str, rows: list) -> None:
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps({"k": r.n_nationkey, "region": r.n_regionkey}) + "\n")

    base = scratch_dir("spark_vis")
    landed = os.path.join(base, "landed")
    os.makedirs(landed)
    for k in (0, 1, 2):
        write(os.path.join(landed, f"r{k}.jsonl"), by_region.get(k, []))
    write(os.path.join(landed, "r3.jsonl.tmp"), by_region.get(3, []))
    write(os.path.join(landed, "_r4.jsonl"), by_region.get(4, []))
    open(os.path.join(landed, "_SUCCESS"), "w").close()
    uncommitted = os.path.join(base, "uncommitted")
    os.makedirs(uncommitted)
    write(os.path.join(uncommitted, "r4.jsonl"), by_region.get(4, []))

    files = visible_files(spark, [landed, uncommitted], require_success=True)
    df = read_jsonl(spark, files, schema="k long, region long")
    return df.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("k").alias("sum_key"),
    )


SQL_VISIBLE_FILES = """
SELECT n_regionkey AS region, count(*) AS n_nations,
       CAST(sum(n_nationkey) AS BIGINT) AS sum_key
FROM nation WHERE n_regionkey IN (0, 1, 2) GROUP BY n_regionkey
"""


def q_corrupt_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O19 driver-verifiable form: PERMISSIVE corrupt-record capture
    # (reference LINE_ERROR, reducer.py:58-64). Orders under key 200
    # land as JSONL with every 10th key written as a truncated record;
    # the scan must route exactly those lines to _corrupt_record (null
    # fields) and parse the rest. The oracle recomputes the partition
    # from orders arithmetic — any captured-vs-parsed misclassification
    # breaks all three outputs.
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415
    from python_mapreduce_spark.scratch import scratch_dir  # noqa: PLC0415

    from python_mapreduce_spark.sources.readers import read_jsonl  # noqa: PLC0415

    rows = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 200)
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    path = os.path.join(scratch_dir("spark_corrupt"), "orders.jsonl")
    with open(path, "w") as f:
        for r in rows:
            if r.o_orderkey % 10 == 0:
                f.write('{"k": %d, "price": BROKEN\n' % r.o_orderkey)
            else:
                f.write(json.dumps({"k": r.o_orderkey, "price": r.o_totalprice}) + "\n")
    df = read_jsonl(spark, path, schema="k long, price double, _corrupt_record string")
    return df.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("good_rows"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("corrupt_rows"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("k"))).alias("sum_good_keys"),
    )


SQL_CORRUPT_CAPTURE = """
SELECT CAST(count(*) FILTER (WHERE o_orderkey % 10 <> 0) AS BIGINT) AS good_rows,
       CAST(count(*) FILTER (WHERE o_orderkey % 10 = 0) AS BIGINT) AS corrupt_rows,
       CAST(sum(o_orderkey) FILTER (WHERE o_orderkey % 10 <> 0) AS BIGINT) AS sum_good_keys
FROM orders WHERE o_orderkey < 200
"""


def q_job_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O27-O29 driver-verifiable form: the priority job queue runs real
    # Spark actions — highest priority first, a planted failure cascade-
    # deletes its whole group (the un-run 'enrich' job), independent
    # jobs continue. Output = one row per job with its outcome and the
    # count its action produced; the oracle states the required schedule
    # and recomputes the counts from the same tables.
    from python_mapreduce_spark.jobs import Job, JobQueue  # noqa: PLC0415

    results: dict[str, int] = {}
    ran: list[str] = []  # OBSERVED execution order — what the oracle grades

    def count_job(name: str, tbl: str):
        def fn() -> None:
            ran.append(name)
            results[name] = table(spark, sf_dir, tbl).count()

        return fn

    def boom() -> None:
        ran.append("bad_job")
        raise RuntimeError("planted failure")

    q = JobQueue()
    q.submit(Job("load_nation", count_job("load_nation", "nation"), priority=3))
    q.submit(Job("load_region", count_job("load_region", "region"), priority=2, group="g1"))
    q.submit(Job("bad_job", boom, priority=1, group="g1"))
    q.submit(Job("enrich", count_job("enrich", "supplier"), priority=0, group="g1"))
    q.submit(Job("summary", count_job("summary", "customer"), priority=-1))
    q.run_cycle()

    # run_order comes from the observed `ran` log (position+1; 0 = never
    # ran), NOT from literals — if the priority sort ever broke, the
    # orders would shift and the oracle hash would go red.
    ok = set(q.succeeded)
    order = {name: i + 1 for i, name in enumerate(ran)}
    rows = [
        ("load_nation", "ok" if "load_nation" in ok else "WRONG", results.get("load_nation", -1), order.get("load_nation", 0)),
        ("load_region", "ok" if "load_region" in ok else "WRONG", results.get("load_region", -1), order.get("load_region", 0)),
        ("bad_job", "failed" if any(n == "bad_job" for n, _ in q.failed) else "WRONG", -1, order.get("bad_job", 0)),
        ("summary", "ok" if "summary" in ok else "WRONG", results.get("summary", -1), order.get("summary", 0)),
        # cascaded away before its turn: must have neither run nor failed
        ("enrich", "cascaded" if "enrich" not in ok and "enrich" not in results else "WRONG", -1, order.get("enrich", 0)),
    ]
    return spark.createDataFrame(
        rows, "job_name string, status string, result long, run_order long"
    )


SQL_JOB_CASCADE = """
SELECT 'load_nation' AS job_name, 'ok' AS status,
       CAST((SELECT count(*) FROM nation) AS BIGINT) AS result, CAST(1 AS BIGINT) AS run_order
UNION ALL SELECT 'load_region', 'ok', CAST((SELECT count(*) FROM region) AS BIGINT), 2
UNION ALL SELECT 'bad_job', 'failed', -1, 3
UNION ALL SELECT 'summary', 'ok', CAST((SELECT count(*) FROM customer) AS BIGINT), 4
UNION ALL SELECT 'enrich', 'cascaded', -1, 0
"""


# --- z-order clustering (data-skipping layout, operators/zorder.py) ----------

# Explicit split points for the deterministic code twin: the quantile
# pass (approxQuantile) is partitioning-dependent, so the hash-oracle
# query pins the buckets instead — the CLUSTER BY RANGE idiom. k1 is
# pmod(o_custkey, 1000) (scale-free across SF dirs); prices above the
# last split saturate into the top bucket, deterministically on both
# engines.
_Z_BITS = 4
_Z_K1_SPLITS = [63.0 * i for i in range(1, 16)]  # 63 .. 945 over [0, 999]
_Z_PRICE_SPLITS = [25000.0 * i for i in range(1, 16)]  # 25k .. 375k


def q_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Morton z-order code itself (operators/zorder.py::zorder_code),
    # driver-hash-verified: bucket rank = count of splits <= value (a
    # JVM higher-order filter over a broadcast literal array — no UDF,
    # no shuffle), then a fixed bits*k-term bit interleave in pure
    # codegen. The oracle replays the same buckets (list_filter lambda)
    # and the same shift/or ladder, so a single flipped bit anywhere in
    # the curve math breaks the hash. Grouping by code keeps the output
    # <= 2^(bits*k) = 256 rows at any scale. The reference has no
    # layout primitive at all (reducer.py rotates unordered part
    # files); this is the data-skipping half of the 100 TB story.
    from python_mapreduce_spark.operators.zorder import zorder_code  # noqa: PLC0415

    o = table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(1000)).cast("long").alias("k1"),
        F.col("o_totalprice").alias("price"),
    )
    coded = zorder_code(
        o,
        ["k1", "price"],
        bits=_Z_BITS,
        code_col="zcode",
        splits={"k1": _Z_K1_SPLITS, "price": _Z_PRICE_SPLITS},
    )
    return coded.groupBy("zcode").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k1").alias("min_k1"),
        F.max("k1").alias("max_k1"),
        dround(F.min("price"), 2).alias("min_price"),
        dround(F.max("price"), 2).alias("max_price"),
    )


def _sql_zorder_code() -> str:
    """Build the DuckDB twin of the fixed-split Morton code."""
    k1_list = "[" + ", ".join(str(s) for s in _Z_K1_SPLITS) + "]"
    pr_list = "[" + ", ".join(str(s) for s in _Z_PRICE_SPLITS) + "]"
    terms = []
    for i in range(_Z_BITS):
        for j, b in enumerate(("b1", "b2")):
            terms.append(f"((({b} >> {i}) & 1) << {i * 2 + j})")
    interleave = " | ".join(terms)
    return f"""
WITH vals AS (
  SELECT CAST(o_custkey % 1000 AS BIGINT) AS k1, o_totalprice AS price
  FROM orders
), buckets AS (
  SELECT k1, price,
         len(list_filter({k1_list}, s -> s <= CAST(k1 AS DOUBLE))) AS b1,
         len(list_filter({pr_list}, s -> s <= CAST(price AS DOUBLE))) AS b2
  FROM vals
), coded AS (
  SELECT k1, price, CAST({interleave} AS BIGINT) AS zcode FROM buckets
)
SELECT zcode, CAST(count(*) AS BIGINT) AS n,
       min(k1) AS min_k1, max(k1) AS max_k1,
       {sql_dround("min(price)", 2)} AS min_price,
       {sql_dround("max(price)", 2)} AS max_price
FROM coded GROUP BY zcode
"""


SQL_ZORDER_CODE = _sql_zorder_code()


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The physical layout half (operators/zorder.py::zorder_write),
    # rows-only by design: the real approxQuantile pass and the range
    # partitioner's boundary sampling are partitioning-dependent, so
    # per-file extents are not SQL-replayable — the deterministic curve
    # math is hash-gated by the q_zorder_code twin, and the layout
    # QUALITY is what this row evidences. Writes orders z-ordered on
    # (o_custkey, o_totalprice), reads the files back, and emits one
    # row per output file: its row count and min/max extent on both
    # clustered columns, plus the corpus-wide mean pairwise file-range
    # overlap per column (the data-skipping figure of merit — ~1.0
    # means every file intersects every other and footer stats skip
    # nothing; the z-order layout lands ~0.3-0.5 on BOTH columns at
    # once where a single-column sort gives ~1.0 on the second column).
    # Scale shape: ONE range exchange for the write, one file-grouped
    # agg for the extents, and the overlap join runs on the
    # <= num_files-row extent frame (broadcast equi-join on a constant
    # key — bounded by contract, never row-scale).
    import os  # noqa: PLC0415
    from python_mapreduce_spark.scratch import scratch_dir  # noqa: PLC0415

    from python_mapreduce_spark.operators.zorder import zorder_write  # noqa: PLC0415
    from python_mapreduce_spark.sources.readers import read_parquet  # noqa: PLC0415

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = os.path.join(scratch_dir("spark_zorder"), "orders_z")
    zorder_write(o, path, ["o_custkey", "o_totalprice"], bits=6, num_files=16)
    back = read_parquet(spark, path, schema=o.schema)
    per_file = back.groupBy(F.input_file_name().alias("__f")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_custkey").alias("min_custkey"),
        F.max("o_custkey").alias("max_custkey"),
        dround(F.min("o_totalprice"), 2).alias("min_price"),
        dround(F.max("o_totalprice"), 2).alias("max_price"),
    )
    # num_files rows, but referenced THREE times (both overlap-join
    # sides + the output join) and Catalyst shares no subtrees: uncut,
    # each reference re-scans the freshly-written table and re-runs the
    # extent aggregation.
    per_file = per_file.localCheckpoint(eager=False)
    ext = per_file.withColumn("__k", F.lit(1))
    other = ext.select(
        F.col("__k").alias("__k2"),
        F.col("__f").alias("__f2"),
        F.col("min_custkey").alias("c_lo"),
        F.col("max_custkey").alias("c_hi"),
        F.col("min_price").alias("p_lo"),
        F.col("max_price").alias("p_hi"),
    )
    pairs = ext.join(F.broadcast(other), ext["__k"] == other["__k2"]).filter(
        F.col("__f") != F.col("__f2")
    )
    overlaps = pairs.agg(
        dround(
            F.avg(
                (
                    (F.col("min_custkey") <= F.col("c_hi"))
                    & (F.col("c_lo") <= F.col("max_custkey"))
                ).cast("double")
            ),
            4,
        ).alias("mean_overlap_custkey"),
        dround(
            F.avg(
                (
                    (F.col("min_price") <= F.col("p_hi"))
                    & (F.col("p_lo") <= F.col("max_price"))
                ).cast("double")
            ),
            4,
        ).alias("mean_overlap_price"),
    )
    return per_file.drop("__f").join(F.broadcast(overlaps))


QUERIES: dict[str, Query] = {
    "q_stats_agg": Query(q_stats_agg, SQL_STATS_AGG, "stddev/var/corr/covar aggregates"),
    "q_median_agg": Query(q_median_agg, SQL_MEDIAN_AGG, "exact interpolated median"),
    "q_offset_page": Query(q_offset_page, SQL_OFFSET_PAGE, "ordered LIMIT/OFFSET pagination"),
    "q_string_agg": Query(q_string_agg, SQL_STRING_AGG, "ordered string_agg/listagg"),
    "q_bool_agg": Query(q_bool_agg, SQL_BOOL_AGG, "bool_and/bool_or/count_if"),
    "q_rollup_grouping": Query(
        q_rollup_grouping, SQL_ROLLUP_GROUPING, "ROLLUP with GROUPING() indicators"
    ),
    "q_window_cume_demo": Query(q_window_cume_demo, SQL_WINDOW_CUME, "dense_rank + cume_dist"),
    "q_window_firstlast": Query(
        q_window_firstlast, SQL_WINDOW_FIRSTLAST, "first/last/nth_value full-frame window"
    ),
    "q_intersect_all": Query(q_intersect_all, SQL_INTERSECT_ALL, "bag intersect"),
    "q_unpivot": Query(q_unpivot, SQL_UNPIVOT, "unpivot/melt (inverse of pivot)"),
    "q_sample_stratified": Query(
        q_sample_stratified, SQL_SAMPLE_STRATIFIED, "per-stratum downsample (O5 upgrade)"
    ),
    "q07_nation_volume": Query(q07_nation_volume, SQL_Q07, "TPC-H Q7-style nation pairs"),
    "q10_returned_items": Query(q10_returned_items, SQL_Q10, "TPC-H Q10-style top-20"),
    "q_except_all": Query(q_except_all, SQL_EXCEPT_ALL, "bag except"),
    "q_collect_agg": Query(q_collect_agg, SQL_COLLECT_AGG, "ordered collect_list/set"),
    "q_sink_roundtrip": Query(q_sink_roundtrip, SQL_SINK_ROUNDTRIP, "partitioned parquet sink roundtrip (O21)"),
    "q_schema_evolution": Query(
        q_schema_evolution, SQL_SCHEMA_EVOLUTION, "mergeSchema read across schema-evolved parquet generations"
    ),
    "q_freq_items": Query(q_freq_items, SQL_FREQ_ITEMS, "frequent-items sketch (tolerance oracle)"),
    "q_upsert": Query(q_upsert, SQL_UPSERT, "keyed MERGE/upsert via anti-join union"),
    "q_skew_report": Query(q_skew_report, SQL_SKEW_REPORT, "shuffle-key skew diagnostic"),
    "q_posexplode": Query(q_posexplode, SQL_POSEXPLODE, "posexplode fan-out (UDTF analog)"),
    "q_fillna": Query(q_fillna, SQL_FILLNA, "null fill over outer join"),
    "q_mode_agg": Query(q_mode_agg, SQL_MODE_AGG, "per-key mode w/ deterministic ties"),
    "q04_priority_check": Query(q04_priority_check, SQL_Q04, "TPC-H Q4-style EXISTS"),
    "q12_priority_by_status": Query(q12_priority_by_status, SQL_Q12, "TPC-H Q12-style conditional counts"),
    "q14_promo_share": Query(q14_promo_share, SQL_Q14, "TPC-H Q14-style ratio"),
    "q_visible_files": Query(
        q_visible_files, SQL_VISIBLE_FILES, "in-flight/hidden/_SUCCESS file visibility (O4)"
    ),
    "q_corrupt_capture": Query(
        q_corrupt_capture, SQL_CORRUPT_CAPTURE, "PERMISSIVE corrupt-record capture (O19)"
    ),
    "q_job_cascade": Query(
        q_job_cascade, SQL_JOB_CASCADE, "priority job queue with failure cascade (O27-O29)"
    ),
    "q_zorder_code": Query(
        q_zorder_code, SQL_ZORDER_CODE, "Morton z-order code, fixed splits (deterministic curve math)"
    ),
    "q_zorder_layout": Query(
        q_zorder_layout, None, "z-order clustered write: per-file extents + mean range overlap (rows-only; hash twin q_zorder_code)"
    ),
}
