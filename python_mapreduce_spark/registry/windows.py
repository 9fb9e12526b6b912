"""Window/analytic queries: ranking, running aggregates, lag/lead,
frames, distribution functions, sessionization.

Reference coverage: all of these are hand-written loops inside the user
reduce function over the sorted group (SURVEY.md §2.2 "Window functions";
sorted-group iteration at disk_sort.py:39-75). Here they are single-pass
window operators over one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_mapreduce_spark.functions.scalar import dround, sql_dround
from python_mapreduce_spark.registry.extra import SQL_WINDOW_CUME
from python_mapreduce_spark.operators.windows import (
    deterministic_shuffle,
    global_row_number,
    global_running_sum,
    lag_delta,
    moving_avg,
    running_agg,
    sessionize,
    topk_per_group,
)
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return topk_per_group(
        li,
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        k=3,
    ).select(
        "l_suppkey",
        F.col("rn").cast("long").alias("rn"),
        "l_orderkey",
        "l_linenumber",
        dround("l_extendedprice").alias("price"),
    )


SQL_WINDOW_TOPK = f"""
SELECT l_suppkey, rn, l_orderkey, l_linenumber, {sql_dround('l_extendedprice')} AS price
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem)
WHERE rn <= 3
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return running_agg(
        o,
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        "o_totalprice",
        out="running_total",
    ).select("o_custkey", "o_orderkey", dround("running_total").alias("running_total"))


SQL_WINDOW_RUNNING = f"""
SELECT o_custkey, o_orderkey,
       {sql_dround('''sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_total
FROM orders
"""


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return lag_delta(
        e, ["user_id"], [F.col("ts"), F.col("event_id")], "value", out="delta"
    ).select("event_id", "user_id", dround("delta").alias("delta"))


SQL_WINDOW_LAG = f"""
SELECT event_id, user_id,
       {sql_dround('''value - lag(value, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)''')} AS delta
FROM events
"""


def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return moving_avg(
        o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")], "o_totalprice", 3
    ).select("o_custkey", "o_orderkey", dround("mavg").alias("mavg3"))


SQL_WINDOW_MOVING_AVG = f"""
SELECT o_custkey, o_orderkey,
       {sql_dround('''avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')} AS mavg3
FROM orders
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-RANGE frame (vs the row-count frame above): per supplier, the
    # trailing-3-day shipped-quantity sum at each lineitem's ship date.
    # Spark range frames need a numeric order key -> epoch seconds;
    # bounds are inclusive on both engines, and equal timestamps are
    # peers (every row at the same instant sees the same frame), so no
    # tiebreak is needed for determinism. Summarized to per-supplier
    # peak demand so the result is dimension-sized.
    li = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_timestamp("l_shipdate"))
        .rangeBetween(-3 * 86400, 0)
    )
    rolled = li.select(
        "l_suppkey", F.sum("l_quantity").over(w).alias("qty_3d")
    )
    return rolled.groupBy("l_suppkey").agg(
        dround(F.max("qty_3d"), 1).alias("peak_qty_3d")
    )


SQL_WINDOW_RANGE_FRAME = f"""
WITH rolled AS (
  SELECT l_suppkey,
         sum(l_quantity) OVER (
           PARTITION BY l_suppkey ORDER BY l_shipdate
           RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS qty_3d
  FROM lineitem
)
SELECT l_suppkey, {sql_dround('max(qty_3d)', 1)} AS peak_qty_3d
FROM rolled GROUP BY l_suppkey
"""


def q_window_rank_dist_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DEMO SHAPE: Window.orderBy with no partition key funnels the whole
    # table through one task — fine for a dimension-sized input, dead at
    # 100 TB. q_window_rank_scalable computes the identical answer with
    # range partitioning (same oracle).
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(w).cast("long").alias("rnk"),
        dround(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def q_window_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB form of global ranking: range-repartition on the order
    # key, number each partition locally, add broadcast prefix offsets
    # (operators/windows.py::global_row_number) — no single-partition
    # window anywhere. rank == row_number here because the order carries
    # a unique tiebreak (c_custkey); ntile/percent_rank are recovered
    # arithmetically from (rn, n). Same oracle as q_window_rank_dist_demo.
    c = table(spark, sf_dir, "customer")
    n = c.count()
    ranked = global_row_number(c, ["c_acctbal", "c_custkey"], out="rnk")
    rn = F.col("rnk")
    k, size, extra = 4, n // 4, n % 4
    boundary = extra * (size + 1)
    quartile = F.when(rn <= F.lit(boundary), (rn - 1) / F.lit(size + 1)).otherwise(
        F.lit(extra) + (rn - F.lit(boundary) - 1) / F.lit(max(size, 1))
    )
    return ranked.select(
        "c_custkey",
        (F.floor(quartile) + 1).cast("long").alias("quartile"),
        rn.alias("rnk"),
        dround((rn - 1) / F.lit(n - 1), 6).alias("pct_rank"),
    )


SQL_WINDOW_RANK_DIST = f"""
SELECT c_custkey,
       ntile(4)       OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
       rank()         OVER (ORDER BY c_acctbal, c_custkey) AS rnk,
       {sql_dround('percent_rank() OVER (ORDER BY c_acctbal, c_custkey)', 6)} AS pct_rank
FROM customer
"""


def q_window_cume_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB form of dense_rank + cume_dist (scalable twin of
    # registry/extra.py::q_window_cume_demo; same oracle):
    #   * dense_rank(key) == rank of the key within the DISTINCT key set
    #     — rank the distinct set with global_row_number (stays scalable
    #     at any key cardinality) and broadcast-join it back;
    #   * cume_dist over a total order with a unique tiebreak == rn / n
    #     with rn from global_row_number.
    # No single-partition Window anywhere in the plan.
    c = table(spark, sf_dir, "customer")
    n = c.count()
    segs = global_row_number(
        c.select("c_mktsegment").distinct(), ["c_mktsegment"], out="seg_rank"
    )
    ranked = global_row_number(c, ["c_acctbal", "c_custkey"], out="rn")
    return ranked.join(F.broadcast(segs), "c_mktsegment").select(
        "c_custkey",
        F.col("seg_rank").cast("long").alias("seg_rank"),
        dround(F.col("rn") / F.lit(n), 6).alias("bal_cume"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gap-based sessions (1h) per user over the events stream — the batch
    # twin of streaming session windows (registry/streaming.py).
    e = table(spark, sf_dir, "events")
    s = sessionize(
        e, ["user_id"], "ts", [F.col("ts"), F.col("event_id")], gap_ms=3_600_000
    )
    return s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts, 1) OVER w IS NULL
                OR date_diff('millisecond', lag(ts, 1) OVER w, ts) > 3600000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM flagged GROUP BY user_id
"""


def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token-budget shard packing for training-data prep: documents are
    # laid out in id order and cut into shards of ~2000 tokens — shard =
    # floor(exclusive-prefix-token-count / budget), so every shard except
    # the last holds the docs whose window starts inside its budget. The
    # cumulative sum is the scalable global_running_sum (range exchange +
    # per-range-partition window + broadcast prefix offsets), never a
    # single-partition SUM() OVER (ORDER BY) — the oracle's form, which
    # only DuckDB gets to use.
    from python_mapreduce_spark.functions.scalar import tokenize  # noqa: PLC0415

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize("text")).cast("long").alias("n_tokens")
    )
    cum = global_running_sum(docs, ["doc_id"], "n_tokens", out="cum_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(2000))
        .cast("long")
        .alias("shard"),
    )


SQL_SHARD_PACK = """
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       CAST(floor((SUM(n_tokens) OVER w - n_tokens) / 2000.0) AS BIGINT) AS shard
FROM t
WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reproducible corpus shuffle (operators/windows.py::
    # deterministic_shuffle): global rank over md5(doc_id) via the
    # scalable global_row_number — range exchange + broadcast prefix
    # offsets, no single-task window. The oracle replays the ordering
    # with a plain window (DuckDB's single process gets to).
    return deterministic_shuffle(
        table(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )


SQL_DETERMINISTIC_SHUFFLE = """
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         AS shuffle_order
FROM documents
"""


QUERIES: dict[str, Query] = {
    "q_window_topk": Query(q_window_topk, SQL_WINDOW_TOPK, "top-k per group via row_number"),
    "q_window_running": Query(q_window_running, SQL_WINDOW_RUNNING, "running sum per key"),
    "q_window_lag": Query(q_window_lag, SQL_WINDOW_LAG, "lag delta per key"),
    "q_window_moving_avg": Query(q_window_moving_avg, SQL_WINDOW_MOVING_AVG, "3-row moving avg"),
    "q_window_range_frame": Query(
        q_window_range_frame, SQL_WINDOW_RANGE_FRAME, "time-RANGE frame (trailing 3-day sum)"
    ),
    "q_window_rank_dist_demo": Query(q_window_rank_dist_demo, SQL_WINDOW_RANK_DIST, "ntile/rank/percent_rank"),
    "q_shard_pack": Query(q_shard_pack, SQL_SHARD_PACK, "token-budget shard packing via distributed running sum"),
    "q_deterministic_shuffle": Query(
        q_deterministic_shuffle, SQL_DETERMINISTIC_SHUFFLE, "reproducible corpus shuffle via scalable global rank"
    ),
    "q_window_rank_scalable": Query(q_window_rank_scalable, SQL_WINDOW_RANK_DIST, "distributed global rank (range-partitioned, no single-task window)"),
    "q_window_cume_scalable": Query(
        q_window_cume_scalable,
        SQL_WINDOW_CUME,
        "distributed dense_rank + cume_dist (no single-task window)",
    ),
    "q_sessionize": Query(q_sessionize, SQL_SESSIONIZE, "gap-based sessionization"),
}
