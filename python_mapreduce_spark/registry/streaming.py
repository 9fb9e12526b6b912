"""Streaming/incremental queries.

Each runs a real Structured Streaming query (file source -> checkpoint ->
AvailableNow -> sink) to completion inside the callable and returns the
result as a batch DataFrame, so the driver's oracle comparison applies to
streaming semantics: tumbling windows, incremental additive recombination
(the reference's f(A+B)=f(A)+f(B) contract, README.txt:18), session
windows, and a custom applyInPandasWithState operator.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, sql_dround
from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table
from python_mapreduce_spark.streaming.incremental import (
    collect_incremental_counts,
    file_stream,
    normalize_event_ts,
    run_stream_to_memory,
)
from python_mapreduce_spark.streaming.windows import (
    session_agg,
    stateful_running_max,
    tumbling_agg,
)


def _events_stream(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    # Stream the single events.parquet file: directory + glob filter
    # (the streaming file source rejects bare file paths).
    return file_stream(spark, sf_dir.rstrip("/"), glob="events.parquet", **kw)


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Real streaming pass: file source -> watermark -> 1h tumbling window
    # -> complete mode -> memory. AvailableNow processes the whole
    # directory then stops, so the result equals the batch computation —
    # which is exactly what the oracle checks.
    from python_mapreduce_spark.session import tune

    tune(spark)
    stream = normalize_event_ts(_events_stream(spark, sf_dir))
    agg = tumbling_agg(
        stream,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), dround(F.sum("value")).alias("sum_value")],
        watermark="1 hour",
    )
    out = run_stream_to_memory(agg, output_mode="complete")
    return out.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


SQL_STREAM_TUMBLING = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       {sql_dround('sum(value)')} AS sum_value
FROM events GROUP BY 1, 2
"""


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sliding windows (1h length, 30m slide): every event lands in two
    # overlapping windows. Same streaming pass as q_stream_tumbling —
    # the slide only changes the window-assignment expression.
    from python_mapreduce_spark.session import tune

    tune(spark)
    stream = normalize_event_ts(_events_stream(spark, sf_dir))
    agg = tumbling_agg(
        stream,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), dround(F.sum("value")).alias("sum_value")],
        watermark="1 hour",
        slide="30 minutes",
    )
    out = run_stream_to_memory(agg, output_mode="complete")
    return out.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


# Each event belongs to the two 30-min-grid windows covering it: the one
# starting at its own 30-min bucket and the one starting 30 min earlier.
SQL_STREAM_SLIDING = f"""
WITH assigned AS (
  SELECT unnest([date_trunc('hour', ts) + INTERVAL (CASE WHEN minute(ts) >= 30 THEN 30 ELSE 0 END) MINUTE,
                 date_trunc('hour', ts) + INTERVAL (CASE WHEN minute(ts) >= 30 THEN 0 ELSE -30 END) MINUTE])
           AS win_start,
         event_type, value
  FROM events
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       {sql_dround('sum(value)')} AS sum_value
FROM assigned GROUP BY 1, 2
"""


def q_stream_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's incremental contract end-to-end: land half the
    # files, run a checkpointed pass; land the rest, run another pass
    # touching ONLY new files; recombine partial aggregates additively.
    # The oracle is the one-shot batch over everything — f(A+B)=f(A)+f(B).
    from python_mapreduce_spark.session import tune

    tune(spark)
    events = table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="incr_")
    in_dir, ckpt = os.path.join(work, "in"), os.path.join(work, "ckpt")

    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)
    p1 = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(in_dir)
    p2 = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")

    import pandas as pd

    partials = spark.createDataFrame(
        pd.concat([p1, p2], ignore_index=True), "event_type string, n long, s double"
    )
    return partials.groupBy("event_type").agg(
        F.sum("n").alias("n_events"), dround(F.sum("s")).alias("sum_value")
    )


SQL_STREAM_INCREMENTAL = f"""
SELECT event_type, count(*) AS n_events, {sql_dround('sum(value)')} AS sum_value
FROM events GROUP BY event_type
"""


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Native session_window (batch mode emits every session; the
    # streaming path is exercised in tests with append+watermark).
    events = table(spark, sf_dir, "events")
    out = session_agg(
        events,
        "ts",
        "1 hour",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    return out.select(
        "user_id",
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


SQL_STREAM_SESSION = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts, 1) OVER w IS NULL
                OR date_diff('millisecond', lag(ts, 1) OVER w, ts) >= 3600000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def q_stream_stateful_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Custom stateful streaming operator (applyInPandasWithState):
    # per-event-type running max across micro-batches; the last update
    # per key equals the global max, which the batch oracle checks.
    from python_mapreduce_spark.session import tune

    tune(spark)
    stream = normalize_event_ts(_events_stream(spark, sf_dir, max_files_per_trigger=1))
    updates = stateful_running_max(stream, "event_type", "value")
    out = run_stream_to_memory(updates, output_mode="update")
    return out.groupBy("event_type").agg(dround(F.max("running_max")).alias("max_value"))


SQL_STREAM_STATEFUL_MAX = f"""
SELECT event_type, {sql_dround('max(value)')} AS max_value
FROM events GROUP BY event_type
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-stream inner join with an event-time range: each click
    # joined to the same user's purchases within the next 30 minutes.
    # Both sides carry watermarks so join state is bounded (without the
    # time bound + watermarks, stream-stream state grows forever — the
    # 100 TB failure mode). AvailableNow makes the result equal the
    # batch/oracle computation.
    from python_mapreduce_spark.session import tune

    tune(spark)
    clicks = (
        normalize_event_ts(_events_stream(spark, sf_dir))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        normalize_event_ts(_events_stream(spark, sf_dir))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
    )
    out = run_stream_to_memory(joined, output_mode="append")
    return out.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


SQL_STREAM_STREAM_JOIN = """
SELECT c.user_id, count(*) AS n_pairs
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id
"""


def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming deduplication with bounded state:
    # dropDuplicatesWithinWatermark keeps one row per (user, type) seen
    # within the watermark horizon and EXPIRES the key afterward — the
    # scale-correct alternative to unbounded dropDuplicates state. All
    # test events fit one horizon, so the result equals global DISTINCT.
    from python_mapreduce_spark.session import tune

    tune(spark)
    stream = normalize_event_ts(_events_stream(spark, sf_dir))
    deduped = (
        stream.withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out = run_stream_to_memory(deduped, output_mode="append")
    return out.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


SQL_STREAM_DEDUP = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


QUERIES: dict[str, Query] = {
    "q_stream_stream_join": Query(
        q_stream_stream_join, SQL_STREAM_STREAM_JOIN, "watermarked stream-stream interval join"
    ),
    "q_stream_dedup_watermark": Query(
        q_stream_dedup_watermark, SQL_STREAM_DEDUP, "dropDuplicatesWithinWatermark"
    ),
    "q_stream_tumbling": Query(
        q_stream_tumbling, SQL_STREAM_TUMBLING, "streamed tumbling-window agg (AvailableNow)"
    ),
    "q_stream_sliding": Query(
        q_stream_sliding, SQL_STREAM_SLIDING, "sliding-window agg (1h window, 30m slide)"
    ),
    "q_stream_incremental": Query(
        q_stream_incremental, SQL_STREAM_INCREMENTAL, "checkpointed incremental passes, additive"
    ),
    "q_stream_session_window": Query(
        q_stream_session_window, SQL_STREAM_SESSION, "session_window aggregation"
    ),
    "q_stream_stateful_max": Query(
        q_stream_stateful_max, SQL_STREAM_STATEFUL_MAX, "applyInPandasWithState running max"
    ),
}
