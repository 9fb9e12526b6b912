"""Query registry: the operator inventory the driver verifies.

Each entry pairs a Spark implementation (a callable ``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle that DuckDB runs over the
same parquet tables. ``sql=None`` marks genuinely non-SQL-expressible
operators (custom stateful streaming, approximate sketches) — the driver
then records a weaker rows-only check.

Conventions that make the hash comparison work (see __spark_entry__.py):
  * every computed column is aliased identically on both sides;
  * double aggregates are rounded (2-4 decimals) on both sides so float
    summation order can't flip a bit;
  * timestamps are emitted as formatted strings;
  * any query whose row *identity* depends on order (top-k) carries a
    total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One verified operator: Spark impl + DuckDB oracle (or rows-only)."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""


# The driver verifies a prefix window of all_queries() (50 entries per
# round), so iteration order IS correctness coverage. Round-3 rotation
# (VERDICT r2 item 1): the 30 registry entries that have never had a
# driver row lead the window — after this round every one of the
# registered queries has a cumulative driver-green row (r01∪r02∪r03).
# The new q_window_cume_scalable follows, then the remaining slots go to
# the entries whose code or input data changed this round (the q11/q15
# exchange-reuse rewrite, the events.ts TIMESTAMP_NTZ regen, the
# simhash/clusters/upsert ADVICE fixes' neighbors).
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (30) --
    # TPC-H shapes (the only §2.2 workloads without a driver row ever)
    "q03_shipping_priority",
    "q05_region_revenue",
    # streaming: stateful/sliding/session/stream-stream
    "q_stream_stateful_max",
    "q_stream_sliding",
    "q_stream_session_window",
    "q_stream_stream_join",
    # UDF surface modes (O7): Python UDTF + grouped-agg pandas UDAF
    "q_mr_udtf_tokens",
    "q_mr_udaf_wavg",
    # dedup: clusters / simhash / matmul regime
    "q_dedup_clusters",
    "q_dedup_simhash",
    "q_dedup_simhash_eval",
    "q_dedup_embedding_matmul",
    # ANN result sets (their recall twins were green in r02)
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    # windows: lag/moving-avg/rank demo + scalable twin
    "q_window_lag",
    "q_window_moving_avg",
    "q_window_rank_dist_demo",
    "q_window_rank_scalable",
    # joins: bucketed big-big range, salted, forward as-of
    "q_join_range_bucketed",
    "q_join_salted",
    "q_join_asof_fwd",
    # text/multimodal/pipeline
    "q_text_quality",
    "q_token_count_bpe",
    "q_pipeline_prepare",
    "q_doc_chunking",
    "q_multimodal_features",
    "q_multimodal_frames",
    # sinks + diagnostics
    "q_upsert",
    "q_freq_items",
    "q_skew_report",
    # -- new this round (q_window_cume_scalable = the scalable twin of
    # the cume demo; q_dedup_embedding_auto = the regime dispatcher;
    # q_visible_files/q_corrupt_capture/q_job_cascade give O4/O19/
    # O27-O29 — previously pytest-only side-effect operators — their
    # first oracle rows via deterministic-construction queries) --
    "q_window_cume_scalable",
    "q_dedup_embedding_auto",
    "q_visible_files",
    "q_corrupt_capture",
    "q_job_cascade",
    "q_stream_incremental_dedup",
    # -- changed this round (code or input data) --
    "q11_revenue_share",
    "q15_top_supplier",
    "q_window_cume_demo",
    "q_sessionize",
    "q_stream_tumbling",
    "q_stream_incremental",
    "q_stream_dedup_watermark",
    "q_join_asof",
    "q17_small_quantity_revenue",
    "q_window_range_frame",
    "q_dedup_jaccard",
    "q_dedup_minhash",
    "q_dedup_embedding",
    "q01_pricing_summary",
)


def all_queries() -> dict[str, Query]:
    """Aggregate every category module's QUERIES dict.

    Order: DRIVER_PRIORITY first (the driver's check window), then the
    remaining round-1-unchecked queries in module order, then the
    round-1-green remainder.
    """
    from python_mapreduce_spark.registry import (  # noqa: PLC0415 - lazy, avoids import cycles
        core,
        extra,
        joins,
        llm,
        mr,
        streaming,
        tpch2,
        tpch3,
        windows,
    )

    merged: dict[str, Query] = {}
    # Modules whose queries had no r01 oracle rows come before the
    # (mostly-green) core/extra/tpch2 block in the non-priority tail.
    for mod in (tpch3, joins, windows, mr, llm, streaming, core, extra, tpch2):
        for name, q in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = q

    out: dict[str, Query] = {}
    for name in DRIVER_PRIORITY:
        out[name] = merged.pop(name)  # KeyError = priority list out of date
    out.update(merged)
    return out
