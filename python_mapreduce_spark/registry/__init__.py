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


# The driver verifies a prefix window of all_queries() (50 entries in round
# 1), so iteration order IS correctness coverage. This list leads the dict
# with (a) the rows that were red in CORRECTNESS_r01 (now fixed — must be
# re-checked) and (b) one-or-more representatives of every module/category
# that sat past round 1's window (joins, windows, mr, llm, streaming, the
# unchecked TPC-H shapes). Everything else follows in module order, with
# round-1-green queries last — if the window grows, it re-covers them.
DRIVER_PRIORITY: tuple[str, ...] = (
    # red in r01, fixed in r02 (stringified complex cols / tolerance oracles)
    "q_percentiles",
    "q_approx_percentile",
    "q_approx_distinct",
    "q_scalar_array",
    "q_scalar_map",
    "q_collect_agg",
    # TPC-H shapes with no r01 oracle row
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q02_min_cost_supplier",
    "q08_market_share",
    "q09_product_profit",
    "q11_revenue_share",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q20_volume_suppliers",
    "q21_sole_returner",
    # joins: every how= variant + theta/range/as-of
    "q_join_equi",
    "q_join_broadcast",
    "q_join_semi",
    "q_join_anti",
    "q_join_outer",
    "q_join_theta",
    "q_join_range",
    "q_join_asof",
    # (asof_fwd sits just past the window: backward asof + the hypothesis
    # equivalence tests cover the operator pair)
    # window shapes (cume/firstlast were already green in r01's window)
    "q_window_topk",
    "q_window_running",
    "q_window_range_frame",
    "q_sessionize",
    # sinks (O21) had pytest-only coverage in r01
    "q_sink_roundtrip",
    # map-reduce compatibility facade (the reference's native modality)
    "q_mr_stream_reduce",
    "q_mr_wordcount",
    "q_mr_wordcount_gz",
    "q_mr_weighted_avg",
    "q_mr_aux_join",
    # LLM-pipeline operators (first-class graded)
    "q_dedup_exact",
    "q_dedup_jaccard",
    "q_dedup_minhash",
    "q_dedup_embedding",
    "q_sim_topk",
    "q_sim_ann_lsh_recall",
    "q_sim_ann_ivf_recall",
    "q_text_stats",
    "q_text_langid",
    "q_text_fingerprint",
    "q_token_count",
    "q_multimodal_meta",
    # streaming representatives
    "q_stream_tumbling",
    "q_stream_incremental",
    "q_stream_dedup_watermark",
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
