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
# round), so iteration order IS correctness coverage. Round-4 rotation
# (VERDICT r3 item 1): lead with the only 2 entries that have never had
# a driver row (landed after the r3 window was fixed), then refresh the
# 41 queries whose only driver-green rows are from r01 — before the
# driver regenerated testdata (events.ts NANOS→MICROS) — so that after
# this round every registry entry has a hard row on the CURRENT data
# (r03∪r04). The last 7 slots balance two pulls: queries whose code or
# oracle changed this round (the tightened LSH recall floor, the
# output_dir-path incremental dedup, the renamed window demos — the
# cumulative driver record is name-keyed, so the new names need fresh
# rows) and window breadth (one r02-stale entry from each module the
# 43 freshness slots leave uncovered: tpch3, joins, mr). The remaining
# changed entries (q_sim_ann_ivf_recall, q_dedup_simhash_eval,
# q_stream_incremental) lead the tail at positions 51+ — all three are
# replica-verified at sf0.01+sf0.1 this round, and the latter two
# already hold r03 rows under unchanged names.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (2) --
    "q_text_fuzzy_match",
    "q_embedding_norm",
    # -- only driver row predates the testdata regen (41) --
    "q_json_extract",
    "q_orders_by_month",
    "q_scalar_datetime",
    "q_scalar_string",
    "q_scalar_math",
    "q_case_when",
    "q_fillna",
    "q_posexplode",
    "q_filter_project",
    "q_distinct",
    "q_count_distinct",
    "q_topk_orders",
    "q_offset_page",
    "q_union",
    "q_intersect",
    "q_intersect_all",
    "q_except",
    "q_except_all",
    "q_pivot",
    "q_unpivot",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_rollup_grouping",
    "q_stats_agg",
    "q_median_agg",
    "q_mode_agg",
    "q_string_agg",
    "q_bool_agg",
    "q_sample_agg",
    "q_sample_stratified",
    "q_salted_agg",
    "q_scalar_subquery",
    "q_window_firstlast",
    "q04_priority_check",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q10_returned_items",
    "q12_priority_by_status",
    "q13_order_count_dist",
    "q14_promo_share",
    # -- changed this round (oracle tightened / path rerouted / renamed)
    # plus module breadth (stalest r02 entry of each uncovered module) --
    "q_sim_ann_lsh_recall",
    "q_window_rank_dist_demo",
    "q_window_cume_demo",
    "q_stream_incremental_dedup",
    "q02_min_cost_supplier",
    "q_join_theta",
    "q_mr_wordcount",
    # -- tail head: first in line beyond the 50-entry window (the
    # r4-new pipeline queries follow the three replica-verified
    # changed entries; together they lead the r5 window) --
    "q_sim_ann_ivf_recall",
    "q_dedup_simhash_eval",
    "q_stream_incremental",
    "q_doc_repetition",
    "q_text_contamination",
    "q_pii_redact",
    "q_domain_mix",
    "q_shard_pack",
    "q_tfidf_topk",
    "q_vocab_coverage",
    "q_nearest_centroid",
    "q_hash_split",
    "q_quality_quantile_filter",
    "q_weighted_sample",
    "q_deterministic_shuffle",
    "q_pipeline_curate",
    "q_pseudonymize",
    "q_schema_evolution",
    "q_gopher_filter",
    "q_temperature_sample",
    "q_upsample_mix",
    "q_crossdoc_ngrams",
    "q_hll_rollup",
    "q_group_reservoir",
    "q_stream_incremental_hll",
    "q_split_leakage",
    "q_topk_rollup",
    "q_kll_rollup",
    "q_clean_text",
    "q_quality_classifier",
    "q_semantic_dedup",
    "q_segment_dedup",
    "q_cluster_split",
    "q_perplexity_filter",
    "q_stream_incremental_contamination",
    "q_stream_incremental_topk",
    "q_histogram",
    "q_table_profile",
    "q_zscore_outliers",
    "q_stream_incremental_kll",
    "q_funnel",
    "q_cohort_retention",
    "q_resample_locf",
    "q_counter_increase",
    "q_quality_ensemble",
    "q_media_dedup",
    "q_media_feature_dedup",
    "q_pagerank",
    "q_inverted_index",
    "q_token_pmi",
    "q_stream_static_join",
    "q_scd2_history",
    "q_robust_scale",
    "q_trending",
    "q_langid_confusion",
    "q_diff_tables",
    "q_data_card",
    "q_target_encode",
    "q_winsorize",
    "q_negative_samples",
    "q_funnel_windowed",
    "q_dup_span_removal",
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
