"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed as a full action (count of the result) so the
whole plan — scan, shuffle, agg, join — runs; timings exclude session
startup and the one-time warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_mapreduce_spark.registry import all_queries
from python_mapreduce_spark.session import get_spark

#: Headline set: one per operator family, heaviest variants.
HEADLINE = [
    "q01_pricing_summary",
    "q_filter_project",
    "q_count_distinct",
    "q_topk_orders",
    "q_rollup",
    "q_json_extract",
    "q05_region_revenue",
    "q_join_asof",
    "q_window_topk",
    "q_sessionize",
    "q_mr_wordcount",
    "q_dedup_minhash",
    "q_dedup_jaccard",
    "q_sim_topk",
    "q_text_stats",
    "q07_nation_volume",
    "q13_order_count_dist",
    "q19_disjunctive_revenue",
    "q_window_range_frame",
    "q_stream_tumbling",
    "q08_market_share",
    "q21_sole_returner",
    # Round-2 additions
    "q_window_rank_scalable",
    "q_pipeline_prepare",
    "q_dedup_embedding_matmul",
    # Round-3 additions. q_dedup_embedding is the banded-LSH regime —
    # the form that actually runs at 100 TB — benched alongside matmul
    # so regressions in it are visible (VERDICT r2 item 7). It is slow
    # here by nature, not by plan: this corpus's pair cosines sit at the
    # random background, so banding has no pruning power at sf0.1.
    "q_dedup_embedding",
    "q_window_cume_scalable",
    # Round-4 additions: the new training-data pipeline operators.
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
    # Round-4 late additions: quality gating, mixing, and dedup signals.
    "q_gopher_filter",
    "q_temperature_sample",
    "q_upsample_mix",
    "q_crossdoc_ngrams",
    "q_hll_rollup",
    # Round-4 continuation: sketch rollups, text normalization/quality,
    # semantic/segment dedup, leakage-safe splitting, perplexity.
    "q_topk_rollup",
    "q_kll_rollup",
    "q_clean_text",
    "q_quality_classifier",
    "q_semantic_dedup",
    "q_segment_dedup",
    "q_cluster_split",
    "q_perplexity_filter",
    "q_quality_ensemble",
    "q_table_profile",
    "q_resample_locf",
    "q_funnel",
    "q_counter_increase",
    "q_scd2_history",
    "q_robust_scale",
    "q_dup_span_removal",
    # Round-5 additions: curation quota/cap/budget ops + covariance.
    "q_domain_cap",
    "q_stratified_split_exact",
    "q_quality_quota",
    "q_token_budget",
    "q_embed_covariance",
    "q_chunk_pack",
    "q_equi_freq_bins",
    "q_cross_corpus_overlap",
    # Round-5 session-2 additions: drift monitors, CDC dedup, term
    # selection, batching, attribution/basket/survivorship analytics.
    "q_psi_drift",
    "q_ks_test",
    "q_cdc_chunk_dedup",
    "q_ngram_diversity",
    "q_chi2_terms",
    "q_length_buckets",
    "q_attribution",
    "q_assoc_rules",
    "q_mix_entropy",
    "q_seasonal_anomaly",
    "q_golden_record",
    "q_interval_join",
    "q_group_ols",
    "q_containment",
    "q_rolling_distinct",
    "q_decayed_trending",
    "q_tokenizer_fertility",
    "q_cluster_canonical",
    "q_quantile_normalize",
    "q_top_eigenvector",
    "q_dup_cluster_sizes",
    "q_dedup_savings",
    "q_time_split_embargo",
    "q_class_weights",
    "q_auc",
    "q_calibration_summary",
    "q_classification_report",
    "q_fuzzy_decontam",
    "q_auc_daily",
    "q_markov",
    "q_retrieval_eval",
    "q_mutual_info",
    "q_woe",
    "q_nucleus",
    "q_triangle_stats",
    "q_jsd_drift",
    "q_dq_audit",
    "q_conversion_lag",
    "q_top_paths",
    "q_gap_report",
    "q_benford",
    "q_user_churn",
    "q_readability",
    "q_session_stats",
    "q_rfm",
    "q_corr_matrix",
    "q_code_detect",
    "q_pr_curve",
    "q_lift_gain",
    "q_auc_disparity",
    "q_blocklist_filter",
    "q_compression_ratio",
    "q_compression_ratio_eval",
    "q_hits",
    "q_sorted_neighborhood",
    "q_histogram2d",
    "q_survival_curve",
    "q_k_anonymity",
    "q_missingness",
    "q_ab_test",
    "q_bloom_semi_join",
    "q_time_weighted_avg",
    "q_ohlc_bars",
    "q_er_match",
    # (q_stream_incremental_auc joins the other stream_incremental_*
    # queries in staying out of the headline set: their runtime is
    # dominated by temp-dir ingest writes, not engine throughput.)
    # Round-7 additions.
    "q_l_diversity",
    "q_ref_integrity",
    "q_brier_score",
    "q_bollinger_bands",
    "q_gini_domains",
    "q_pareto_share",
    "q_zipf_slope",
    "q_tfidf_terms",
    "q_dedup_embedding_precluster",
    "q_dedup_embedding_precluster_eval",
    "q_heaps_law",
    "q_table_checksum",
    # Round-8 registrations (staged batch 1). q_stream_cusum stays out:
    # like the stream_incremental_* family its runtime is temp-dir
    # ingest, not engine throughput.
    "q_anova",
    "q_welch_ttest",
    "q_mad_outliers",
    "q_cusum",
    "q_fellegi_sunter",
    "q_kcore",
    "q_cramers_v",
    "q_trimmed_mean",
    # Round-9 registrations (staged batch 2 — all batch-mode) plus the
    # z-order layout evidence pair.
    "q_mannwhitney",
    "q_spearman",
    "q_brown_forsythe",
    "q_jarque_bera",
    "q_kruskal_wallis",
    "q_mann_kendall",
    "q_bh_fdr",
    "q_partial_corr",
    "q_ols_influence",
    "q_forecast_backtest",
    "q_market_concentration",
    "q_autocorr",
    "q_bm25_topk",
    "q_t_closeness",
    "q_theil",
    "q_nelson_aalen",
    "q_hybrid_retrieval",
    "q_retrieval_ndcg",
    "q_count_min",
    "q_label_propagation",
    "q_zorder_code",
    "q_zorder_layout",
    # Round-10 registrations (staged round 9). The two
    # stream_incremental_* members stay out per the family convention
    # (runtime is temp-dir ingest, not engine throughput).
    "q_kmv_distinct",
    "q_kmv_intersect",
    "q_bootstrap_ci",
    "q_bootstrap_diff_ci",
    "q_sim_ann_ivf_pq",
    "q_sim_ann_ivf_pq_recall",
]

#: Tiny-SF warmup dir: pays per-plan JIT/codegen once so sf0.1 timings
#: measure steady-state execution, not Janino compile time (irrelevant at
#: cluster scale, dominant on a cold local JVM).
WARMUP_SF_DIR = "/root/testdata/sf0.001"

#: Host-drift calibration (VERDICT r3 item 5). Two rounds in a row the
#: cross-round bench comparison needed manual "uniform shift" forensics
#: after host reboots moved every timing by a constant factor. Anchors:
#:   * duckdb_q01 — the DuckDB-side runtime of the Q01 oracle SQL over
#:     the same parquet: a pure CPU+IO number with no JVM in the loop;
#:   * spark_scan_agg — a fixed parquet scan + 2-agg on lineitem: the
#:     smallest end-to-end Spark action.
#: Reference values measured at sf0.1 on the round-4 host INSIDE a full
#: bench run (the warmed-session context matters: the same scan-agg
#: measures ~2x slower in a fresh session; two back-to-back bench runs
#: agreed within 10% on both anchors). Each bench run re-measures both,
#: reports the drift factor (geometric mean of the two anchor ratios),
#: and emits queries_normalized = raw / drift so rounds compare on
#: equal footing.
CAL_REF = {"duckdb_q01": 0.077, "spark_scan_agg": 0.112}


def _measure_calibration(spark, sf_dir: str, q01_sql: str) -> dict[str, float]:
    import duckdb  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    best_duck = float("inf")
    for _ in range(3):
        t0 = time.time()
        con.execute(q01_sql).fetchall()
        best_duck = min(best_duck, time.time() - t0)

    def scan_agg() -> None:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
            F.sum("l_quantity"), F.count(F.lit(1))
        ).collect()

    scan_agg()  # warm
    best_scan = float("inf")
    for _ in range(3):
        t0 = time.time()
        scan_agg()
        best_scan = min(best_scan, time.time() - t0)
    return {"duckdb_q01": round(best_duck, 4), "spark_scan_agg": round(best_scan, 4)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    for name in names:
        registry[name].fn(spark, WARMUP_SF_DIR).count()

    # Best-of-3: measures steady-state engine throughput. This virtual
    # host has transient minutes-long slowdown waves (observed 10-50x on
    # identical plans with the box otherwise idle — storage/virtio
    # weather, not query cost; see README "benchmark methodology").
    # Every number reported is a real end-to-end run; taking the best of
    # three passes, plus one extra attempt for anything still anomalously
    # slow, keeps the recorded figure the reproducible one and makes
    # round-over-round regressions attributable to code, not weather.
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in names:
            t0 = time.time()
            registry[name].fn(spark, sf_dir).count()
            dt = time.time() - t0
            timings[name] = min(timings.get(name, float("inf")), dt)
    for name in names:
        if timings[name] > 10.0:
            t0 = time.time()
            registry[name].fn(spark, sf_dir).count()
            timings[name] = min(timings[name], time.time() - t0)
    timings = {k: round(v, 3) for k, v in timings.items()}

    cal = _measure_calibration(spark, sf_dir, registry["q01_pricing_summary"].sql)
    # Drift vs the pinned reference host: geometric mean of the two
    # anchor ratios. CAL_REF is an sf0.1 measurement, so normalization
    # only applies at sf0.1; other SFs report drift 1.0 (raw == norm).
    if abs(sf - 0.1) < 1e-9:
        drift = (
            (cal["duckdb_q01"] / CAL_REF["duckdb_q01"])
            * (cal["spark_scan_agg"] / CAL_REF["spark_scan_agg"])
        ) ** 0.5
    else:
        drift = 1.0
    normalized = {k: round(v / drift, 3) for k, v in timings.items()}

    record = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration": {**cal, "reference": CAL_REF, "drift": round(drift, 3)},
        "value_normalized": round(sum(normalized.values()), 3),
        "queries_normalized": normalized,
    }
    line = json.dumps(record, separators=(",", ":"))
    # The driver captures a tail of combined output and parses the last
    # JSON line it can see. The full record now carries 117+ queries
    # (~6 KB) and overflows that tail window even when printed last
    # (BENCH_r05 "parsed": null), so: the FULL record goes to
    # BENCH_LOCAL.json and an early stdout line, and the very last
    # stdout line is a compact SUMMARY record — same driver schema
    # (metric/value/unit/queries/sf) but with only the 10 heaviest
    # queries inlined, plus totals, count, and calibration drift.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w"
    ) as f:
        f.write(line + "\n")
    print(line, flush=True)
    spark.stop()
    print(make_summary_line(record), flush=True)


def make_summary_line(record: dict) -> str:
    """The driver-facing LAST stdout line: same schema as the full
    record but with only the 10 heaviest queries inlined, so it stays
    well under the driver's tail-capture window at ANY registry size
    (the full record overflowed it at 117 queries — BENCH_r05
    "parsed": null). Size pinned by tests/test_core_queries.py."""
    heavy10 = dict(sorted(record["queries"].items(), key=lambda kv: -kv[1])[:10])
    return json.dumps(
        {
            "metric": record["metric"],
            "value": record["value"],
            "unit": record["unit"],
            "queries": heavy10,
            "sf": record["sf"],
            "n_queries": len(record["queries"]),
            "value_normalized": record["value_normalized"],
            "calibration_drift": record["calibration"]["drift"],
            "full_record": "BENCH_LOCAL.json",
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    main()
