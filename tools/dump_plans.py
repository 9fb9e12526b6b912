"""Generate PLANS.md: formatted physical plans for the headline queries
with the scale-relevant properties called out (pushdown, pruning,
broadcast, partial aggregation, top-k limits).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from python_mapreduce_spark.plans.explain import formatted_plan  # noqa: E402
from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    ("q01_pricing_summary", "partial+final hash agg; filter pushed to scan"),
    ("q_filter_project", "PushedFilters + pruned ReadSchema"),
    ("q05_region_revenue", "fact-fact shuffle join + broadcast dims"),
    ("q_join_asof", "as-of via single window pass, one shuffle"),
    ("q_window_topk", "WindowGroupLimit pre-trims per partition"),
    ("q_topk_orders", "TakeOrderedAndProject, no global sort"),
    ("q_dedup_minhash", "banded LSH self-join"),
    ("q_sim_topk", "mapInPandas scoring, corpus never shuffles"),
    ("q19_disjunctive_revenue", "OR-of-ANDs pushed to both scans"),
    ("q17_small_quantity_revenue", "de-correlated scalar subquery as broadcast pre-agg"),
    ("q_window_range_frame", "time-RANGE frame, single shuffle per partition key"),
    ("q08_market_share", "star join: one fact-fact shuffle, all dims broadcast"),
    ("q21_sole_returner", "exists/not-exists as one fact scan + window, no self-join"),
    ("q11_revenue_share", "global-threshold HAVING: agg branch broadcast back, partial-agg shuffle shared via ReuseExchange"),
    ("q15_top_supplier", "scalar-max view filter: same ReuseExchange pattern, no single-partition window"),
    ("q_window_cume_scalable", "distributed dense_rank + cume_dist: broadcast distinct-key ranks + global_row_number, no Window node"),
    ("q_unpivot", "melt via Expand in the scan stage, no shuffle"),
    ("q_dedup_embedding", "banded-LSH candidates: equi-join on band keys, no nested loop; broadcast-matrix verify — only 16-byte id pairs cross Arrow (r8)"),
    ("q_dedup_jaccard", "PPJoin prefix filter: rarity-ordered per-doc prefixes self-join (lossless for the threshold), candidate-bounded composite-key verify; stop-shingle cap as pre-resolved literal filter"),
    ("q_window_rank_scalable", "distributed global rank: one range exchange, no Window node"),
    ("q_join_range_bucketed", "bucket-grid range join: equi-join + residual filter"),
    ("q_text_contamination", "eval n-gram set broadcast; corpus scanned once, shuffled only on doc id for the count"),
    ("q_domain_mix", "md5-bucket keep rule evaluated inside the scan stage, no shuffle before the audit agg"),
    ("q_tfidf_topk", "tf frame checkpointed once (corpus exploded ONCE), df derived from it, term-keyed join, 1-row count broadcast, per-doc top-k window"),
    ("q_hash_split", "split CASE projection inside the scan stage; only the audit agg shuffles"),
    ("q_pipeline_curate", "quantile gate + hash split + BPE accounting fused: Catalyst optimizes the composition as one plan"),
    ("q_crossdoc_ngrams", "gram keys md5-narrowed before the shuffle; two keyed aggs + one equi-join, nothing all-pairs"),
    ("q_temperature_sample", "domains-row rate table broadcast back; data-side keep is a pushed filter, no data shuffle"),
    ("q_hll_rollup", "mergeable sketch rollup: both aggs map-side-combining, only fixed-size sketch binaries cross the wire"),
    ("q_topk_rollup", "frequent-items sketch rollup: accumulate/combine aggs, per-key window only over the estimated item set"),
    ("q_segment_dedup", "first-occurrence vote on md5(segment) keys, min(struct) map-side-combined; only kept segments shuffle for reassembly"),
    ("q_perplexity_filter", "one bigram agg trains the LM (checkpointed); context counts derive from it; scoring join + per-doc DECIMAL sum"),
    ("q_quality_classifier", "weights broadcast onto md5-bucketed tokens; per-doc mean collapses map-side before the shuffle"),
    ("q_zscore_outliers", "per-key stats agg broadcast back onto the stream: one scan + map-side join, no second shuffle"),
    ("q_resample_locf", "grid generated distributed from each key's span; LOCF window partitioned by key"),
    ("q_inverted_index", "posting lists trimmed by WindowGroupLimit before collect_list; tf frame checkpointed for its two consumers"),
    ("q_media_feature_dedup", "bucket + adjacent-probe equi-join on decoded features, never all-pairs"),
    ("q_target_encode", "per-category agg checkpointed; global prior DERIVED from it — one data scan, two broadcasts back"),
    ("q_negative_samples", "stride negatives via rank equi-join on the checkpointed shuffle frame — no crossJoin, no RNG"),
    ("q_domain_cap", "per-domain cap as Partial+Final WindowGroupLimit — map-side top-cap heap per domain, no full-domain sort"),
    ("q_quality_quota", "global cut via distributed rank (range exchange); per-group floor window WindowGroupLimit-trimmed"),
    ("q_table_checksum", "order-invariant content digest: ONE map-side-combined hash agg; only (n, hi, lo) cross the wire"),
    ("q_kcore", "k-core peeling: degree filter + semi-join per round on the checkpointed edge frame, no window, no collect"),
    ("q_chunk_pack", "concat-then-chunk packing: one range exchange for the running sum, then per-row span explode — no single-task window"),
    ("q_embed_covariance", "dim-pair explode + ONE map-side-combined decimal agg: wire carries dim^2/2 cells per task, corpus-size-independent"),
    ("q_equi_freq_bins", "per-group percentile thresholds broadcast back; bin assignment is a projected HOF over n_bins elements"),
    ("q_cross_corpus_overlap", "both sides md5-narrowed; reference pre-agged to distinct digests, broadcast when dimension-sized"),
    ("q_psi_drift", "reference deciles broadcast onto BOTH snapshots; bucket counts partial-agg map-side, totals re-agg from the count frame"),
    ("q_ks_test", "per-distinct-value counts, then ONE range exchange carrying BOTH cumulative counts as separate longs (multi-weight running sum — no bit-packing cliff)"),
    ("q_cdc_chunk_dedup", "per-doc windows only; cross-doc vote groupBy on md5 chunk keys with map-side partials"),
    ("q_chi2_terms", "contingency cells from ONE term-keyed agg (checkpointed); label/total frames broadcast; WindowGroupLimit top-k"),
    ("q_attribution", "as-of join: touches pre-reduced map-side to (user, ts) rows, one user-keyed shuffle, streaming window"),
    ("q_golden_record", "survivorship as ONE max(struct) hash agg — per-partition survivors combine map-side, no window over duplicates"),
    ("q_quantile_normalize", "per-group rank + size from ONE shuffle (window pair on the same partitioning), no second scan"),
    ("q_time_split_embargo", "pure codegen projection: boundary CASE over the timestamp, filters pushable to the scan"),
    ("q_class_weights", "ONE map-side-combined label agg; N and k derive from the count frame broadcast back"),
    ("q_dedup_savings", "canonical-keep verdicts join the tokenized frame once; the report is one group-key hash agg"),
    ("q_auc", "rank-identity AUC: per-distinct-score counts + ONE distributed running sum — no global sort, no single-task window"),
    ("q_classification_report", "one (label,pred) agg scans the data; marginals/diagonal derive from the class^2 frame"),
    ("q_calibration_summary", "one projection + one bin-keyed agg; Brier/ECE re-aggregate the n_bins frame"),
    ("q_fuzzy_decontam", "cross-corpus banded LSH: corpus bands equi-join benchmark bands; only candidates pay exact Jaccard"),
    ("q_auc_daily", "sliced AUC: cumulative counts via window PARTITIONED BY day over the count frame — parallel across slices"),
    ("q_markov", "per-key lag window (never SinglePartition) -> state^2 count frame; totals re-agg from that frame"),
    ("q_retrieval_eval", "cosine_topk plan + label join keyed on the kxQ top-k frame + two label aggs"),
    ("q_mutual_info", "ONE (a,b) agg; marginals/entropies re-agg from the class^2 frame, broadcast back"),
    ("q_nucleus", "count agg + group-partitioned running sum on the category-sized frame; null-safe totals join"),
    ("q_triangle_stats", "degree-ordered orientation bounds the wedge self-join at O(m^1.5); closure via one equi-join"),
    ("q_dq_audit", "ALL predicate rules in ONE scan/agg (k conditional sums, inline explode-to-long); uniqueness per key agg"),
    ("q_jsd_drift", "per-side category counts full-outer-merged; both KL halves in one re-agg of the category frame"),
    ("q_conversion_lag", "attribution as-of join (one user shuffle) -> ONE global exact-percentile agg"),
    ("q_top_paths", "per-key head window -> map-side path counts -> scalable global rank on the path frame"),
    ("q_user_churn", "two-row fan-out per (user, day) -> one (day,user) agg -> one day agg; no set self-join"),
    ("q_corr_matrix", "ALL pairwise sufficient stats in ONE scan/agg (DECIMAL-exact); pair table exploded from one row"),
    ("q_pr_curve", "PR sweep: one score-keyed agg, then ONE multi-weight running sum over descending score; totals broadcast"),
    ("q_lift_gain", "exact equal-size deciles by integer DIV arithmetic on aggregated (score,label) stripes — rows never shuffle by bucket"),
    ("q_survival_curve", "Kaplan-Meier: duration-keyed agg + TWO range-exchange running sums (risk set, then 1e-8-scaled ln terms)"),
    ("q_hits", "HITS: per-iteration in/out contribution aggs with DECIMAL sums; one-row L1 norms broadcast back"),
    ("q_sorted_neighborhood", "ER blocking: distributed global rank (range exchange) + explode(sequence)/equi-join — O(n*w) pairs, skew-proof"),
    ("q_histogram2d", "one scan + ONE (x,y)-bucket map-side-combined agg: at most (bins+2)^2 keys shuffle at any size"),
    ("q_blocklist_filter", "term list as ONE array literal; higher-order filter per row — pure codegen, no shuffle/UDF/join"),
    ("q_rfm", "one user agg; exact quantile thresholds broadcast back; scoring is a projected CASE"),
    ("q_ref_integrity", "FK audit: keys-only projections meet in an equi-join (parent side distinct -> broadcastable); union of four 1-row aggs"),
    ("q_bollinger_bands", "partitioned running window over the daily-agg frame — one shuffle on the key, no single-task stage"),
    ("q_pareto_share", "distributed global rank (range exchange) + broadcast 1-row count; conditional-sum agg, rows never shuffle twice"),
    ("q_zipf_slope", "vocab-frame TakeOrderedAndProject trim -> distributed rank over <=100 rows -> closed-form OLS agg"),
    ("q_l_diversity", "one (quasi, distinct-sensitive) agg -> one group-frame re-agg; single scan"),
    ("q_brier_score", "ONE map-side-combined global agg of squared-error sufficient stats"),
    ("q_table_checksum", "replication-audit digest: md5 words summed in ONE partial+final hash agg — (group, 3 numbers) per partition cross the exchange"),
    ("q_zorder_code", "Morton code: HOF bucket filter over broadcast literal splits + shift/or interleave — pure codegen, no UDF, one group agg bounded at 2^(bits*k) rows"),
    ("q_zorder_layout", "z-order write evidence: one range exchange clusters the curve; read-back per-file agg + broadcast joins on the <=num_files extent frame"),
    ("q_bm25_topk", "BM25: one tokenize pass, query-term filter BEFORE any join, per-term DECIMAL contributions, TakeOrderedAndProject cut"),
    ("q_hybrid_retrieval", "RRF fusion: BM25 and cosine ladders each top-k-sized by contract; fusion joins ~40 rows at any corpus scale"),
    ("q_label_propagation", "LPA round = ONE edge-onto-labels equi-join + map-side count agg + min(struct) argmax, labels checkpointed per round"),
    ("q_count_min", "count-min: (depth x width) bucket agg map-side-combined; estimates probe the fixed-size sketch frame"),
    ("q_mannwhitney", "rank-free U: per-distinct-value counts + ONE range-exchange running sum — no per-row ranks, no single-task window"),
]

INTERESTING = re.compile(
    r"PushedFilters|ReadSchema|Broadcast|WindowGroupLimit|TakeOrderedAndProject"
    r"|partial_|Exchange|SortMergeJoin|HashAggregate"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump-plans")
    registry = all_queries()
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by tools/dump_plans.py at {sf_dir}. The `>>` markers flag",
        "the scale-relevant plan properties (pushdown, pruning, broadcast,",
        "partial aggregation, pre-trimmed top-k).",
        "",
    ]
    for name, why in SHOWCASE:
        plan = formatted_plan(registry[name].fn(spark, sf_dir))
        marked = "\n".join(
            (">> " + line if INTERESTING.search(line) else "   " + line)
            for line in plan.splitlines()
        )
        out.append(f"## {name}\n\n_{why}_\n\n```\n{marked}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
