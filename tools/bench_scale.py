"""Scale-decade wall-clock bench: the heaviest registry queries on the
synthetic 10x corpus (tools/make_scale_corpus.py output) vs sf0.1.

The candidate-count scaling gates (tools/scaling_*.py) prove the
ALGORITHMIC growth is near-linear; this harness catches what they can't
see — super-linear WALL-CLOCK (a shuffle that stops fitting, a collect
that grows, a window that concentrates) — by running each heavy query at
both scales and comparing the time ratio to the corpus-size ratio of the
table the query actually scans (documents and embeddings grow by
different factors in the synthetic corpus).

A query is FLAGGED when t_big / t_small > 2 x its corpus ratio (with a
1s floor on t_small so Spark fixed overheads on sub-second queries don't
read as super-linear growth). Writes BENCH_SCALE.json; exit 1 if
anything is flagged.

Usage: python tools/bench_scale.py [small_dir] [big_dir]
       (defaults /root/testdata/sf0.1  /tmp/sf1_synth)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The heavy-10 from BENCH_LOCAL (r5): every multi-second query that
# touches only the documents/embeddings tables (the two the synthetic
# corpus regenerates). table -> which corpus ratio applies. Document
# queries run FIRST: the embedding corpus grows 50x (vs 10x for
# documents) and q_dedup_embedding sits on a documented quadratic cost
# floor there (random-background cosines -> candidates approach
# all-pairs), so the embedding pair goes last and a wall-clock budget
# keeps one pathological query from starving the whole report.
HEAVY = {
    "q_cluster_split": "documents",
    "q_containment": "documents",
    "q_triangle_stats": "documents",
    "q_dedup_jaccard": "documents",
    "q_dup_cluster_sizes": "documents",
    "q_cluster_canonical": "documents",
    "q_dedup_savings": "documents",
    "q_fuzzy_decontam": "documents",
    # VERDICT r6 stretch item 7: the ER family — sorted-neighborhood
    # blocking is O(n*w) candidates and should be the best-scaling
    # entry; the match-score stage joins payloads back per candidate
    "q_sorted_neighborhood": "documents",
    "q_er_match": "documents",
    "hits_documents": "documents",
    # Round-10: Ed-Join over 24-char document prefixes (title-style
    # typo dedup) — the positional-q-gram prefix filter's decade gate
    "edit_distance_documents": "documents",
    "q_top_eigenvector": "embeddings",
    "q_dedup_embedding": "embeddings",
}


def _hits_documents(spark, sf_dir):
    # VERDICT r6 stretch item 7: a HITS decade datapoint. The registry's
    # q_hits graph (lineitem x orders) isn't in the synthetic corpus, so
    # this wrapper runs the SAME hits_scores operator over the
    # documents-derived near-dup edge set (the df-capped jaccard join
    # q_triangle_stats uses) — per-iteration cost should track edges
    # ~linearly (two degree-free contribution joins + 1-row norms).
    from python_mapreduce_spark.llm.dedup import hits_scores, ngram_jaccard_pairs
    from python_mapreduce_spark.registry.llm import table

    docs = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, max_shingle_df=100
    ).select("id1", "id2")
    return hits_scores(edges, "id1", "id2", iterations=2)


def _dedup_embedding_auto(spark, sf_dir):
    # The production dispatcher (llm/dedup.py::embedding_dedup) — at
    # 100k x 64 the unit matrix is ~51 MB, under the broadcast budget,
    # so the regime is the CHUNKED matmul (bounded ~32 MB sims blocks
    # per task); past the budget it is LSH behind the candidate-budget
    # guard. This replaces the r6 timeout-skip with a bounded datapoint
    # (VERDICT r6 item 3).
    from python_mapreduce_spark.llm.dedup import embedding_dedup
    from python_mapreduce_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dedup(emb, "vec_id", "embedding", threshold=0.4)


# bench-local callables for operators whose registry query reads tables
# the synthetic corpus doesn't regenerate (hits) or whose registry form
# is the deliberately-unguarded explicit regime (dedup_embedding's raw
# LSH form sits on the documented random-cosine cost floor — the
# PRODUCTION path is the guarded dispatcher measured here)
def _edit_distance_documents(spark, sf_dir):
    # Ed-Join decade datapoint (llm/dedup.py::edit_distance_pairs): all
    # pairs of 24-char document prefixes within Levenshtein 1. The
    # registry query runs on part names (key-capped; the synthetic
    # corpus has no part table), so the decade gate measures the SAME
    # operator on the documents the corpus does regenerate. Measured
    # round 10: x4.1 wall on the x10 corpus (8.7 -> 35.5 s), pair count
    # x3.9 — the prefix/positional/length filters hold sub-linear.
    from pyspark.sql import functions as F
    from python_mapreduce_spark.llm.dedup import edit_distance_pairs
    from python_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 24).alias("s"),
    )
    return edit_distance_pairs(docs, "id", "s", max_distance=1)


CUSTOM_FNS = {
    "hits_documents": _hits_documents,
    "q_dedup_embedding": _dedup_embedding_auto,
    "edit_distance_documents": _edit_distance_documents,
}

# Documented super-linear regimes (measured + root-caused, see the cited
# docstrings): a flag on these queries records the measurement but does
# not fail the gate — only UNEXPECTED super-linearity exits nonzero.
WAIVERS = {
    "q_containment": (
        "df-cap saturation regime on the fixed-vocabulary synthetic corpus: "
        "candidate pairs = sum df*(df-1)/2 grows quadratically until the "
        "100-doc cap bites (measured x58.8 pairs on x10 corpus, 74.5M vs the "
        "cap/2 x instances = 166M hard bound); linear past saturation — "
        "llm/dedup.py::containment_pairs cost law"
    ),
    "q_dedup_jaccard": (
        "same df-capped postings join and saturation regime as q_containment"
    ),
    "q_triangle_stats": (
        "edge source is the df-capped jaccard join (same saturation regime); "
        "wedge join bounded O(m^1.5) on the resulting edges"
    ),
    "hits_documents": (
        "edge source is the same df-capped jaccard join (its saturation "
        "regime measured x33.7 in this very run as q_dedup_jaccard); the "
        "HITS iterations themselves are two degree-free equi-joins + 1-row "
        "norms per pass — linear in edges once the edge set exists"
    ),
    "q_dedup_embedding": (
        "exact all-pairs dedup is quadratic by design: the dispatcher's "
        "matmul regime scores n^2 cosines in bounded ~32 MB chunks, so the "
        "datapoint demonstrates BOUNDEDNESS (memory + wall-clock), not "
        "linearity; embeddings also grow x50 while documents grow x10 — "
        "llm/dedup.py::embedding_dedup (the r6 timeout-skip is gone: the "
        "candidate-budget guard refuses the unbounded LSH-verify regime)"
    ),
}


def reflag() -> int:
    """Re-apply flag/waiver classification to the existing
    BENCH_SCALE.json WITHOUT re-measuring — for when a measured
    super-linear regime gets root-caused and its waiver lands after the
    run (measurements untouched; only `flagged`/`waiver`/counts
    recompute)."""
    path = os.path.join(REPO, "BENCH_SCALE.json")
    with open(path) as f:
        record = json.load(f)
    n_unexplained = 0
    n_total = 0
    for name, row in record["queries"].items():
        if "time_ratio" not in row:
            continue
        flagged = row["time_ratio"] > 2.0 * row["corpus_ratio"]
        row["flagged"] = flagged
        n_total += flagged
        if flagged and name in WAIVERS:
            row["waiver"] = WAIVERS[name]
        else:
            row.pop("waiver", None)
            n_unexplained += flagged
    record.pop("n_flagged", None)  # VERDICT r7 item 6: the old name read
    # as "zero flags" when four waived flags existed — split the counts.
    record["n_flagged_unexplained"] = n_unexplained
    record["n_flagged_total"] = n_total
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"bench_scale_flagged_unexplained": n_unexplained}), flush=True)
    return 1 if n_unexplained else 0


def main() -> int:
    if "--reflag" in sys.argv[1:]:
        return reflag()
    if "--guard-only" in sys.argv[1:]:
        return guard_only()
    if "--only" in sys.argv[1:]:
        return only(sys.argv[sys.argv.index("--only") + 1 :])
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"

    from python_mapreduce_spark.registry import all_queries
    from python_mapreduce_spark.session import get_spark, tune

    ratios = {
        t: pq.read_metadata(os.path.join(big, f"{t}.parquet")).num_rows
        / pq.read_metadata(os.path.join(small, f"{t}.parquet")).num_rows
        for t in ("documents", "embeddings")
    }
    spark = get_spark("bench-scale")
    tune(spark)
    registry = all_queries()

    def run(name: str, sf_dir: str, *, single_past: float = 60.0) -> float:
        fn = CUSTOM_FNS.get(name) or registry[name].fn
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = time.time() - t0
        if best < single_past:  # a second pass only when it's cheap
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best

    # warm the JVM/codegen caches off the clock
    registry["q_dedup_jaccard"].fn(spark, small).count()

    deadline = time.time() + float(os.environ.get("BENCH_SCALE_BUDGET_S", "2400"))
    out: dict[str, dict] = {}
    n_flagged = 0  # unexplained (unwaived) flags — the gating count
    n_flagged_total = 0  # every flag, waived or not

    def flush_record() -> None:
        record = {
            "small": small,
            "big": big,
            "corpus_ratios": {k: round(v, 2) for k, v in ratios.items()},
            "queries": out,
            "n_flagged_unexplained": n_flagged,
            "n_flagged_total": n_flagged_total,
        }
        with open(os.path.join(REPO, "BENCH_SCALE.json"), "w") as f:
            json.dump(record, f, indent=2)

    for name, tbl in HEAVY.items():
        if time.time() > deadline:
            out[name] = {"table": tbl, "skipped": "wall-clock budget exhausted"}
            print(f"skip {name}: budget exhausted", flush=True)
            flush_record()
            continue
        t_small = run(name, small)
        t_big = run(name, big)
        corpus_ratio = ratios[tbl]
        time_ratio = t_big / max(t_small, 1.0)
        flagged = time_ratio > 2.0 * corpus_ratio
        waived = flagged and name in WAIVERS
        n_flagged += flagged and not waived
        n_flagged_total += flagged
        out[name] = {
            "table": tbl,
            "corpus_ratio": round(corpus_ratio, 2),
            "t_small_s": round(t_small, 2),
            "t_big_s": round(t_big, 2),
            "time_ratio": round(time_ratio, 2),
            "flagged": flagged,
        }
        if waived:
            out[name]["waiver"] = WAIVERS[name]
        # record incrementally: a hung query still leaves every
        # completed row on disk for the next session to read
        flush_record()
        tag = "WAIV" if waived else ("FLAG" if flagged else "ok  ")
        print(
            f"{tag} {name}: {t_small:.1f}s -> {t_big:.1f}s "
            f"(x{time_ratio:.1f} vs corpus x{corpus_ratio:.0f})",
            flush=True,
        )

    guard, guard_bad = run_guard(spark, big)
    n_flagged += guard_bad
    out["dedup_embedding_guard"] = guard
    flush_record()
    print(f"guard {guard}", flush=True)

    print(json.dumps({"bench_scale_flagged_unexplained": n_flagged}), flush=True)
    return 1 if n_flagged else 0


def run_guard(spark, big: str) -> tuple[dict, int]:
    # VERDICT r6 item 3 "Done" evidence: force the LSH branch at the big
    # corpus (huge corpus_bytes) and verify (a) the default policy is a
    # DELIBERATE raise — never an unbounded all-pairs verify — and (b)
    # the precluster re-route completes with a bounded wall-clock.
    from python_mapreduce_spark.llm.dedup import embedding_dedup
    from python_mapreduce_spark.sources.readers import load_table

    emb_big = load_table(spark, big, "embeddings")
    guard: dict = {}
    bad = 0
    try:
        embedding_dedup(
            emb_big, "vec_id", "embedding", corpus_bytes=1 << 40
        ).count()
        guard["lsh_budget_raise"] = False  # should not happen on this corpus
        bad = 1
    except ValueError as e:
        guard["lsh_budget_raise"] = True
        guard["raise_msg"] = str(e)[:200]
    t0 = time.time()
    guard["precluster_pairs"] = embedding_dedup(
        emb_big, "vec_id", "embedding", corpus_bytes=1 << 40,
        on_budget="precluster",
    ).count()
    guard["precluster_t_s"] = round(time.time() - t0, 2)
    return guard, bad


def only(names: list[str]) -> int:
    """Re-measure ONLY the named HEAVY rows and merge them into the
    existing BENCH_SCALE.json (the guard_only pattern) — for when one
    query's implementation changes without touching the other twelve."""
    from python_mapreduce_spark.registry import all_queries
    from python_mapreduce_spark.session import get_spark, tune

    path = os.path.join(REPO, "BENCH_SCALE.json")
    with open(path) as f:
        record = json.load(f)
    small, big = record["small"], record["big"]
    ratios = record["corpus_ratios"]
    spark = get_spark("bench-scale-only")
    tune(spark)
    registry = all_queries()

    def run(name: str, sf_dir: str, *, single_past: float = 60.0) -> float:
        fn = CUSTOM_FNS.get(name) or registry[name].fn
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = time.time() - t0
        if best < single_past:
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best

    for name in names:
        tbl = HEAVY[name]
        t_small = run(name, small)
        t_big = run(name, big)
        corpus_ratio = ratios[tbl]
        time_ratio = t_big / max(t_small, 1.0)
        flagged = time_ratio > 2.0 * corpus_ratio
        row = {
            "table": tbl,
            "corpus_ratio": round(corpus_ratio, 2),
            "t_small_s": round(t_small, 2),
            "t_big_s": round(t_big, 2),
            "time_ratio": round(time_ratio, 2),
            "flagged": flagged,
        }
        if flagged and name in WAIVERS:
            row["waiver"] = WAIVERS[name]
        record["queries"][name] = row
        print(f"{name}: {t_small:.1f}s -> {t_big:.1f}s (x{time_ratio:.1f})", flush=True)
    n_unexplained = sum(
        1
        for r in record["queries"].values()
        if r.get("flagged") and "waiver" not in r and "time_ratio" in r
    )
    record["n_flagged_unexplained"] = n_unexplained
    record["n_flagged_total"] = sum(
        1 for r in record["queries"].values() if r.get("flagged")
    )
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"bench_scale_flagged_unexplained": n_unexplained}), flush=True)
    return 1 if n_unexplained else 0


def guard_only() -> int:
    """Re-measure ONLY the dedup_embedding_guard block and merge it into
    the existing BENCH_SCALE.json — for when the guard path's dials
    change without touching the 13 measured heavy queries."""
    big = next(
        (a for a in sys.argv[1:] if not a.startswith("--")), "/tmp/sf1_synth"
    )
    from python_mapreduce_spark.session import get_spark, tune

    spark = get_spark("bench-scale-guard")
    tune(spark)
    path = os.path.join(REPO, "BENCH_SCALE.json")
    with open(path) as f:
        record = json.load(f)
    guard, bad = run_guard(spark, big)
    record["queries"]["dedup_embedding_guard"] = guard
    prior = record.pop("n_flagged", None)  # legacy single-count records
    base = record.get("n_flagged_unexplained", prior or 0)
    record["n_flagged_unexplained"] = base + bad
    record.setdefault(
        "n_flagged_total",
        sum(1 for r in record["queries"].values() if r.get("flagged")),
    )
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(f"guard {guard}", flush=True)
    print(
        json.dumps(
            {"bench_scale_flagged_unexplained": record["n_flagged_unexplained"]}
        ),
        flush=True,
    )
    return 1 if record["n_flagged_unexplained"] else 0


if __name__ == "__main__":
    sys.exit(main())
