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
    "q_top_eigenvector": "embeddings",
    "q_dedup_embedding": "embeddings",
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
    "q_dedup_embedding": (
        "random-background cosines: banded-LSH candidates approach all-pairs "
        "at any size on this corpus — the data's documented cost floor "
        "(llm/dedup.py::embedding_dedup_pairs); embeddings also grow x50 "
        "while documents grow x10"
    ),
}


def main() -> int:
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
        t0 = time.time()
        registry[name].fn(spark, sf_dir).count()
        best = time.time() - t0
        if best < single_past:  # a second pass only when it's cheap
            t0 = time.time()
            registry[name].fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best

    # warm the JVM/codegen caches off the clock
    registry["q_dedup_jaccard"].fn(spark, small).count()

    deadline = time.time() + float(os.environ.get("BENCH_SCALE_BUDGET_S", "2400"))
    out: dict[str, dict] = {}
    n_flagged = 0

    def flush_record() -> None:
        record = {
            "small": small,
            "big": big,
            "corpus_ratios": {k: round(v, 2) for k, v in ratios.items()},
            "queries": out,
            "n_flagged": n_flagged,
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

    print(json.dumps({"bench_scale_flagged": n_flagged}), flush=True)
    return 1 if n_flagged else 0


if __name__ == "__main__":
    sys.exit(main())
