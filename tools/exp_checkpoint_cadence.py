"""Measured checkpoint-cadence experiment for the graph family
(VERDICT r9 item 4).

The fixed-iteration graph operators (pagerank_fixed / hits_scores /
label_propagation) localCheckpoint their score frame EVERY iteration —
~4-6 blocking materializations per query, the bench's top cost block
(q_hits 8.2 s, q_label_propagation 6.4 s, q_kcore 6.0 s in r9). A
cadence of 2 halves the blocking round-trips at the price of a plan at
most 2 rounds deep. This harness measures both on the REGISTRY
workloads at a given SF dir, and first proves the results identical
(the operators round every score per step, so cadence is a pure
physical-plan change).

Usage: python tools/exp_checkpoint_cadence.py [sf_dir] [reps]
Prints a markdown table; adoption is decided on the numbers (and gated
by tools/scaling_graph.py decade probes for lineage growth), per the
measured-not-mandated discipline.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.dedup import (  # noqa: E402
    hits_scores,
    label_propagation,
    pagerank_fixed,
)
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402


def _cust_supp_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )


def _dup_edges(spark, sf_dir):
    from python_mapreduce_spark.llm.dedup import ngram_jaccard_pairs  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, max_shingle_df=100, prefix_filter=True
    ).select("id1", "id2")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-ckpt-cadence")

    workloads = {
        # registry shapes: q_pagerank (3 iters), q_hits (2 iters),
        # q_label_propagation (4 rounds on the df-capped dup graph)
        "pagerank(3)": lambda ck: pagerank_fixed(
            _cust_supp_edges(spark, sf_dir), "src", "dst",
            iterations=3, checkpoint_every=ck,
        ),
        "hits(2)": lambda ck: hits_scores(
            _cust_supp_edges(spark, sf_dir), "src", "dst",
            iterations=2, checkpoint_every=ck,
        ),
        "lpa(4)": lambda ck: label_propagation(
            _dup_edges(spark, sf_dir), rounds=4, checkpoint_every=ck
        ),
    }

    cadences = (1, 2, 4)
    print(f"# checkpoint cadence @ {sf_dir}, best of {reps}")
    print("| workload | " + " | ".join(f"cadence={c}" for c in cadences) + " | equal |")
    print("|---|" + "---|" * (len(cadences) + 1))
    rc = 0
    for name, fn in workloads.items():
        times: dict[int, float] = {}
        results: dict[int, frozenset] = {}
        for ck in cadences:
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                rows = fn(ck).collect()
                best = min(best, time.time() - t0)
            times[ck] = best
            results[ck] = frozenset(tuple(r) for r in rows)
        equal = all(results[c] == results[cadences[0]] for c in cadences)
        if not equal:
            rc = 1
        print(
            f"| {name} | "
            + " | ".join(f"{times[c]:.2f}s" for c in cadences)
            + f" | {'yes' if equal else 'NO — BUG'} |"
        )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
