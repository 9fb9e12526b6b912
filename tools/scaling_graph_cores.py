"""Decade + core-count scaling for the iterative graph operators
(VERDICT r10 item 7): q_hits / q_kcore / q_label_propagation wall clock
at 1x vs 10x edges, to be run at 8 and at 32 cores.

At sf0.1 every graph query is fixed-overhead-bound (8-core runs BEAT
32-core runs), so bench seconds there cannot evidence scale behavior.
This harness scales the REAL sf0.1 edge list a decade by tiling it N
times with shifted node ids (degree distribution, component structure
and peel depth preserved exactly per tile; nodes and edges both x N) and
times the operators bench-style (best of 3 warm runs).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scaling_graph_cores.py [--mult 10]
Writes/merges /root/repo/BENCH_SCALE_GRAPH.json keyed by core count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from python_mapreduce_spark.llm.dedup import (  # noqa: E402
    hits_scores,
    kcore,
    label_propagation,
)
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_SCALE_GRAPH.json")


def base_edges(spark):
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )


def tiled(e, mult: int):
    # tile k shifts every node id into its own namespace: k disjoint
    # copies of the real graph -> exactly mult x nodes and edges with
    # identical per-tile structure.
    tiles = e.crossJoin(F.broadcast(
        e.sparkSession.range(mult).select(F.col("id").alias("__tile"))))
    return tiles.select(
        F.concat(F.col("__tile").cast("string"), F.lit("_"), F.col("src")).alias("src"),
        F.concat(F.col("__tile").cast("string"), F.lit("_"), F.col("dst")).alias("dst"),
    )


def bench(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:32s} best {best:7.2f}s", flush=True)
    return round(best, 2)


def main() -> None:
    mult = 10
    for a in sys.argv[1:]:
        if a.startswith("--mult"):
            mult = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark("scaling_graph_cores")
    e1 = base_edges(spark).localCheckpoint(eager=True)
    n1 = e1.count()
    # materialize the tiled edge list once so the timed runs measure the
    # operators, not the tiling
    e10 = tiled(e1, mult).localCheckpoint(eager=True)
    n10 = e10.count()
    print(f"cpus={cpus} edges 1x={n1} {mult}x={n10}", flush=True)

    ops = {
        "hits": lambda e: hits_scores(e, "src", "dst", iterations=2).count(),
        "kcore": lambda e: kcore(e, 2, "src", "dst").count(),
        "lpa": lambda e: label_propagation(e, rounds=4, src="src", dst="dst").count(),
    }
    rec: dict = {"edges_1x": n1, f"edges_{mult}x": n10, "mult": mult, "queries": {}}
    for name, fn in ops.items():
        fn(e1)  # warm
        t1 = bench(f"{name} 1x", lambda: fn(e1))
        t10 = bench(f"{name} {mult}x", lambda: fn(e10))
        rec["queries"][name] = {
            "t_1x_s": t1,
            f"t_{mult}x_s": t10,
            "time_ratio": round(t10 / max(t1, 0.01), 2),
        }
    spark.stop()

    merged = {}
    if os.path.exists(OUT):
        merged = json.load(open(OUT))
    merged[f"cpus_{cpus}"] = rec
    json.dump(merged, open(OUT, "w"), indent=1)
    print(json.dumps(merged, indent=1))


if __name__ == "__main__":
    main()
