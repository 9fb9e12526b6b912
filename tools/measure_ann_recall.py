"""Measure ANN recall vs brute force across dial settings and seeds.

Supports VERDICT r3 item 2: pick (planes, probe_radius) / (nlist, nprobe,
iters) such that multi-probe LSH recall >= 0.9 and IVF recall >= 0.8
hold with margin across scale factors and plane seeds, then pin those
thresholds in the registry oracles.

Usage: python tools/measure_ann_recall.py [--auto-only] [sf_dir ...]

``--auto-only`` skips the dial sweep and measures just the registry
default (corpus-adaptive ivf_dials) row — the cheap per-corpus gate.
ADVICE r6 item 1 coverage: the interpolated-dial regime between the
~28.9k floor crossover and the 100k scale point is measured on a
25x-embeddings synthetic corpus (50k vectors -> dials (11, 7)):

    python tools/make_scale_corpus.py --out /tmp/sf50k_synth \
        --doc-mult 1 --vec-mult 25
    python tools/measure_ann_recall.py --auto-only /tmp/sf50k_synth
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.similarity import (  # noqa: E402
    ann_topk_ivf,
    ann_topk_lsh,
    cosine_topk,
    ivf_dials,
)
from python_mapreduce_spark.session import get_spark, tune  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402


def recall(exact, approx) -> float:
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    row = (
        ex.join(ap, ["query_id", "neighbor_id"], "left")
        .agg(
            (F.sum(F.coalesce("__hit", F.lit(0))) / F.count(F.lit(1))).alias("r")
        )
        .collect()[0]
    )
    return float(row.r)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--auto-only"]
    auto_only = "--auto-only" in sys.argv[1:]
    sf_dirs = args or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("ann-recall", master="local[16]")
    tune(spark)
    for sf in sf_dirs:
        emb = load_table(spark, sf, "embeddings").cache()
        queries = emb.filter(F.col("vec_id") < 10)
        exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5).cache()
        exact.count()

        for planes, radius in [] if auto_only else [(6, 3), (6, 4), (8, 4), (10, 5), (12, 6)]:
            for seed in (42, 7, 2024):
                r = recall(
                    exact,
                    ann_topk_lsh(
                        emb, queries, "vec_id", "embedding",
                        k=5, planes=planes, probe_radius=radius, seed=seed,
                    ),
                )
                print(f"{sf} LSH planes={planes} radius={radius} seed={seed}: recall={r:.3f}", flush=True)

        for nlist, nprobe, iters in [] if auto_only else [(8, 3, 2), (8, 5, 3), (8, 6, 3), (16, 8, 3), (16, 10, 3)]:
            r = recall(
                exact,
                ann_topk_ivf(
                    emb, queries, "vec_id", "embedding",
                    k=5, nlist=nlist, nprobe=nprobe, iters=iters,
                ),
            )
            print(f"{sf} IVF nlist={nlist} nprobe={nprobe} iters={iters}: recall={r:.3f}", flush=True)

        # the registry-default corpus-adaptive dials (ivf_dials) —
        # this row is the VERDICT r5 item-4 gate: >= 0.85 at 100k
        n = emb.count()
        auto_nlist, auto_nprobe = ivf_dials(n)
        r = recall(
            exact,
            ann_topk_ivf(emb, queries, "vec_id", "embedding", k=5, iters=3),
        )
        print(
            f"{sf} IVF ADAPTIVE n={n} -> nlist={auto_nlist} nprobe={auto_nprobe} iters=3: "
            f"recall={r:.3f}",
            flush=True,
        )
        emb.unpersist()
        exact.unpersist()


if __name__ == "__main__":
    main()
