"""Empirical near-linearity harness for the similarity-search family —
the ANN companion to tools/scaling_dedup.py (VERDICT r3 item 6 pattern).

The 100 TB claims for ANN rest on plan shape: the query table is
broadcast-small by contract, so per-query work must grow ~linearly in
CORPUS size — brute force scans the corpus once, and hyperplane-LSH
candidates grow with bucket occupancy (~n / 2^planes per bucket). The
quadratic failure mode (e.g. bucketing silently degenerating to one
bucket, or a plan regression cross-joining corpus x corpus) would grow
candidates ~R^2. This harness measures both sizes and gates at 2x the
corpus ratio:

  * LSH candidate-pair count for a FIXED 10-query set (radius-0 exact
    bucket match — runtime-noise-free, the load-bearing assertion);
  * brute-force top-k wall-clock (one corpus scan + BLAS matmul);
  * multi-probe LSH top-k wall-clock (the production dial set).

Usage: python tools/scaling_ann.py [sf_dir sf_dir ...]
Two or more dirs (default sf0.01 sf0.1; add the
tools/make_scale_corpus.py output — 100k vectors — as the at-scale
point); every adjacent pair is gated at 2x its size ratio. Exits
nonzero on any breach; prints a markdown table.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.similarity import (  # noqa: E402
    ann_topk_lsh,
    cosine_topk,
    hyperplane_lsh_buckets,
)
from python_mapreduce_spark.session import get_spark, tune  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402

N_QUERIES = 10
PLANES = 6


def measure(spark, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    # Candidate count at radius 0: corpus buckets equi-joined with the
    # fixed query buckets. Deterministic (seeded planes), so this is the
    # noise-free linearity signal.
    cb = hyperplane_lsh_buckets(emb, "vec_id", "embedding", planes=PLANES)
    qb = (
        hyperplane_lsh_buckets(queries, "vec_id", "embedding", planes=PLANES)
        .withColumnRenamed("id", "qid")
    )
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("qid") != F.col("id"))
        .count()
    )

    t0 = time.time()
    cosine_topk(emb, queries, "vec_id", "embedding", k=5).count()
    t_brute = time.time() - t0

    t0 = time.time()
    ann_topk_lsh(
        emb, queries, "vec_id", "embedding", k=5, planes=PLANES, probe_radius=4
    ).count()
    t_lsh = time.time() - t0

    # IVF-PQ end-to-end (train + encode + ADC + refine) on the corpus-
    # adaptive dials. Training passes dominate at these sizes (the
    # index is built per call here; production builds once and
    # amortizes), so the gated claim is near-LINEAR total cost — the
    # quadratic failure modes (ADC degenerating to all-pairs, refine
    # joining raw vectors corpus-wide) would breach the 2R gate.
    from python_mapreduce_spark.llm.similarity import ann_topk_ivf_pq  # noqa: PLC0415

    t0 = time.time()
    ann_topk_ivf_pq(
        emb, queries, "vec_id", "embedding", k=5, iters=3, m=16, pq_iters=2
    ).count()
    t_pq = time.time() - t0

    return {
        "vectors": n,
        "lsh_candidates": cand,
        "t_bruteforce": round(t_brute, 2),
        "t_lsh_multiprobe": round(t_lsh, 2),
        "t_ivf_pq": round(t_pq, 2),
    }


def main() -> int:
    from tools.scaling_common import run_gates  # noqa: PLC0415

    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("scaling-ann", master="local[16]")
    tune(spark)
    return run_gates(
        dirs,
        lambda d: measure(spark, d),
        "vectors",
        ("lsh_candidates", "t_bruteforce", "t_lsh_multiprobe", "t_ivf_pq"),
    )


if __name__ == "__main__":
    raise SystemExit(main())
