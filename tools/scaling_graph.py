"""Empirical near-linearity harness for the round-5 graph/decontam
operators (the same measured-not-claimed discipline as
scaling_dedup/scaling_text/scaling_ann).

Two plans whose 100 TB story rests on a bounded join:

  * ``fuzzy_decontamination`` — cross-corpus banded LSH in its
    PRODUCTION shape: the benchmark side is CONSTANT-SIZED (64 docs —
    eval suites don't grow with the training corpus) while the train
    side scales. The benchmark docs are light mutations of 64 corpus
    docs, so true matches exist at every scale. Gated metric: the
    candidate count out of the band equi-join — with a fixed benchmark
    side it must grow ~R (train bands only); a cross blowup would grow
    ~R^2. (A harness variant with BOTH sides growing ~R measures the
    band-collision background at ~R^2 by construction — that shape is
    why the operator contract pins the eval side as benchmark-sized.)
  * ``kcore`` — iterative 2-core peeling on the same scale-path dup
    graph: per round one degree agg + one semi-join screen, depth =
    peeling depth (shallow on dup graphs) -> wall-clock gated ~linear
    in edges.
  * ``triangle_stats`` — degree-ordered triangle counting on the
    SCALE-PATH dup graph (``minhash_dedup_pairs`` over a corpus with a
    constant injected near-dup fraction, the scaling_dedup corpus).
    Gated: edge count, the ORIENTED WEDGE count (exactly the rows the
    closure join processes — the O(m^1.5) bound's observable), and
    wall-clock.

Usage: python tools/scaling_graph.py [sf_dir sf_dir ...]
Default: sf0.01 sf0.1 (+ pass the tools/make_scale_corpus.py output as
a third decade). Every adjacent pair is gated at 2x its size ratio;
exits nonzero on any breach; prints a markdown table.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.dedup import (  # noqa: E402
    band_keys,
    fuzzy_decontamination,
    kcore,
    label_propagation,
    minhash_dedup_pairs,
    minhash_signatures,
)
from python_mapreduce_spark.llm.text import shingle_sets  # noqa: E402
from python_mapreduce_spark.session import get_spark, tune  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402

BENCHMARK_DOCS = 64  # constant at every scale: eval suites don't grow


def measure(spark, sf_dir: str) -> dict:
    from tools.scaling_dedup import corpus_with_dups  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)
    n = docs.count()

    # constant-sized benchmark: light mutations of the 64 lowest-id
    # docs, so true near-dup matches exist at every scale
    ev = (
        docs.orderBy("doc_id")
        .limit(BENCHMARK_DOCS)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" benchmark paraphrase tail")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    bc = band_keys(
        minhash_signatures(shingle_sets(docs, "doc_id", "text", 3), num_hashes=64),
        bands=32, rows=2,
    )
    be = band_keys(
        minhash_signatures(shingle_sets(ev, "doc_id", "text", 3), num_hashes=64),
        bands=32, rows=2,
    )
    t0 = time.time()
    cand = (
        bc.alias("c")
        .join(
            be.alias("e"),
            (F.col("c.band") == F.col("e.band")) & (F.col("c.bkey") == F.col("e.bkey")),
        )
        .select(F.col("c.id"), F.col("e.id"))
        .distinct()
        .count()
    )
    t_cand = time.time() - t0
    t0 = time.time()
    flagged = fuzzy_decontamination(docs, ev, "doc_id", "text", threshold=0.7).count()
    t_decontam = time.time() - t0

    # scale-path dup graph: minhash (not exact-jaccard) edges over the
    # constant-dup-fraction corpus
    corpus, _ = corpus_with_dups(spark, sf_dir)
    corpus = corpus.localCheckpoint(eager=True)
    t0 = time.time()
    edges = (
        minhash_dedup_pairs(corpus, "doc_id", "text", threshold=0.7)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    deg = (
        edges.select(F.col("id1").alias("v"))
        .unionByName(edges.select(F.col("id2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("id1"), F.col("d").alias("d1"))
    db = deg.select(F.col("v").alias("id2"), F.col("d").alias("d2"))
    keyed = edges.join(da, "id1").join(db, "id2")
    src = F.when(
        F.struct(F.col("d1"), F.col("id1")) < F.struct(F.col("d2"), F.col("id2")),
        F.col("id1"),
    ).otherwise(F.col("id2"))
    outdeg = keyed.select(src.alias("u")).groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    wedges = outdeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("long").alias("w")
    ).collect()[0]["w"] or 0
    t_tri = time.time() - t0

    # k-core peeling on the same dup graph: per round one degree agg +
    # one semi-join screen; depth is the peeling depth (shallow on
    # dup graphs), so wall-clock should track edges ~linearly.
    t0 = time.time()
    n_core = kcore(edges, 2).count()
    t_kcore = time.time() - t0

    # label propagation on the same dup graph: per round one
    # edges-onto-labels equi-join + one count agg + min(struct) argmax
    # -> wall-clock gated ~linear in edges (fixed 4 rounds).
    t0 = time.time()
    n_comm = label_propagation(edges, rounds=4).count()
    t_lpa = time.time() - t0

    return {
        "docs": n,
        "decontam_candidates": max(cand, 1),
        "decontam_flagged": flagged,
        "dup_edges": max(n_edges, 1),
        "oriented_wedges": max(int(wedges), 1),
        "t_decontam_cand": round(t_cand, 2),
        "t_decontam": round(t_decontam, 2),
        "t_triangle_side": round(t_tri, 2),
        "t_kcore": round(t_kcore, 2),
        "t_lpa": round(t_lpa, 2),
        "kcore_nodes": n_core,
        "lpa_communities": n_comm,
    }


def main() -> int:
    from tools.scaling_common import run_gates  # noqa: PLC0415

    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("scaling-graph", master="local[16]")
    tune(spark)
    return run_gates(
        dirs,
        lambda d: measure(spark, d),
        "docs",
        (
            "decontam_candidates",
            "dup_edges",
            "oriented_wedges",
            "t_decontam_cand",
            "t_decontam",
            "t_triangle_side",
            "t_kcore",
            "t_lpa",
        ),
        info_keys=("decontam_flagged", "kcore_nodes", "lpa_communities"),
    )


if __name__ == "__main__":
    raise SystemExit(main())
