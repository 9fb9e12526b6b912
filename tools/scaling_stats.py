"""Empirical near-linearity harness for the rank-free statistics
family staged this round (the stats companion to scaling_dedup /
scaling_text / scaling_graph / scaling_ann — the VERDICT r3 item 6
pattern).

The 100 TB claim of mann_whitney_u / kruskal_wallis / spearman_corr
rests on ONE plan property: ranks are never assigned per row — the
work is a per-distinct-value count agg plus a distributed running sum
over the value-cardinality frame (range exchange + broadcast offsets,
no single-task window). The quadratic/funnel failure modes (a plan
regression to a global Window.orderBy, or a rank join exploding) show
up directly as superlinear wall-clock, so this harness measures each
operator end-to-end at every dir and gates every adjacent pair at 2x
its size ratio. bh_fdr rides along: its hypothesis count is fixed
(one per source) so its cost is the scan/agg — it must scale with the
corpus, not the rank machinery.

Usage: python tools/scaling_stats.py [sf_dir sf_dir ...]
Default: sf0.01 sf0.1 /tmp/sf1_synth (build the third decade with
tools/make_scale_corpus.py — documents-only, which is all this family
needs). Exits nonzero on any gate breach; prints a markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F  # noqa: E402

from scaling_common import run_gates  # noqa: E402

from python_mapreduce_spark.operators.aggregates import (  # noqa: E402
    bh_fdr,
    kruskal_wallis,
    mann_whitney_u,
    spearman_corr,
)
from python_mapreduce_spark.functions.scalar import dround, normal_sf_approx  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402

SPARK = get_spark("scaling-stats")


def measure(sf_dir: str) -> dict:
    docs = load_table(SPARK, sf_dir, "documents")
    n = docs.count()

    t0 = time.time()
    mw = mann_whitney_u(
        docs.withColumn("seg", F.when(F.col("lang") == "en", "en").otherwise("other")),
        "seg",
        "n_chars",
        a="en",
        b="other",
    ).collect()
    t_mw = time.time() - t0

    t0 = time.time()
    kw = kruskal_wallis(docs, "source", "n_chars").collect()
    t_kw = time.time() - t0

    t0 = time.time()
    sp = spearman_corr(docs, "n_chars", F.col("doc_id"), y_scale=1.0).collect()
    t_sp = time.time() - t0

    t0 = time.time()
    per = (
        docs.filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_s"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("k_s"),
        )
    )
    tot = per.agg(
        F.sum("n_s").cast("double").alias("__n"),
        F.sum("k_s").cast("double").alias("__k"),
    )
    w = per.crossJoin(F.broadcast(tot))
    p0 = F.col("__k") / F.col("__n")
    nsd = F.col("n_s").cast("double")
    z = F.when(
        (F.col("n_s") > 0) & (F.col("__k") > 0) & (F.col("__k") < F.col("__n")),
        (F.col("k_s").cast("double") / nsd - p0)
        / F.sqrt(p0 * (F.lit(1.0) - p0) / nsd),
    )
    pv = dround(
        F.when(z.isNotNull(), F.least(F.lit(1.0), F.lit(2.0) * normal_sf_approx(F.abs(z)))),
        8,
    )
    bh = bh_fdr(w.select("source", pv.alias("pv")), ["source"], "pv").collect()
    t_bh = time.time() - t0

    return {
        "n_docs": n,
        "t_mannwhitney_s": round(t_mw, 1),
        "t_kruskal_s": round(t_kw, 1),
        "t_spearman_s": round(t_sp, 1),
        "t_bh_fdr_s": round(t_bh, 1),
        "mw_z": mw[0].z if mw else None,
        "kw_h": kw[0].h_corrected if kw else None,
        "sp_rho": sp[0].spearman_rho if sp else None,
        "bh_rejected": sum(1 for r in bh if r.rejected),
    }


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/tmp/sf1_synth",
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    sys.exit(
        run_gates(
            dirs,
            measure,
            "n_docs",
            ("t_mannwhitney_s", "t_kruskal_s", "t_spearman_s", "t_bh_fdr_s"),
            info_keys=("mw_z", "kw_h", "sp_rho", "bh_rejected"),
        )
    )
