"""Interleaved A/B of q_dedup_embedding: HEAD (banded cut) vs no-cut vs
repartitioned-cut at 32 cores (VERDICT r10 item 1).

Alternates variants within one session so host weather hits all arms
equally. Prints per-iteration seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import python_mapreduce_spark.llm.similarity as sim  # noqa: E402
from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def make_variant(mode: str):
    def pairs(emb, id_col, vec_col, *, bands=24, rows_per_band=2, dim=64, seed=42):
        banded = sim._banded_lsh_keys(
            emb, id_col, vec_col, bands=bands, rows_per_band=rows_per_band, dim=dim, seed=seed
        )
        if mode == "cut":
            banded = banded.localCheckpoint(eager=False)
        elif mode == "cut_repart":
            banded = banded.repartition(64, "band", "bkey").localCheckpoint(eager=False)
        l, r = banded.alias("l"), banded.alias("r")
        return (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bkey") == F.col("r.bkey"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
            .distinct()
        )

    return pairs


def main() -> None:
    spark = get_spark("exp_ab_dedup")
    q = all_queries()["q_dedup_embedding"]
    orig = sim.banded_lsh_candidate_pairs
    modes = sys.argv[1:] or ["cut", "nocut"]
    # warmup
    q.fn(spark, "/root/testdata/sf0.001").count()
    results: dict[str, list[float]] = {m: [] for m in modes}
    for it in range(5):
        for mode in modes:
            sim.banded_lsh_candidate_pairs = orig if mode == "head" else make_variant(mode)
            spark.sparkContext.setJobDescription(f"dedup_embedding {mode} it{it}")
            t0 = time.time()
            n = q.fn(spark, SF).count()
            dt = time.time() - t0
            results[mode].append(dt)
            print(f"it{it} {mode:12s} {dt:7.3f}s rows={n}", flush=True)
    sim.banded_lsh_candidate_pairs = orig
    for m, ts in results.items():
        ts2 = sorted(ts)
        print(f"{m:12s} best={ts2[0]:.3f} med={ts2[len(ts2)//2]:.3f} all={[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
