"""Round-11 experiment: where does q_dedup_embedding's 32-core time go?

Decomposes the banded-LSH pipeline into sub-actions and times variants
of the candidate-pair join shape (VERDICT r10 item 1).

Usage: SPARK_GRAFT_CPUS=32 python tools/exp_dedup_embedding.py [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.similarity import _banded_lsh_keys  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402


def timed(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:50s} {best:7.3f}s", flush=True)
    return best


def main() -> None:
    sf = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    spark = get_spark("exp_dedup_embedding")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    def banded():
        return _banded_lsh_keys(
            emb, "vec_id", "embedding", bands=24, rows_per_band=2, dim=64, seed=42
        )

    def join_pairs(b):
        l, r = b.alias("l"), b.alias("r")
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

    # warmup at tiny sf
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()

    timed("banded keys count (1 UDF pass)", lambda: banded().count())
    timed("A cut+join (HEAD shape), count", lambda: join_pairs(banded().localCheckpoint(eager=False)).count())
    timed("B nocut join (r9 shape), count", lambda: join_pairs(banded()).count())

    def c():
        b = banded().localCheckpoint(eager=False)
        b = b.repartition(int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32")), "band", "bkey")
        return join_pairs(b)

    timed("C cut+repartition(band,bkey)+join, count", lambda: c().count())

    def d():
        b = banded().localCheckpoint(eager=False)
        l, r = b.alias("l"), b.alias("r")
        return (
            l.hint("merge")
            .join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bkey") == F.col("r.bkey"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
            .distinct()
        )

    timed("D cut+merge-hint join, count", lambda: d().count())

    def e():
        b = emb.repartition(int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32")))
        b = _banded_lsh_keys(b, "vec_id", "embedding", bands=24, rows_per_band=2, dim=64, seed=42)
        b = b.localCheckpoint(eager=False)
        return join_pairs(b)

    timed("E repartition-before-UDF+cut+join, count", lambda: e().count())

    spark.stop()


if __name__ == "__main__":
    main()
