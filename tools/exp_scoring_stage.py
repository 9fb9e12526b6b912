"""Round-11 experiment: isolate the q_dedup_embedding scoring-stage cost.

The event log shows the post-distinct mapInPandas stage burning ~15s per
task on ~62k candidate pairs each (~250us/row), while the same scoring
arithmetic runs at <1us/row in pure pandas. Which part is slow:
the distinct, the Arrow hop, the closure, or the join upstream?
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.similarity import _banded_lsh_keys, _round6, _unit_rows  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402


def timed(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return best


def main() -> None:
    sf = "/root/testdata/sf0.1"
    spark = get_spark("exp_scoring_stage")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    pdf = (
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        .filter(F.col("v").isNotNull())
        .toPandas()
    )
    unit = _unit_rows(pdf["v"].values)
    pos = pd.Series(np.arange(len(pdf)), index=pdf["id"].to_numpy())

    def score(batches):
        for b in batches:
            if b.empty:
                continue
            i1 = pos.reindex(b["id1"].to_numpy()).to_numpy()
            i2 = pos.reindex(b["id2"].to_numpy()).to_numpy()
            ok = ~(np.isnan(i1) | np.isnan(i2))
            i1, i2 = i1[ok].astype("int64"), i2[ok].astype("int64")
            cos = _round6((unit[i1] * unit[i2]).sum(axis=1))
            m = cos >= 0.4
            yield pd.DataFrame(
                {
                    "id1": b["id1"].to_numpy()[ok][m],
                    "id2": b["id2"].to_numpy()[ok][m],
                    "cos": cos[m],
                }
            )

    def identity(batches):
        for b in batches:
            yield pd.DataFrame({"id1": b["id1"], "id2": b["id2"], "cos": 0.5})

    def cand():
        b = _banded_lsh_keys(emb, "vec_id", "embedding", bands=24, rows_per_band=2, dim=64, seed=42)
        b = b.localCheckpoint(eager=False)
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

    schema = "id1 long, id2 long, cos double"
    timed("cand only, count", lambda: cand().count())
    timed("cand + identity mapInPandas, count", lambda: cand().mapInPandas(identity, schema).count())
    timed("cand + real score mapInPandas, count", lambda: cand().mapInPandas(score, schema).count())

    # synthetic 2M pairs, no join upstream
    ids = pdf["id"].to_numpy()
    n = len(ids)
    synth = (
        spark.range(2_000_000)
        .select(
            F.element_at(F.lit(ids.tolist()), (F.pmod(F.xxhash64("id"), F.lit(n)) + 1).cast("int")).alias("id1"),
            F.element_at(F.lit(ids.tolist()), (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n)) + 1).cast("int")).alias("id2"),
        )
    )
    timed("synthetic 2M pairs, count", lambda: synth.count())
    timed("synthetic 2M + real score, count", lambda: synth.mapInPandas(score, schema).count())
    spark.stop()


if __name__ == "__main__":
    main()
