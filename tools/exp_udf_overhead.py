"""Isolate fixed per-stage Python-UDF overhead at 32 cores.

In one warm session, times repeatedly:
  a) trivial JVM-only count on 2k rows
  b) pandas UDF over 2k rows, 1 partition
  c) banding UDF + posexplode (the real _banded_lsh_keys), count
  d) same + lazy localCheckpoint, count
  e) same checkpointed frame, second action (cache-read)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.similarity import _banded_lsh_keys  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:45s} {' '.join(f'{t:6.3f}' for t in ts)}", flush=True)


def main() -> None:
    spark = get_spark("exp_udf_overhead")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.count()  # warm scan

    @F.pandas_udf("long")
    def triv(v: pd.Series) -> pd.Series:
        return pd.Series([1] * len(v), dtype="int64")

    timed("a) jvm-only count", lambda: emb.count())
    timed("b) trivial pandas_udf count", lambda: emb.select(triv("vec_id")).count())
    timed(
        "c) banding udf + posexplode count",
        lambda: _banded_lsh_keys(
            emb, "vec_id", "embedding", bands=24, rows_per_band=2, dim=64, seed=42
        ).count(),
    )

    def d():
        b = _banded_lsh_keys(
            emb, "vec_id", "embedding", bands=24, rows_per_band=2, dim=64, seed=42
        ).localCheckpoint(eager=False)
        b.count()
        return b

    timed("d) banding + lazy checkpoint count", d)
    b = d()
    timed("e) checkpointed frame re-count", lambda: b.count())
    spark.stop()


if __name__ == "__main__":
    main()
