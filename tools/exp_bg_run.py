"""Run a registry query in a loop (background target for live sampling)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "q_dedup_embedding"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("exp_bg_run")
    q = all_queries()[name]
    q.fn(spark, "/root/testdata/sf0.001").count()
    print("WARMED", flush=True)
    for i in range(n):
        t0 = time.time()
        q.fn(spark, SF).count()
        print(f"run{i}: {time.time()-t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
