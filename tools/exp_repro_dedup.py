"""Reproduce the q_dedup_embedding 32-core regression (VERDICT r10 item 1).

Times 3 bench-identical iterations and samples Python worker process
counts + aggregate CPU during each run.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sample_workers(stop, out):
    while not stop.is_set():
        r = subprocess.run(
            ["bash", "-c", "ps -eo pid,pcpu,rss,etimes,cmd | grep 'pyspark.daemon' | grep -v grep | wc -l"],
            capture_output=True,
            text=True,
        )
        out.append(int(r.stdout.strip() or 0))
        time.sleep(0.5)


def main() -> None:
    spark = get_spark("exp_repro_dedup")
    q = all_queries()["q_dedup_embedding"]
    # warmup at sf0.001 like bench.py
    q.fn(spark, "/root/testdata/sf0.001").count()
    for i in range(3):
        counts: list[int] = []
        stop = threading.Event()
        t = threading.Thread(target=sample_workers, args=(stop, counts))
        t.start()
        t0 = time.time()
        n = q.fn(spark, SF).count()
        dt = time.time() - t0
        stop.set()
        t.join()
        print(
            f"iter {i}: {dt:7.3f}s rows={n} workers(min/med/max)="
            f"{min(counts)}/{sorted(counts)[len(counts)//2]}/{max(counts)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
