"""Checkpoint-block accumulation audit (VERDICT r10 item 3 / guide §5).

Runs the checkpoint-heavy HEADLINE queries bench-style for N passes and
samples the driver's RDD storage after every query: number of cached
RDDs, blocks, and storage memory used. If ContextCleaner keeps up, the
numbers plateau; monotone growth across passes = leak.

Usage: SPARK_GRAFT_CPUS=32 python tools/exp_storage_audit.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY = [
    "q_dedup_jaccard",
    "q_containment",
    "q_dedup_savings",
    "q_fuzzy_decontam",
    "q_hits",
    "q_kcore",
    "q_label_propagation",
    "q_cluster_split",
    "q_cluster_canonical",
    "q_triangle_stats",
    "q_dedup_embedding",
    "q_top_eigenvector",
    "q_dup_cluster_sizes",
]


def storage(sc):
    infos = sc._jsc.sc().getRDDStorageInfo()
    n_rdds = len(infos)
    n_blocks = sum(i.numCachedPartitions() for i in infos)
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return n_rdds, n_blocks, mem, disk


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("exp_storage_audit")
    sc = spark.sparkContext
    registry = all_queries()
    for name in HEAVY:
        registry[name].fn(spark, "/root/testdata/sf0.001").count()
    hi_mem = 0
    for p in range(passes):
        for name in HEAVY:
            t0 = time.time()
            registry[name].fn(spark, SF).count()
            dt = time.time() - t0
            r, b, m, dsk = storage(sc)
            hi_mem = max(hi_mem, m)
            print(
                f"pass{p} {name:24s} {dt:6.2f}s  cached_rdds={r:4d} "
                f"blocks={b:5d} mem={m/1e6:8.1f}MB disk={dsk/1e6:7.1f}MB",
                flush=True,
            )
        import gc

        gc.collect()  # release python-side DataFrame refs promptly
        time.sleep(2)
        r, b, m, dsk = storage(sc)
        print(
            f"== end of pass {p} (post-gc): rdds={r} blocks={b} "
            f"mem={m/1e6:.1f}MB disk={dsk/1e6:.1f}MB high-water mem={hi_mem/1e6:.1f}MB ==",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
