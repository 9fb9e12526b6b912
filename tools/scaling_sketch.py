"""Empirical near-linearity harness for the round-9 sketch/resampling
family (the companion to scaling_dedup / scaling_text / scaling_graph /
scaling_ann / scaling_stats — the VERDICT r3 item 6 pattern).

The 100 TB claims measured here:

* ``kmv_sketch`` + ``kmv_distinct_estimate`` — one distinct agg narrows
  the data to (group, 60-bit hash), then a WindowGroupLimit k-cut; the
  estimate touches only the <=k-row-per-group sketch frame. Cost must
  track the scan, never the distinct-value count.
* ``kmv_intersect_estimate`` — after sketching, set operations are
  joins of <=k-row frames: the wall-clock must be sketch-bound (two
  scans) with a constant-size tail.
* ``bootstrap_mean_ci`` — the R-fold explode happens in the scan stage
  and collapses map-side to R integer-cent DECIMAL sums; one shuffle of
  R rows per partition. Cost ~ R * scan, linear in rows.

Failure modes this catches: a plan regression to a keyless window in
the k-cut (funnels every distinct hash through one task), the bootstrap
shuffling the fanned rows instead of combining map-side, or the
intersect path joining raw data instead of sketches — each shows up
directly as superlinear wall-clock.

Usage: python tools/scaling_sketch.py [sf_dir sf_dir ...]
Default: the three real SF dirs (orders/events scale with SF, so no
synthetic corpus is needed). Exits nonzero on any gate breach.
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
    bootstrap_mean_ci,
    kmv_distinct_estimate,
    kmv_intersect_estimate,
    kmv_sketch,
)
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402

SPARK = get_spark("scaling-sketch")


def measure(sf_dir: str) -> dict:
    events = load_table(SPARK, sf_dir, "events")
    orders = load_table(SPARK, sf_dir, "orders")
    n = events.count() + orders.count()

    t0 = time.time()
    est = kmv_distinct_estimate(
        kmv_sketch(events, "user_id", group_by=["event_type"], k=256),
        group_by=["event_type"],
        k=256,
    ).collect()
    t_kmv = time.time() - t0

    t0 = time.time()
    a = events.filter((F.col("event_type") == "click") & (F.col("value") > 150.0))
    b = events.filter((F.col("event_type") == "purchase") & (F.col("value") > 150.0))
    inter = kmv_intersect_estimate(
        kmv_sketch(a, "user_id", k=256), kmv_sketch(b, "user_id", k=256), k=256
    ).collect()
    t_inter = time.time() - t0

    t0 = time.time()
    boot = bootstrap_mean_ci(orders, "o_totalprice", "o_orderkey", replicates=40).collect()
    t_boot = time.time() - t0

    return {
        "n_rows": n,
        "t_kmv_distinct_s": round(t_kmv, 1),
        "t_kmv_intersect_s": round(t_inter, 1),
        "t_bootstrap_s": round(t_boot, 1),
        "kmv_types": len(est),
        "jaccard": inter[0].jaccard_kmv if inter else None,
        "ci_width": (
            round(boot[0].ci_hi - boot[0].ci_lo, 2)
            if boot and boot[0].ci_hi is not None
            else None
        ),
    }


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    sys.exit(
        run_gates(
            dirs,
            measure,
            "n_rows",
            ("t_kmv_distinct_s", "t_kmv_intersect_s", "t_bootstrap_s"),
            info_keys=("kmv_types", "jaccard", "ci_width"),
        )
    )
