"""Empirical near-linearity harness for the governance/copy-audit
family (VERDICT r7 stretch item 8 — the sixth harness beside
scaling_dedup / scaling_text / scaling_graph / scaling_ann /
scaling_stats).

``table_checksum`` claims to be THE 100 TB copy-audit primitive: ONE
map-side-combined hash agg over a single scan, with only (group keys,
3 numbers) per partition crossing the shuffle — so its wall-clock must
track the scan, i.e. grow ~linearly with the corpus.
``replication_audit`` layers a digest-vs-digest join (group-count
sized, tiny) plus a phase-2 row-diff that touches ONLY divergent
groups behind a broadcast-semi screen — with a fixed number of
divergent groups its cost must also stay scan-bound. This harness
measures both end-to-end at every dir and gates every adjacent pair at
2x its size ratio (scaling_common). The replication run audits the
documents table against a copy with a deterministic ~1/1000 text
perturbation so phase 2 is genuinely exercised (every source group
diverges -> the phase-2 diff re-reads both sides, the worst realistic
case for the audit's scan count).

Usage: python tools/scaling_audit.py [sf_dir sf_dir ...]
Default: sf0.01 sf0.1 /tmp/sf1_synth (documents-only; build the third
decade with tools/make_scale_corpus.py). Exits nonzero on any gate
breach; prints a markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F  # noqa: E402

from scaling_common import run_gates  # noqa: E402

from python_mapreduce_spark.operators.aggregates import table_checksum  # noqa: E402
from python_mapreduce_spark.operators.relational import replication_audit  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402

SPARK = get_spark("scaling-audit")


def measure(sf_dir: str) -> dict:
    docs = load_table(SPARK, sf_dir, "documents")
    n = docs.count()

    # whole-table digest: the single-row global audit form
    t0 = time.time()
    glob = table_checksum(docs, ["doc_id", "text", "lang", "source", "n_chars"])
    glob_row = glob.collect()
    t_checksum = time.time() - t0

    # per-group digest: the partition-audit form (one row per source)
    t0 = time.time()
    grouped = table_checksum(
        docs, ["doc_id", "text", "lang", "n_chars"], group_by=["source"]
    ).collect()
    t_checksum_grouped = time.time() - t0

    # two-phase replication audit vs a deterministically perturbed copy
    # (~1/1000 rows get a text suffix -> every source group mismatches,
    # so phase 2 re-reads both sides: the worst-case scan count)
    copy = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 1000 == 7, F.concat(F.col("text"), F.lit("!"))
        ).otherwise(F.col("text")),
    )
    t0 = time.time()
    audit = replication_audit(
        docs,
        copy,
        "doc_id",
        ["text", "lang", "n_chars"],
        group_by="source",
    ).collect()
    t_replication = time.time() - t0

    n_changed = sum(r.n_row_changed for r in audit)
    return {
        "n_docs": n,
        "t_checksum_s": round(t_checksum, 1),
        "t_checksum_grouped_s": round(t_checksum_grouped, 1),
        "t_replication_s": round(t_replication, 1),
        "n_groups": len(grouped),
        "n_rows_digested": glob_row[0].n_rows if glob_row else 0,
        "audit_changed_rows": n_changed,
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
            ("t_checksum_s", "t_checksum_grouped_s", "t_replication_s"),
            info_keys=("n_groups", "n_rows_digested", "audit_changed_rows"),
        )
    )
