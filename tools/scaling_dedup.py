"""Empirical near-linearity harness for the dedup family (VERDICT r3 item 6).

The 100 TB claims for MinHash dedup rest on plan shape (banded bucket
join, candidate-only verify). This harness backs them with measurement:
run ``minhash_dedup_pairs`` and ``incremental_minhash_dedup`` on two
corpora that differ ~10x in size — documents at sf0.01 and sf0.1, each
with the same *fraction* of injected near-duplicates — and assert that

  * LSH candidate count grows ~linearly in corpus size (the quadratic
    failure mode would grow ~R^2 = ~100x);
  * wall-clock grows at most ~linearly (generous 2x slack for host
    weather; a quadratic blowup is 10x beyond the gate, far outside any
    noise band).

Candidate-count linearity is the load-bearing assertion: candidates are
what the verify stage pays for, and they are runtime-noise-free.

Usage: python tools/scaling_dedup.py [sf_dir sf_dir ...]
Two or more dirs (default sf0.01 sf0.1; add the
tools/make_scale_corpus.py output as a third decade); every adjacent
pair is gated at 2x its size ratio. Exits nonzero on any breach;
prints a markdown table.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
)
from python_mapreduce_spark.llm.text import shingle_sets  # noqa: E402
from python_mapreduce_spark.session import get_spark, tune  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402
from python_mapreduce_spark.streaming.dedup import incremental_minhash_dedup  # noqa: E402

DUP_FRACTION = 0.05  # same injected near-dup rate at every size


def corpus_with_dups(spark, sf_dir: str):
    """documents + a near-dup mutation of every 1/DUP_FRACTION-th doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    step = int(1 / DUP_FRACTION)
    dups = (
        docs.filter(F.col("doc_id") % step == 0)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" injected near duplicate tail")).alias("text"),
        )
    )
    return docs.unionByName(dups), n


def measure(spark, sf_dir: str) -> dict:
    corpus, n_base = corpus_with_dups(spark, sf_dir)
    corpus = corpus.localCheckpoint(eager=True)
    n = corpus.count()

    t0 = time.time()
    cand = lsh_candidate_pairs(
        minhash_signatures(shingle_sets(corpus, "doc_id", "text", 3), num_hashes=32),
        bands=8,
        rows=4,
    ).count()
    t_cand = time.time() - t0

    t0 = time.time()
    verified = minhash_dedup_pairs(corpus, "doc_id", "text").count()
    t_batch = time.time() - t0

    work = tempfile.mkdtemp(prefix="scaling_dedup_")
    in_dir, state, ckpt, out = (os.path.join(work, d) for d in ("in", "state", "ck", "out"))
    half = n_base  # pass 1 = originals, pass 2 = injected dups
    t0 = time.time()
    corpus.filter(F.col("doc_id") < half).write.mode("append").parquet(in_dir)
    incremental_minhash_dedup(spark, in_dir, state, ckpt, bands=16, rows=2, output_dir=out)
    corpus.filter(F.col("doc_id") >= half).write.mode("append").parquet(in_dir)
    incremental_minhash_dedup(spark, in_dir, state, ckpt, bands=16, rows=2, output_dir=out)
    t_incr = time.time() - t0
    n_dups = (
        spark.read.parquet(out).filter(F.col("is_dup")).count()
    )
    shutil.rmtree(work, ignore_errors=True)
    return {
        "docs": n,
        "candidates": cand,
        "verified_pairs": verified,
        "incr_dups": n_dups,
        "t_candidates": round(t_cand, 2),
        "t_batch": round(t_batch, 2),
        "t_incremental": round(t_incr, 2),
    }


def main() -> int:
    from tools.scaling_common import run_gates  # noqa: PLC0415

    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("scaling-dedup", master="local[16]")
    tune(spark)
    return run_gates(
        dirs,
        lambda d: measure(spark, d),
        "docs",
        ("candidates", "verified_pairs", "incr_dups",
         "t_candidates", "t_batch", "t_incremental"),
    )


if __name__ == "__main__":
    raise SystemExit(main())
