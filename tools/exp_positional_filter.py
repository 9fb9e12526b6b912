"""Measured experiment: PPJoin positional filter on the Jaccard join
(VERDICT r9 item 7).

Compares the prefix-filtered Jaccard pair join with and without the
positional candidate prune (first-common-token overlap bound) on the
registry corpus shape (documents, t=0.8, df cap 100): wall-clock
best-of-N plus the observable the filter actually moves — the number
of candidate pairs entering exact verification.

Usage: python tools/exp_positional_filter.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from python_mapreduce_spark.llm.dedup import (  # noqa: E402
    _prefix_verified_inter,
    ngram_jaccard_pairs,
    shingle_sets,
)
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-positional")
    docs = load_table(spark, sf_dir, "documents")

    # candidate counts: rebuild the helper's inputs the way
    # ngram_jaccard_pairs does (df cap applied), then count the pairs
    # each variant sends into verification
    sets_ = shingle_sets(docs, "doc_id", "text", 3).filter(F.size("shingles") > 0)
    posts = sets_.select("id", F.explode("shingles").alias("shingle"))
    hot = (
        posts.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 100)
        .select("shingle")
    )
    hot_set = [r["shingle"] for r in hot.collect()]
    if hot_set:
        posts = posts.filter(~F.col("shingle").isin(hot_set))
    sizes = posts.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    for t in (0.8, 0.5):
        n_plain = (
            _prefix_verified_inter(posts, sizes, t, both_prefix=True, positional=False)
            .count()
        )
        n_pos = (
            _prefix_verified_inter(posts, sizes, t, both_prefix=True, positional=True)
            .count()
        )
        print(
            f"t={t}: verified candidates prefix-only={n_plain} "
            f"positional={n_pos} (pruned {n_plain - n_pos}, "
            f"{100 * (n_plain - n_pos) / max(n_plain, 1):.1f}%)"
        )

    # wall clock on the full registry-shaped query
    for label, kwargs in (
        ("prefix", {"prefix_filter": True}),
        ("prefix+positional", {"prefix_filter": True, "positional_filter": True}),
    ):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.8, max_shingle_df=100, **kwargs
            ).count()
            best = min(best, time.time() - t0)
        print(f"wall t=0.8 {label}: {best:.2f}s (best of {reps})")

    # containment (one-sided form): can the positional prune flip the
    # measured when-to-use rule (base 5.1 s vs prefix 13.1 s at sf0.1)?
    from python_mapreduce_spark.llm.dedup import containment_pairs  # noqa: PLC0415

    for label, kwargs in (
        ("base", {}),
        ("prefix", {"prefix_filter": True}),
        ("prefix+positional", {"prefix_filter": True, "positional_filter": True}),
    ):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            containment_pairs(
                docs, "doc_id", "text", threshold=0.6, max_shingle_df=100, **kwargs
            ).count()
            best = min(best, time.time() - t0)
        print(f"containment wall t=0.6 {label}: {best:.2f}s (best of {reps})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
