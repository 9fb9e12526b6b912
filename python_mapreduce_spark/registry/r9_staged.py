"""Round-9 STAGED registry entries — built and oracle-verified in
round 9, deliberately NOT wired into ``all_queries()`` yet.

The round-9 rotation already spends its addition budget on the z-order
evidence pair (VERDICT r8 item 4 caps additions so the r03 staleness
block keeps draining); this module is the NEXT batch, fully built to
the staged evidence bar — Spark query + DuckDB oracle + standing
pytest gate (``tests/test_r8_staged_oracles.py`` runs the exact
check_oracle comparison over BOTH staged modules at sf0.001) +
degenerate-replica gate (``tools/check_staged.py``, which gates
r8_staged ∪ r9_staged).
Round 10 registers it by merging ``QUERIES`` into
``registry/__init__.all_queries()`` and appending the names behind the
staleness block.

Operators covered: incremental label propagation (VERDICT r8 stretch
item 7) — the graph member of the additive-state streaming family:
per-epoch edge-delta ingest into idempotent ``ingest_epoch=N``
partitions + checkpointed per-node labels, oracle = the batch LPA
unroll verbatim on the union of epochs.
"""

from __future__ import annotations

import os
from python_mapreduce_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table
from python_mapreduce_spark.registry.r8_staged import SQL_LABEL_PROPAGATION


def q_stream_incremental_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental community detection (streaming/dedup.py::
    # incremental_label_propagation): the near-dup edge stream arrives
    # in two waves (split by pmod(id1+id2, 2) so both waves carry edges
    # of the same communities — the interleaving a naive
    # per-wave-compute-then-union would get wrong); each checkpointed
    # pass ingests ONLY the new edge files into an idempotent
    # ingest_epoch=N partition and recomputes the fixed-round
    # synchronous LPA over the compact edge state, checkpointing the
    # per-node labels. The edge set is union-additive and the recompute
    # is a pure function of it, so the final communities equal the
    # batch LPA on ALL edges — the oracle is q_label_propagation's
    # 4-round unroll VERBATIM. Raw text is scanned once to derive
    # edges; the epochs touch only (a, b) pairs.
    from python_mapreduce_spark.llm.dedup import ngram_jaccard_pairs  # noqa: PLC0415
    from python_mapreduce_spark.streaming.dedup import (  # noqa: PLC0415
        incremental_label_propagation,
        read_lpa_communities,
    )

    docs = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, max_shingle_df=100,
        prefix_filter=True, positional_filter=True,
    ).select("id1", "id2")
    work = scratch_dir("incr_lpa")
    in_dir, ckpt, state = (
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "state"),
    )
    edges.filter(F.pmod(F.col("id1") + F.col("id2"), F.lit(2)) == 0).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    edges.filter(F.pmod(F.col("id1") + F.col("id2"), F.lit(2)) == 1).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    return read_lpa_communities(spark, state)


# --- KMV (k-minimum-values) distinct sketch with set operations --------------

_KMV_K = 64
#: (k-1) * 2^60 — exactly representable as a double on both engines
#: (k-1 has 6 significant bits), so the KMV estimate is ONE
#: correctly-rounded IEEE division.
_KMV_SCALE = f"({_KMV_K - 1}.0 * 1152921504606846976.0)"
_KMV_SEG_A = "event_type = 'click' AND value > 150.0"
_KMV_SEG_B = "event_type = 'purchase' AND value > 150.0"


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KMV distinct sketch (operators/aggregates.py::kmv_sketch /
    # kmv_distinct_estimate): per event_type, the k=64 smallest 60-bit
    # md5 hashes of the distinct user set; estimate = (k-1)/h_(k)
    # scaled to the domain when the sketch is full, the exact count
    # when not. Fully deterministic (pure function of the value set),
    # so — unlike the HLL twins — the oracle replays the ESTIMATE
    # bit-for-bit, no tolerance needed. Scale shape: one distinct agg
    # narrows to (group, hash), then a WindowGroupLimit k-cut; the
    # estimate runs on the <=k-row-per-group sketch frame.
    from python_mapreduce_spark.operators.aggregates import (  # noqa: PLC0415
        kmv_distinct_estimate,
        kmv_sketch,
    )

    ev = table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "user_id", group_by=["event_type"], k=_KMV_K)
    est = kmv_distinct_estimate(sk, group_by=["event_type"], k=_KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "n_kmv", "sketch_full"
    )


SQL_KMV_DISTINCT = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashes
  ) WHERE rn <= {_KMV_K}
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(h) AS hk
  FROM sk GROUP BY event_type
),
est AS (
  SELECT event_type,
         floor((CASE WHEN n >= {_KMV_K}
                     THEN {_KMV_SCALE} / CAST(hk AS DOUBLE)
                     ELSE CAST(n AS DOUBLE) END) * 10000.0 + 0.5) / 10000.0 AS n_kmv,
         n >= {_KMV_K} AS sketch_full
  FROM agg
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT exact.event_type, n_exact, n_kmv, sketch_full
FROM exact JOIN est USING (event_type)
"""


def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The set-OPERATION KMV can do and HLL cannot: "distinct users in
    # segment A AND segment B" from two <=k-row sketches
    # (operators/aggregates.py::kmv_intersect_estimate). Union sketch =
    # k smallest of the merged hashes (TakeOrderedAndProject, no
    # window); within it, the both-present fraction is an unbiased
    # Jaccard estimate, and n_inter = jaccard * n_union. The raw events
    # are scanned once per segment at sketch time; everything after is
    # k-row frames and broadcast joins. Exact intersection rides along
    # for the driver to verify against.
    from python_mapreduce_spark.operators.aggregates import (  # noqa: PLC0415
        kmv_intersect_estimate,
        kmv_sketch,
    )

    ev = table(spark, sf_dir, "events")
    # Each segment feeds its sketch AND the exact-intersection ride-
    # along (4 filtered corpus scans uncut); one cut per narrow
    # segment frame keeps it to one scan per segment.
    a = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 150.0)
    ).select("user_id").localCheckpoint(eager=False)
    b = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150.0)
    ).select("user_id").localCheckpoint(eager=False)
    est = kmv_intersect_estimate(
        kmv_sketch(a, "user_id", k=_KMV_K),
        kmv_sketch(b, "user_id", k=_KMV_K),
        k=_KMV_K,
    )
    exact = (
        a.filter(F.col("user_id").isNotNull())
        .intersect(b.filter(F.col("user_id").isNotNull()))
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_intersect"))
    )
    return exact.join(F.broadcast(est))


SQL_KMV_INTERSECT = f"""
WITH ha AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE {_KMV_SEG_A} AND user_id IS NOT NULL
),
hb AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE {_KMV_SEG_B} AND user_id IS NOT NULL
),
ska AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
skb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
merged AS (
  SELECT coalesce(ska.h, skb.h) AS h,
         ska.h IS NOT NULL AS in_a, skb.h IS NOT NULL AS in_b
  FROM ska FULL OUTER JOIN skb ON ska.h = skb.h
),
u AS (SELECT * FROM merged ORDER BY h LIMIT {_KMV_K}),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk,
         CAST(coalesce(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END), 0) AS BIGINT) AS nboth
  FROM u
),
est AS (
  SELECT
    floor((CASE WHEN n >= {_KMV_K} THEN {_KMV_SCALE} / CAST(hk AS DOUBLE)
                ELSE CAST(n AS DOUBLE) END) * 10000.0 + 0.5) / 10000.0 AS n_union_kmv,
    CASE WHEN n > 0 THEN
      floor((CAST(nboth AS DOUBLE) / CAST(n AS DOUBLE))
            * (CASE WHEN n >= {_KMV_K} THEN {_KMV_SCALE} / CAST(hk AS DOUBLE)
                    ELSE CAST(n AS DOUBLE) END) * 10000.0 + 0.5) / 10000.0
    END AS n_intersect_kmv,
    CASE WHEN n > 0 THEN
      floor(CAST(nboth AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0 + 0.5) / 10000.0
    END AS jaccard_kmv
  FROM stats
),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS n_exact_intersect FROM (
    SELECT user_id FROM events WHERE {_KMV_SEG_A} AND user_id IS NOT NULL
    INTERSECT
    SELECT user_id FROM events WHERE {_KMV_SEG_B} AND user_id IS NOT NULL
  )
)
SELECT n_exact_intersect, n_union_kmv, n_intersect_kmv, jaccard_kmv FROM exact, est
"""


# --- deterministic Poisson-bootstrap confidence interval ---------------------

_BOOT_R = 40


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RNG-free percentile bootstrap for the mean order value
    # (operators/aggregates.py::bootstrap_mean_ci): replicate weights
    # are Poisson(1) draws by inverse-CDF over md5(id|r) — pure integer
    # comparisons, identical on both engines, so the oracle replays the
    # interval EXACTLY (no tolerance). One scan fans rows to R=40
    # (replicate, weighted-cents) pairs; ONE map-side-combined agg
    # leaves 40 rows of integer-cent DECIMAL sums; the percentile runs
    # over the 40-row means frame (sort-based — no order-dependent
    # float accumulation).
    from python_mapreduce_spark.operators.aggregates import bootstrap_mean_ci  # noqa: PLC0415

    o = table(spark, sf_dir, "orders")
    return bootstrap_mean_ci(o, "o_totalprice", "o_orderkey", replicates=_BOOT_R)


def _sql_bootstrap_ci() -> str:
    from python_mapreduce_spark.operators.aggregates import _BOOT_POISSON_CUTS  # noqa: PLC0415

    wt = " + ".join(
        f"(CASE WHEN u >= {cut} THEN 1 ELSE 0 END)" for cut in _BOOT_POISSON_CUTS
    )
    return f"""
WITH vals AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS id,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS DECIMAL(28,0)) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
),
fanned AS (
  SELECT id, cents, r FROM vals, (SELECT unnest(range({_BOOT_R})) AS r)
),
weighted AS (
  SELECT cents, r, CAST(({wt}) AS BIGINT) AS wt FROM (
    SELECT cents, r,
           CAST(('0x' || substr(md5(id || '|' || CAST(r AS VARCHAR)), 1, 13)) AS BIGINT) AS u
    FROM fanned
  )
),
rep AS (
  SELECT r, CAST(sum(cents * wt) AS DECIMAL(38,0)) AS s, CAST(sum(wt) AS BIGINT) AS n
  FROM weighted GROUP BY r
),
means AS (
  SELECT CASE WHEN n > 0 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 END AS m
  FROM rep
),
ci AS (SELECT quantile_cont(m, [0.025, 0.975]) AS q FROM means),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CASE WHEN count(*) > 0 THEN
           floor(CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0
                 * 10000.0 + 0.5) / 10000.0
         END AS mean_full
  FROM vals
)
SELECT n_rows, mean_full,
       floor(q[1] * 10000.0 + 0.5) / 10000.0 AS ci_lo,
       floor(q[2] * 10000.0 + 0.5) / 10000.0 AS ci_hi
FROM base, ci
"""


SQL_BOOTSTRAP_CI = _sql_bootstrap_ci()


def q_bootstrap_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-sample uplift with uncertainty (operators/aggregates.py::
    # bootstrap_diff_ci): percentile-bootstrap CI for mean(click value)
    # - mean(view value) — the continuous-metric companion to
    # q_ab_test's two-proportion z. Same RNG-free discipline: Poisson
    # weights by md5 inverse-CDF, ONE map-side-combined agg to R=40
    # DECIMAL sufficient sums per side (conditional sums split the
    # groups inside the same pass), sort-based percentile over the
    # 40 resampled differences. The oracle replays the interval and
    # the significance verdict exactly.
    from python_mapreduce_spark.operators.aggregates import bootstrap_diff_ci  # noqa: PLC0415

    ev = table(spark, sf_dir, "events")
    return bootstrap_diff_ci(
        ev, "value", "event_id", "event_type", "click", "view", replicates=_BOOT_R
    )


def _sql_bootstrap_diff_ci() -> str:
    from python_mapreduce_spark.operators.aggregates import _BOOT_POISSON_CUTS  # noqa: PLC0415

    wt = " + ".join(
        f"(CASE WHEN u >= {cut} THEN 1 ELSE 0 END)" for cut in _BOOT_POISSON_CUTS
    )
    return f"""
WITH vals AS (
  SELECT CAST(event_id AS VARCHAR) AS id,
         event_type = 'click' AS is_a,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS DECIMAL(28,0)) AS cents
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
),
fanned AS (
  SELECT id, is_a, cents, r FROM vals, (SELECT unnest(range({_BOOT_R})) AS r)
),
weighted AS (
  SELECT is_a, cents, r, CAST(({wt}) AS BIGINT) AS wt FROM (
    SELECT is_a, cents, r,
           CAST(('0x' || substr(md5(id || '|' || CAST(r AS VARCHAR)), 1, 13)) AS BIGINT) AS u
    FROM fanned
  )
),
rep AS (
  SELECT r,
         CAST(sum(CASE WHEN is_a THEN cents * wt ELSE 0 END) AS DECIMAL(38,0)) AS sa,
         CAST(sum(CASE WHEN is_a THEN wt ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN NOT is_a THEN cents * wt ELSE 0 END) AS DECIMAL(38,0)) AS sb,
         CAST(sum(CASE WHEN NOT is_a THEN wt ELSE 0 END) AS BIGINT) AS nb
  FROM weighted GROUP BY r
),
diffs AS (
  SELECT CASE WHEN na > 0 AND nb > 0 THEN
           CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
           - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0
         END AS d
  FROM rep
),
ci AS (
  SELECT floor(q[1] * 10000.0 + 0.5) / 10000.0 AS ci_lo,
         floor(q[2] * 10000.0 + 0.5) / 10000.0 AS ci_hi
  FROM (SELECT quantile_cont(d, [0.025, 0.975]) AS q FROM diffs)
),
base AS (
  SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CASE WHEN sum(CASE WHEN is_a THEN 1 ELSE 0 END) > 0
               AND sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) > 0 THEN
           floor((CAST(sum(CASE WHEN is_a THEN cents ELSE 0 END) AS DOUBLE)
                    / CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS DOUBLE)
                  - CAST(sum(CASE WHEN NOT is_a THEN cents ELSE 0 END) AS DOUBLE)
                    / CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS DOUBLE))
                 / 100.0 * 10000.0 + 0.5) / 10000.0
         END AS diff_full
  FROM vals
)
SELECT n_a, n_b, diff_full, ci_lo, ci_hi,
       CASE WHEN ci_lo IS NOT NULL THEN (ci_lo > 0.0 OR ci_hi < 0.0) END AS significant
FROM base, ci
"""


SQL_BOOTSTRAP_DIFF_CI = _sql_bootstrap_diff_ci()


# --- IVF-PQ: the compressed-scan ANN path -------------------------------------

#: Measured PQ dials (this round): m=16 subspaces on the 64-dim
#: embeddings, 2 Lloyd passes on the residual codebooks; bits/refine
#: are CORPUS-ADAPTIVE via llm/similarity.py::pq_dials — 4-bit codes +
#: refine 40 below ~30k vectors (recall 0.940/0.920/0.900 at
#: sf0.001/0.01/0.1), 6-bit codes + refine n/500 above (0.90 at 50k,
#: 0.86 at 100k; the FIXED small-SF dials collapsed to 0.48 at 100k —
#: the r5 zero-margin lesson, re-learned and dialed out live).
_PQ_DIALS = {"m": 16, "pq_iters": 2, "iters": 3}


def q_sim_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-PQ approximate top-k (llm/similarity.py::ann_topk_ivf_pq):
    # the COMPRESSED-SCAN scale path completing the ANN family — the
    # probed corpus fraction is scanned as 16 small integer codes per
    # vector instead of 64 floats, the ADC scoring is pure codegen
    # (element_at LUT lookups, no Python in the hot path), and the
    # approx top k*refine are exact-cosine re-ranked so emitted scores
    # are exact and PQ error only affects recall. Not SQL-expressible
    # (distributed k-means + float matmuls); rows-only, gated by the
    # hash-green recall twin below.
    from python_mapreduce_spark.llm.similarity import ann_topk_ivf_pq  # noqa: PLC0415

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_topk_ivf_pq(emb, queries, "vec_id", "embedding", k=5, **_PQ_DIALS)


def q_sim_ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-PQ against brute force — the tolerance-oracle pattern of the
    # other ANN twins (registry/llm.py::_ann_recall_eval): recall_floor
    # = least(actual, 0.8), so the oracle's literal matches exactly when
    # the floor holds and a red row carries the miss magnitude.
    from python_mapreduce_spark.llm.similarity import (  # noqa: PLC0415
        ann_topk_ivf_pq,
        cosine_topk,
    )
    from python_mapreduce_spark.registry.llm import _ann_recall_eval  # noqa: PLC0415

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ann_topk_ivf_pq(emb, queries, "vec_id", "embedding", k=5, **_PQ_DIALS)
    return _ann_recall_eval(exact, approx, 0.8)


def _sql_pq_recall() -> str:
    from python_mapreduce_spark.registry.llm import _sql_ann_recall  # noqa: PLC0415

    return _sql_ann_recall(0.8)


# --- incremental KMV state (streaming family) --------------------------------

def q_stream_incremental_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental DISTINCT via KMV state (streaming/incremental.py::
    # incremental_kmv_sketch): the event stream arrives in two waves
    # split by event_id parity, so the same user lands in BOTH — the
    # overlap a naive additive recombination would double-count. The
    # KMV merge law (k smallest of the union of per-epoch k-mins == k
    # smallest of the union of the sets) restores additivity, and —
    # unlike the HLL twin, which needs a within-5% tolerance gate —
    # the reconstructed sketch is BIT-IDENTICAL to a batch sketch over
    # everything, so the oracle is SQL_KMV_DISTINCT verbatim.
    from python_mapreduce_spark.session import tune  # noqa: PLC0415
    from python_mapreduce_spark.streaming.incremental import (  # noqa: PLC0415
        incremental_kmv_sketch,
        read_kmv_estimate,
    )

    tune(spark)
    events = table(spark, sf_dir, "events")
    work = scratch_dir("incr_kmv")
    in_dir, ckpt, state = (
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "state"),
    )
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)
    incremental_kmv_sketch(spark, in_dir, ckpt, ["event_type"], "user_id", state, k=_KMV_K)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(in_dir)
    incremental_kmv_sketch(spark, in_dir, ckpt, ["event_type"], "user_id", state, k=_KMV_K)

    est = read_kmv_estimate(spark, state, ["event_type"], k=_KMV_K)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "n_kmv", "sketch_full"
    )


QUERIES: dict[str, Query] = {
    "q_stream_incremental_lpa": Query(
        q_stream_incremental_lpa,
        SQL_LABEL_PROPAGATION,
        "incremental LPA communities: per-epoch edge deltas + checkpointed labels; oracle = batch LPA on the union",
    ),
    "q_kmv_distinct": Query(
        q_kmv_distinct,
        SQL_KMV_DISTINCT,
        "KMV distinct sketch per segment: deterministic (k-1)/h_k estimate replayed bit-for-bit",
    ),
    "q_kmv_intersect": Query(
        q_kmv_intersect,
        SQL_KMV_INTERSECT,
        "KMV set ops: union/intersection/Jaccard estimates from two k-row sketches (what HLL cannot do)",
    ),
    "q_bootstrap_ci": Query(
        q_bootstrap_ci,
        SQL_BOOTSTRAP_CI,
        "RNG-free Poisson-bootstrap percentile CI for the mean, exactly oracle-replayable",
    ),
    "q_stream_incremental_kmv": Query(
        q_stream_incremental_kmv,
        SQL_KMV_DISTINCT,
        "incremental distinct via KMV merge-law state: bit-identical to the batch sketch, exact-replay oracle",
    ),
    "q_bootstrap_diff_ci": Query(
        q_bootstrap_diff_ci,
        SQL_BOOTSTRAP_DIFF_CI,
        "two-sample bootstrap uplift CI (mean A - mean B) with exact-replay oracle + significance verdict",
    ),
    "q_sim_ann_ivf_pq": Query(
        q_sim_ann_ivf_pq,
        None,
        "IVF-PQ compressed-scan approximate top-k (rows-only; hash twin q_sim_ann_ivf_pq_recall)",
    ),
    "q_sim_ann_ivf_pq_recall": Query(
        q_sim_ann_ivf_pq_recall,
        _sql_pq_recall(),
        "IVF-PQ recall vs brute force (tolerance oracle, floor 0.8 with measured margin)",
    ),
}
