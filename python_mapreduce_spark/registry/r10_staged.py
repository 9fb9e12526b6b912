"""Round-10 STAGED registry entries — built and verified in round 10,
deliberately NOT wired into ``all_queries()`` yet (the round-10
rotation spends its addition budget on the r9 staged batch; the
rotation invariant appends new names behind the staleness block, so
these wait one round). Round 11 registers them by merging ``QUERIES``
into ``registry/__init__.all_queries()`` and appending the names
behind the staleness block.

Operators covered — Ed-Join (``llm/dedup.py::edit_distance_pairs``:
positional-q-gram prefix-filtered Levenshtein similarity join, the
typo-class member of the near-dup family, exact DuckDB-levenshtein
oracle) and incremental ANN (IVF) index maintenance
(``streaming/ann.py`` — VERDICT r9 item 5), the similarity-search
member of the additive-state streaming family. Per-epoch vector files
are assigned against FROZEN first-epoch centroids into idempotent
``ingest_epoch=N`` partitions (O(delta) per pass); a list-size-skew
trigger retrains on the union when frozen centroids go stale; raw
vectors are immutable so every rewrite only touches derived state.
Oracle convention = the established ANN pair: the raw top-k set is
rows-only (centroids come from distributed float sums — not
SQL-expressible) and the hash-green twin pins recall vs the
brute-force ground truth, computed in the same job
(:func:`python_mapreduce_spark.registry.llm._ann_recall_eval`
pattern): the oracle emits the floor literal, and a red row carries
the actual deficient recall.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table
from python_mapreduce_spark.scratch import scratch_dir

#: Recall floor for the incremental index (frozen first-epoch centroids
#: over a same-distribution 3-epoch split, corpus-adaptive dials).
#: Measured round 10 (ROUND10_RESPONSES.md): 0.960 / 0.900 / 0.920 at
#: sf0.001 / 0.01 / 0.1 vs brute force, list skew 1.07-1.26 (no retrain
#: fires) — the batch IVF family's 0.8 floor holds with margin even
#: though the coarse quantizer only ever saw the first third of the
#: corpus; under real drift the skew retrain exists to keep it that way.
_INCR_IVF_FLOOR = 0.8


def _build_incr_ivf_state(
    spark: SparkSession,
    sf_dir: str,
    *,
    epochs: int = 3,
    retrain_skew: float | None = None,
) -> str:
    """Split the embeddings table into ``epochs`` epoch files by vec_id
    range (same-distribution slices: centroids freeze after the first,
    so under the default skew bound no retrain fires and the
    reconstructed index is the pytest-pinned frozen-batch equivalent),
    ingest them in checkpointed passes, and return the state dir."""
    from python_mapreduce_spark.streaming.ann import incremental_ivf_index  # noqa: PLC0415

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    cuts = [n * i // epochs for i in range(epochs)] + [n]
    work = scratch_dir("incr_ivf")
    in_dir, ckpt, state = (
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "state"),
    )
    kwargs = {} if retrain_skew is None else {"retrain_skew": retrain_skew}
    for lo, hi in zip(cuts, cuts[1:]):
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).write.mode("append").parquet(in_dir)
        incremental_ivf_index(spark, in_dir, ckpt, state, **kwargs)
    return state


def q_stream_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental IVF ANN (streaming/ann.py): three epoch ingests, new
    # vectors assigned against the frozen first-epoch centroids, top-k
    # served from the reconstructed epoch-partitioned index through the
    # SAME probe/score stage as batch IVF (ivf_probe_topk). Rows-only
    # by the ANN convention; q_stream_incremental_ivf_recall is the
    # hash-green gate.
    from python_mapreduce_spark.streaming.ann import read_ivf_topk  # noqa: PLC0415

    state = _build_incr_ivf_state(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return read_ivf_topk(spark, state, queries, "vec_id", "embedding", k=5)


def q_stream_incremental_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Recall of the reconstructed incremental index vs the brute-force
    # ground truth over the SAME ingested union — the tolerance-oracle
    # pattern every ANN family member uses (the DuckDB twin emits the
    # floor literal; a red row carries the actual deficient recall).
    from python_mapreduce_spark.llm.similarity import cosine_topk  # noqa: PLC0415
    from python_mapreduce_spark.registry.llm import _ann_recall_eval  # noqa: PLC0415
    from python_mapreduce_spark.streaming.ann import read_ivf_topk  # noqa: PLC0415

    state = _build_incr_ivf_state(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = read_ivf_topk(spark, state, queries, "vec_id", "embedding", k=5)
    return _ann_recall_eval(exact, approx, _INCR_IVF_FLOOR)


def _sql_incr_ivf_recall() -> str:
    return f"""
SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
       CAST({_INCR_IVF_FLOOR} AS DOUBLE) AS recall_floor
FROM embeddings WHERE vec_id < 10
"""


def q_stream_incremental_ivf_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Driver-checkable evidence of the RETRAIN path (the recall twin
    # only ever exercises frozen-centroid ingest): two epoch halves with
    # retrain_skew=-1 force the one O(corpus) retrain at epoch 1 —
    # structurally, not corpus-dependently, so the outcome is identical
    # on every SF and degenerate replica. Emits the index meta plus a
    # Spark-side consistency audit; the oracle replays the
    # SQL-derivable facts (version = the retrain epoch, nlist = the
    # ivf_dials sqrt rule, total_n = the distinct-id count) and pins
    # the audit booleans TRUE — a botched rewrite (stale cvers rows,
    # stats diverging from assignments) goes driver-red.
    from python_mapreduce_spark.streaming.ann import read_ivf_meta  # noqa: PLC0415

    state = _build_incr_ivf_state(spark, sf_dir, epochs=2, retrain_skew=-1.0)
    if not os.path.isdir(os.path.join(state, "centroids")):
        return spark.createDataFrame(
            [],
            "version long, nlist long, total_n long, retrained boolean, "
            "stats_consistent boolean",
        )
    meta = read_ivf_meta(spark, state)
    stats = spark.read.parquet(os.path.join(state, "list_stats"))
    asg = spark.read.parquet(os.path.join(state, "assignments"))
    vers_row = stats.agg(
        F.countDistinct("cvers").alias("n_vers"), F.max("cvers").alias("max_vers")
    )
    per_list = (
        asg.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n_asg"))
        .join(
            stats.groupBy("cluster").agg(F.sum("n").cast("long").alias("n_stat")),
            "cluster",
            "full",
        )
    )
    mismatches = per_list.filter(
        F.coalesce(F.col("n_asg"), F.lit(-1)) != F.coalesce(F.col("n_stat"), F.lit(-2))
    ).agg(F.count(F.lit(1)).alias("n_bad"))
    return (
        meta.join(F.broadcast(vers_row))
        .join(F.broadcast(mismatches))
        .select(
            F.col("version").cast("long").alias("version"),
            F.col("nlist").cast("long").alias("nlist"),
            F.col("total_n").cast("long").alias("total_n"),
            (F.col("version") >= 1).alias("retrained"),
            (
                (F.col("n_vers") == 1)
                & (F.col("max_vers") == F.col("version"))
                & (F.col("n_bad") == 0)
            ).alias("stats_consistent"),
        )
    )


SQL_INCR_IVF_RETRAIN = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM embeddings)
SELECT CAST(1 AS BIGINT) AS version,
       CAST(greatest(8, round(sqrt(c) / 20.0)) AS BIGINT) AS nlist,
       c AS total_n,
       TRUE AS retrained,
       TRUE AS stats_consistent
FROM n WHERE c > 0
"""


def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ed-Join (llm/dedup.py::edit_distance_pairs): all part-name pairs
    # within Levenshtein distance 1 via positional-q-gram prefix
    # filtering + codegen levenshtein verify — the typo-class dedup the
    # shingle joins structurally miss. The synthetic part names draw
    # from a tiny vocabulary, so the within-1 pair set is large
    # (~3.9M rows over the full sf0.1 table); the query caps the corpus
    # at a FIXED key bound (full table at sf<=0.01) and emits the
    # per-distance aggregate with order-insensitive id-sum checksums —
    # the oracle recomputes the truth quadratically, so a single
    # lost or phantom pair flips a checksum. Pair-set equality with the
    # direct join is additionally pytest-pinned (test_edit_distance.py).
    from python_mapreduce_spark.llm.dedup import edit_distance_pairs  # noqa: PLC0415

    part = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 4000)
    pairs = edit_distance_pairs(part, "p_partkey", "p_name", max_distance=1)
    return pairs.groupBy("distance").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("id1").cast("long").alias("sum_id1"),
        F.sum("id2").cast("long").alias("sum_id2"),
    )


SQL_EDIT_DISTANCE_PAIRS = """
WITH p AS (
  SELECT p_partkey, coalesce(p_name, '') AS p_name FROM part
  WHERE p_partkey < 4000
),
pairs AS (
  SELECT a.p_partkey AS id1, b.p_partkey AS id2,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
  FROM p a JOIN p b
    ON a.p_partkey < b.p_partkey
   AND abs(length(a.p_name) - length(b.p_name)) <= 1
)
SELECT distance, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(id1) AS BIGINT) AS sum_id1,
       CAST(sum(id2) AS BIGINT) AS sum_id2
FROM pairs WHERE distance <= 1 GROUP BY distance
"""


def q_stream_incremental_edit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental Ed-Join dedup (streaming/dedup.py::
    # incremental_edit_distance_dedup): part names arrive in two
    # id-monotone waves; each checkpointed pass flags new names within
    # Levenshtein 1 of anything already seen, via md5-ordered q-gram
    # prefix state (a FIXED gram order keeps old and new prefixes
    # mutually lossless as the corpus grows — df drifts, md5 does not)
    # + exact codegen verification. Id-monotone ingest makes
    # first-seen-wins coincide with the batch canonical-min rule, which
    # the oracle replays quadratically. Same fixed corpus cap as
    # q_edit_distance_pairs.
    from python_mapreduce_spark.streaming.dedup import (  # noqa: PLC0415
        incremental_edit_distance_dedup,
    )

    part = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 4000)
    n = part.count()
    cut = (
        part.agg(F.expr("percentile_approx(p_partkey, 0.5, 2147483647)")).collect()[0][0]
        if n
        else 0
    )
    work = scratch_dir("incr_ed")
    in_dir, state, ckpt, out_dir = (
        os.path.join(work, "in"),
        os.path.join(work, "state"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "out"),
    )
    src = part.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("s"))
    for cond in (F.col("id") <= cut, F.col("id") > cut):
        src.filter(cond).write.mode("append").parquet(in_dir)
        incremental_edit_distance_dedup(
            spark, in_dir, state, ckpt, max_distance=1, output_dir=out_dir
        )
    if n == 0:
        return spark.createDataFrame([], "id long, is_dup boolean")
    return spark.read.parquet(out_dir).select(
        "id", "is_dup"
    )


SQL_INCR_EDIT_DEDUP = """
WITH p AS (
  SELECT p_partkey AS id, coalesce(p_name, '') AS s FROM part
  WHERE p_partkey < 4000
)
SELECT a.id, count(b.id) > 0 AS is_dup
FROM p a LEFT JOIN p b
  ON b.id < a.id
 AND abs(length(a.s) - length(b.s)) <= 1
 AND levenshtein(a.s, b.s) <= 1
GROUP BY a.id
"""


QUERIES: dict[str, Query] = {
    "q_stream_incremental_ivf": Query(
        q_stream_incremental_ivf,
        None,
        "incremental IVF ANN index (frozen-centroid epoch ingest; rows-only, recall twin below)",
    ),
    "q_stream_incremental_ivf_recall": Query(
        q_stream_incremental_ivf_recall,
        _sql_incr_ivf_recall(),
        "incremental IVF recall vs brute force (tolerance oracle)",
    ),
    "q_stream_incremental_ivf_retrain": Query(
        q_stream_incremental_ivf_retrain,
        SQL_INCR_IVF_RETRAIN,
        "incremental IVF forced-retrain evidence: version bump + rewrite consistency",
    ),
    "q_edit_distance_pairs": Query(
        q_edit_distance_pairs,
        SQL_EDIT_DISTANCE_PAIRS,
        "Ed-Join: positional-q-gram prefix-filtered Levenshtein pair join",
    ),
}
