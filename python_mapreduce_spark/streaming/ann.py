"""Incremental ANN (IVF) index maintenance — the similarity-search
member of the additive-state streaming family (HLL / KLL / top-k / PSI
/ JSD / AUC / band-key dedup / LPA / KMV).

Beyond the reference surface (SURVEY.md §2.2 north-star extensions);
the reference's closest ancestor is the hold_state incremental ledger
(/root/reference/mapper.py:110-143), which this module's file-stream
checkpoint generalizes to derived-index state.

The production pattern: an embedding corpus accretes file-by-file
(nightly encode runs, vendor drops), and each ingest pass must extend
the ANN index WITHOUT re-scanning or re-assigning everything already
ingested. The design (VERDICT r9 item 5):

  * file ledger = a Structured Streaming checkpoint (AvailableNow via
    ``incremental_pass``) — each pass reads ONLY new files, exactly
    once;
  * durable state = per-epoch parquet partitions
    ``vectors/ingest_epoch=N`` of raw (id, v), written once at ingest
    and NEVER rewritten afterwards — the union-additive source of
    truth;
  * index = ``assignments/ingest_epoch=N`` of (id, v, cluster), a
    RECOMPUTABLE derived artifact (assignment is a pure function of
    (vector, centroids)): new epochs are assigned against FROZEN
    centroids in one scan-stage Arrow matmul over the delta only, so a
    pass costs O(delta), never O(corpus). The query path reads only
    this dir — no join at search time. Cost: the index duplicates the
    vector bytes (the standard derived-index trade; at 100 TB the
    alternative is an id-keyed corpus join under every query);
  * centroids = trained once on the first epoch by the deterministic
    distributed k-means of
    :func:`~python_mapreduce_spark.llm.similarity.ivf_assign`, stored
    tiny (nlist x dim) in ``centroids/`` behind the write-to-temp /
    two-rename swap protocol;
  * re-train trigger = list-size SKEW: frozen centroids slowly go
    stale as the distribution drifts, which shows up as one inverted
    list outgrowing the mean (probed-fraction recall decays and the
    largest list dominates probe cost). Per-epoch ``list_stats``
    partitions (nlist rows each) make the check O(epochs x nlist) —
    when max_list/mean_list exceeds ``retrain_skew`` the pass retrains
    on the full union read from ``vectors/`` (the one O(corpus) event,
    amortized over many cheap passes) and regenerates every epoch's
    assignment partition. Because the rewrite reads ``vectors/`` and
    writes ``assignments/`` — different directories — no step ever
    overwrites its own input, and a crash can only lose derived state.

Replay / crash safety: each epoch partition is mode=overwrite (a
replayed batch overwrites itself, the
``incremental_distinct_sketch`` contract); the centroid swap is healed
by ``recover_and_clear_swap``; and every epoch's ``list_stats`` rows
carry the centroid VERSION they were assigned under, so a pass begins
by regenerating any epoch whose version trails the current centroids
(the crash window of a retrain rewrite) from its immutable raw
partition — idempotent repair; the state converges no matter where a
kill lands.

Determinism: centroids (seedless xxhash64-ordered k-means init),
assignment (argmax cosine), the skew trigger (pure function of the
ingested multiset), and probe/top-k (stable argsort + total-order
window) are all deterministic, so the reconstructed index — and every
top-k served from it — is a replayable function of the epoch sequence.
With no retrain triggered it equals the batch IVF index built with the
same frozen first-epoch centroids bit-for-bit (pytest-pinned); recall
vs brute force is driver-checked by the registry twin, the established
ANN convention.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.streaming.incremental import incremental_pass


def _dirs(state_dir: str) -> tuple[str, str, str, str]:
    return (
        os.path.join(state_dir, "vectors"),
        os.path.join(state_dir, "assignments"),
        os.path.join(state_dir, "centroids"),
        os.path.join(state_dir, "list_stats"),
    )


def _load_centroids(spark: SparkSession, cent_dir: str) -> tuple[np.ndarray, int]:
    """(centroid matrix ordered by cluster id, version)."""
    pdf = spark.read.parquet(cent_dir).toPandas().sort_values("cluster")
    cents = np.vstack(pdf["c_vec"].values).astype(np.float64)
    return cents, int(pdf["version"].iloc[0])


def _write_centroids(
    spark: SparkSession, cent_dir: str, cents: np.ndarray, version: int, trained_n: int
) -> None:
    from python_mapreduce_spark.operators.relational import swap_into  # noqa: PLC0415

    pdf = pd.DataFrame(
        {
            "cluster": np.arange(cents.shape[0], dtype=np.int64),
            "c_vec": [row.tolist() for row in cents],
            "version": np.int64(version),
            "trained_n": np.int64(trained_n),
        }
    )
    tmp, old = cent_dir + "__swap_tmp", cent_dir + "__swap_old"
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
    swap_into(cent_dir, tmp, old)


def _write_epoch_index(
    assigned: DataFrame, asg_dir: str, stats_dir: str, epoch: int, version: int
) -> None:
    """One epoch's (id, v, cluster) assignment partition + its nlist-row
    stats partition, both mode=overwrite (idempotent under replay and
    repair)."""
    assigned.write.mode("overwrite").parquet(
        os.path.join(asg_dir, f"ingest_epoch={epoch}")
    )
    stats = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("cvers", F.lit(version).cast("long"))
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"ingest_epoch={epoch}")
    )


def _rewrite_epochs(
    spark: SparkSession,
    vec_dir: str,
    asg_dir: str,
    stats_dir: str,
    cents: np.ndarray,
    version: int,
    epochs: list[int] | None = None,
) -> None:
    """Regenerate assignment + stats partitions for ``epochs`` (all when
    None) from the IMMUTABLE raw partitions against ``cents``. Reads
    ``vectors/``, writes ``assignments/`` — never overwrites its own
    input. Pure function of (vectors, cents): running it twice, or
    dying halfway and running again, lands on the same state."""
    from python_mapreduce_spark.llm.similarity import assign_to_centroids  # noqa: PLC0415

    allv = spark.read.parquet(vec_dir).select("ingest_epoch", "id", "v")
    if epochs is not None:
        allv = allv.filter(F.col("ingest_epoch").isin([int(e) for e in epochs]))
    reassigned = assign_to_centroids(allv, "id", "v", cents).join(
        allv.select("ingest_epoch", "id"), "id"
    )
    (
        reassigned.select("ingest_epoch", "id", "v", "cluster")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_epoch")
        .parquet(asg_dir)
    )
    stats = (
        spark.read.parquet(asg_dir)
        .filter(
            F.col("ingest_epoch").isin([int(e) for e in epochs])
            if epochs is not None
            else F.lit(True)
        )
        .groupBy("ingest_epoch", "cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("cvers", F.lit(version).cast("long"))
    )
    (
        stats.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_epoch")
        .parquet(stats_dir)
    )


def incremental_ivf_index(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int | None = None,
    iters: int = 2,
    retrain_skew: float = 4.0,
    fmt: str = "parquet",
    schema=None,
) -> None:
    """One incremental indexing run: assign vectors from files not seen
    by previous passes into the epoch-partitioned IVF state (see module
    docstring). ``retrain_skew`` is the max_list/mean_list bound above
    which the pass retrains centroids on the full union (measured
    default 4.0 — see ROUND10_RESPONSES.md: a balanced corpus under the
    sqrt dials sits near 1.5-2.5; a drifted one only passes 4 when one
    list holds >4x its share, where probed-fraction recall decay
    begins). ``nlist=None`` derives dials from the first epoch's count
    (and from the union count on retrain) via
    :func:`~python_mapreduce_spark.llm.similarity.ivf_dials`.
    """
    from python_mapreduce_spark.llm.similarity import (  # noqa: PLC0415
        assign_to_centroids,
        ivf_assign,
        ivf_dials,
    )
    from python_mapreduce_spark.operators.relational import (  # noqa: PLC0415
        recover_and_clear_swap,
    )

    vec_dir, asg_dir, cent_dir, stats_dir = _dirs(state_dir)

    def on_batch(batch: DataFrame, epoch: int) -> None:
        recover_and_clear_swap(cent_dir, cent_dir + "__swap_tmp", cent_dir + "__swap_old")
        have_cents = os.path.isdir(cent_dir)

        # Crash repair FIRST — before any other frame over the state is
        # built, so every later read lists post-repair files. Any epoch
        # whose stats trail the current centroid version (or never
        # wrote stats) was caught mid-rewrite: regenerate it from its
        # immutable raw partition. Stats are nlist rows per epoch, so
        # the staleness scan is O(epochs x nlist), not a corpus read.
        cents = version = None
        if have_cents:
            cents, version = _load_centroids(spark, cent_dir)
            vec_epochs = {
                int(r.ingest_epoch)
                for r in spark.read.parquet(vec_dir)
                .select("ingest_epoch")
                .distinct()
                .collect()
            }
            ok_epochs: set[int] = set()
            if os.path.isdir(stats_dir):
                seen = (
                    spark.read.parquet(stats_dir)
                    .groupBy("ingest_epoch")
                    .agg(F.min("cvers").alias("cvers"))
                    .toPandas()
                )
                ok_epochs = {
                    int(e) for e in seen[seen["cvers"] == version]["ingest_epoch"]
                }
            stale = sorted(vec_epochs - ok_epochs)
            if stale:
                _rewrite_epochs(
                    spark, vec_dir, asg_dir, stats_dir, cents, version, epochs=stale
                )

        # Canonical delta: unique by id inside the batch (min-array tie
        # rule — deterministic under replay), first-seen-wins across
        # epochs (anti-join against prior epochs' ids; own epoch is
        # EXCLUDED from the state side so a replayed batch does not
        # erase itself — the incremental_minhash_dedup contract).
        delta = (
            batch.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .filter(F.col("id").isNotNull())
            .groupBy("id")
            .agg(F.min("v").alias("v"))
        )
        if os.path.isdir(vec_dir):
            prior = (
                spark.read.parquet(vec_dir)
                .filter(F.col("ingest_epoch") != epoch)
                .select("id")
            )
            delta = delta.join(prior, "id", "left_anti")

        if not have_cents:
            n0 = delta.count()
            if n0 == 0:
                return  # nothing ingested yet; no index to build
            n_lists = nlist if nlist is not None else ivf_dials(n0)[0]
            assigned, cents = ivf_assign(delta, "id", "v", nlist=n_lists, iters=iters)
            # Raw partition first (durable), then the derived index,
            # then publish centroids: dying between any two steps leaves
            # either no centroids (next pass replays and retrains on the
            # same delta) or a repairable version gap.
            assigned.select("id", "v").write.mode("overwrite").parquet(
                os.path.join(vec_dir, f"ingest_epoch={epoch}")
            )
            _write_epoch_index(assigned, asg_dir, stats_dir, epoch, version=epoch)
            _write_centroids(spark, cent_dir, cents, version=epoch, trained_n=n0)
            return

        delta.write.mode("overwrite").parquet(
            os.path.join(vec_dir, f"ingest_epoch={epoch}")
        )
        assigned = assign_to_centroids(
            spark.read.parquet(os.path.join(vec_dir, f"ingest_epoch={epoch}")),
            "id",
            "v",
            cents,
        )
        _write_epoch_index(assigned, asg_dir, stats_dir, epoch, version=version)

        # Skew trigger from the summed stats frame (tiny).
        tot = (
            spark.read.parquet(stats_dir)
            .groupBy("cluster")
            .agg(F.sum("n").alias("n"))
            .agg(F.max("n").alias("max_n"), F.sum("n").alias("total_n"))
            .collect()[0]
        )
        n_lists = cents.shape[0]
        skew = float(tot.max_n) * n_lists / max(float(tot.total_n), 1.0)
        if skew > retrain_skew:
            union = spark.read.parquet(vec_dir).select("id", "v")
            total_n = int(tot.total_n)
            new_nlist = nlist if nlist is not None else ivf_dials(total_n)[0]
            _, new_cents = ivf_assign(union, "id", "v", nlist=new_nlist, iters=iters)
            _write_centroids(spark, cent_dir, new_cents, version=epoch, trained_n=total_n)
            _rewrite_epochs(spark, vec_dir, asg_dir, stats_dir, new_cents, version=epoch)

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch, fmt=fmt, schema=schema)


def read_ivf_meta(spark: SparkSession, state_dir: str) -> DataFrame:
    """One-row index health frame: (version, nlist, total_n, max_list_n,
    skew) — the retrain trigger's own observables, read from the tiny
    centroid + stats state only."""
    _, _, cent_dir, stats_dir = _dirs(state_dir)
    cents = spark.read.parquet(cent_dir).agg(
        F.max("version").alias("version"),
        F.count(F.lit(1)).cast("long").alias("nlist"),
    )
    per_list = spark.read.parquet(stats_dir).groupBy("cluster").agg(
        F.sum("n").alias("n")
    )
    stats = per_list.agg(
        F.sum("n").cast("long").alias("total_n"),
        F.max("n").cast("long").alias("max_list_n"),
    )
    return cents.join(stats).select(
        "version",
        "nlist",
        "total_n",
        "max_list_n",
        F.round(F.col("max_list_n") * F.col("nlist") / F.col("total_n"), 4).alias(
            "skew"
        ),
    )


def read_ivf_topk(
    spark: SparkSession,
    state_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 5,
    nprobe: int | None = None,
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k served from the reconstructed incremental
    index: load the frozen centroids (tiny), read the epoch-partitioned
    (id, v, cluster) assignment union, and run the shared
    :func:`~python_mapreduce_spark.llm.similarity.ivf_probe_topk`
    probe/score stage — identical code path to batch IVF search.
    ``nprobe=None`` applies the ivf_dials probe fraction to the
    index's ACTUAL list count. Assumes the last ingest pass completed;
    after a crash, run one more pass first (its repair step heals any
    partially-rewritten epochs)."""
    from python_mapreduce_spark.llm.similarity import ivf_probe_topk  # noqa: PLC0415

    _, asg_dir, cent_dir, _ = _dirs(state_dir)
    if not os.path.isdir(cent_dir):
        # Nothing was ever ingested (every delivery was empty/NULL-id):
        # no index exists — serve the empty result, same schema.
        return spark.createDataFrame(
            [], f"{query_id} long, rn long, neighbor_id long, cos double"
        )
    cents, _version = _load_centroids(spark, cent_dir)
    if nprobe is None:
        nprobe = min(cents.shape[0], max(6, round(cents.shape[0] * 0.625)))
    assigned = spark.read.parquet(asg_dir).select("id", "v", "cluster")
    return ivf_probe_topk(
        assigned, cents, queries, id_col, vec_col, k=k, nprobe=nprobe, query_id=query_id
    )
