"""Replay contracts for the incremental IVF index
(streaming/ann.py): batch equality under frozen centroids, exactly-once
ledger behavior, first-seen-wins redelivery, the skew retrain trigger,
and crash repair of a partially-rewritten epoch."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_mapreduce_spark.streaming.ann import (
    incremental_ivf_index,
    read_ivf_meta,
    read_ivf_topk,
)


def _vecs(ids, center, dim=8, spread=0.05):
    """Deterministic synthetic vectors: unit-ish points around a corner
    of the hypercube, jittered by a pure function of the id (no RNG)."""
    out = []
    for i in ids:
        v = np.array(center, dtype=np.float64)
        jit = np.array(
            [((i * 2654435761 + d * 97) % 1000) / 1000.0 - 0.5 for d in range(dim)]
        )
        out.append((int(i), (v + spread * jit).astype(np.float32).tolist()))
    return out


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _topk_rows(df):
    return {
        (r.query_id, r.rn, r.neighbor_id, round(r.cos, 6)) for r in df.collect()
    }


CENTER_A = [1.0, 0, 0, 0, 0, 0, 0, 0]
CENTER_B = [0, 1.0, 0, 0, 0, 0, 0, 0]
CENTER_C = [0, 0, 1.0, 0, 0, 0, 0, 0]


def test_incremental_ivf_equals_frozen_batch_and_replays(spark, tmp_path):
    from python_mapreduce_spark.llm.similarity import (
        assign_to_centroids,
        ivf_assign,
        ivf_probe_topk,
    )

    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    wave1 = _vecs(range(0, 30), CENTER_A) + _vecs(range(30, 60), CENTER_B)
    wave2 = _vecs(range(60, 90), CENTER_C)
    queries = _frame(spark, _vecs([1000, 1001], CENTER_A) + _vecs([1002], CENTER_C))

    # wave 1: centroids train on this epoch and freeze
    _frame(spark, wave1).write.mode("append").parquet(in_dir)
    incremental_ivf_index(
        spark, in_dir, ckpt, state, nlist=4, retrain_skew=1e9
    )
    meta1 = read_ivf_meta(spark, state).collect()[0]
    assert meta1.nlist == 4 and meta1.total_n == 60

    # wave 2: assigned against the FROZEN wave-1 centroids
    _frame(spark, wave2).write.mode("append").parquet(in_dir)
    incremental_ivf_index(
        spark, in_dir, ckpt, state, nlist=4, retrain_skew=1e9
    )
    meta2 = read_ivf_meta(spark, state).collect()[0]
    assert meta2.total_n == 90
    assert meta2.version == meta1.version  # no retrain happened

    got = _topk_rows(read_ivf_topk(spark, state, queries, k=3, nprobe=3))

    # batch twin with the same frozen rule: train on wave 1 only, assign
    # the union, probe identically -> bit-for-bit equality
    _, cents = ivf_assign(
        _frame(spark, wave1), "vec_id", "embedding", nlist=4, iters=2
    )
    union = _frame(spark, wave1 + wave2)
    assigned = assign_to_centroids(union, "vec_id", "embedding", cents)
    want = _topk_rows(
        ivf_probe_topk(assigned, cents, queries, "vec_id", "embedding", k=3, nprobe=3)
    )
    assert got == want and len(got) > 0

    # pass with no new files: exactly-once, nothing changes
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4, retrain_skew=1e9)
    assert _topk_rows(read_ivf_topk(spark, state, queries, k=3, nprobe=3)) == got

    # re-delivered ids in a NEW file (different payload): first-seen
    # wins — the index is unchanged
    _frame(spark, _vecs(range(0, 30), CENTER_C)).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4, retrain_skew=1e9)
    assert read_ivf_meta(spark, state).collect()[0].total_n == 90
    assert _topk_rows(read_ivf_topk(spark, state, queries, k=3, nprobe=3)) == got


def test_incremental_ivf_retrain_on_skew(spark, tmp_path):
    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    # epoch 1: balanced two-cluster corpus
    _frame(
        spark, _vecs(range(0, 20), CENTER_A) + _vecs(range(20, 40), CENTER_B)
    ).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4, retrain_skew=2.5)
    v1 = read_ivf_meta(spark, state).collect()[0].version

    # epoch 2: drift — a flood of NEW-region vectors piles into one
    # frozen list, pushing max/mean past the bound -> retrain fires
    _frame(spark, _vecs(range(40, 160), CENTER_C)).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4, retrain_skew=2.5)
    meta = read_ivf_meta(spark, state).collect()[0]
    assert meta.version > v1, "skew breach must bump the centroid version"
    assert meta.total_n == 160
    assert float(meta.skew) <= 2.5, "retrained lists must be balanced again"

    # every epoch's stats must sit at the NEW version (full rewrite)
    stats = spark.read.parquet(os.path.join(state, "list_stats"))
    assert {r.cvers for r in stats.select("cvers").distinct().collect()} == {
        meta.version
    }
    # and the assignment partitions were regenerated consistently:
    # per-list counts derived from assignments equal the stats
    vec_counts = {
        (r.cluster, r.n)
        for r in spark.read.parquet(os.path.join(state, "assignments"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    stat_counts = {
        (r.cluster, r.n)
        for r in stats.groupBy("cluster").agg(F.sum("n").cast("long").alias("n")).collect()
    }
    assert vec_counts == stat_counts


def test_incremental_ivf_repairs_stale_epoch(spark, tmp_path):
    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    _frame(
        spark, _vecs(range(0, 20), CENTER_A) + _vecs(range(20, 40), CENTER_B)
    ).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4, retrain_skew=1e9)

    # Simulate the retrain-rewrite crash window: scramble epoch 0's
    # ASSIGNMENT cluster tags and mark its stats as assigned under a
    # PRIOR version (the raw vectors partition stays untouched — it is
    # immutable by contract).
    asg_part = os.path.join(state, "assignments", "ingest_epoch=0")
    scrambled = (
        spark.read.parquet(asg_part)
        .select("id", "v", (F.pmod(F.col("cluster") + 1, F.lit(4))).cast("int").alias("cluster"))
    )
    scrambled.write.mode("overwrite").parquet(str(tmp_path / "scratch"))
    spark.read.parquet(str(tmp_path / "scratch")).write.mode("overwrite").parquet(asg_part)
    stats_part = os.path.join(state, "list_stats", "ingest_epoch=0")
    bad_stats = spark.read.parquet(stats_part).withColumn(
        "cvers", F.col("cvers") - 1
    )
    bad_stats.write.mode("overwrite").parquet(str(tmp_path / "scratch2"))
    spark.read.parquet(str(tmp_path / "scratch2")).write.mode("overwrite").parquet(stats_part)

    # next pass heals before ingesting its delta
    _frame(spark, _vecs(range(40, 50), CENTER_A)).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4, retrain_skew=1e9)

    from python_mapreduce_spark.llm.similarity import assign_to_centroids
    from python_mapreduce_spark.streaming.ann import _load_centroids

    cents, version = _load_centroids(spark, os.path.join(state, "centroids"))
    stats = spark.read.parquet(os.path.join(state, "list_stats"))
    assert {r.cvers for r in stats.select("cvers").distinct().collect()} == {version}
    asg = spark.read.parquet(os.path.join(state, "assignments"))
    fixed = assign_to_centroids(asg.select("id", "v"), "id", "v", cents)
    mismatches = (
        asg.select("id", F.col("cluster").alias("got"))
        .join(fixed.select("id", F.col("cluster").alias("want")), "id")
        .filter(F.col("got") != F.col("want"))
        .count()
    )
    assert mismatches == 0, "repair must restore pure-function assignments"


def test_incremental_ivf_empty_first_batch_then_data(spark, tmp_path):
    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    # first delivery holds only NULL ids -> no index is built, no crash
    spark.createDataFrame(
        [(None, [0.1] * 8)], "vec_id long, embedding array<float>"
    ).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4)
    assert not os.path.isdir(os.path.join(state, "centroids"))

    _frame(spark, _vecs(range(0, 40), CENTER_A)).write.mode("append").parquet(in_dir)
    incremental_ivf_index(spark, in_dir, ckpt, state, nlist=4)
    meta = read_ivf_meta(spark, state).collect()[0]
    assert meta.total_n == 40
    queries = _frame(spark, _vecs([500], CENTER_A))
    assert read_ivf_topk(spark, state, queries, k=3).count() == 3
