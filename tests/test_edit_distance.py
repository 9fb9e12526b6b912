"""Losslessness and edge contracts for the Ed-Join operator
(llm/dedup.py::edit_distance_pairs): the prefix / positional / length
filters plus the short-string bucket must emit exactly the direct
quadratic join's pairs — on real part names, and on an adversarial
repeated-gram corpus where the prefix lemma's positional tie-breaking
is most stressed (a 4-trial 2-letter-alphabet fuzz at lengths 0-10
passed off-suite; the corpus here keeps its hardest shapes)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from python_mapreduce_spark.llm.dedup import edit_distance_pairs


def _direct(df, d):
    a = df.select(F.col("id").alias("id1"), F.col("s").alias("s1"))
    b = df.select(F.col("id").alias("id2"), F.col("s").alias("s2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("distance", F.levenshtein("s1", "s2").cast("long"))
        .filter(F.col("distance") <= d)
        .select("id1", "id2", "distance")
    )


def _rows(df):
    return {(r.id1, r.id2, r.distance) for r in df.collect()}


def test_edit_distance_pairs_equal_direct_join_on_part(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("s")
    )
    for d in (1, 2):
        got = _rows(edit_distance_pairs(part, "id", "s", max_distance=d))
        want = _rows(_direct(part, d))
        assert got == want and len(got) > 0


def test_edit_distance_pairs_repeated_gram_and_short_strings(spark):
    # gram-repeat-heavy strings exercise positional tie-breaking in the
    # prefix; empties and sub-q strings exercise the short bucket
    rows = [
        (1, "aaaa"), (2, "aaab"), (3, "aaa"), (4, "ab"), (5, "a"),
        (6, ""), (7, "b"), (8, "abababab"), (9, "babababa"),
        (10, "aabb"), (11, "bbaa"), (12, "aaaa"), (13, "xyxyxy"),
        (14, "yxyxyx"), (15, "xxyyxx"),
    ]
    adv = spark.createDataFrame(rows, "id long, s string")
    for d in (0, 1, 2):
        got = _rows(edit_distance_pairs(adv, "id", "s", max_distance=d))
        want = _rows(_direct(adv, d))
        assert got == want
    # identical texts emit distance 0
    assert (1, 12, 0) in _rows(edit_distance_pairs(adv, "id", "s", max_distance=0))


def test_edit_distance_pairs_empty_and_nulls(spark):
    empty = spark.createDataFrame([], "id long, s string")
    assert edit_distance_pairs(empty, "id", "s").count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abcd")], "id long, s string"
    )
    got = _rows(edit_distance_pairs(nulls, "id", "s", max_distance=1))
    # NULL is the empty doc: (1, 2) distance 0; neither is near "abcd"
    assert got == {(1, 2, 0)}


def test_edit_distance_pairs_rejects_bad_dials(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", max_distance=-1)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", q=0)


def test_edit_distance_pairs_plan_is_hazard_free(spark, sf_dir):
    from python_mapreduce_spark.plans.explain import (
        formatted_plan,
        single_partition_windows,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("s")
    )
    df = edit_distance_pairs(part, "id", "s", max_distance=1)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan  # short bucket is a keyed join
    assert not single_partition_windows(df)


def test_incremental_edit_distance_dedup_matches_batch_rule(spark, tmp_path):
    # Two id-monotone waves: first-seen-wins == the batch canonical-min
    # rule (dup iff a within-d pair with any lower id), which is what
    # the registry oracle replays. Also: exactly-once on a no-new-files
    # pass and harmless re-delivery of already-seen ids.
    from python_mapreduce_spark.streaming.dedup import (
        incremental_edit_distance_dedup,
    )

    rows = [
        (1, "blue bolt"), (2, "blue bolts"), (3, "red widget"),
        (4, "red midget"), (5, "small ring"), (6, "ab"), (7, "a"),
        (8, ""), (9, "zzzz"), (10, "blue bolt"), (11, "grand piano"),
        (12, "grind piano"), (13, "b"),
    ]
    in_dir, state, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )

    def wave(lo, hi):
        return spark.createDataFrame(
            [r for r in rows if lo <= r[0] < hi], "id long, s string"
        )

    def batch_rule(upto):
        sub = spark.createDataFrame(
            [r for r in rows if r[0] < upto], "id long, s string"
        )
        a = sub.select(F.col("id").alias("ida"), F.col("s").alias("sa"))
        b = sub.select(F.col("id").alias("idb"), F.col("s").alias("sb"))
        dups = (
            a.join(b, (F.col("idb") < F.col("ida")))
            .filter(F.levenshtein("sa", "sb") <= 1)
            .select(F.col("ida").alias("id"))
            .distinct()
        )
        return {r.id for r in dups.collect()}

    wave(0, 7).write.mode("append").parquet(in_dir)
    dec1 = incremental_edit_distance_dedup(spark, in_dir, state, ckpt)
    got1 = {int(r.id) for _, r in dec1.iterrows() if r.is_dup}
    assert got1 == batch_rule(7)

    wave(7, 99).write.mode("append").parquet(in_dir)
    dec2 = incremental_edit_distance_dedup(spark, in_dir, state, ckpt)
    got2 = {int(r.id) for _, r in dec2.iterrows() if r.is_dup}
    want2 = batch_rule(99) - batch_rule(7)  # decisions only for NEW docs
    # wave-2 docs judged against everything seen so far
    assert got2 == {i for i in want2 if i >= 7}

    # no new files: no decisions, exactly-once
    dec3 = incremental_edit_distance_dedup(spark, in_dir, state, ckpt)
    assert dec3.empty

    # re-delivered ids in a NEW file: self-exclusion keeps them from
    # matching their own state rows; the verbatim copy of id 1 is
    # correctly a dup of it (distance 0)
    spark.createDataFrame(
        [(20, "blue bolt")], "id long, s string"
    ).write.mode("append").parquet(in_dir)
    dec4 = incremental_edit_distance_dedup(spark, in_dir, state, ckpt)
    assert {int(r.id): bool(r.is_dup) for _, r in dec4.iterrows()} == {20: True}
