"""Incremental-ingest semantics: exactly-once file tracking, additive
recombination, restart behavior — the guarantees the reference's
delete-then-rewrite ledger (reference mapper.py:116-143) cannot make
(SURVEY.md §7 risks: "crash between = data loss; our streaming checkpoint
version must be strictly better, verify with a kill/resume test").
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events(spark, sf_dir):
    from python_mapreduce_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "events")


def test_incremental_passes_are_exactly_once_and_additive(spark, events, tmp_path):
    from python_mapreduce_spark.streaming.incremental import collect_incremental_counts

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)

    half_a.write.mode("append").parquet(in_dir)
    p1 = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")
    assert p1["n"].sum() == half_a.count()

    # No new files -> a re-run processes NOTHING (exactly-once per file).
    p_rerun = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")
    assert p_rerun.empty or p_rerun["n"].sum() == 0

    half_b.write.mode("append").parquet(in_dir)
    p2 = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")
    assert p2["n"].sum() == half_b.count()

    # f(A+B) = f(A) + f(B): recombined partials equal the one-shot batch.
    combined = (
        pd.concat([p1, p2], ignore_index=True).groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )
    )
    batch = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .toPandas()
    )
    merged = combined.merge(batch, on="event_type", suffixes=("_inc", "_batch"))
    assert (merged["n_inc"] == merged["n_batch"]).all()
    assert (abs(merged["s_inc"] - merged["s_batch"]) < 1e-6).all()


def test_restart_from_checkpoint_does_not_reprocess(spark, events, tmp_path):
    # Simulate kill/resume: a fresh streaming query object against the
    # same checkpoint must pick up only unseen files.
    from python_mapreduce_spark.streaming.incremental import collect_incremental_counts

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    events.limit(100).write.mode("append").parquet(in_dir)
    p1 = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")
    total_first = p1["n"].sum()
    assert total_first == 100

    # "Restart": brand-new pass (new query instance) over the same
    # checkpoint — nothing new to do.
    p2 = collect_incremental_counts(spark, in_dir, ckpt, ["event_type"], "value")
    assert p2.empty or p2["n"].sum() == 0


def test_incremental_counts_output_dir_partials_are_exactly_once(spark, events, tmp_path):
    # output_dir mode: partials land in ingest_epoch partitions instead
    # of the driver, and a replayed pass (fresh checkpoint, same files,
    # same epoch ordinal) overwrites its partition — summing the
    # read-back never double-counts.
    from python_mapreduce_spark.streaming.incremental import collect_incremental_counts

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    events.limit(100).write.mode("append").parquet(in_dir)
    p = collect_incremental_counts(
        spark, in_dir, str(tmp_path / "ck1"), ["event_type"], "value",
        output_dir=out_dir,
    )
    assert p.empty  # partials never visit the driver in at-scale mode
    first = spark.read.parquet(out_dir)
    assert first.agg(F.sum("n")).collect()[0][0] == 100

    # replay with a fresh checkpoint: epoch 0 partition is overwritten
    collect_incremental_counts(
        spark, in_dir, str(tmp_path / "ck2"), ["event_type"], "value",
        output_dir=out_dir,
    )
    back = spark.read.parquet(out_dir)
    assert back.agg(F.sum("n")).collect()[0][0] == 100
    assert back.select("ingest_epoch").distinct().count() == 1


def test_incremental_distinct_sketch_does_not_double_count(spark, tmp_path):
    # Two waves whose user sets OVERLAP: additive recombination of
    # per-wave distinct counts would read 100; the unioned sketch state
    # estimates the true 75 (within the lgk bound). Replay with a fresh
    # checkpoint overwrites its epoch partition — never double-appends.
    from pyspark.sql import functions as SF

    from python_mapreduce_spark.streaming.incremental import (
        incremental_distinct_sketch,
        read_distinct_estimate,
    )

    in_dir, state = str(tmp_path / "in"), str(tmp_path / "state")
    wave1 = spark.range(50).select(SF.col("id").alias("user"), SF.lit("t").alias("et"))
    wave2 = spark.range(25, 75).select(
        SF.col("id").alias("user"), SF.lit("t").alias("et")
    )
    wave1.write.mode("append").parquet(in_dir)
    incremental_distinct_sketch(spark, in_dir, str(tmp_path / "ck"), ["et"], "user", state)
    wave2.write.mode("append").parquet(in_dir)
    incremental_distinct_sketch(spark, in_dir, str(tmp_path / "ck"), ["et"], "user", state)

    est = read_distinct_estimate(spark, state, ["et"]).collect()[0].approx_distinct
    assert abs(est - 75) / 75 <= 0.05  # NOT 100: overlap merged, not summed
    # state is one fixed-size sketch row per key per epoch
    state_df = spark.read.parquet(state)
    assert state_df.count() == 2
    assert state_df.select("ingest_epoch").distinct().count() == 2

    # replay of pass 1 against a fresh checkpoint overwrites epoch 0
    incremental_distinct_sketch(
        spark, in_dir, str(tmp_path / "ck2"), ["et"], "user", state
    )
    est2 = read_distinct_estimate(spark, state, ["et"]).collect()[0].approx_distinct
    assert abs(est2 - 75) / 75 <= 0.05


def test_streaming_append_session_windows_close_with_watermark(spark, events, tmp_path):
    # Append-mode session windows: with the watermark past every event
    # (AvailableNow drains the source, then advances the watermark), all
    # sessions finalize and match the batch session_window computation.
    from python_mapreduce_spark.streaming.incremental import (
        file_stream,
        normalize_event_ts,
        run_stream_to_memory,
    )
    from python_mapreduce_spark.streaming.windows import session_agg

    in_dir = str(tmp_path / "in")
    events.write.mode("append").parquet(in_dir)
    stream = normalize_event_ts(file_stream(spark, in_dir))
    agg = session_agg(
        stream, "ts", "1 hour", ["user_id"], [F.count(F.lit(1)).alias("n")],
        watermark="0 seconds",
    )
    out = run_stream_to_memory(
        agg, output_mode="append", checkpoint_dir=str(tmp_path / "ckpt")
    ).toPandas()

    batch_df = session_agg(
        events, "ts", "1 hour", ["user_id"], [F.count(F.lit(1)).alias("n")]
    ).select("user_id", F.col("win.start").alias("start"), F.col("win.end").alias("end"), "n")
    batch = batch_df.toPandas()

    # Sessions whose end is beyond the final watermark (= max event time
    # with 0s delay) legitimately stay open and unemitted; everything
    # else must match the batch computation exactly.
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    open_sessions = batch[batch["end"] > max_ts]
    closed = batch[batch["end"] <= max_ts]
    assert len(out) == len(closed)
    assert out["n"].sum() == closed["n"].sum()
    assert len(batch) - len(out) == len(open_sessions)


def test_stream_upsert_parquet_applies_corrections_exactly_once(spark, tmp_path):
    # Corrections stream -> parquet MERGE target: three input batches
    # (initial load, revision of one key + a new key, re-run with nothing
    # new). Target must hold latest-per-key, re-runs must be no-ops, and
    # the target stays a plain parquet dataset throughout.
    from python_mapreduce_spark.streaming.incremental import stream_upsert_parquet

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir / name))

    land("b1", [(1, "a"), (2, "b"), (3, "c")])
    stream_upsert_parquet(
        spark, f"{in_dir}/*", target, ckpt, "k",
        schema="k long, v string",
    )
    assert {
        (r.k, r.v) for r in spark.read.parquet(target).collect()
    } == {(1, "a"), (2, "b"), (3, "c")}

    land("b2", [(2, "B2"), (4, "d")])
    stream_upsert_parquet(
        spark, f"{in_dir}/*", target, ckpt, "k",
        schema="k long, v string",
    )
    assert {
        (r.k, r.v) for r in spark.read.parquet(target).collect()
    } == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}

    # nothing new: checkpoint skips all seen files, target unchanged
    stream_upsert_parquet(
        spark, f"{in_dir}/*", target, ckpt, "k",
        schema="k long, v string",
    )
    assert spark.read.parquet(target).count() == 4


def test_stream_upsert_recovers_from_mid_swap_crash(spark, tmp_path):
    # Simulate a kill between the two swap renames: target gone, data
    # stranded in __upsert_old, plus a stale half-written __upsert_tmp.
    # The next run must restore the old target, clear the stale dirs,
    # and apply the new batch on top of the restored data.
    import os

    from python_mapreduce_spark.streaming.incremental import stream_upsert_parquet

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir / name))

    land("b1", [(1, "a"), (2, "b")])
    stream_upsert_parquet(
        spark, f"{in_dir}/*", target, ckpt, "k", schema="k long, v string"
    )

    # crash state: target renamed away, stale tmp left behind
    os.rename(target, f"{target}__upsert_old")
    os.makedirs(f"{target}__upsert_tmp")
    land("b2", [(2, "B2"), (3, "c")])
    stream_upsert_parquet(
        spark, f"{in_dir}/*", target, ckpt, "k", schema="k long, v string"
    )
    assert {
        (r.k, r.v) for r in spark.read.parquet(target).collect()
    } == {(1, "a"), (2, "B2"), (3, "c")}
    assert not os.path.isdir(f"{target}__upsert_old")
    assert not os.path.isdir(f"{target}__upsert_tmp")


def test_stream_upsert_same_key_in_batch_is_deterministic(spark, tmp_path):
    # Conflicting same-key rows within ONE micro-batch must resolve
    # deterministically (lexicographic max over non-key columns), so a
    # replayed batch picks the same survivor.
    from python_mapreduce_spark.streaming.incremental import stream_upsert_parquet

    for run in ("r1", "r2"):
        in_dir = tmp_path / run / "in"
        in_dir.mkdir(parents=True)
        target = str(tmp_path / run / "target")
        spark.createDataFrame(
            [(1, "zzz"), (1, "aaa"), (2, "mid"), (2, "zed")], "k long, v string"
        ).coalesce(1).write.parquet(str(in_dir / "b1"))
        stream_upsert_parquet(
            spark,
            f"{in_dir}/*",
            target,
            str(tmp_path / run / "ckpt"),
            "k",
            schema="k long, v string",
        )
        assert {
            (r.k, r.v) for r in spark.read.parquet(target).collect()
        } == {(1, "zzz"), (2, "zed")}


def test_stream_upsert_order_col_beats_column_order(spark, tmp_path):
    # With order_col, the latest revision wins even when the
    # lexicographic struct-max over column order would pick the other
    # row; ties on order_col still resolve deterministically.
    from python_mapreduce_spark.streaming.incremental import stream_upsert_parquet

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    target = str(tmp_path / "target")
    rows = [
        (1, "zzz", 1),  # lexicographic winner on v, but stale version
        (1, "aaa", 2),  # latest version must win
        (2, "tie_aa", 5),
        (2, "tie_zz", 5),  # version tie -> lexicographic max of v
    ]
    spark.createDataFrame(rows, "k long, v string, ver long").coalesce(1).write.parquet(
        str(in_dir / "b1")
    )
    stream_upsert_parquet(
        spark,
        f"{in_dir}/*",
        target,
        str(tmp_path / "ckpt"),
        "k",
        order_col="ver",
        schema="k long, v string, ver long",
    )
    assert {
        (r.k, r.v, r.ver) for r in spark.read.parquet(target).collect()
    } == {(1, "aaa", 2), (2, "tie_zz", 5)}

    import pytest

    with pytest.raises(ValueError, match="order_col"):
        stream_upsert_parquet(
            spark,
            f"{in_dir}/*",
            str(tmp_path / "t2"),
            str(tmp_path / "ckpt2"),
            "k",
            order_col="nope",
            schema="k long, v string, ver long",
        )


def test_stream_upsert_order_col_protects_target_across_batches(spark, tmp_path):
    # Conditional-merge semantics: a late-arriving file carrying a STALE
    # revision must not regress the newer row already in the target.
    from python_mapreduce_spark.streaming.incremental import stream_upsert_parquet

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream_upsert_parquet(
            spark, f"{in_dir}/*", target, ckpt, "k",
            order_col="ver", schema="k long, v string, ver long",
        )

    spark.createDataFrame([(1, "new", 5), (2, "x", 1)], "k long, v string, ver long") \
        .coalesce(1).write.parquet(str(in_dir / "b1"))
    run()
    # late stale revision of k=1 plus a genuinely newer k=2
    spark.createDataFrame([(1, "old", 3), (2, "y", 2)], "k long, v string, ver long") \
        .coalesce(1).write.parquet(str(in_dir / "b2"))
    run()
    assert {
        (r.k, r.v, r.ver) for r in spark.read.parquet(target).collect()
    } == {(1, "new", 5), (2, "y", 2)}


def test_incremental_dedup_output_dir_is_exactly_once_per_epoch(spark, tmp_path):
    # output_dir mode: decisions land in ingest_epoch=<N> partitions and
    # a replayed batch (same files, fresh checkpoint writing the same
    # epoch ordinal) OVERWRITES its partition instead of appending — the
    # decision output holds no duplicate (id, is_dup) rows after replay.
    from python_mapreduce_spark.streaming.dedup import incremental_minhash_dedup

    text = "content for the exactly once decision output check "
    docs = [(1, text * 4), (2, text * 4 + "suffix"), (3, "wholly different words " * 6)]
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    out_dir = str(tmp_path / "decisions")

    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    p = incremental_minhash_dedup(
        spark, in_dir, state, str(tmp_path / "ckpt1"), output_dir=out_dir
    )
    assert p.empty  # at-scale mode never drives decisions through pandas
    first = {
        (r.id, r.is_dup, r.ingest_epoch)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert {(i, d) for i, d, _ in first} == {(1, False), (2, True), (3, False)}

    # replay: fresh checkpoint reprocesses the same files as epoch 0
    incremental_minhash_dedup(
        spark, in_dir, state, str(tmp_path / "ckpt2"), output_dir=out_dir
    )
    replayed = spark.read.parquet(out_dir)
    assert replayed.count() == 3  # overwritten, not doubled
    assert {
        (r.id, r.is_dup, r.ingest_epoch) for r in replayed.collect()
    } == first


def test_incremental_dedup_matches_batch_rule(spark, tmp_path):
    # Incremental corpus dedup: planted near-dups within a batch, across
    # batches, and a chained copy-of-a-dropped-copy. The canonical-min
    # rule (dup iff a >=0.8-Jaccard pair with a lower-id doc) must hold
    # across passes exactly as a one-shot batch would compute it.
    from python_mapreduce_spark.streaming.dedup import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today "
    other = "completely different content about spark engines and parquet files "
    docs1 = [
        (1, base * 5),
        (2, base * 5 + "tail variation"),   # dup of 1 (same batch)
        (3, other * 5),
    ]
    docs2 = [
        (4, base * 5 + "another tail"),     # dup of 1/2 (prior batch)
        (5, "entirely novel text with no overlap whatsoever in shingles " * 5),
    ]
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(docs1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    p1 = incremental_minhash_dedup(spark, in_dir, state, ckpt)
    spark.createDataFrame(docs2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    p2 = incremental_minhash_dedup(spark, in_dir, state, ckpt)

    d1 = dict(zip(p1["id"], p1["is_dup"]))
    d2 = dict(zip(p2["id"], p2["is_dup"]))
    assert d1 == {1: False, 2: True, 3: False}
    assert d2 == {4: True, 5: False}


def test_incremental_dedup_replay_is_idempotent(spark, tmp_path):
    # A crash between the state append and the checkpoint commit replays
    # the batch with its OWN band keys already in the state. The
    # batch-id exclusion must keep the replayed decisions identical —
    # no doc may match itself. Simulated by re-running the same landed
    # file against the already-appended state with a fresh checkpoint.
    from python_mapreduce_spark.streaming.dedup import incremental_minhash_dedup

    text = "some repeated content for the replay idempotence check " 
    docs = [(1, text * 4), (2, text * 4 + "suffix"), (3, "unrelated words entirely " * 6)]
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")

    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    p1 = incremental_minhash_dedup(spark, in_dir, state, str(tmp_path / "ckpt1"))
    # replay: same files, fresh checkpoint, state already holds their keys
    p2 = incremental_minhash_dedup(spark, in_dir, state, str(tmp_path / "ckpt2"))

    assert dict(zip(p1["id"], p1["is_dup"])) == {1: False, 2: True, 3: False}
    assert dict(zip(p2["id"], p2["is_dup"])) == dict(zip(p1["id"], p1["is_dup"]))


def test_incremental_contamination_unions_to_batch_audit(spark, tmp_path):
    # Two waves of corpus files audited incrementally must union to the
    # one-shot batch audit, and a crash-replay of an epoch (same epoch
    # id, state already written) must overwrite, not double-append.
    from pyspark.sql import functions as SF

    from python_mapreduce_spark.llm.text import ngram_contamination
    from python_mapreduce_spark.streaming.incremental import incremental_contamination

    ev = spark.createDataFrame(
        [(100, "held out benchmark question about spark shuffles and joins")],
        "doc_id long, text string",
    )
    leak = "held out benchmark question about spark shuffles and joins extra tail"
    corpus = [
        (1, leak),                                  # contaminated
        (2, "completely unrelated document words"),
        (3, "another clean document with its own content here"),
        (4, leak + " second copy"),                 # contaminated, wave 2
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    in_dir, ck, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    df.filter(SF.col("doc_id") <= 2).write.mode("append").parquet(in_dir)
    incremental_contamination(spark, in_dir, ck, ev, out)
    df.filter(SF.col("doc_id") >= 3).write.mode("append").parquet(in_dir)
    incremental_contamination(spark, in_dir, ck, ev, out)

    got = {
        r.id: (r.n_contaminated, r.contamination)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.id: (r.n_contaminated, r.contamination)
        for r in ngram_contamination(df, ev, "doc_id", "text", 8).collect()
    }
    assert got == batch
    assert got[1][0] > 0 and got[4][0] > 0 and got[2][0] == 0
    # exactly one row per doc across epochs (no cross-epoch duplication),
    # laid out as one idempotent partition per epoch — a crash-replay of
    # an epoch re-runs foreachBatch with the SAME epoch id and the
    # mode=overwrite write replaces that partition instead of appending
    rows = spark.read.parquet(out)
    assert rows.count() == 4
    assert rows.select("ingest_epoch").distinct().count() == 2


def test_incremental_topk_recovers_globally_heavy_but_locally_light_item(spark, tmp_path):
    # The defining case for sketch state over row partials: "hot" is
    # NEVER in any single epoch's top-2 but IS the global #1. Per-epoch
    # top-k rows would lose it; combined sketch state must not.
    from pyspark.sql import functions as SF

    from python_mapreduce_spark.streaming.incremental import (
        incremental_topk_sketch,
        read_topk_estimate,
    )

    in_dir, ck, st = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "st")

    def wave(epoch_leader):
        # per wave: leader 10x, runner-up 8x, hot 6x (locally 3rd)
        rows = [(epoch_leader, "g")] * 10 + [(f"{epoch_leader}b", "g")] * 8 + [("hot", "g")] * 6
        return spark.createDataFrame(rows, "item string, g string")

    wave("w1").write.mode("append").parquet(in_dir)
    incremental_topk_sketch(spark, in_dir, ck, ["g"], "item", st, max_items=64)
    wave("w2").write.mode("append").parquet(in_dir)
    incremental_topk_sketch(spark, in_dir, ck, ["g"], "item", st, max_items=64)
    wave("w3").write.mode("append").parquet(in_dir)
    incremental_topk_sketch(spark, in_dir, ck, ["g"], "item", st, max_items=64)

    top = read_topk_estimate(spark, st, ["g"], k=2, max_items=64).collect()
    ranked = sorted(top, key=lambda r: r.rank)
    assert ranked[0].item == "hot" and ranked[0].est_count == 18
    # every other item has 10 or 8; rank 2 is a 10-count leader
    assert ranked[1].est_count == 10
    # state layout: one sketch row per key per epoch
    state = spark.read.parquet(st)
    assert state.count() == 3
    assert state.select("ingest_epoch").distinct().count() == 3


def _crash_last_commit(ckpt: str) -> None:
    # Simulate a kill between the epoch's state write and the streaming
    # checkpoint commit: the state partition exists but the commit marker
    # does not, so the next run replays the SAME batch with the SAME
    # epoch id against already-written state.
    import os

    commits = os.path.join(ckpt, "commits")
    last = max(
        (f for f in os.listdir(commits) if not f.startswith(".")), key=int
    )
    os.remove(os.path.join(commits, last))
    # local-FS checksum shadow; a real crash leaves neither file
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_incremental_distinct_sketch_recovers_from_pre_commit_crash(spark, tmp_path):
    # Kill/resume for the HLL member of the sketch triad (VERDICT r4
    # item 4): replaying the crashed epoch must overwrite its partition
    # (same estimate, same state row count), never double-append.
    from pyspark.sql import functions as SF

    from python_mapreduce_spark.streaming.incremental import (
        incremental_distinct_sketch,
        read_distinct_estimate,
    )

    in_dir, ck, st = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "st")
    spark.range(50).select(SF.col("id").alias("user"), SF.lit("t").alias("et")).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_distinct_sketch(spark, in_dir, ck, ["et"], "user", st)
    _crash_last_commit(ck)
    spark.range(25, 75).select(
        SF.col("id").alias("user"), SF.lit("t").alias("et")
    ).write.mode("append").parquet(in_dir)
    # resume: replays epoch 0 (overwrite) then ingests wave 2 as epoch 1
    incremental_distinct_sketch(spark, in_dir, ck, ["et"], "user", st)

    est = read_distinct_estimate(spark, st, ["et"]).collect()[0].approx_distinct
    assert abs(est - 75) / 75 <= 0.05
    state = spark.read.parquet(st)
    assert state.count() == 2  # one sketch row per key per epoch, no dup epoch 0
    assert state.select("ingest_epoch").distinct().count() == 2


def test_incremental_topk_sketch_recovers_from_pre_commit_crash(spark, tmp_path):
    from python_mapreduce_spark.streaming.incremental import (
        incremental_topk_sketch,
        read_topk_estimate,
    )

    in_dir, ck, st = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "st")
    rows1 = [("a", "g")] * 10 + [("b", "g")] * 4
    rows2 = [("b", "g")] * 3 + [("c", "g")] * 5
    spark.createDataFrame(rows1, "item string, g string").write.mode("append").parquet(
        in_dir
    )
    incremental_topk_sketch(spark, in_dir, ck, ["g"], "item", st)
    before = {
        (r.rank, r.item, r.est_count)
        for r in read_topk_estimate(spark, st, ["g"], k=3).collect()
    }
    _crash_last_commit(ck)
    spark.createDataFrame(rows2, "item string, g string").write.mode("append").parquet(
        in_dir
    )
    incremental_topk_sketch(spark, in_dir, ck, ["g"], "item", st)

    got = {
        (r.rank, r.item, r.est_count)
        for r in read_topk_estimate(spark, st, ["g"], k=3).collect()
    }
    # counts exact within max_items: a=10, b=4+3=7, c=5 — epoch-0 replay
    # must not double a or b's first-wave counts
    assert got == {(1, "a", 10), (2, "b", 7), (3, "c", 5)}
    assert before == {(1, "a", 10), (2, "b", 4)}
    state = spark.read.parquet(st)
    assert state.select("ingest_epoch").distinct().count() == 2


def test_incremental_quantile_sketch_recovers_from_pre_commit_crash(spark, tmp_path):
    from pyspark.sql import functions as SF

    from python_mapreduce_spark.streaming.incremental import (
        incremental_quantile_sketch,
        read_quantile_estimate,
    )

    in_dir, ck, st = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "st")
    spark.range(0, 100).select(
        SF.lit("g").alias("g"), SF.col("id").cast("double").alias("v")
    ).write.mode("append").parquet(in_dir)
    incremental_quantile_sketch(spark, in_dir, ck, ["g"], "v", st)
    _crash_last_commit(ck)
    spark.range(100, 200).select(
        SF.lit("g").alias("g"), SF.col("id").cast("double").alias("v")
    ).write.mode("append").parquet(in_dir)
    incremental_quantile_sketch(spark, in_dir, ck, ["g"], "v", st)

    row = read_quantile_estimate(spark, st, ["g"], probs=(0.5,)).collect()[0]
    # true median of 0..199 is ~100; KLL rank error ~1.65% at k=200. A
    # double-appended epoch 0 would skew the median toward ~66.
    assert abs(row.q_05 - 100) <= 10
    state = spark.read.parquet(st)
    assert state.select("ingest_epoch").distinct().count() == 2


def test_incremental_psi_equals_batch_monitor(spark, tmp_path):
    # Bucket counts are additive, so the incremental monitor's PSI over
    # two ingest waves must equal the one-shot batch psi_drift on the
    # same data; a third pass with no new files must not add state.
    import os

    from pyspark.sql import functions as F

    from python_mapreduce_spark.operators.aggregates import (
        psi_drift,
        psi_from_bucket_counts,
        psi_reference_thresholds,
    )
    from python_mapreduce_spark.streaming.incremental import (
        incremental_psi_buckets,
        read_psi_state,
    )

    ref_rows = [("k", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] * 3]
    cur_rows = [("k", float(v)) for v in [5, 6, 7, 8, 9, 10, 11, 12] * 4]
    ref = spark.createDataFrame(ref_rows, "g string, value double")
    cur = spark.createDataFrame(cur_rows, "g string, value double")

    batch = psi_drift(ref, cur, ["g"], "value", n_bins=10).collect()[0]

    thr = psi_reference_thresholds(ref, ["g"], "value", n_bins=10)
    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    half = len(cur_rows) // 2
    spark.createDataFrame(cur_rows[:half], "g string, value double").write.mode(
        "append"
    ).parquet(in_dir)
    incremental_psi_buckets(spark, in_dir, ckpt, ["g"], "value", thr, state)
    spark.createDataFrame(cur_rows[half:], "g string, value double").write.mode(
        "append"
    ).parquet(in_dir)
    incremental_psi_buckets(spark, in_dir, ckpt, ["g"], "value", thr, state)
    n_epochs = len([d for d in os.listdir(state) if d.startswith("ingest_epoch=")])
    # no-new-files pass: state must not grow
    incremental_psi_buckets(spark, in_dir, ckpt, ["g"], "value", thr, state)
    assert (
        len([d for d in os.listdir(state) if d.startswith("ingest_epoch=")]) == n_epochs
    )

    ref_counts = (
        ref.join(F.broadcast(thr), ["g"])
        .groupBy(
            "g",
            (
                F.size(F.filter("__thr", lambda t: t < F.col("value").cast("double")))
                + F.lit(1)
            ).cast("int").alias("__b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__nr"))
    )
    merged = (
        ref_counts.join(read_psi_state(spark, state, ["g"]), ["g", "__b"], "full_outer")
        .select(
            "g",
            "__b",
            F.coalesce("__nr", F.lit(0)).cast("long").alias("__nr"),
            F.coalesce("__nc", F.lit(0)).cast("long").alias("__nc"),
        )
    )
    incr = psi_from_bucket_counts(merged, ["g"]).collect()[0]
    assert (incr.n_ref, incr.n_cur, incr.psi, incr.drifted) == (
        batch.n_ref,
        batch.n_cur,
        batch.psi,
        batch.drifted,
    )


def test_incremental_jsd_equals_batch_and_replays_idempotently(spark, tmp_path):
    # Category counts are additive: two ingest waves recombine to the
    # one-shot batch jsd_drift; a crash-replay of the last epoch
    # (checkpoint rolled back, same files) overwrites its own partition
    # and the answer is unchanged; a no-new-files pass adds no state.
    import os
    import shutil

    from python_mapreduce_spark.operators.aggregates import (
        jsd_drift,
        jsd_from_category_counts,
    )
    from python_mapreduce_spark.streaming.incremental import (
        incremental_category_counts,
        read_category_state,
    )
    from pyspark.sql import functions as F

    ref_rows = [(c,) for c in "aaabbc"]
    cur_rows = [(c,) for c in "abbbccd"]
    ref = spark.createDataFrame(ref_rows, "c string")
    cur = spark.createDataFrame(cur_rows, "c string")
    [batch] = jsd_drift(ref, cur, "c").collect()

    in_dir, ckpt, state = (
        str(tmp_path / "in"), str(tmp_path / "ckpt"), str(tmp_path / "state")
    )
    spark.createDataFrame(cur_rows[:3], "c string").write.mode("append").parquet(in_dir)
    incremental_category_counts(spark, in_dir, ckpt, "c", state)
    ckpt_backup = str(tmp_path / "ckpt_backup")
    shutil.copytree(ckpt, ckpt_backup)
    spark.createDataFrame(cur_rows[3:], "c string").write.mode("append").parquet(in_dir)
    incremental_category_counts(spark, in_dir, ckpt, "c", state)

    def recombined():
        ca = ref.groupBy(F.col("c").alias("__c")).agg(
            F.count(F.lit(1)).cast("long").alias("__na")
        )
        cb = read_category_state(spark, state).withColumnRenamed("__nc", "__nb")
        return jsd_from_category_counts(ca, cb).collect()[0]

    assert recombined() == batch

    # crash replay: restore the pre-wave-2 checkpoint and re-run — the
    # replayed epoch overwrites its own partition, result unchanged
    n_epochs = len([d for d in os.listdir(state) if d.startswith("ingest_epoch=")])
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_backup, ckpt)
    incremental_category_counts(spark, in_dir, ckpt, "c", state)
    assert recombined() == batch
    assert (
        len([d for d in os.listdir(state) if d.startswith("ingest_epoch=")])
        == n_epochs
    )

    # no-new-files pass: state must not grow
    incremental_category_counts(spark, in_dir, ckpt, "c", state)
    assert (
        len([d for d in os.listdir(state) if d.startswith("ingest_epoch=")])
        == n_epochs
    )


def test_incremental_kmv_state_is_bit_identical_to_batch_sketch(spark, tmp_path):
    # The KMV merge law: k smallest of the union of per-epoch k-min
    # sets == k smallest of the union of the full sets, so the
    # reconstructed estimate is BIT-IDENTICAL to a batch sketch — no
    # tolerance gate, unlike HLL. Overlapping waves must not
    # double-count.
    from python_mapreduce_spark.operators.aggregates import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    from python_mapreduce_spark.streaming.incremental import (
        incremental_kmv_sketch,
        read_kmv_estimate,
    )

    rows = [("a", i) for i in range(300)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v long")
    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    # wave 1: v < 200; wave 2: v >= 100 -> [100, 200) lands in BOTH
    df.filter(F.col("v") < 200).write.mode("append").parquet(in_dir)
    incremental_kmv_sketch(spark, in_dir, ckpt, ["g"], "v", state, k=64)
    df.filter(F.col("v") >= 100).write.mode("append").parquet(in_dir)
    incremental_kmv_sketch(spark, in_dir, ckpt, ["g"], "v", state, k=64)

    got = {
        r.g: (r.n_kmv, r.sketch_full)
        for r in read_kmv_estimate(spark, state, ["g"], k=64).collect()
    }
    batch = {
        r.g: (r.n_kmv, r.sketch_full)
        for r in kmv_distinct_estimate(
            kmv_sketch(df, "v", group_by=["g"], k=64), group_by=["g"], k=64
        ).collect()
    }
    assert got == batch  # bit-identical, not approximately equal
    assert got["b"] == (40.0, False)  # below-k group stays exact
    assert got["a"][1] is True  # 300 distinct > k: estimation engaged
    # no-new-files pass: exactly-once, state unchanged
    incremental_kmv_sketch(spark, in_dir, ckpt, ["g"], "v", state, k=64)
    again = {
        r.g: (r.n_kmv, r.sketch_full)
        for r in read_kmv_estimate(spark, state, ["g"], k=64).collect()
    }
    assert again == got


def test_incremental_lpa_equals_batch_on_union_and_tolerates_redelivery(
    spark, tmp_path
):
    # The incremental-LPA contract: after each pass the checkpointed
    # labels equal the BATCH synchronous LPA on the union of all edge
    # deltas so far (pure function of the union-additive edge set), and
    # a re-delivered edge file changes nothing.
    from python_mapreduce_spark.llm.dedup import label_propagation
    from python_mapreduce_spark.streaming.dedup import (
        incremental_label_propagation,
        read_lpa_communities,
    )

    # two cliques bridged by one edge (LPA separates them; CC would not)
    clique1 = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (3, 4)]
    clique2 = [(10, 11), (11, 12), (10, 12), (10, 13), (11, 13), (12, 13)]
    bridge = [(4, 10)]
    all_edges = clique1 + clique2 + bridge
    in_dir, ckpt, state = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )

    def frame(rows):
        return spark.createDataFrame(rows, "id1 long, id2 long")

    def communities(df):
        return {
            (r.community, r.n_nodes)
            for r in label_propagation(df, rounds=4).collect()
        }

    # wave 1: clique1 only
    frame(clique1).write.mode("append").parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    got1 = {(r.community, r.n_nodes) for r in read_lpa_communities(spark, state).collect()}
    assert got1 == communities(frame(clique1))

    # wave 2: the rest -> equals batch LPA on the union
    frame(clique2 + bridge).write.mode("append").parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    got2 = {(r.community, r.n_nodes) for r in read_lpa_communities(spark, state).collect()}
    assert got2 == communities(frame(all_edges))
    assert len(got2) == 2  # the bridge did NOT merge the cliques

    # pass with no new files: exactly-once, labels unchanged
    incremental_label_propagation(spark, in_dir, ckpt, state)
    assert {
        (r.community, r.n_nodes) for r in read_lpa_communities(spark, state).collect()
    } == got2

    # re-delivered (duplicate) edges in a NEW file: harmless — the edge
    # set is a set; also reversed orientation canonicalizes away
    frame([(b, a) for a, b in clique1]).write.mode("append").parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    assert {
        (r.community, r.n_nodes) for r in read_lpa_communities(spark, state).collect()
    } == got2

    # epoch partitions accumulated; labels carry the as_of_epoch stamp
    assert (
        len(
            [
                d
                for d in os.listdir(os.path.join(state, "edges"))
                if d.startswith("ingest_epoch=")
            ]
        )
        == 3  # the no-new-files pass ingested nothing
    )
    lab = spark.read.parquet(os.path.join(state, "labels"))
    assert set(lab.columns) == {"node", "label", "as_of_epoch"}
