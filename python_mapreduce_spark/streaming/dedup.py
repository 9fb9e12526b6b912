"""Incremental corpus deduplication: near-dup-filter NEW document files
against everything already ingested.

The production pattern for continuously-ingested training data: the
corpus accretes file-by-file (crawl drops, vendor deliveries), and each
ingest pass must decide "is this document a near-duplicate of anything
seen so far" WITHOUT re-deduping the whole corpus. The reference's
incremental contract (hold_state ledger, mapper.py:110-143) meets the
MinHash-LSH dedup pipeline (llm/dedup.py):

  * file ledger = a Structured Streaming checkpoint (AvailableNow, via
    ``incremental_pass``) — each pass reads ONLY new files, exactly once;
  * dedup state = the banded LSH keys of every seen document
    ((id, band, bkey) — a fixed ``bands`` longs per doc, independent of
    document size; 100 TB of text is ~billions of rows of 3 longs);
  * candidate generation = equi-join of the new batch's band keys
    against the state — the only corpus-sized work, and it is a hash
    join on band keys, never a scan of old text;
  * exact verification = re-read ONLY the candidate partners' text from
    the corpus store (semi-join pushdown) and compute true Jaccard, so
    precision is exact and banding only dials recall.

Replay safety: the state append is at-least-once (a crash between
append and checkpoint commit replays the batch), so candidate
generation excludes the current batch's own ids from the state side —
a replayed batch reaches the same decisions and its duplicate state
rows only cost extra (deduplicated) candidates.

Duplicate rule ("first-seen wins"): a document is a duplicate iff it
has a verified near-dup pair with an EARLIER-SEEN document — anything
in the state from prior passes, or a lower-id doc within the same
batch. Decisions for already-ingested docs are final (they were
emitted when their pass ran), so first-seen-wins is the only
consistent incremental semantics: a late-arriving doc that duplicates
an old one is the one dropped, whatever their ids. When ingest order
is monotone in id — as in the registry query, which splits the corpus
at an id threshold — first-seen-wins coincides with the batch
"canonical-min" rule (dup iff a pair with any lower-id doc), which is
exactly SQL-expressible and is what makes the operator
oracle-checkable end-to-end.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.streaming.incremental import incremental_pass


def incremental_minhash_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.8,
    fmt: str = "parquet",
    schema=None,
    output_dir: str | None = None,
) -> pd.DataFrame:
    """One incremental dedup pass over files not seen by previous passes.

    Decisions are one row per new document, ``(id, is_dup)`` —
    ``is_dup`` true iff the doc has an exact-Jaccard >= ``threshold``
    pair with an earlier-seen document (prior passes' state, or a
    lower-id doc in the same batch) — first-seen wins; see the module
    docstring for when this equals the batch canonical-min rule.
    Appends the new docs' band keys to ``state_dir`` (ALL new docs,
    duplicates included, so later chained copies still match).

    The state directory accretes one small parquet file set per pass —
    the standard small-files tax; at scale, periodically run
    ``operators.relational.compact_files(spark, state_dir, ...)``
    between passes (its recover-and-swap protocol is crash-safe).

    With ``output_dir`` the decisions are written there as parquet and
    an EMPTY pandas frame is returned — the at-scale mode (decisions
    are corpus-sized; never drive them through the driver). Each
    micro-batch writes its own hive-style partition
    ``ingest_epoch=<epoch>/`` with mode=overwrite, so a crash-replay of
    the batch overwrites the same partition instead of appending a
    second copy: the decision output is exactly-once per epoch (read
    back ``output_dir`` as partitioned parquet; ``ingest_epoch`` is the
    pass ordinal of the shared checkpoint). Without ``output_dir``,
    decisions come back as pandas — demo/test mode only.
    """
    from python_mapreduce_spark.llm.dedup import (  # noqa: PLC0415 - avoid cycle
        band_keys,
        minhash_signatures,
    )
    from python_mapreduce_spark.llm.text import shingle_sets  # noqa: PLC0415

    decisions: list[pd.DataFrame] = []

    def verify_pairs(cand: DataFrame, sets_a: DataFrame, sets_b: DataFrame) -> DataFrame:
        """Exact Jaccard on candidate (id1, id2); keeps pairs >= threshold."""
        a, b = sets_a.alias("va"), sets_b.alias("vb")
        return (
            cand.join(a, F.col("id1") == F.col("va.id"))
            .join(b, F.col("id2") == F.col("vb.id"))
            .select(
                "id1",
                "id2",
                (
                    F.size(F.array_intersect("va.shingles", "vb.shingles"))
                    / F.size(F.array_union("va.shingles", "vb.shingles"))
                ).alias("j"),
            )
            .filter(F.col("j") >= threshold)
        )

    def on_batch(batch: DataFrame, epoch: int) -> None:
        docs = batch.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        sets_new = shingle_sets(docs, "id", "text", n).localCheckpoint(eager=True)
        banded_new = band_keys(
            minhash_signatures(sets_new, num_hashes=num_hashes), bands=bands, rows=rows
        ).localCheckpoint(eager=True)
        new_ids = banded_new.select("id").distinct()

        dup_vs_old = None
        if os.path.isdir(state_dir):
            # Exclude this batch's own ids from the state side: a
            # replayed batch may already have appended them, and
            # matching a doc to itself would flag everything.
            state = (
                spark.read.parquet(state_dir)
                .join(new_ids, "id", "left_anti")
                .select(F.col("id").alias("old_id"), "band", "bkey")
            )
            cand_old = (
                banded_new.join(state, ["band", "bkey"])
                .select(F.col("old_id").alias("id1"), F.col("id").alias("id2"))
                .distinct()
            )
            # Exact verify needs the OLD partners' text: re-read only
            # them from the corpus store (semi-join pushdown on id).
            old_ids = cand_old.select(F.col("id1").alias("id")).distinct()
            corpus = spark.read.format(fmt).load(input_dir).select(
                F.col(id_col).alias("id"), F.col(text_col).alias("text")
            )
            sets_old = shingle_sets(
                corpus.join(old_ids, "id", "left_semi"), "id", "text", n
            )
            dup_vs_old = verify_pairs(cand_old, sets_old, sets_new).select(
                F.col("id2").alias("id")
            )

        # within-batch: lower id wins (same self-join as lsh_candidate_pairs)
        l, r = banded_new.alias("l"), banded_new.alias("r")
        cand_in = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bkey") == F.col("r.bkey"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
            .distinct()
        )
        dup_in_batch = verify_pairs(cand_in, sets_new, sets_new).select(
            F.col("id2").alias("id")
        )

        dups = dup_in_batch if dup_vs_old is None else dup_in_batch.unionByName(dup_vs_old)
        dups = dups.distinct().withColumn("is_dup", F.lit(True))
        out = (
            docs.select("id")
            .join(dups, "id", "left")
            .select("id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
        )
        if output_dir is not None:
            # Idempotent per-epoch partition: a replayed batch (crash
            # between this write and the checkpoint commit) overwrites
            # its own ingest_epoch=N directory rather than appending
            # duplicate decision rows — exactly-once decision output.
            out.write.mode("overwrite").parquet(
                os.path.join(output_dir, f"ingest_epoch={epoch}")
            )
        else:
            decisions.append(out.toPandas())
        # state append AFTER decisions: at-least-once, replay-tolerant
        banded_new.write.mode("append").parquet(state_dir)

    incremental_pass(
        spark, input_dir, checkpoint_dir, on_batch, fmt=fmt, schema=schema
    )
    if not decisions:
        return pd.DataFrame(columns=["id", "is_dup"])
    return pd.concat(decisions, ignore_index=True)


def incremental_label_propagation(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    *,
    src: str = "id1",
    dst: str = "id2",
    rounds: int = 4,
    fmt: str = "parquet",
    schema=None,
) -> None:
    """Incremental community detection: the graph member of the
    additive-state streaming family (HLL / KLL / top-k / PSI / JSD /
    AUC / band-key dedup). The edge stream accretes file-by-file (new
    near-dup pairs, new link deliveries); each checkpointed pass
    ingests ONLY the new edge files — canonicalized, self-loop-free,
    batch-deduped — into an idempotent ``edges/ingest_epoch=<epoch>/``
    partition of ``state_dir`` (mode=overwrite: a crash-replayed batch
    overwrites its own epoch rather than double-appending, the
    :func:`~python_mapreduce_spark.streaming.incremental.
    incremental_distinct_sketch` contract), then recomputes the
    synchronous min-tiebreak label propagation
    (:func:`~python_mapreduce_spark.llm.dedup.label_propagation`) over
    the COMPACT edge state and checkpoints the per-node labels to
    ``labels/`` — all inside the batch function, so the streaming
    checkpoint commits only after both writes landed (kill at any
    point => the pass replays and converges).

    Additivity argument: the edge SET is union-additive (the per-epoch
    partitions union to the full graph; LPA symmetrizes and dedups, so
    an edge re-delivered in a later epoch is harmless), and the fixed-
    round synchronous recompute is a pure function of that set — the
    labels after epoch N therefore equal the batch LPA on the union of
    all epochs' deltas, verbatim, which is exactly what the SQL oracle
    replays. The raw corpus is never rescanned: deriving edges from
    text (the expensive scan at 100 TB) happens once per file upstream;
    the per-epoch recompute touches only (a, b) pairs — ~billions of
    rows of 2 longs for a 100 TB corpus — and each LPA round is ONE
    equi-join + map-side-combined count agg + min(struct) argmax over
    that compact state. A warm-start (seeding from the previous epoch's
    labels) would cut rounds but break the batch-equality contract;
    this variant keeps the oracle exact.

    Read the running communities back with
    :func:`read_lpa_communities`.
    """
    edges_dir = os.path.join(state_dir, "edges")
    labels_dir = os.path.join(state_dir, "labels")

    def on_batch(batch: DataFrame, epoch: int) -> None:
        from python_mapreduce_spark.llm.dedup import label_propagation  # noqa: PLC0415

        delta = (
            batch.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"ingest_epoch={epoch}")
        )
        all_edges = spark.read.parquet(edges_dir)
        labels = label_propagation(
            all_edges, rounds=rounds, src="a", dst="b", return_labels=True
        ).withColumn("as_of_epoch", F.lit(epoch).cast("long"))
        labels.write.mode("overwrite").parquet(labels_dir)

    incremental_pass(
        spark, input_dir, checkpoint_dir, on_batch, fmt=fmt, schema=schema
    )


def read_lpa_communities(spark: SparkSession, state_dir: str) -> DataFrame:
    """Running communities from the checkpointed label state of
    :func:`incremental_label_propagation`: one row per community,
    (community, n_nodes) — only the label snapshot is read, never the
    edge state or any raw data."""
    labels = spark.read.parquet(os.path.join(state_dir, "labels"))
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def incremental_edit_distance_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "id",
    text_col: str = "s",
    max_distance: int = 1,
    q: int = 2,
    fmt: str = "parquet",
    schema=None,
    output_dir: str | None = None,
) -> pd.DataFrame:
    """Incremental Ed-Join dedup: flag each NEW string that sits within
    Levenshtein ``max_distance`` of anything already ingested — the
    typo-class sibling of :func:`incremental_minhash_dedup` (same
    ledger, same first-seen-wins rule, same replay contract), for
    name/title/key-class columns where token-set sketches are blind.

    State = the positional q-gram PREFIX of every seen string,
    ``q*d + 1`` rows per doc (plus a ``strings/`` store for exact
    verification). The prefix is taken under a FIXED global gram order
    (md5(gram), position) — not document frequency: an incremental
    prefix join is only lossless if old and new prefixes were chosen
    under the SAME total order, and df drifts as the corpus grows. Any
    fixed total order preserves the prefix principle (one edit destroys
    at most ``q`` grams, so within-d pairs share a gram inside both
    q*d+1-prefixes, at positions differing <= d); rarity ordering is
    purely a candidate-count optimization, traded here for an
    append-only state. (A periodic compaction could re-rank prefixes
    under current df; out of scope.) Strings too short to own a full
    prefix contribute every gram; strings with fewer than ``q`` chars
    have no grams at all and their qualifying partners are provably
    just as short, so a bounded short-string bucket (len <= q*d+q-1)
    pairs all-to-all through a constant-key equi-join.

    Exact verification (``F.levenshtein <= d``, whole-stage codegen)
    runs on every candidate, so the filters only prune work. Decisions
    are one row per new doc, ``(id, is_dup)``; with ``output_dir`` each
    micro-batch writes an idempotent ``ingest_epoch=N`` partition (the
    at-scale mode), else pandas comes back (demo/test mode). When
    ingest order is monotone in id, first-seen-wins coincides with the
    batch canonical-min rule (dup iff a within-d pair with any lower
    id) — exactly SQL-expressible, which is what the registry oracle
    replays. Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions).
    """
    d = int(max_distance)
    qq = int(q)
    if d < 0 or qq < 1:
        raise ValueError(f"need max_distance >= 0 and q >= 1: {max_distance}, {q}")
    plen = qq * d + 1
    short_len = qq * d + qq - 1
    prefix_dir = os.path.join(state_dir, "prefix")
    strings_dir = os.path.join(state_dir, "strings")
    decisions: list[pd.DataFrame] = []

    def md5_prefix(src: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window as _W  # noqa: PLC0415

        grams = src.select(
            "id",
            "len",
            F.explode(
                F.expr(
                    f"CASE WHEN length(s) >= {qq} THEN "
                    f"transform(sequence(1, length(s) - {qq} + 1), "
                    f"i -> struct(substring(s, i, {qq}) AS g, i AS pos)) "
                    f"ELSE array() END"
                )
            ).alias("t"),
        ).select("id", "len", F.col("t.g").alias("g"), F.col("t.pos").alias("pos"))
        return (
            grams.withColumn(
                "__rn",
                F.row_number().over(
                    _W.partitionBy("id").orderBy(
                        F.md5("g").asc(), F.col("pos").asc()
                    )
                ),
            )
            .filter(F.col("__rn") <= plen)
            .select("id", "len", "g", "pos")
        )

    def verify(cand: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
        """Exact levenshtein screen; keeps (id1, id2) within d."""
        v1 = left.select(F.col("id").alias("id1"), F.col("s").alias("__s1"))
        v2 = right.select(F.col("id").alias("id2"), F.col("s").alias("__s2"))
        return (
            cand.join(v1, "id1")
            .join(v2, "id2")
            .filter(F.levenshtein("__s1", "__s2") <= d)
            .select("id1", "id2")
        )

    def on_batch(batch: DataFrame, epoch: int) -> None:
        docs = (
            batch.select(
                F.col(id_col).cast("long").alias("id"),
                F.coalesce(F.col(text_col), F.lit("")).alias("s"),
            )
            .withColumn("len", F.length("s"))
            .localCheckpoint(eager=True)
        )
        pref_new = md5_prefix(docs).localCheckpoint(eager=True)
        new_ids = docs.select("id").distinct()

        dup_vs_old = None
        if os.path.isdir(prefix_dir):
            # Exclude this batch's own ids from the state side: a
            # replayed batch may already have appended them.
            state_pref = (
                spark.read.parquet(prefix_dir)
                .join(new_ids, "id", "left_anti")
                .select(
                    F.col("id").alias("old_id"),
                    F.col("len").alias("old_len"),
                    F.col("g").alias("old_g"),
                    F.col("pos").alias("old_pos"),
                )
            )
            cand_old = (
                pref_new.join(
                    state_pref,
                    (F.col("g") == F.col("old_g"))
                    & (F.abs(F.col("pos") - F.col("old_pos")) <= d)
                    & (F.abs(F.col("len") - F.col("old_len")) <= d),
                )
                .select(F.col("old_id").alias("id1"), F.col("id").alias("id2"))
                .distinct()
            )
            old_strings = (
                spark.read.parquet(strings_dir)
                .join(new_ids, "id", "left_anti")
                .select("id", "s", "len")
            )
            # short residue: sub-q-gram strings pair only with strings
            # just as short — a bounded constant-key bucket
            sb_new = docs.filter(F.col("len") <= short_len).withColumn("__k", F.lit(1))
            sb_old = old_strings.filter(F.col("len") <= short_len).withColumn(
                "__k", F.lit(1)
            )
            cand_short_old = (
                sb_new.alias("nb")
                .join(sb_old.alias("ob"), F.col("nb.__k") == F.col("ob.__k"))
                .select(F.col("ob.id").alias("id1"), F.col("nb.id").alias("id2"))
            )
            dup_vs_old = verify(
                cand_old.unionByName(cand_short_old).distinct(), old_strings, docs
            ).select(F.col("id2").alias("id"))

        # within-batch: lower id wins (canonical-min rule)
        l, r = pref_new.alias("l"), pref_new.alias("r")
        cand_in = (
            l.join(
                r,
                (F.col("l.g") == F.col("r.g"))
                & (F.col("l.id") < F.col("r.id"))
                & (F.abs(F.col("l.pos") - F.col("r.pos")) <= d)
                & (F.abs(F.col("l.len") - F.col("r.len")) <= d),
            )
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        )
        sb = docs.filter(F.col("len") <= short_len).withColumn("__k", F.lit(1))
        cand_short_in = (
            sb.alias("a")
            .join(
                sb.alias("b"),
                (F.col("a.__k") == F.col("b.__k")) & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        )
        dup_in_batch = verify(
            cand_in.unionByName(cand_short_in).distinct(), docs, docs
        ).select(F.col("id2").alias("id"))

        dups = (
            dup_in_batch
            if dup_vs_old is None
            else dup_in_batch.unionByName(dup_vs_old)
        )
        dups = dups.distinct().withColumn("is_dup", F.lit(True))
        out = (
            docs.select("id")
            .join(dups, "id", "left")
            .select("id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
        )
        if output_dir is not None:
            out.write.mode("overwrite").parquet(
                os.path.join(output_dir, f"ingest_epoch={epoch}")
            )
        else:
            decisions.append(out.toPandas())
        # state append AFTER decisions: at-least-once, replay-tolerant
        pref_new.write.mode("append").parquet(prefix_dir)
        docs.select("id", "s", "len").write.mode("append").parquet(strings_dir)

    incremental_pass(
        spark, input_dir, checkpoint_dir, on_batch, fmt=fmt, schema=schema
    )
    if not decisions:
        return pd.DataFrame(columns=["id", "is_dup"])
    return pd.concat(decisions, ignore_index=True)
