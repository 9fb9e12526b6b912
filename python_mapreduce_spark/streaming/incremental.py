"""Incremental file ingestion + streaming execution helpers.

Batch-incremental runs use ``Trigger.AvailableNow``: process everything
new since the checkpoint, then stop — the reference's "run the job again,
skip files we've seen" loop (mapper.py:116-143) with exactly-once
semantics instead of the delete-then-rewrite ledger that can lose data on
crash.
"""

from __future__ import annotations

import os
from python_mapreduce_spark.scratch import scratch_dir
import uuid
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stream(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema=None,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Checkpointable file-source stream over a directory.

    The streaming file source only accepts directories; to stream a
    single file, pass its parent as ``path`` and the filename as
    ``glob``. Schema is mandatory for streaming sources; default to the
    batch reader's schema of the same path (one footer read). At scale,
    ``maxFilesPerTrigger`` bounds per-micro-batch work.
    """
    if schema is None:
        batch = spark.read.format(fmt)
        if glob:
            batch = batch.option("pathGlobFilter", glob)
        schema = batch.load(path).schema
    reader = spark.readStream.format(fmt).schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Same ts normalization as sources.readers.load_table (nanos longs
    or TIMESTAMP_NTZ -> session-TZ TimestampType), for streaming frames."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        from python_mapreduce_spark.sources.readers import (  # noqa: PLC0415
            require_utc_session,
        )

        require_utc_session(df.sparkSession)
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def run_stream_to_memory(
    stream_df: DataFrame,
    *,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
    name: str | None = None,
) -> DataFrame:
    """Run a streaming frame to completion (AvailableNow) into a memory
    sink; return the result as a batch DataFrame.

    Memory sinks are for tests/verification — production sinks are files/
    tables via the same writeStream with a durable format.
    """
    spark = stream_df.sparkSession
    qname = name or f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = checkpoint_dir or scratch_dir("ckpt")
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def incremental_pass(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    *,
    fmt: str = "parquet",
    schema=None,
) -> None:
    """One incremental run: process ONLY files not seen by previous passes
    against the same checkpoint (exactly-once per file), via foreachBatch.

    This is the reference's hold_state loop (mapper.py:110-143) made
    crash-safe: the checkpoint commits after the batch function succeeds,
    so a kill between read and write re-processes instead of losing data.
    """
    stream = file_stream(spark, input_dir, fmt=fmt, schema=schema)
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_parquet(
    spark: SparkSession,
    input_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    key: str | list[str],
    *,
    order_col: str | None = None,
    fmt: str = "parquet",
    schema=None,
) -> None:
    """Streaming MERGE sink: each micro-batch of corrections upserts into
    a parquet target. The same-key survivor is chosen deterministically:
    with ``order_col`` (a version/timestamp column) the row with the
    greatest order value wins — ACROSS the target and the batch, not
    just within the batch, so a late-arriving stale revision can never
    regress a newer target row (conditional-MERGE semantics: WHEN
    MATCHED AND batch.order > target.order). Ties break
    lexicographically over the remaining columns. Without ``order_col``,
    batch rows replace same-key target rows unconditionally
    (operators/relational.py::upsert, last-writer-wins) and the within-
    batch survivor is the lexicographic max over the struct of non-key
    columns IN THEIR EXISTING ORDER — deterministic and replay-stable,
    but column-order-dependent and unrelated to any revision semantics,
    so pass ``order_col`` for corrections streams where "latest wins"
    matters.

    The production late-corrections pattern: a stream of record
    revisions lands in ``input_dir``; the target stays a plain parquet
    dataset any engine can read. foreachBatch + checkpoint give
    exactly-once per input file. The target rewrite is write-to-temp
    then a two-rename swap; the swap itself is NOT atomic, so every
    batch starts with crash recovery: if a previous run died between the
    two renames (``__upsert_old`` present, target missing) the old
    target is restored first, and stale ``__upsert_tmp``/``__upsert_old``
    are cleared before swapping. Combined with checkpoint replay +
    deterministic per-batch dedup, a crash at any point converges to the
    correct target on restart.

    At 100 TB, pair with a partitioned target and rewrite only affected
    partitions; here the whole-dataset rewrite keeps the demo honest and
    small.
    """
    from python_mapreduce_spark.operators.relational import (  # noqa: PLC0415
        recover_and_clear_swap,
        swap_into,
        upsert,
    )

    keys = [key] if isinstance(key, str) else list(key)
    # Build the stream once: its schema serves the eager order_col
    # validation AND the foreachBatch run (schema=None would otherwise
    # trigger a second inference read inside incremental_pass). A bad
    # column raised here surfaces plainly instead of wrapped in a
    # StreamingQueryException from inside foreachBatch.
    stream = file_stream(spark, input_dir, fmt=fmt, schema=schema)
    if order_col is not None and (order_col in keys or order_col not in stream.columns):
        raise ValueError(
            f"order_col {order_col!r} must be a non-key input column "
            f"(keys={keys}, columns={stream.columns})"
        )
    tmp = f"{target_dir.rstrip('/')}__upsert_tmp"
    old = f"{target_dir.rstrip('/')}__upsert_old"

    def dedup_latest(batch: DataFrame) -> DataFrame:
        # Deterministic same-key survivor: max of a struct whose leading
        # field is order_col (when given, validated above), so the
        # latest revision wins and lexicographic comparison of the
        # remaining columns only breaks exact ties. dropDuplicates would
        # pick an arbitrary row, so a replayed batch could pick a
        # different survivor.
        vals = [c for c in batch.columns if c not in keys]
        if not vals:
            return batch.dropDuplicates(keys)
        ranked = vals
        if order_col is not None:
            ranked = [order_col, *[c for c in vals if c != order_col]]
        picked = batch.groupBy(*keys).agg(F.max(F.struct(*ranked)).alias("_v"))
        return picked.select(*keys, *[F.col(f"_v.{c}").alias(c) for c in vals])

    def on_batch(batch: DataFrame, _epoch: int) -> None:
        recover_and_clear_swap(target_dir, tmp, old)
        batch = dedup_latest(batch)
        if os.path.isdir(target_dir):
            current = spark.read.parquet(target_dir)
            if order_col is not None:
                # Conditional merge: the greatest order value wins
                # whether it sits in the target or the batch — a stale
                # late arrival cannot regress a newer target row.
                merged = dedup_latest(
                    current.select(*batch.columns).unionByName(batch)
                )
            else:
                merged = upsert(current, batch, keys)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(tmp)
        swap_into(target_dir, tmp, old)

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_distinct_sketch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    state_dir: str,
    *,
    lgk: int = 12,
) -> None:
    """Incremental DISTINCT cardinality via mergeable HLL sketch state:
    each checkpointed pass sketches ONLY its new files and writes the
    per-key sketch binaries into an ``ingest_epoch=<epoch>/`` partition
    of ``state_dir`` (mode=overwrite — crash-replay overwrites rather
    than double-appends, exactly-once per epoch, same contract as
    :func:`collect_incremental_counts`).

    count/sum partials are additive, so the incremental-counts path
    recombines them with SUM; distinct is NOT additive — re-counting a
    user seen in an earlier epoch must not increment the total. HLL
    register max-merge restores additivity: union of all epochs' sketch
    state equals (within the lgk error bound) a sketch over all data
    ever ingested, and the state is a fixed ~2^lgk bytes per key per
    epoch regardless of data volume — the at-scale shape for "distinct
    users ever seen" over an unbounded ingest. Read the running
    estimate back with :func:`read_distinct_estimate`.
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        agg = (
            normalize_event_ts(batch)
            .groupBy(*keys)
            .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"))
        )
        agg.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_distinct_estimate(
    spark: SparkSession, state_dir: str, keys: list[str]
) -> DataFrame:
    """Union the per-epoch sketch state of
    :func:`incremental_distinct_sketch` into the running per-key
    distinct estimate. Only fixed-size sketch binaries are read and
    merged — the raw data is never rescanned."""
    state = spark.read.parquet(state_dir)
    return state.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct")
    )


def incremental_kmv_sketch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    state_dir: str,
    *,
    k: int = 256,
) -> None:
    """Incremental distinct cardinality via KMV (k-minimum-values)
    state — the deterministic sibling of
    :func:`incremental_distinct_sketch`: each checkpointed pass
    sketches ONLY its new files (the k smallest 60-bit md5 hashes of
    the distinct values per key,
    :func:`~python_mapreduce_spark.operators.aggregates.kmv_sketch`)
    into an idempotent ``ingest_epoch=<epoch>/`` partition of
    ``state_dir``.

    The KMV merge law makes the state additive: the k smallest of the
    UNION of per-epoch k-min sets equal the k smallest of the union of
    the full value sets (any hash in the true union's k-min is
    necessarily within its own epoch's k-min), so
    :func:`read_kmv_estimate` reconstructs exactly the sketch a batch
    pass over all data would build — re-counting a value seen in an
    earlier epoch is idempotent by set union. Two advantages over the
    HLL path: the running estimate is a PURE FUNCTION of the value set
    (bit-replayable by an ANSI oracle — no tolerance gate), and the
    per-key states support set operations
    (:func:`~python_mapreduce_spark.operators.aggregates.
    kmv_intersect_estimate`) that HLL registers cannot express. State
    cost: at most k longs per key per epoch.
    """
    from python_mapreduce_spark.operators.aggregates import kmv_sketch  # noqa: PLC0415

    def on_batch(batch: DataFrame, epoch: int) -> None:
        sk = kmv_sketch(normalize_event_ts(batch), value_col, group_by=keys, k=k)
        sk.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_kmv_estimate(
    spark: SparkSession, state_dir: str, keys: list[str], *, k: int = 256
) -> DataFrame:
    """Running distinct estimate from :func:`incremental_kmv_sketch`
    state: union the per-epoch sketch rows, keep the k smallest distinct
    hashes per key (the KMV merge), and estimate — only fixed-size
    sketch rows are read; the raw data is never rescanned. Identical,
    bit-for-bit, to a batch sketch over everything ever ingested."""
    from python_mapreduce_spark.operators.aggregates import (  # noqa: PLC0415
        kmv_distinct_estimate,
    )
    from python_mapreduce_spark.operators.windows import topk_per_group  # noqa: PLC0415

    state = spark.read.parquet(state_dir).select(*keys, "h").distinct()
    merged = topk_per_group(state, keys, [F.col("h").asc()], k).drop("rn")
    return kmv_distinct_estimate(merged, group_by=keys, k=k)


def collect_incremental_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    *,
    output_dir: str | None = None,
) -> pd.DataFrame:
    """Run one incremental pass aggregating count+sum per key; the
    partial aggregate covers THIS pass's new files (additive with prior
    passes — the f(A+B) = f(A)+f(B) contract, README.txt:18).

    With ``output_dir`` the partials are written as parquet into a
    hive-style ``ingest_epoch=<epoch>/`` partition (mode=overwrite, so a
    crash-replay of the batch overwrites rather than double-appends —
    exactly-once per epoch) and an EMPTY frame is returned; summing the
    read-back partitions gives the running total without any partial
    ever visiting the driver — the at-scale mode for high-cardinality
    keys. Without it, partials come back as pandas (keys are
    contract-small: event types, dates)."""
    parts: list[pd.DataFrame] = []

    def on_batch(batch: DataFrame, epoch: int) -> None:
        agg = (
            normalize_event_ts(batch)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s"))
        )
        if output_dir is not None:
            agg.write.mode("overwrite").parquet(
                os.path.join(output_dir, f"ingest_epoch={epoch}")
            )
        else:
            parts.append(agg.toPandas())

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)
    if not parts:
        return pd.DataFrame(columns=[*keys, "n", "s"])
    return pd.concat(parts, ignore_index=True)


def incremental_contamination(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    eval_set: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> None:
    """Incremental benchmark-contamination audit: each checkpointed pass
    audits ONLY newly ingested corpus files for word-n-gram overlap
    against the (benchmark-sized, broadcast) ``eval_set``, writing the
    per-document overlap rows into an idempotent
    ``ingest_epoch=<epoch>/`` partition of ``out_dir`` (mode=overwrite
    — crash-replay overwrites rather than double-appends, exactly-once
    per epoch, the same contract as :func:`collect_incremental_counts`).

    Contamination is a PER-DOCUMENT property, so the union of the epoch
    partitions IS the running audit: new epochs append new documents'
    rows and nothing already audited is ever rescanned — the at-scale
    shape for "audit the corpus as it lands" over an unbounded ingest
    (contrast the distinct-cardinality case, which needs mergeable
    sketch state because its aggregate is NOT additive). The batch-side
    algorithm is llm/text.py::ngram_contamination unchanged: eval
    n-grams broadcast, each new file scanned once, never shuffled on
    text.
    """
    from python_mapreduce_spark.llm.text import ngram_contamination  # noqa: PLC0415

    def on_batch(batch: DataFrame, epoch: int) -> None:
        out = ngram_contamination(batch, eval_set, id_col, text_col, n)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def incremental_topk_sketch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    item_expr: str,
    state_dir: str,
    *,
    max_items: int = 1024,
) -> None:
    """Incremental heavy-hitters via mergeable frequent-items sketch
    state: each checkpointed pass sketches ONLY its new files
    (``approx_top_k_accumulate`` over ``item_expr``, a SQL expression)
    and writes the per-key sketch states into an idempotent
    ``ingest_epoch=<epoch>/`` partition of ``state_dir`` — the same
    exactly-once-per-epoch contract as
    :func:`incremental_distinct_sketch`.

    Why sketch state and not per-epoch top-k rows: item counts ARE
    additive, but top-k of the union is NOT the union of per-epoch
    top-ks — an item globally heavy yet never locally top-k would
    vanish from row-level partials. The sketch state tracks the full
    (bounded) item universe per epoch, so combining states across
    epochs recovers the true running heavy hitters; within
    ``max_items`` distinct items the counts are exact. Read the
    running top-k back with :func:`read_topk_estimate`.
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        agg = (
            normalize_event_ts(batch)
            .groupBy(*keys)
            .agg(
                F.expr(
                    f"approx_top_k_accumulate({item_expr}, {int(max_items)})"
                ).alias("state")
            )
        )
        agg.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_topk_estimate(
    spark: SparkSession,
    state_dir: str,
    keys: list[str],
    *,
    k: int = 5,
    max_items: int = 1024,
) -> DataFrame:
    """Combine the per-epoch sketch state of
    :func:`incremental_topk_sketch` into the running per-key top-k:
    (keys..., rank, item, est_count) ranked by (count DESC, item ASC) —
    the same deterministic total order as
    operators/aggregates.py::sketch_topk_rollup. Only fixed-size sketch
    states are read and combined; raw data is never rescanned."""
    from pyspark.sql import Window  # noqa: PLC0415

    state = spark.read.parquet(state_dir)
    merged = state.groupBy(*keys).agg(
        F.expr(f"approx_top_k_combine(state, {int(max_items)})").alias("__comb")
    )
    est = merged.select(
        *keys,
        F.explode(F.expr(f"approx_top_k_estimate(__comb, {int(max_items)})")).alias("__e"),
    ).select(*keys, F.col("__e.item").alias("item"), F.col("__e.count").alias("est_count"))
    w = Window.partitionBy(*keys).orderBy(F.desc("est_count"), F.asc("item"))
    return (
        est.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rank", "item", "est_count")
    )


def incremental_quantile_sketch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    state_dir: str,
    *,
    k: int = 200,
) -> None:
    """Incremental quantiles via mergeable KLL sketch state — the third
    member of the incremental-sketch triad (:func:`incremental_distinct_sketch`
    for distincts, :func:`incremental_topk_sketch` for heavy hitters):
    each checkpointed pass sketches ONLY its new files
    (``kll_sketch_agg_double``) into an idempotent
    ``ingest_epoch=<epoch>/`` partition of ``state_dir``.

    Quantiles are the canonical non-additive aggregate — there is no
    row-level partial that recombines into a median — but KLL states
    merge losslessly within the sketch's rank-error bound (~1.65% at
    k=200), so the merged state over all epochs answers any quantile
    over everything ever ingested without rescanning raw data. Read
    back with :func:`read_quantile_estimate`. KLL compaction is
    randomized: estimates vary slightly run-to-run; verify by RANK, not
    equality (see operators/aggregates.py::sketch_quantile_rollup).
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        agg = (
            normalize_event_ts(batch)
            .select(*keys, F.col(value_col).cast("double").alias("__v"))
            .groupBy(*keys)
            .agg(F.expr(f"kll_sketch_agg_double(__v, {int(k)})").alias("sketch"))
        )
        agg.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_quantile_estimate(
    spark: SparkSession,
    state_dir: str,
    keys: list[str],
    *,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    k: int = 200,
) -> DataFrame:
    """Merge the per-epoch KLL state of
    :func:`incremental_quantile_sketch` into running per-key quantile
    estimates (keys..., q_<p>...). Only fixed-size sketch binaries are
    read and merged; raw data is never rescanned."""
    state = spark.read.parquet(state_dir)
    merged = state.groupBy(*keys).agg(
        F.expr(f"kll_merge_agg_double(sketch, {int(k)})").alias("__m")
    )
    qcols = [
        F.expr(f"kll_sketch_get_quantile_double(__m, CAST({p} AS DOUBLE))").alias(
            f"q_{str(p).replace('.', '')}"
        )
        for p in probs
    ]
    return merged.select(*keys, *qcols)


def incremental_psi_buckets(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    thresholds: DataFrame,
    state_dir: str,
) -> None:
    """Incremental distribution-drift state: each checkpointed pass
    buckets ONLY newly ingested files against the PINNED reference
    decile ``thresholds`` (``operators/aggregates.py::
    psi_reference_thresholds`` — the monitor's fixed yardstick,
    broadcast) and writes the per-(key, bucket) counts into an
    idempotent ``ingest_epoch=<epoch>/`` partition of ``state_dir``
    (mode=overwrite — crash-replay overwrites, exactly-once per epoch,
    the family contract). Bucket counts are ADDITIVE, so the running
    current-side histogram is a plain SUM over the epoch partitions —
    PSI against the reference recomputes from fist-sized state without
    ever rescanning old epochs (read back with :func:`read_psi_state`
    + ``psi_from_bucket_counts``). This is the epoch-over-epoch corpus
    drift monitor of a continuously-ingesting training pipeline.
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        v = F.col(value_col).cast("double")
        bucket = (F.size(F.filter("__thr", lambda t: t < v)) + F.lit(1)).cast("int")
        counts = (
            normalize_event_ts(batch)
            .filter(F.col(value_col).isNotNull())
            .join(F.broadcast(thresholds), keys)
            .groupBy(*keys, bucket.alias("__b"))
            .agg(F.count(F.lit(1)).cast("long").alias("__nc"))
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_psi_state(spark: SparkSession, state_dir: str, keys: list[str]) -> DataFrame:
    """Sum the per-epoch bucket partitions back to the running
    current-side histogram (keys..., __b, __nc) — the additive
    recombination :func:`incremental_psi_buckets` is designed around."""
    return (
        spark.read.parquet(state_dir)
        .groupBy(*keys, "__b")
        .agg(F.sum("__nc").cast("long").alias("__nc"))
    )


def incremental_category_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    cat_col: str,
    state_dir: str,
) -> None:
    """Incremental CATEGORICAL-drift state: each checkpointed pass
    counts ONLY newly ingested files per category (NULL categories
    included as their own row) and writes the counts into an idempotent
    ``ingest_epoch=<epoch>/`` partition of ``state_dir``
    (mode=overwrite — crash-replay overwrites, exactly-once per epoch,
    the family contract). Category counts are ADDITIVE, so the running
    current-side distribution is a plain SUM over epoch partitions and
    JSD against any pinned reference snapshot recomputes from
    alphabet-sized state without rescanning old epochs (read back with
    :func:`read_category_state` +
    ``operators/aggregates.py::jsd_from_category_counts``). The
    categorical companion of :func:`incremental_psi_buckets`.
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        counts = (
            normalize_event_ts(batch)
            .groupBy(F.col(cat_col).alias("__c"))
            .agg(F.count(F.lit(1)).cast("long").alias("__nc"))
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_category_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Sum the per-epoch category partitions back to the running
    current-side counts (__c, __nc) — the additive recombination
    :func:`incremental_category_counts` is designed around."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("__c")
        .agg(F.sum("__nc").cast("long").alias("__nc"))
    )


def incremental_score_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    score_expr,
    label_expr,
    state_dir: str,
) -> None:
    """Incremental MODEL-EVAL state: each checkpointed pass reduces ONLY
    newly ingested files to per-distinct-score (positive, negative)
    counts — the sufficient statistics of the rank-identity ROC AUC —
    and writes them into an idempotent ``ingest_epoch=<epoch>/``
    partition of ``state_dir`` (mode=overwrite — crash-replay
    overwrites, exactly-once per epoch, the family contract). The
    counts are ADDITIVE, so a continuously-evaluated model's AUC (and
    PR curve: the same counts drive
    ``operators/aggregates.py::pr_curve``'s plan) recomputes from
    score-cardinality-sized state without rescanning old epochs — read
    back with :func:`read_score_counts` +
    ``operators/aggregates.py::auc_from_score_counts``. The eval
    companion of :func:`incremental_psi_buckets`.

    ``score_expr`` / ``label_expr`` are Columns (or names) evaluated on
    each batch; rows with a NULL score or label are excluded, matching
    ``auc_score``.
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        s = F.col(score_expr) if isinstance(score_expr, str) else score_expr
        y = F.col(label_expr) if isinstance(label_expr, str) else label_expr
        counts = (
            normalize_event_ts(batch)
            .select(
                s.cast("double").alias("__s"), y.cast("boolean").alias("__y")
            )
            .filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
            .groupBy("__s")
            .agg(
                F.sum(F.col("__y").cast("long")).cast("long").alias("__p"),
                F.sum((~F.col("__y")).cast("long")).cast("long").alias("__n"),
            )
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"ingest_epoch={epoch}")
        )

    incremental_pass(spark, input_dir, checkpoint_dir, on_batch)


def read_score_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Sum the per-epoch score-count partitions back to the running
    (__s, __p, __n) frame — the additive recombination
    :func:`incremental_score_counts` is designed around."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("__s")
        .agg(
            F.sum("__p").cast("long").alias("__p"),
            F.sum("__n").cast("long").alias("__n"),
        )
    )
