"""Window / analytic operators.

Reference equivalent: none as operators. The reference's reduce sees each
key's rows as one sorted group (key-then-value order from the merged runs,
disk_sort.py:55-66), and users hand-roll rank/lag/cumsum loops inside the
reduce function (SURVEY.md §2.2 "Window functions"). Spark's window exec
runs the same partition-sorted scan — one shuffle on the partition key,
then a streaming pass — but declaratively, with frames, and fused into
whole-stage codegen.

Every helper takes explicit total-order tiebreaks: at 100 TB, duplicate
order keys are a certainty and nondeterministic window output is a
correctness bug, not a nuisance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def _win(keys: Sequence[str], order: Sequence[Column]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*order)


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-k rows per group via row_number (reference: user reduce keeps
    top-k while iterating the sorted group).

    Catalyst plans a partial top-k per partition before the shuffle
    (WindowGroupLimit), so only k rows per group per input partition
    move — the map-side combine the reference lacks.
    """
    return (
        df.withColumn(rank_col, F.row_number().over(_win(keys, order)))
        .filter(F.col(rank_col) <= k)
    )


def running_agg(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    agg_col: str | Column,
    out: str = "running",
    fn=F.sum,
) -> DataFrame:
    """Cumulative aggregate over the ordered group (reference: cumsum
    hand-loop in reduce)."""
    w = _win(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, fn(agg_col).over(w))


def lag_delta(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    col: str,
    out: str = "delta",
) -> DataFrame:
    """Difference from the previous row in the ordered group."""
    w = _win(keys, order)
    return df.withColumn(out, F.col(col) - F.lag(col, 1).over(w))


def moving_avg(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    col: str,
    window_rows: int,
    out: str = "mavg",
) -> DataFrame:
    """Trailing N-row moving average."""
    w = _win(keys, order).rowsBetween(-(window_rows - 1), Window.currentRow)
    return df.withColumn(out, F.avg(col).over(w))


def global_row_number(
    df: DataFrame,
    order: Sequence[str],
    *,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row_number over a total order — the 100 TB form
    of ``Window.orderBy(...)`` (which funnels every row through ONE task).

    Range-repartition on the order keys (Spark samples split points, so
    partitions are balanced), sort within partitions, then number each
    partition locally and add the broadcast prefix sum of partition
    counts. The only driver-side data is one count per partition.

    ``order`` must be a total order (append a unique tiebreak column) or
    numbering is nondeterministic at duplicate keys — same contract as
    every helper in this module.

    The extra counting pass re-executes the upstream plan; at scale,
    cache/checkpoint the input if it is expensive to recompute (the
    alternative — a single-partition window — does not scale at all).

    The range-partitioned input is materialized ONCE (localCheckpoint)
    before the two passes: Spark's range exchange draws a fresh random
    sample per job, so re-executing the plan for the counting pass and
    the numbering pass lands rows in DIFFERENT partitions and corrupts
    the offsets (observed at sf0.1: ranks shifted by a partition's worth
    of drift; sf0.01 only passed because the sample covered every row).
    Checkpoint storage is executor memory-and-disk — the same volume a
    shuffle write costs. Split-point randomness never affects the
    OUTPUT: the total order makes row numbers independent of where
    partition boundaries fall.
    """
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order])
        .sortWithinPartitions(*order)
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in parts.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    # monotonically_increasing_id() == (partition_id << 33) + row index
    # within the partition, assigned in partition order — which IS the
    # sort order after sortWithinPartitions. Decomposing it gives the
    # local rank with zero extra shuffles and no Window at all; the
    # broadcast offset map turns it global. (The second-best formulation
    # — a Window.partitionBy(partition_id) — re-shuffles the whole table
    # on partition id because range partitioning doesn't satisfy the
    # window's hash-clustering requirement; measured: 2 Exchanges vs 1.)
    mid = F.monotonically_increasing_id()
    local_ix = mid.bitwiseAND(F.lit((1 << 33) - 1))
    pid_col = F.shiftrightunsigned(mid, 33).cast("int")
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), pid_col
    )
    return parts.withColumn(
        out, (local_ix + F.coalesce(offset_expr, F.lit(0)) + 1).cast("long")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    salt: str = "",
    out: str = "shuffle_order",
) -> DataFrame:
    """Reproducible pseudo-random global ordering: rank every row by
    ``md5(id || salt)`` (tie-broken by id) — the corpus-shuffle step a
    training pipeline runs before sequence packing, with an auditable
    order instead of RNG state. Re-runs reproduce the same permutation;
    changing the salt re-deals it per epoch. Beyond the reference
    surface (SURVEY.md §2.2 north-star extensions).

    Built on :func:`global_row_number`, so the ordering is a range
    exchange + per-partition numbering + broadcast prefix offsets — no
    single-task window at any scale. The md5 sort key is uniform, so
    the range partitions are balanced by construction.
    """
    keyed = df.withColumn(
        "__shufkey", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    )
    return global_row_number(keyed, ["__shufkey", id_col], out=out).drop("__shufkey")


def global_running_sum(
    df: DataFrame,
    order: Sequence[str],
    weight_col: str | Sequence[str],
    *,
    out: str | Sequence[str] = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global running sum of one or more integral columns
    over a total order — the 100 TB form of ``SUM() OVER (ORDER BY
    ...)``, which as a plain window funnels the whole table through ONE
    task. Passing a list of weight columns (with a matching list of
    ``out`` names) computes all the running sums in the SAME single
    range exchange + window pass — this is how two-sided statistics
    (:func:`~python_mapreduce_spark.operators.aggregates.ks_statistic`)
    carry both sides' cumulative counts without bit-packing them into
    one long (exact for each side up to 2^63 rows, not 2^31).

    Same scheme as :func:`global_row_number`: range-repartition on the
    order keys (balanced via sampled split points), materialize ONCE
    (localCheckpoint — the range sample is redrawn per job, so the
    offset pass and the sum pass must see identical partitioning), then
    one tiny driver-side pass collects per-partition weight totals whose
    exclusive prefix sums become broadcast offsets. The running sum
    within each partition is a window keyed on the partition id — every
    window partition is one bounded range partition, so no single-task
    hotspot exists anywhere in the plan, and the whole computation stays
    JVM-side.

    ``order`` must be a total order (unique tiebreak) — module contract.
    """
    cols = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    outs = [out] if isinstance(out, str) else list(out)
    if len(cols) != len(outs):
        raise ValueError(f"weight_col/out arity mismatch: {cols} vs {outs}")
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order])
        .sortWithinPartitions(*order)
        .localCheckpoint(eager=True)
    )
    psums = sorted(
        (r["__pid"], tuple(r[f"s{i}"] for i in range(len(cols))))
        for r in parts.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(*[F.sum(c).alias(f"s{i}") for i, c in enumerate(cols)])
        .collect()
    )
    offsets: dict[int, tuple[int, ...]] = {}
    acc = [0] * len(cols)
    for pid, sums in psums:
        offsets[pid] = tuple(acc)
        for i, s_ in enumerate(sums):
            acc[i] += int(s_ or 0)
    tagged = parts.withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for i, (c, o) in enumerate(zip(cols, outs)):
        offset_expr = F.element_at(
            F.create_map(*[F.lit(x) for pid, t in offsets.items() for x in (pid, t[i])]),
            F.col("__pid"),
        )
        tagged = tagged.withColumn(
            o, (F.sum(c).over(w) + F.coalesce(offset_expr, F.lit(0))).cast("long")
        )
    return tagged.drop("__pid")


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    order: Sequence[Column],
    gap_ms: int,
    out: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_ms``.

    Two streaming windows over one shuffle: lag to find gaps, cumulative
    sum of new-session flags to number sessions. Millisecond integer math
    (unix_millis) keeps it exact — no float timestamps.
    """
    w = _win(keys, order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_millis(F.col(ts)) - F.unix_millis(F.lag(ts, 1).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    return df.withColumn("__new_session", is_new).withColumn(
        out, F.sum("__new_session").over(wrun)
    ).drop("__new_session")


def resample_locf(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    interval_seconds: int,
) -> DataFrame:
    """Time-series resample with gap filling: bucket each key's values
    onto a regular ``interval_seconds`` grid (last observation in each
    bucket wins), generate the FULL grid between that key's first and
    last bucket, and forward-fill empty buckets with the last observed
    value (LOCF) — the hypertable ``time_bucket_gapfill + locf``
    operation for sensor/metric streams with missing intervals.

    Returns (keys..., bucket_ts, value, filled) where ``filled`` marks
    carried-forward rows. Leading buckets before a key's first
    observation cannot exist (the grid starts at the first observed
    bucket), so ``value`` is never NULL in the output.

    Plan shape: bucket-last is one (key, bucket)-keyed aggregation
    (max_by struct, map-side combined); the per-key grid comes from a
    sequence() explode of the key's 1-row (min, max) span — rows
    generated distributed, proportional to the OUTPUT size, never a
    driver loop; the forward fill is a last(ignorenulls) window
    partitioned BY KEY (never a single partition). Dense grids from
    sparse keys are the output's cost, not a shuffle amplification —
    only (key, bucket, value) rows move.
    """
    if interval_seconds <= 0:
        raise ValueError(f"interval_seconds must be positive: {interval_seconds}")
    step = int(interval_seconds)
    ks = list(keys)
    # millisecond-exact event order (unix_millis truncates micros the
    # same way in any engine); bucket = epoch-ms integer-divided onto
    # the grid, expressed in seconds for the output timestamp
    ms = F.unix_millis(F.col(ts_col))
    bucket = (F.floor(ms / F.lit(step * 1000)) * step).cast("long")
    # last observation per (key, bucket): max over (event-ms, value) —
    # the value is a deterministic tiebreak for equal timestamps
    obs = (
        df.select(*ks, bucket.alias("__b"), ms.alias("__s"),
                  F.col(value_col).alias("__v"))
        .groupBy(*ks, "__b")
        .agg(F.max(F.struct("__s", "__v")).alias("__last"))
        .select(*ks, "__b", F.col("__last.__v").alias("__v"))
        # bucket-level (output-sized) frame feeds BOTH the span pass and
        # the grid join — cut the lineage so the raw scan runs once
        .localCheckpoint(eager=False)
    )
    span = obs.groupBy(*ks).agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    grid = span.select(
        *ks,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step).cast("long"))
        ).alias("__b"),
    )
    joined = grid.join(obs, [*ks, "__b"], "left")
    w = (
        Window.partitionBy(*ks)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *ks,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        F.last("__v", ignorenulls=True).over(w).alias("value"),
        F.col("__v").isNull().alias("filled"),
    )


def counter_increase(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key discrete increase of a monotonic counter with RESET
    handling (the Prometheus ``increase`` rule): for consecutive
    samples, increase = value - previous value, except after a counter
    reset (value dropped below the previous sample) where the new value
    itself is the increase — the metric-pipeline step for translating
    cumulative counters into per-interval deltas. First sample per key
    emits NULL (no predecessor).

    One lag window partitioned BY KEY (never a single partition), one
    shuffle. Ordering is (ts, value) so same-timestamp samples resolve
    deterministically in any engine. Returns the input keys plus
    (ts, value, increase).
    """
    ks = list(keys)
    w = Window.partitionBy(*ks).orderBy(F.unix_millis(F.col(ts_col)), F.col(value_col))
    prev = F.lag(F.col(value_col).cast("double"), 1).over(w)
    cur = F.col(value_col).cast("double")
    inc = F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(cur >= prev, cur - prev).otherwise(cur)
    )
    return df.select(
        *ks, F.col(ts_col).alias("ts"), cur.alias("value"), inc.alias("increase")
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Change-data-capture to SCD2 history: collapse a stream of
    per-key observations into validity intervals — one row per
    ATTRIBUTE CHANGE with (valid_from, valid_to, is_current) — the
    slowly-changing-dimension table a warehouse builds from an update
    feed. Consecutive observations with an unchanged attribute merge
    into one interval; ``valid_to`` is the next change's start (NULL
    for the open current row).

    Two windows over ONE key-partitioned shuffle: lag() detects change
    points, lead() over the filtered change rows closes intervals.
    Ordering is (event-ms, tiebreak) — pass a unique ``tiebreak``
    column when same-millisecond updates are possible, else ordering
    (and therefore interval boundaries) is nondeterministic, the same
    total-order contract as every helper in this module. NULL
    attributes count as a distinct state (NULL -> value and value ->
    NULL are both changes).
    """
    order = [F.unix_millis(F.col(ts_col))]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(attr_col), 1).over(w)
    first = F.row_number().over(w) == 1
    # null-safe inequality: NULL<->value transitions are changes too
    changed = first | ~F.col(attr_col).eqNullSafe(prev)
    marks = df.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return marks.select(
        F.col(key).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col), 1).over(w2).alias("valid_to"),
        F.lead(F.col(ts_col), 1).over(w2).isNull().alias("is_current"),
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    *,
    k: int = 3,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: pair
    every anchor row with ``k`` pseudo-random OTHER rows — uniform,
    reproducible, and auditable, with the same no-RNG-state discipline
    as :func:`deterministic_shuffle` (which supplies the permutation:
    negatives are fixed rank offsets in the md5-shuffled order, so they
    are uncorrelated with any natural ordering of the data). Changing
    the ``salt`` re-deals all negatives per epoch.

    Returns (anchor_id, neg_id, j) for j in 1..k; a stride that lands
    back on the anchor (only possible when the corpus is no bigger
    than ~k) is dropped rather than emitted as a self-pair. In that
    same degenerate regime (n <= k+1) distinct j values can also wrap
    to the SAME neg_id, so (anchor_id, neg_id) pairs are not distinct
    — callers needing distinct negatives on toy corpora should
    ``dropDuplicates(["anchor_id", "neg_id"])``; for any real corpus
    (n > k+1) every stride is distinct by construction (ADVICE r4
    item 2).

    Plan shape: one deterministic_shuffle (range exchange + local
    numbering), a k-row explode of rank offsets, and one rank-keyed
    equi-join back to the shuffled frame — no crossJoin, no RNG, and
    the shuffled frame is checkpointed so its plan runs once for both
    join sides.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    ranked = deterministic_shuffle(df.select(id_col), id_col, salt=salt).localCheckpoint(
        eager=False
    )
    n_row = ranked.agg(F.max("shuffle_order").cast("long").alias("__n"))
    anchors = (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col("shuffle_order").alias("__r"),
            "__n",
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("j"),
        )
        .withColumn(
            "__neg_rank",
            F.pmod(
                F.col("__r") - 1 + F.greatest(F.col("__n") / (k + 1), F.lit(1)).cast("long") * F.col("j"),
                F.col("__n"),
            )
            + 1,
        )
        .filter(F.col("__neg_rank") != F.col("__r"))
    )
    negs = ranked.select(
        F.col(id_col).alias("neg_id"), F.col("shuffle_order").alias("__neg_rank")
    )
    return anchors.join(negs, "__neg_rank").select("anchor_id", "neg_id", "j")


def chunk_pack(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay every document's tokens
    end-to-end in the md5-shuffled order and cut the stream into fixed
    ``seq_len`` training sequences — the GPT-style pretraining packer
    where documents STRADDLE sequence boundaries (zero padding waste),
    as opposed to :func:`shard-style<global_running_sum>` whole-doc
    binning. Returns one row per (document x sequence it overlaps):

      (id, seq_id, doc_offset, seq_offset, n_tokens)

    ``doc_offset`` = first packed token's position within the document,
    ``seq_offset`` = its position within the sequence; a document
    spanning three sequences emits three rows whose n_tokens sum to its
    token count. Deterministic, order/partitioning-independent, salt
    re-deals the permutation per epoch.

    Plan shape: one distributed running sum over the md5 total order
    (:func:`global_running_sum` — range exchange + broadcast offsets,
    no single-task window), then a per-row explode over the 1 + a few
    sequences each document overlaps. No shuffle after the range
    exchange; zero-token documents emit nothing.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    base = df.select(
        F.col(id_col).alias("id"), F.col(tokens_col).cast("long").alias("__t")
    ).withColumn("__k", F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))))
    cum = global_running_sum(base, ["__k", "id"], "__t", out="__end")
    spans = (
        cum.filter(F.col("__t") > 0)
        .withColumn("__start", F.col("__end") - F.col("__t"))
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / seq_len),
                    F.floor((F.col("__end") - 1) / seq_len),
                )
            ),
        )
    )
    g_start = F.greatest(F.col("__start"), F.col("seq_id") * seq_len)
    g_end = F.least(F.col("__end"), (F.col("seq_id") + 1) * seq_len)
    return spans.select(
        "id",
        F.col("seq_id").cast("long").alias("seq_id"),
        (g_start - F.col("__start")).cast("long").alias("doc_offset"),
        (g_start - F.col("seq_id") * seq_len).cast("long").alias("seq_offset"),
        (g_end - g_start).cast("long").alias("n_tokens"),
    )


def length_buckets(
    df: DataFrame,
    id_col: str,
    length_col: str,
    *,
    n_buckets: int = 4,
    batch_size: int = 16,
    salt: str = "",
) -> DataFrame:
    """Length-bucketed batch planning: bucket rows by global
    equal-frequency quantiles of ``length_col``, deal each bucket into
    fixed-size batches in md5-shuffled order, and emit per-batch padding
    accounting (``padding_tokens = n_rows * max_len - sum_len``) — the
    dynamic-batching prep that cuts padding waste when sequences of
    similar length train together (the PADDED counterpart of
    :func:`chunk_pack`, for models that cannot straddle documents
    across sequences). Emits (bucket, batch_id, n_rows, min_len,
    max_len, sum_len, padding_tokens); re-runs reproduce the same
    batches, changing ``salt`` re-deals them per epoch.

    Scale shape: the quantile thresholds are ONE global aggregate
    (broadcast back, the :func:`~python_mapreduce_spark.operators
    .aggregates.equi_freq_bins` rule with rounded cut points); the
    within-bucket order comes from :func:`global_row_number` over
    (bucket, md5 key) — range exchange + broadcast prefix offsets,
    never a single-task window even when one bucket holds most of the
    corpus — and per-bucket ranks derive from the global rank by
    subtracting each bucket's broadcast min. The batch roll-up is an
    ordinary partial+final hash agg on (bucket, batch).
    """
    if n_buckets < 1 or batch_size < 1:
        raise ValueError(f"need n_buckets >= 1 and batch_size >= 1: ({n_buckets}, {batch_size})")
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415

    length = F.col(length_col).cast("long")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    thr = df.agg(
        F.array(
            *[dround(F.expr(f"percentile({length_col}, {f!r}D)"), 6) for f in fracs]
        ).alias("__thr")
    )
    lv = length.cast("double")
    keyed = (
        df.crossJoin(F.broadcast(thr))
        .select(
            F.col(id_col).alias("id"),
            length.alias("__len"),
            (F.size(F.filter("__thr", lambda t: t < lv)) + F.lit(1)).cast("int").alias("bucket"),
        )
        .withColumn(
            "__ok", F.md5(F.concat(F.col("id").cast("string"), F.lit(salt)))
        )
    )
    ranked = global_row_number(keyed, ["bucket", "__ok", "id"], out="__grn")
    starts = ranked.groupBy("bucket").agg(F.min("__grn").alias("__start"))
    batched = ranked.join(F.broadcast(starts), "bucket").withColumn(
        "batch_id",
        F.floor((F.col("__grn") - F.col("__start")) / F.lit(int(batch_size))).cast("long"),
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__len").cast("long").alias("min_len"),
            F.max("__len").cast("long").alias("max_len"),
            F.sum("__len").cast("long").alias("sum_len"),
        )
        .withColumn(
            "padding_tokens",
            (F.col("n_rows") * F.col("max_len") - F.col("sum_len")).cast("long"),
        )
    )


def seasonal_residual(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    period_days: int = 7,
    mad_k: float = 3.0,
) -> DataFrame:
    """Seasonal-naive anomaly detection for daily series: per key,
    aggregate to daily totals, take the same-weekday baseline exactly
    ``period_days`` CALENDAR days back (the seasonal-naive forecast),
    and flag days whose residual exceeds ``mad_k`` x the key's median
    absolute residual — the robust day-over-week spike/drop monitor for
    metric streams (plain z-scoring breaks on weekly seasonality; this
    differences it away first). Emits (keys..., day, daily_total,
    baseline, residual, is_anomaly); a day whose baseline day
    (``day - period_days``) has no data — including every day in the
    first period — carries a NULL baseline/residual and is never
    anomalous, so gaps in the series can't silently misalign the
    baseline onto a different weekday (that was the old row-lag
    behavior; see gap_report for detecting the gaps themselves). A key
    whose median absolute residual is 0 flags nothing (threshold
    degenerates, documented rather than divided by).

    Scale shape: the daily roll-up is one (keys, day) hash agg in
    DECIMAL (map-side combined, exact at any parallelism); the calendar
    baseline is a self-equi-join of that day-sized frame on
    (keys, day - period_days) — no window at all; the MAD is a second
    grouped agg over the residual frame (lineage-cut so the day frame
    computes once) broadcast back.
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415 - avoid module cycle

    ks = list(keys)
    daily = (
        df.groupBy(*ks, F.to_date(F.col(ts_col)).alias("day"))
        .agg(
            F.coalesce(
                F.sum(F.col(value_col).cast("decimal(18,6)")),
                F.lit(0).cast("decimal(18,6)"),
            ).alias("__tot")
        )
        .localCheckpoint(eager=False)  # feeds both sides of the baseline join
    )
    base = daily.select(
        *ks,
        F.date_add(F.col("day"), int(period_days)).alias("day"),
        F.col("__tot").alias("__base"),
    )
    resid = (
        daily.join(base, [*ks, "day"], "left")
        .withColumn(
            "__resid",
            (F.col("__tot") - F.col("__base")).cast("double"),
        )
        .localCheckpoint(eager=False)  # feeds both the MAD agg and the output
    )
    mad = resid.filter(F.col("__resid").isNotNull()).groupBy(*ks).agg(
        dround(F.expr("percentile(abs(__resid), 0.5D)"), 6).alias("__mad")
    )
    is_anom = (
        F.col("__resid").isNotNull()
        & (F.col("__mad") > 0)
        & (F.abs(F.col("__resid")) >= F.lit(float(mad_k)) * F.col("__mad"))
    )
    return resid.join(F.broadcast(mad), ks, "left").select(
        *ks,
        "day",
        dround(F.col("__tot").cast("double"), 2).alias("daily_total"),
        dround(F.col("__base").cast("double"), 2).alias("baseline"),
        dround(F.col("__resid"), 2).alias("residual"),
        F.coalesce(is_anom, F.lit(False)).alias("is_anomaly"),
    )


def quantile_normalize(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    value_col: str,
    *,
    out: str = "pctile",
) -> DataFrame:
    """Per-group rank transform to [0, 1]: each value maps to its
    percent_rank within the group ((rank - 1) / (n - 1), ties sharing a
    rank) — the score-calibration step that makes quality signals from
    different sources comparable before a global cut (a 0.9 from a
    harsh scorer and a 0.9 from a lenient one mean different things;
    their percentiles do not). Emits (keys..., id, value, pctile)
    rounded to 6 decimals; single-row groups map to 0.0.

    Scale shape: ONE window partitioned by the group keys and ordered
    by value — rank semantics make the output independent of the
    physical tie order, so no tiebreak column is needed and the result
    is deterministic at any parallelism. Never a single-partition
    window (the group keys partition it); groups are assumed
    bounded-per-key as usual for windowed operators.
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415 - avoid module cycle

    ks = list(keys)
    w = Window.partitionBy(*ks).orderBy(F.col(value_col).cast("double"))
    return df.select(
        *ks,
        F.col(id_col).alias("id"),
        F.col(value_col).cast("double").alias(value_col),
        dround(F.percent_rank().over(w), 6).alias(out),
    )


def cusum_changepoints(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    value_col: str,
    *,
    target: float | None = None,
    allowance: float = 0.0,
    threshold: float = 4.0,
) -> DataFrame:
    """Tabular CUSUM change-point detector per key: running one-sided
    cumulative sums of deviations from ``target`` (Page 1954), with an
    alarm wherever either sum crosses ``threshold``. ``allowance`` (k)
    is the slack subtracted from each deviation; ``threshold`` (h) is
    in the same units as the value. ``target=None`` uses each key's own
    series mean (the retrospective "did this metric shift" audit);
    pass an explicit target for the online control-chart reading.

    The CUSUM recurrence ``S+_i = max(0, S+_{i-1} + d_i)`` looks
    sequential, but it has a closed prefix form: with ``P_i`` the plain
    running sum of ``d``, ``S+_i = P_i - min(0, min_{j<=i} P_j)`` — so
    the whole detector is TWO frame windows (running sum + running min)
    per side over ONE shuffle on the keys, no recursion, no UDF, and an
    ANSI-SQL oracle can replay it with identical window frames. NULL
    values contribute zero deviation (they advance the row index but
    carry no evidence). Emits every input row with ``cusum_pos``,
    ``cusum_neg`` (both >= 0, rounded to 6), and ``alarm``.

    Scale shape: one hash exchange on the keys, then two streaming
    window passes fused by Spark into a single WindowExec per frame
    spec; per-key partitions as everywhere in this module. Determinism:
    callers pass a TOTAL order (duplicate order keys at 100 TB would
    otherwise make the running sums nondeterministic).
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415 - avoid module cycle

    ks = list(keys)
    w = _win(ks, order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value_col).cast("double")
    if target is None:
        mu = F.avg(v).over(Window.partitionBy(*ks))
    else:
        mu = F.lit(float(target))
    dev = F.coalesce(v - mu, F.lit(0.0))
    # Two selects: Spark forbids a window function inside another
    # window's argument, so the running sums materialize first.
    staged = df.withColumn(
        "__p_pos", F.sum(dev - F.lit(float(allowance))).over(run)
    ).withColumn("__p_neg", F.sum(-dev - F.lit(float(allowance))).over(run))
    s_pos = F.col("__p_pos") - F.least(
        F.lit(0.0), F.min("__p_pos").over(run)
    )
    s_neg = F.col("__p_neg") - F.least(
        F.lit(0.0), F.min("__p_neg").over(run)
    )
    return (
        staged.withColumn("cusum_pos", dround(s_pos, 6))
        .withColumn("cusum_neg", dround(s_neg, 6))
        .withColumn(
            "alarm",
            (F.col("cusum_pos") > threshold) | (F.col("cusum_neg") > threshold),
        )
        .drop("__p_pos", "__p_neg")
    )


def forecast_backtest(
    df: DataFrame,
    keys: Sequence[str],
    period_col,
    value_col,
    *,
    horizon: int = 12,
    baseline_lag: int = 1,
) -> DataFrame:
    """Forecast-accuracy backtest for the naive family: score the
    "same value ``horizon`` periods ago" forecast (seasonal-naive —
    e.g. horizon 12 on monthly data = year-over-year) against actuals,
    per key — the forecasting counterpart of the classification-eval
    family (classification_report / pr_curve / brier_score). Emits one
    row per key: n_periods, n_eval (periods where the forecast
    exists), and the standard backtest metrics — mae, bias (mean
    signed error), rmse, wape (sum|e| / sum|a|), smape (mean
    2|e|/(|a|+|f|), 0 where both sides are 0), and mase (MAE relative
    to the in-sample ``baseline_lag``-step naive MAE; < 1 beats the
    baseline). Degenerate guards: no evaluable periods -> NULL
    metrics; an all-zero actuals span -> wape NULL; a zero-error
    baseline -> mase NULL. Beyond the reference surface (SURVEY.md
    §2.2 north-star extensions).

    Scale shape: the series roll-up is one (keys, period) hash agg
    (map-side combined); the forecast and the baseline each come from
    a CALENDAR/INDEX self-equi-join of that period-sized frame on
    (keys, period - k) — the seasonal_residual pattern, no window at
    all, so a GAP in the series yields NULL forecasts for the periods
    it would misalign instead of silently comparing the wrong periods
    (a positional lag would slide across gaps; pre-fill with
    resample_locf if gap-bridging is wanted). Everything after the
    joins is one per-key agg of sufficient statistics.

    Determinism: actuals quantize to integer CENTS in the roll-up, so
    every error is an exact integer; |e|, e, e^2 sums ride DECIMAL and
    the ratio metrics compute once in fixed IEEE shape. The per-row
    sMAPE terms are the one non-integral sum — each term quantizes to
    1e-8 and accumulates in DECIMAL(38,8), order-independent at any
    partitioning.
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415 - avoid module cycle

    ks = list(keys)
    p = (
        F.col(period_col) if isinstance(period_col, str) else period_col
    ).cast("long")
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    series = (
        df.select(*ks, p.alias("p"), yc.alias("__yc"))
        .filter(F.col("p").isNotNull() & F.col("__yc").isNotNull())
        .groupBy(*ks, "p")
        .agg(F.sum("__yc").cast("long").alias("a"))
        .localCheckpoint(eager=False)  # feeds three sides of the joins
    )
    fc = series.select(
        *ks, (F.col("p") + F.lit(int(horizon))).alias("p"), F.col("a").alias("__f")
    )
    bl = series.select(
        *ks,
        (F.col("p") + F.lit(int(baseline_lag))).alias("p"),
        F.col("a").alias("__b"),
    )
    j = series.join(fc, [*ks, "p"], "left").join(bl, [*ks, "p"], "left")
    a_d = F.col("a").cast("double")
    f_d = F.col("__f").cast("double")
    e = F.col("a") - F.col("__f")
    e_d = a_d - f_d
    has_f = F.col("__f").isNotNull()
    smape_term = F.when(
        has_f,
        dround(
            F.when(
                (F.abs(a_d) + F.abs(f_d)) > 0,
                F.lit(2.0) * F.abs(e_d) / (F.abs(a_d) + F.abs(f_d)),
            ).otherwise(F.lit(0.0)),
            8,
        ),
    ).cast("decimal(38,8)")
    eb = F.col("a") - F.col("__b")
    agg = j.groupBy(*ks).agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.count(F.when(has_f, F.lit(1))).cast("long").alias("n_eval"),
        F.sum(F.when(has_f, F.abs(e)).cast("decimal(38,0)"))
        .cast("double")
        .alias("__sae"),
        F.sum(F.when(has_f, e).cast("decimal(38,0)"))
        .cast("double")
        .alias("__se"),
        F.sum(
            F.when(has_f, (e.cast("decimal(19,0)") * e).cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("__see"),
        F.sum(F.when(has_f, F.abs(F.col("a"))).cast("decimal(38,0)"))
        .cast("double")
        .alias("__saa"),
        F.sum(smape_term).cast("double").alias("__ssm"),
        F.count(F.when(F.col("__b").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("__nb"),
        F.sum(F.when(F.col("__b").isNotNull(), F.abs(eb)).cast("decimal(38,0)"))
        .cast("double")
        .alias("__sab"),
    )
    n_ev = F.col("n_eval").cast("double")
    some = F.col("n_eval") > 0
    mae = F.col("__sae") / n_ev / F.lit(100.0)
    base_mae = F.col("__sab") / F.col("__nb").cast("double") / F.lit(100.0)
    return agg.select(
        *ks,
        "n_periods",
        "n_eval",
        dround(F.when(some, mae), 6).alias("mae"),
        dround(F.when(some, F.col("__se") / n_ev / F.lit(100.0)), 6).alias(
            "bias"
        ),
        dround(
            F.when(some, F.sqrt(F.col("__see") / n_ev) / F.lit(100.0)), 6
        ).alias("rmse"),
        dround(
            F.when(some & (F.col("__saa") > 0), F.col("__sae") / F.col("__saa")),
            6,
        ).alias("wape"),
        dround(F.when(some, F.col("__ssm") / n_ev), 6).alias("smape"),
        dround(
            F.when(
                some & (F.col("__nb") > 0) & (F.col("__sab") > 0),
                mae / base_mae,
            ),
            6,
        ).alias("mase"),
    )


def autocorrelation(
    df: DataFrame,
    period_col,
    value_col,
    *,
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function of a period-rolled series: for each
    lag 1..``max_lag``, r_k = sum((y_t - ybar)(y_{t+k} - ybar)) /
    sum((y_t - ybar)^2) — the seasonality/persistence diagnostic that
    tells you WHICH horizon :func:`forecast_backtest` should score
    (a weekly cycle shows as a peak at lag 7). Emits one row per lag:
    (lag, n_pairs, acf), NULL acf when the series has no variance or
    fewer than 2 periods. Beyond the reference surface (SURVEY.md
    §2.2 north-star extensions).

    Scale shape: the series first rolls up to one row per period
    (map-side-combined hash agg, integer cents) — every later stage is
    period-cardinality-sized, not data-sized. The lag pairing is ONE
    equi shuffle join: the left side explodes each period row into
    ``max_lag`` (period + k) probes, so no range join, no window, and
    no per-lag scan; pairs where the lagged period is MISSING simply
    drop (calendar join, not positional — a gap cannot misalign the
    series). The mean is a 1-row broadcast.

    Determinism: period totals are exact integer cents, so the mean is
    one exact division; every deviation product converts to DOLLAR^2,
    quantizes to 1e-2, and accumulates in DECIMAL(38,2) —
    order-independent at any partitioning. Envelope: dround's
    long-typed floor bounds |deviation product| <= ~9.2e16 dollar^2
    (deviations up to ~$3e8 per period) — pre-scale the value for
    series hotter than that.
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415 - avoid module cycle

    p = (
        F.col(period_col) if isinstance(period_col, str) else period_col
    ).cast("long")
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    series = (
        df.select(p.alias("p"), yc.alias("__yc"))
        .filter(F.col("p").isNotNull() & F.col("__yc").isNotNull())
        .groupBy("p")
        .agg(F.sum("__yc").cast("long").alias("y"))
        .localCheckpoint(eager=False)  # mean pass + both join sides
    )
    stats = series.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("y").cast("double").alias("__s"),
    )
    mean = F.col("__s") / F.col("__n").cast("double")
    centered = series.crossJoin(F.broadcast(stats)).select(
        "p",
        "y",
        (F.col("y").cast("double") - mean).alias("__d"),
        "__n",
    )
    den_term = dround(
        F.col("__d") * F.col("__d") / F.lit(10000.0), 2
    ).cast("decimal(38,2)")
    den = centered.groupBy(F.lit(1).alias("__g")).agg(
        F.max("__n").alias("__n"),
        F.sum(den_term).cast("double").alias("__den"),
    )
    lags = F.explode(
        F.array([F.lit(i) for i in range(1, int(max_lag) + 1)])
    ).alias("lag")
    probes = centered.select(
        F.col("__d").alias("__d1"), F.col("p"), lags
    ).withColumn("__p2", F.col("p") + F.col("lag"))
    paired = probes.join(
        centered.select(F.col("p").alias("__p2"), F.col("__d").alias("__d2")),
        "__p2",
    )
    num_term = dround(
        F.col("__d1") * F.col("__d2") / F.lit(10000.0), 2
    ).cast("decimal(38,2)")
    nums = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(num_term).cast("double").alias("__num"),
    )
    out = nums.crossJoin(F.broadcast(den))
    acf = F.when(
        (F.col("__n") >= 2) & (F.col("__den") > 0),
        F.col("__num") / F.col("__den"),
    )
    return out.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        dround(acf, 6).alias("acf"),
    )


def mann_kendall(
    df: DataFrame,
    period_col,
    value_col,
) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope over a period-rolled
    series: S = sum over pairs i<j of sign(y_j - y_i) with the
    tie-corrected normal approximation, and the Theil-Sen slope
    estimate (median of pairwise slopes) — the standard nonparametric
    "is this metric trending, and how fast" detector (robust to
    outliers and steps that wreck the OLS fit :func:`~python_mapreduce_spark.operators.aggregates.group_ols`
    scores, and the natural companion to :func:`autocorrelation` /
    :func:`forecast_backtest` on the same rolled series). Emits ONE
    row: n_periods, n_pairs, s_stat, var_s, z (continuity-corrected),
    sen_slope (value units per period). Fewer than 2 periods -> zero
    rows (no trend question exists); an all-tied series has var 0 ->
    z NULL, sen_slope 0. Beyond the reference surface (SURVEY.md §2.2
    north-star extensions).

    Scale shape: the series first rolls up to ONE exact integer-cent
    row per period, so the pairwise stage is quadratic in PERIODS, not
    rows — calendar-bounded by construction (a decade of days is ~3.7k
    periods -> ~7M pairs; document the budget when feeding finer
    grains). The pair join is a theta self-join of that period-sized
    frame (plans as a broadcast nested-loop with the p_j > p_i
    predicate attached — the engine's documented theta-join shape, not
    a bare cartesian).

    Determinism: S is an EXACT integer (sign sums of exact cent
    diffs); the tie term t(t-1)(2t+5) rides DECIMAL; Sen's slope is
    the exact interpolated median (both engines interpolate even
    counts identically — the mad_outliers precedent) of pair slopes
    computed in one fixed IEEE shape from exact integers.
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415 - avoid module cycle

    p = (
        F.col(period_col) if isinstance(period_col, str) else period_col
    ).cast("long")
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    series = (
        df.select(p.alias("p"), yc.alias("__yc"))
        .filter(F.col("p").isNotNull() & F.col("__yc").isNotNull())
        .groupBy("p")
        .agg(F.sum("__yc").cast("long").alias("y"))
        .localCheckpoint(eager=False)  # both join sides + ties + count
    )
    a = series.select(F.col("p").alias("__p1"), F.col("y").alias("__y1"))
    b = series.select(F.col("p").alias("__p2"), F.col("y").alias("__y2"))
    pairs = a.join(b, F.col("__p2") > F.col("__p1"))
    slope = (
        (F.col("__y2") - F.col("__y1")).cast("double")
        / (F.col("__p2") - F.col("__p1")).cast("double")
        / F.lit(100.0)
    )
    pair_agg = (
        pairs.groupBy(F.lit(1).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.signum((F.col("__y2") - F.col("__y1")).cast("double")))
            .cast("long")
            .alias("s_stat"),
            F.median(slope).alias("__sen"),
        )
    )
    ties = series.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("__t"))
    tie_agg = ties.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).alias("__nvals"),
        F.sum("__t").cast("long").alias("n_periods"),
        F.sum(
            F.col("__t").cast("decimal(38,0)")
            * (F.col("__t") - 1)
            * (F.lit(2) * F.col("__t") + 5)
        )
        .cast("double")
        .alias("__tsum"),
    )
    out = pair_agg.join(F.broadcast(tie_agg), "__g").drop("__g")
    n_d = F.col("n_periods").cast("double")
    var_s = (
        n_d * (n_d - F.lit(1.0)) * (F.lit(2.0) * n_d + F.lit(5.0))
        - F.col("__tsum")
    ) / F.lit(18.0)
    s_d = F.col("s_stat").cast("double")
    z = F.when(
        var_s > 0,
        F.when(F.col("s_stat") > 0, (s_d - F.lit(1.0)) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (s_d + F.lit(1.0)) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    return out.select(
        "n_periods",
        "n_pairs",
        "s_stat",
        dround(var_s, 4).alias("var_s"),
        dround(z, 6).alias("z"),
        dround(F.col("__sen"), 6).alias("sen_slope"),
    )
