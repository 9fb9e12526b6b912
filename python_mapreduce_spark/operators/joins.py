"""Join operators.

The reference implements NO join operator: equi-joins are the user-written
"repartition join" pattern (both inputs mapped to (join_key, tagged_value),
reduce pairs the tagged sides — SURVEY.md §2.2, enabled by multi-dir input
at mapper.py:26,77), and map-side joins are the auxiliary-data dict probed
inside map functions (mapper.py:150-157). Non-equi joins require manual
key discretization. Here every variant is a named operator and Catalyst
picks the physical strategy (broadcast-hash / shuffled-hash / sort-merge /
broadcast-nested-loop), with AQE switching at runtime.

Scale notes (100 TB):
  * ``broadcast_join`` pins the small side onto every executor — the
    declarative version of the reference's aux-data pattern; no shuffle of
    the big side at all.
  * ``asof_join`` is the union+window formulation: ONE shuffle on the key,
    no pandas, no per-group materialization — works for billions of rows
    per key-partition since the window is a streaming last() scan.
  * theta/range joins go through BroadcastNestedLoopJoin, which is only
    sane when one side is broadcast-small; ``bucketed_range_join`` is the
    big-big rewrite — a hash equi-join on a shared bucket grid plus a
    residual filter, no nested loop.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_mapreduce_spark.functions.scalar import dround


def equi_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join (reference: reduce-side repartition join pattern).

    ``how`` covers inner/left/right/full/left_semi/left_anti — the
    reference expresses semi/anti/outer by tag-and-reduce emission rules
    (SURVEY.md §2.2 "Joins — semi / anti / outer").
    """
    return left.join(right, on=on, how=how)


def broadcast_join(
    big: DataFrame, small: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Map-side join: explicit broadcast of the small side (reference:
    auxiliary-data dict probed in the map fn, mapper.py:150-157)."""
    return big.join(F.broadcast(small), on=on, how=how)


def theta_join(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """Arbitrary-predicate join — absent in the reference (hash partition
    on exact key only, shuffler.py:71-77). Plans as BroadcastNestedLoopJoin
    when a side is small; keep the small side on the right."""
    return left.join(right, on=condition, how="inner")


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value: str,
    lo: str,
    hi: str,
    *,
    how: str = "inner",
) -> DataFrame:
    """Join rows to [lo, hi) ranges.

    Broadcast-NLJ path: fine whenever ``ranges`` is dimension-sized (tiers,
    buckets, calendars). For big-big range joins, pre-bucketize both sides
    to a common grid and equi-join on bucket id first — that turns an
    O(n*m) NLJ into a shuffle join plus a residual filter.
    """
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return facts.join(F.broadcast(ranges), on=cond, how=how)


def bucketed_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value: str,
    lo: str,
    hi: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """Big-big range join as a hash equi-join on a common bucket grid —
    the 100 TB form of :func:`range_join`.

    Each fact row maps to ONE bucket (``floor(value/width)``); each range
    explodes to every bucket its [lo, hi) span overlaps; the equi-join on
    bucket id hash-partitions both sides, and the exact range predicate
    filters residual edge hits. A fact meets a range in exactly one
    bucket (its own), so no dedup pass is needed.

    Cost model: ranges expand by ~span/width rows (pick width ~ median
    span), facts shuffle ONCE on bucket id, and no nested loop ever runs
    — vs BroadcastNestedLoopJoin's |facts| x |ranges| comparisons, which
    is only sane for dimension-sized range tables. Skewed grids (many
    facts in one bucket) are AQE skew-split territory, same as any
    shuffle join.
    """
    bucket = lambda c: F.floor(F.col(c) / F.lit(bucket_width)).cast("long")  # noqa: E731
    f = facts.withColumn("__bucket", bucket(value))
    r = ranges.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(lo), F.floor(F.col(hi) / F.lit(bucket_width)).cast("long"))),
    )
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return f.join(r, on="__bucket", how="inner").filter(cond).drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    *,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same key (``direction=
    'backward'``), or the earliest right row with ``right_ts >=
    left_ts`` (``'forward'``) — pandas ``merge_asof`` directions.

    Spark lacks a native as-of join (SURVEY.md §2.2 "Joins — theta /
    range / as-of"). This is the scalable formulation: tag and union both
    sides, then a single window partitioned by key and ordered by
    (ts, side) carries the most recent right-side values forward with
    ``last(..., ignorenulls=True)``. One shuffle, no pandas, streams at
    any per-key cardinality — unlike merge_asof-in-applyInPandas, which
    materializes a whole key group per batch.

    Right rows sort before left rows at equal timestamps, so a right row
    AT the left timestamp matches (<= semantics, same as DuckDB ASOF).
    Key columns must exist under the same names on both sides. Returns
    all left columns plus ``<right_col><suffix>`` for each requested
    right column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)

    lhs = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
    )
    rhs = right.select(
        *[
            F.col(c).alias(c)
            if c in keys
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )

    # When multiple right rows share (key, ts), the carried values must
    # not depend on shuffle order (the repo's own total-order rule,
    # operators/windows.py): the carried columns themselves join the
    # window ordering as a tiebreak, so both directions deterministically
    # pick the lexicographically GREATEST right-cols tuple at the tied
    # timestamp.
    tiebreak_cols = [f"{c}{suffix}" for c in right_cols]
    if direction == "backward":
        # Right rows (side 0) sort BEFORE left rows at equal ts, so a
        # right row AT the left timestamp is inside the trailing frame;
        # last(ignorenulls) over ascending tiebreaks picks the greatest.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__side"), *[F.col(c).asc() for c in tiebreak_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = [
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    else:
        # Forward: left rows (side 1) sort BEFORE right rows at equal ts
        # (descending side order), so an equal-ts right row is inside the
        # leading frame; first(ignorenulls) over descending tiebreaks
        # picks the greatest — same convention as backward.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__side").desc(), *[F.col(c).desc() for c in tiebreak_cols])
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = [
            F.first(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    carried = rhs.unionByName(lhs).select(
        *left.columns,
        F.col("__side"),
        *carry,
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_buckets: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated.

    For hot join keys (one key = one straggler reducer), append a salt to
    the skewed side's key and explode the other side across every salt
    value, so one hot key spreads over ``salt_buckets`` tasks. Salt is
    derived deterministically (hash of ``salt_source``, default: the
    whole-row hash) so reruns partition identically.

    Prefer AQE's skew-join splitting (on by default here,
    session.py) — it needs no replication and reacts to measured skew.
    Reach for explicit salting when the skew is known AND the replicated
    side is small but above the broadcast threshold, or when a
    deterministic layout must be pinned across engine versions. The
    replicated side's size cost is x``salt_buckets`` — keep it the
    dimension side.
    """
    src = F.col(salt_source) if salt_source else F.xxhash64(*skewed.columns)
    lhs = skewed.withColumn("__salt", F.pmod(src, F.lit(salt_buckets)).cast("int"))
    rhs = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = lhs.join(rhs, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    a_id: str,
    b_id: str,
    *,
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int,
) -> DataFrame:
    """Interval-OVERLAP join: all (a, b) interval pairs sharing a key
    whose [start, end] spans intersect — the incident-correlation /
    session-overlap primitive (which purchases fell inside an error
    window, which sessions overlap a deploy). Distinct from
    :func:`range_join`'s point-in-interval shape: BOTH sides are
    intervals. Inputs carry integer span columns (``start_col`` <=
    ``end_col``, e.g. epoch-ms) plus an id; emits (keys..., a_id, b_id,
    overlap_start, overlap_end, overlap_ms) with inclusive-bound
    overlap semantics (touching endpoints count, overlap_ms >= 0).

    Scale shape: the big-big-safe bucket grid — each interval explodes
    to its covering ``bucket_width`` buckets (cost proportional to span
    / width, chosen to keep fan-out small), the join is a pure EQUI-join
    on (keys, bucket) with the overlap predicate as a residual filter,
    and each qualifying pair is emitted EXACTLY ONCE by keeping only
    the bucket containing the overlap start (a filter, not a distinct —
    no dedup shuffle). No BroadcastNestedLoop, no CartesianProduct at
    any size.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    w = int(bucket_width)
    ks = list(keys)

    def exploded(df: DataFrame, idc: str, tag: str) -> DataFrame:
        s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
        return df.select(
            *ks,
            F.col(idc).alias(f"{tag}_id"),
            s.alias(f"{tag}_start"),
            e.alias(f"{tag}_end"),
            F.explode(F.sequence(F.floor(s / w), F.floor(e / w))).alias("__bucket"),
        )
    ea, eb = exploded(a, a_id, "a"), exploded(b, b_id, "b")
    ov_start = F.greatest(F.col("a_start"), F.col("b_start"))
    ov_end = F.least(F.col("a_end"), F.col("b_end"))
    return (
        ea.join(eb, [*ks, "__bucket"])
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
            & (F.col("__bucket") == F.floor(ov_start / w))
        )
        .select(
            *ks,
            "a_id",
            "b_id",
            ov_start.alias("overlap_start"),
            ov_end.alias("overlap_end"),
            (ov_end - ov_start).alias("overlap_ms"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_cols: Sequence[str],
    *,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking for entity resolution: order the
    records by a blocking key (with the id as total-order tiebreak) and
    emit every record paired with its ``window`` successors — the
    classic candidate-pair generator that bounds comparisons at
    O(n * window) instead of per-block O(n^2) (robust to skewed blocks:
    a million-record block costs the same per record as a 10-record
    one). Emits (id_a, id_b, rank_gap) with rank_gap in [1, window];
    downstream verify stages join back the payloads they need.

    Scale shape: the global order comes from
    :func:`~python_mapreduce_spark.operators.windows.global_row_number`
    (range exchange + broadcast offsets — no single-task window); the
    neighbor pairing is ONE explode(sequence(1, window)) + ONE
    equi-join on rank+offset — never a range or cross join. Output is
    exactly n*window - window*(window+1)/2 rows for n >= window (each
    row pairs with min(n - rank, window) successors, so for n < window
    the count is the all-pairs n*(n-1)/2).
    """
    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    if int(window) < 1:
        raise ValueError(f"window must be >= 1: {window}")
    ks = list(key_cols)
    ranked = global_row_number(
        df.select(F.col(id_col).alias("__id"), *ks), [*ks, "__id"], out="__rn"
    ).localCheckpoint(eager=False)  # both join sides read it
    left = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__rn"),
        F.explode(F.sequence(F.lit(1), F.lit(int(window)))).alias("rank_gap"),
    ).withColumn("__rn2", F.col("__rn") + F.col("rank_gap"))
    right = ranked.select(F.col("__rn").alias("__rn2"), F.col("__id").alias("id_b"))
    return left.join(right, "__rn2").select(
        "id_a", "id_b", F.col("rank_gap").cast("long").alias("rank_gap")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Bloom-pre-filtered semi join: returns EXACTLY ``big LEFT SEMI
    JOIN small ON key`` — but probe rows are first screened by a
    broadcast Bloom filter of the small side's keys, so the bulk of
    non-matching rows die inside the scan stage (pure codegen) and
    never reach the shuffle. The classic big-big semi-join accelerator
    for when the small side is too large to broadcast as a hash table
    but its ``m_bits``-bit Bloom image is trivially broadcastable —
    the runtime-filter idea Spark's own AQE applies to equi-joins,
    exposed as an explicit operator. Bit positions come from seeded
    xxhash64 (JVM-native long hashing — measured ~4x faster per probe
    row than an md5/conv string path); the hash only has to agree
    between the build and probe passes of the SAME job, never across
    engines, because the oracle-visible result is the exact semi join.

    The filter is built with ONE aggregation over the small side
    (k explode positions -> bit_or per 64-bit word); the collected
    state is m_bits/64 longs (KB at any corpus size). False positives
    only cost shuffle volume — the residual exact semi join removes
    them, so results are bit-identical to the plain semi join (which
    is therefore the oracle). NULL keys never match, as in any
    null-unsafe equi-join — so the build pass drops NULL small-side
    keys before hashing (xxhash64(NULL, seed) is a real long, which
    would otherwise set k live bits per NULL row and inflate the
    false-positive rate) and the probe condition leads with
    ``key IS NOT NULL`` so NULL probe rows die in the scan stage too.
    """
    if m_bits % 64 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    if k < 1:
        raise ValueError(f"need at least one hash function: {k}")
    n_words = m_bits // 64

    def pos_sql(i: int) -> str:
        # i-th hash: seeded xxhash64 of the key, mod m_bits (pmod —
        # xxhash64 is signed). SQL-expression form because shiftleft's
        # DataFrame API takes only literal shift amounts.
        return f"pmod(xxhash64({key}, {i}), {m_bits})"

    pos = small.filter(F.col(key).isNotNull()).selectExpr(
        f"explode(array({', '.join(pos_sql(i) for i in range(k))})) AS __p"
    )
    words = (
        pos.selectExpr(
            "CAST(__p / 64 AS INT) AS __w",
            "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT)) AS __m",
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__m)").alias("__mask"))
    )
    wmap = {r["__w"]: r["__mask"] for r in words.collect()}  # <= m_bits/64 rows
    arr_sql = (
        "array(" + ", ".join(f"CAST({int(wmap.get(i, 0))} AS BIGINT)" for i in range(n_words)) + ")"
    )
    # probe: bind the filter array ONCE, one seeded-xxhash position and
    # one element_at + mask check per hash — all JVM-native inside
    # whole-stage codegen, no strings anywhere on the hot path
    probe = big.withColumn("__bloom", F.expr(arr_sql))
    cond = f"({key} IS NOT NULL) AND " + " AND ".join(
        f"(element_at(__bloom, CAST({pos_sql(i)} / 64 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST({pos_sql(i)} % 64 AS INT))) != 0"
        for i in range(k)
    )
    pre = probe.filter(F.expr(cond)).drop("__bloom")
    return pre.join(small.select(key).distinct(), key, "left_semi")


def er_match_score(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    fields: Sequence[tuple[str, float]],
    *,
    threshold: float = 0.75,
    on_duplicate_ids: str = "fanout",
) -> DataFrame:
    """Entity-resolution match scoring over candidate pairs — the
    verify stage that completes :func:`sorted_neighborhood_pairs`'
    blocking stage: for each (id_a, id_b) candidate, a weighted
    field-similarity score in [0, 1] and the ``matched`` verdict.
    String fields score 1 - levenshtein/max_len (1.0 on exact match),
    non-string fields score exact equality; a field NULL on BOTH sides
    scores 1.0 (agreement), NULL on ONE side 0.0. ``fields`` is
    (column, weight) — weights normalize internally. Emits
    (id_a, id_b, per-field sim_<col>..., score, matched), score rounded
    to 1e-6.

    ``records`` is expected unique per id; ``on_duplicate_ids`` says
    what to do when it isn't:

    * ``'fanout'`` (default, the standard join semantics) — each
      candidate pair emits once per payload combination;
    * ``'dedupe'`` — keep one deterministic payload per id
      (min-by-payload via a struct min — NOT dropDuplicates, whose
      survivor is partition-order-dependent) before joining;
    * ``'error'`` — raise ``ValueError`` if any id repeats (one cheap
      count-distinct agg), for pipelines where duplicate ids mean
      upstream corruption rather than a payload choice.

    Scale shape: two id-keyed equi-joins fan the candidate frame out to
    its payloads (candidates are O(n*w) from the blocking stage, never
    all-pairs); every similarity is a JVM-side expression (levenshtein
    is a built-in in Spark AND DuckDB, so the oracle replays it
    exactly) — no UDF anywhere.
    """
    from pyspark.sql.types import StringType  # noqa: PLC0415

    fs = list(fields)
    if not fs or sum(w for _, w in fs) <= 0:
        raise ValueError(f"fields must carry a positive total weight: {fs}")
    if on_duplicate_ids not in ("fanout", "dedupe", "error"):
        raise ValueError(
            f"on_duplicate_ids must be 'fanout', 'dedupe' or 'error': "
            f"{on_duplicate_ids!r}"
        )
    total = float(sum(w for _, w in fs))
    types = dict((f.name, f.dataType) for f in records.schema.fields)
    if on_duplicate_ids == "error":
        dup = (
            records.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .first()
        )
        if dup is not None:
            raise ValueError(
                f"records has duplicate {id_col!r} values (e.g. "
                f"{dup[id_col]!r} x{dup['__c']}); pass "
                "on_duplicate_ids='fanout' or 'dedupe' to proceed"
            )
    elif on_duplicate_ids == "dedupe":
        payload = F.struct(*[F.col(c) for c, _ in fs]).alias("__payload")
        records = (
            records.select(F.col(id_col), payload)
            .groupBy(id_col)
            .agg(F.min("__payload").alias("__payload"))
            .select(id_col, "__payload.*")
        )
    # Both payload sides read the same projection; uncut, each replays
    # the upstream scan (including any wide source columns the payload
    # derives from). One cut of the narrow (id, fields...) frame reads
    # the records once.
    proj = records.select(
        F.col(id_col).alias("__id"), *[F.col(c).alias(f"__f_{c}") for c, _ in fs]
    ).localCheckpoint(eager=False)
    a = proj.select(
        F.col("__id").alias("id_a"),
        *[F.col(f"__f_{c}").alias(f"__a_{c}") for c, _ in fs],
    )
    b = proj.select(
        F.col("__id").alias("id_b"),
        *[F.col(f"__f_{c}").alias(f"__b_{c}") for c, _ in fs],
    )
    joined = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    sims: list = []
    score = F.lit(0.0)
    for c, wgt in fs:
        ca, cb = F.col(f"__a_{c}"), F.col(f"__b_{c}")
        if isinstance(types[c], StringType):
            max_len = F.greatest(F.length(ca), F.length(cb))
            sim_val = F.when(
                max_len > 0,
                F.lit(1.0) - F.levenshtein(ca, cb) / max_len.cast("double"),
            ).otherwise(F.lit(1.0))  # both empty strings agree
        else:
            sim_val = (ca == cb).cast("double")
        sim = (
            F.when(ca.isNull() & cb.isNull(), F.lit(1.0))
            .when(ca.isNull() | cb.isNull(), F.lit(0.0))
            .otherwise(sim_val)
        )
        sims.append(dround(sim, 6).alias(f"sim_{c}"))
        score = score + F.lit(float(wgt) / total) * sim
    return joined.select(
        "id_a",
        "id_b",
        *sims,
        dround(score, 6).alias("score"),
        (dround(score, 6) >= F.lit(float(threshold))).alias("matched"),
    )


def fellegi_sunter_weights(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    fields: Sequence[str],
    *,
    m: float | dict[str, float] = 0.95,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage weights over blocked
    candidate pairs — the classical alternative to
    :func:`er_match_score`'s ad-hoc weighted similarity: each field's
    agreement contributes log2(m/u) and each disagreement
    log2((1-m)/(1-u)), so agreeing on a RARE value (low u) counts for
    far more than agreeing on a common one. ``m`` (P(agree | same
    entity), per field or one value for all) encodes data quality —
    keep the default unless a labeled sample says otherwise; ``u``
    (P(agree | different entities)) is ESTIMATED from the data as the
    random-agreement probability sum_v (c_v / n)^2 over each field's
    non-null value distribution — the standard frequency-based
    estimate, computed with one tiny agg per field.

    A field NULL on either side contributes 0 (no evidence — the FS
    treatment of missing comparisons, deliberately different from
    er_match_score's both-NULL-agrees rule, which scores payload
    similarity rather than identity evidence). Emits (id_a, id_b,
    n_agree, n_compared, fs_weight), weight rounded to 1e-6. Probability
    clamps at [1e-9, 1 - 1e-9] keep degenerate fields (constant value:
    u -> 1) finite; a constant field then contributes ~0 on agreement,
    which is exactly right — everyone agrees on it.

    Scale shape: per-field u is one map-side-combined value-count agg
    reduced to ONE scalar (k bounded driver scalars total, never a
    value list); scoring is then two id-keyed equi-joins (candidates
    are O(n*w) from blocking, never all-pairs) and a pure-literal
    projection — no UDF, log2 is a built-in in Spark AND DuckDB so an
    oracle replays it exactly. ``records`` must be unique per id (use
    er_match_score's on_duplicate_ids='dedupe' contract upstream if
    not).
    """
    fs = list(fields)
    if not fs:
        raise ValueError("fields must be non-empty")
    m_by = {f: (m[f] if isinstance(m, dict) else float(m)) for f in fs}
    eps = 1e-9

    def clamp(p: float) -> float:
        return min(max(p, eps), 1.0 - eps)

    # ONE u-estimation job for all fields (melt to (field, value) rows,
    # one count agg, one k-row collect) instead of one blocking
    # corpus-scan job per field. Counts are exact integers in double,
    # so the per-field sum(c^2)/(sum c)^2 is bit-identical to the
    # per-field-job form; string-cast grouping is injective per field
    # EXCEPT floating signed zero (raw grouping merges -0.0 with 0.0,
    # their strings differ), so float fields normalize -0.0 first —
    # pinned by tests/test_r8_ops.py::test_fellegi_sunter_typed_u.
    from pyspark.sql.types import DoubleType, FloatType  # noqa: PLC0415

    def _vstr(f: str) -> Column:
        col = F.col(f)
        if isinstance(records.schema[f].dataType, (DoubleType, FloatType)):
            col = F.when(col == 0, F.lit(0).cast(records.schema[f].dataType)).otherwise(
                col
            )
        return col.cast("string")

    melted = (
        records.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f).alias("__f"),
                            _vstr(f).alias("__v"),
                        )
                        for f in fs
                    ]
                )
            ).alias("__fv")
        )
        .select(F.col("__fv.__f").alias("__f"), F.col("__fv.__v").alias("__v"))
        .filter(F.col("__v").isNotNull())
    )
    vc = melted.groupBy("__f", "__v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    u_rows = {
        r["__f"]: r["u"]
        for r in vc.groupBy("__f")
        .agg((F.sum(F.col("c") * F.col("c")) / (F.sum("c") * F.sum("c"))).alias("u"))
        .collect()
    }
    u_by: dict[str, float] = {
        f: clamp(u_rows[f] if u_rows.get(f) is not None else 0.5) for f in fs
    }

    # Both payload sides read the same projection — project once and
    # cut so the records scan runs once (er_match_score's shape).
    proj = records.select(
        F.col(id_col).alias("__id"), *[F.col(f).alias(f"__f_{f}") for f in fs]
    ).localCheckpoint(eager=False)
    left = proj.select(
        F.col("__id").alias("__ida"),
        *[F.col(f"__f_{f}").alias(f"__a_{f}") for f in fs],
    )
    right = proj.select(
        F.col("__id").alias("__idb"),
        *[F.col(f"__f_{f}").alias(f"__b_{f}") for f in fs],
    )
    p = (
        pairs.select(F.col("id_a"), F.col("id_b"))
        .join(left, F.col("id_a") == F.col("__ida"))
        .join(right, F.col("id_b") == F.col("__idb"))
    )
    weight = F.lit(0.0)
    agree_cnt = F.lit(0)
    comp_cnt = F.lit(0)
    log2 = math.log(2.0)
    for f in fs:
        mm, uu = clamp(m_by[f]), u_by[f]
        w_agree = math.log(mm / uu) / log2
        w_disagree = math.log((1.0 - mm) / (1.0 - uu)) / log2
        a_, b_ = F.col(f"__a_{f}"), F.col(f"__b_{f}")
        present = a_.isNotNull() & b_.isNotNull()
        agrees = present & (a_ == b_)
        weight = weight + F.when(agrees, F.lit(w_agree)).when(
            present, F.lit(w_disagree)
        ).otherwise(F.lit(0.0))
        agree_cnt = agree_cnt + agrees.cast("int")
        comp_cnt = comp_cnt + present.cast("int")
    return p.select(
        "id_a",
        "id_b",
        agree_cnt.alias("n_agree"),
        comp_cnt.alias("n_compared"),
        dround(weight, 6).alias("fs_weight"),
    )
