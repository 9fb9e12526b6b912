"""Aggregation operators.

Reference equivalents: the sort -> group-by-key -> whole-group reduce
pipeline (disk_sort.py:39-75 + reducer.py:73-93). The reference has NO
map-side combine — every (k, v) crosses the shuffle (SURVEY.md §2.1
"notably absent"). Spark's hash aggregation is partial+final
automatically, which is the single biggest scale win over the reference:
at 100 TB a sum over a low-cardinality key shuffles a few rows per
partition instead of the whole table.

All helpers keep expressions JVM-side (pyspark.sql.functions) so they
stay inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, dsum


def group_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """groupBy + aggregate (reference O8+O14+O17+O18 collapsed into one op).

    Spark plans this as partial hash-agg -> shuffle on ``keys`` -> final
    hash-agg, spilling via Tungsten when groups exceed memory — replacing
    the reference's external merge sort (disk_sort.py:77-97) and DiskList
    oversized-group escape hatch (disk_list.py:6-63).
    """
    return df.groupBy(*keys).agg(*aggs)


def distinct_rows(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """DISTINCT — the reference's "emit (value, 1), reduce once per group"
    pattern (SURVEY.md §2.2). Partial aggregation dedupes map-side first."""
    return (df.select(*cols) if cols else df).distinct()


def count_distinct_by(
    df: DataFrame, keys: Sequence[str], col: str, *, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """COUNT(DISTINCT col) per key; ``approx=True`` -> HLL++ sketch,
    the scale path (one pass, no distinct shuffle) for 100 TB cardinality
    estimation. The reference can only do the exact two-job version."""
    agg = (
        F.approx_count_distinct(col, rsd) if approx else F.countDistinct(col)
    ).alias(f"{'approx_' if approx else ''}n_{col}")
    return df.groupBy(*keys).agg(agg)


def sketch_distinct_rollup(
    df: DataFrame,
    coarse_col: str,
    fine_col: str | Column,
    value_col: str,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Distinct counts via MERGEABLE HLL sketches (Apache Datasketches):
    build one sketch per (coarse, fine) cell, then roll up to the coarse
    grain by sketch UNION — the pre-aggregation pattern that lets a
    100 TB pipeline maintain per-day/per-shard sketches and combine them
    to any coarser grain (or across incremental loads) WITHOUT rescanning
    raw data. This is what :func:`count_distinct_by`'s
    ``approx_count_distinct`` cannot do: its estimate is final, not a
    reusable state. Returns (coarse, n_cells, approx_distinct).

    Dense HLL registers are max-merged, so re-aggregation never degrades
    accuracy below the lgk error bound. One measured subtlety (pinned by
    ``tests/test_operators.py::test_sketch_rollup_union_stays_in_bounds``):
    a small cell's sketch stays in sparse coupon mode, where a DIRECT
    estimate is exact — the union promotes coupons to dense registers,
    so tiny-cardinality rollup estimates can differ slightly from a
    one-shot sketch while both stay within the bound. Estimates are
    deterministic (hash-based, no RNG) at any parallelism. Both
    aggregations are map-side-combining; only fixed-size sketch binaries
    (~2^lgk bytes) cross the wire, never values.
    """
    fine = F.col(fine_col) if isinstance(fine_col, str) else fine_col
    cells = df.groupBy(F.col(coarse_col), fine.alias("__fine")).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("__sketch")
    )
    return cells.groupBy(coarse_col).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.hll_sketch_estimate(F.hll_union_agg("__sketch")).alias("approx_distinct"),
    )


def sketch_topk_rollup(
    df: DataFrame,
    coarse_col: str,
    fine_col: str | Column,
    item_col: str | Column,
    *,
    k: int = 5,
    max_items: int = 1024,
) -> DataFrame:
    """Top-k most frequent items via MERGEABLE frequent-items sketches
    (``approx_top_k_accumulate`` / ``_combine`` / ``_estimate``): build
    one sketch per (coarse, fine) cell, COMBINE to the coarse grain,
    then estimate — the sibling of :func:`sketch_distinct_rollup` for
    heavy-hitter queries. A 100 TB pipeline maintains per-day/per-shard
    sketches and rolls them up to any coarser grain (or across
    incremental loads) without rescanning raw data; only fixed-size
    sketch states (~``max_items`` entries) cross the wire.

    Accuracy contract: whenever a cell's distinct-item count stays
    within ``max_items`` the sketch tracks every item, so counts are
    EXACT and combine is lossless — size ``max_items`` for the expected
    item cardinality and the estimate is a hard answer, not an
    approximation (the registry oracle relies on this). Beyond that the
    datasketches frequent-items guarantee bounds the count error.

    Returns (coarse, rank, item, est_count), rank 1..k by
    (count DESC, item ASC) — a deterministic total order, unlike the
    sketch's own tie-arbitrary output ordering.
    """
    fine = F.col(fine_col) if isinstance(fine_col, str) else fine_col
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    cells = df.select(F.col(coarse_col), fine.alias("__fine"), item.alias("__item")).groupBy(
        coarse_col, "__fine"
    ).agg(F.expr(f"approx_top_k_accumulate(__item, {int(max_items)})").alias("__state"))
    merged = cells.groupBy(coarse_col).agg(
        F.expr(f"approx_top_k_combine(__state, {int(max_items)})").alias("__comb")
    )
    # estimate the FULL tracked set, then impose the deterministic order
    # and cut at k — the sketch's own top-k output breaks count ties in
    # an arbitrary (insertion-dependent) order.
    est = merged.select(
        coarse_col,
        F.explode(F.expr(f"approx_top_k_estimate(__comb, {int(max_items)})")).alias("__e"),
    ).select(
        coarse_col,
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("est_count"),
    )
    w = Window.partitionBy(coarse_col).orderBy(F.desc("est_count"), F.asc("item"))
    return (
        est.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(coarse_col, "rank", "item", "est_count")
    )


def sketch_quantile_rollup(
    df: DataFrame,
    coarse_col: str,
    fine_col: str | Column,
    value_col: str,
    *,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = 200,
) -> DataFrame:
    """Quantiles via MERGEABLE KLL sketches (Apache Datasketches): one
    sketch per (coarse, fine) cell, merged to the coarse grain with
    ``kll_merge_agg_double`` — the quantile member of the
    maintain-fine-sketches-roll-up-anywhere family
    (:func:`sketch_distinct_rollup` for distincts,
    :func:`sketch_topk_rollup` for heavy hitters). ``percentile`` /
    ``approx_percentile`` estimates are final values; KLL states are
    reusable, so a 100 TB pipeline re-aggregates daily sketches to any
    grain or across incremental loads without rescanning raw data. Only
    fixed-size sketch binaries (O(k log n) bytes) cross the wire.

    KLL at k=200 guarantees ~1.65% normalized RANK error (99%
    confidence). Unlike HLL, KLL compaction is randomized, so estimates
    vary slightly run-to-run — callers verifying results should check
    the rank of the estimate against the guarantee (the registry query
    does exactly that), never exact equality.

    Returns (coarse, n_cells, q_<p> for each p).
    """
    fine = F.col(fine_col) if isinstance(fine_col, str) else fine_col
    cells = df.select(
        F.col(coarse_col), fine.alias("__fine"), F.col(value_col).cast("double").alias("__v")
    ).groupBy(coarse_col, "__fine").agg(
        F.expr(f"kll_sketch_agg_double(__v, {int(k)})").alias("__sk")
    )
    merged = cells.groupBy(coarse_col).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.expr(f"kll_merge_agg_double(__sk, {int(k)})").alias("__m"),
    )
    qcols = [
        F.expr(f"kll_sketch_get_quantile_double(__m, CAST({p} AS DOUBLE))").alias(
            f"q_{str(p).replace('.', '')}"
        )
        for p in probs
    ]
    return merged.select(coarse_col, "n_cells", *qcols)


def numeric_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-range numeric histogram: bucket b covers
    [lo + b*w, lo + (b+1)*w) with w = (hi - lo) / nbins; values below
    ``lo`` land in bucket -1, values >= ``hi`` in bucket ``nbins``
    (PostgreSQL ``width_bucket`` convention shifted to 0-based interior
    buckets) — the data-profiling distribution pass. NULLs are skipped.

    One scan + one nbins-key aggregation; the bucket expression is
    explicit IEEE floor arithmetic rather than an engine builtin so the
    identical rule runs in any engine (the registry oracle replays it).
    Empty buckets are absent from the output (at 100 TB a dense output
    would need a bucket-spine join; callers needing zeros outer-join a
    ``spark.range(nbins)`` spine).

    Returns (bucket, lo_edge, hi_edge, n) with edges NULL for the two
    overflow buckets.
    """
    if nbins <= 0:
        raise ValueError(f"nbins must be positive: {nbins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo: ({lo}, {hi})")
    v = F.col(value_col).cast("double")
    bucket = _histogram_bucket(v, lo, hi, nbins)
    agg = (
        df.filter(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (float(hi) - float(lo)) / float(nbins)
    interior = (F.col("bucket") >= 0) & (F.col("bucket") < nbins)
    return agg.select(
        "bucket",
        F.when(interior, dround(F.lit(float(lo)) + F.col("bucket") * F.lit(w), 6)).alias(
            "lo_edge"
        ),
        F.when(
            interior, dround(F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w), 6)
        ).alias("hi_edge"),
        "n",
    )


def _histogram_bucket(v: Column, lo: float, hi: float, nbins: int) -> Column:
    """The shared fixed-range bucket rule of :func:`numeric_histogram`
    and :func:`histogram2d`: [lo + b*w, lo + (b+1)*w) interior buckets,
    -1 below, nbins at-or-above — explicit IEEE floor arithmetic so any
    engine replays it."""
    w = (float(hi) - float(lo)) / float(nbins)
    return (
        F.when(v < float(lo), F.lit(-1))
        .when(v >= float(hi), F.lit(nbins))
        .otherwise(F.floor((v - float(lo)) / F.lit(w)).cast("int"))
        .cast("int")
    )


def histogram2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    x_range: tuple[float, float, int],
    y_range: tuple[float, float, int],
) -> DataFrame:
    """Fixed-range 2-D histogram (the heatmap/profiling pass): joint
    bucket counts of two numeric columns under the same explicit
    bucket rule as :func:`numeric_histogram` per axis — the one-scan
    answer to "how do value and time-of-day covary", and the substrate
    for a density/outlier heatmap over a 100 TB table. Rows with a NULL
    on EITHER axis are skipped (a joint observation needs both); each
    axis keeps the -1 / nbins overflow buckets. Each ``*_range`` is
    (lo, hi, nbins). Emits (x_bucket, y_bucket, n) sparse — empty cells
    are absent (callers needing a dense grid outer-join a
    range-product spine).

    One scan + one aggregation keyed on (x_bucket, y_bucket) — at most
    (x_bins + 2) * (y_bins + 2) keys shuffle regardless of input size,
    fully map-side combined.
    """
    xlo, xhi, xb = x_range
    ylo, yhi, yb = y_range
    for lo_, hi_, b_ in (x_range, y_range):
        if b_ <= 0 or not hi_ > lo_:
            raise ValueError(f"bad range: ({lo_}, {hi_}, {b_})")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    return (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(
            _histogram_bucket(x, xlo, xhi, int(xb)).alias("x_bucket"),
            _histogram_bucket(y, ylo, yhi, int(yb)).alias("y_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass table profiling: per column, row count, NULL count,
    exact distinct count, and (numeric columns only) min/max/mean — the
    data-quality summary a pipeline records per ingested table/shard.

    ALL columns profile in a SINGLE aggregation over ONE scan (Spark
    plans the multi-distinct via Expand, still one job) — never one job
    per column; the 1-row wide result is then unpivoted driver-free
    into (column, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v)
    with doubles rounded for cross-engine stability. NULLs are excluded
    from n_distinct, min, max, and mean.

    The Expand multiplies every input row by (#distinct aggs + 1)
    BEFORE the partial aggregation, but the partial agg collapses each
    expanded stream to per-partition distinct values in the SAME stage,
    so only distinct partials cross the exchange. An r11 experiment
    that repartitioned the projected rows first (to parallelize the
    Expand past a single-row-group scan) measured WORSE interleaved at
    32 cores (med 2.63 s vs 2.31 s): the full-row shuffle write out of
    the serial scan task costs more than the Expand+partial-agg it
    displaces, and it adds an exchange. Measured rejection — the
    one-agg shape stands.
    """
    from pyspark.sql.types import NumericType  # noqa: PLC0415

    numeric = {f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)}
    df = df.select(*dict.fromkeys(cols))  # §2.3 insurance: scan only profiled columns
    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for c in cols:
        # coalesce: sum() over ZERO rows is NULL, but "no rows" means
        # zero nulls (the empty-input sweep caught the divergence)
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(
                f"__nulls_{c}"
            )
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(dround(F.min(F.col(c).cast("double")), 4).alias(f"__min_{c}"))
            aggs.append(dround(F.max(F.col(c).cast("double")), 4).alias(f"__max_{c}"))
            aggs.append(dround(F.avg(F.col(c).cast("double")), 4).alias(f"__mean_{c}"))
    # one row, but consumed by one select PER COLUMN below — without
    # the lineage cut each union branch would replay the whole scan +
    # aggregation (the same dual-consumption defect fixed in
    # tfidf/vocab/perplexity)
    wide = df.agg(*aggs).localCheckpoint(eager=False)
    null_d = F.lit(None).cast("double")
    rows = [
        wide.select(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}") if c in numeric else null_d).alias("min_v"),
            (F.col(f"__max_{c}") if c in numeric else null_d).alias("max_v"),
            (F.col(f"__mean_{c}") if c in numeric else null_d).alias("mean_v"),
        )
        for c in cols
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def zscore_outliers(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    value_col: str,
    *,
    z: float = 3.0,
) -> DataFrame:
    """Per-key z-score outlier detection: rows whose value sits >= ``z``
    sample standard deviations from their group mean — the monitoring /
    anomaly-surface pass over a metric stream. Emits (keys..., id,
    value, zscore) for flagged rows.

    One grouped aggregation computes (mean, stddev) per key; the tiny
    stats table broadcast-joins back onto the stream — two scans of the
    input (stats + join side) but no second shuffle and nothing
    key-partitioned a window would need. Groups with stddev 0 or
    NULL (constant or single-row) flag nothing. ``zscore`` is rounded
    to 4 decimals; the threshold compares the unrounded value, so a
    boundary row is decided by full double precision on any engine.
    """
    ks = [F.col(k) for k in keys]
    stats = df.groupBy(*ks).agg(
        F.avg(F.col(value_col).cast("double")).alias("__mu"),
        F.stddev_samp(F.col(value_col).cast("double")).alias("__sd"),
    )
    joined = df.join(F.broadcast(stats), list(keys))
    zval = (F.col(value_col).cast("double") - F.col("__mu")) / F.col("__sd")
    return (
        joined.filter(F.col("__sd") > 0)
        .filter(F.abs(zval) >= float(z))
        .select(
            *keys,
            F.col(id_col).alias("id"),
            F.col(value_col).cast("double").alias("value"),
            dround(zval, 4).alias("zscore"),
        )
    )


def quantile_rank_flag(
    df: DataFrame,
    key: str,
    value_col: str,
    est: DataFrame,
    *,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    tol: float = 0.05,
    flag_name: str = "rollup_ok",
) -> DataFrame:
    """Verify randomized quantile estimates by RANK: for each key, the
    exact rank of each estimated quantile (fraction of values <= the
    estimate, via one broadcast join back to the data) must sit within
    ``tol`` of its target probability. KLL guarantees ~1.65% rank error
    at k=200, so tol=0.05 is stable-TRUE when healthy and flips on any
    broken merge. ``est`` carries (key, q_<p>... ) as produced by
    :func:`sketch_quantile_rollup` / streaming
    read_quantile_estimate. Returns (key, <flag_name> boolean)."""
    checks = []
    for p in probs:
        qc = f"q_{str(p).replace('.', '')}"
        checks.append(
            F.abs(
                F.avg((F.col(value_col).cast("double") <= F.col(qc)).cast("double"))
                - F.lit(float(p))
            )
        )
    ranks = (
        df.join(F.broadcast(est), key)
        .groupBy(key)
        .agg(*[c.alias(f"__e{i}") for i, c in enumerate(checks)])
    )
    worst = F.greatest(*[F.col(f"__e{i}") for i in range(len(probs))]) if len(probs) > 1 else F.col("__e0")
    return ranks.select(key, (worst <= float(tol)).alias(flag_name))


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """ROLLUP — hierarchical subtotals. Absent in the reference (single
    grouping key per job, SURVEY.md §2.2); one shuffle in Spark."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    return df.cube(*keys).agg(*aggs)


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    salt_buckets: int = 8,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-stage salted sum for skewed keys.

    Low-cardinality hot keys make one reducer the straggler; salting
    splits each key into ``salt_buckets`` sub-keys for the first (heavy)
    shuffle, then re-aggregates the tiny partial table. AQE's skew-join
    handling covers joins; this is the aggregation-side equivalent.
    Result is identical to the direct groupBy (verified by oracle).

    The salt is a deterministic whole-row xxhash64 by default (works on
    any DataFrame, same trick as salted_join); pass ``salt_col`` to
    derive it from one column instead.
    """
    src = [F.col(salt_col)] if salt_col else [F.col(c) for c in df.columns]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*src), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").alias("n_rows"),
    )


def key_skew_report(
    df: DataFrame, keys: Sequence[str], *, top_n: int = 5
) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle key: key count,
    max/avg per-key row count, their ratio (the straggler factor — a
    uniform key is ~1, a hot key is how much longer its reducer runs),
    and the heaviest keys as a deterministic string.

    The pre-flight check before a big groupBy/join at scale: a ratio in
    the hundreds says salt (salted_group_agg / salted_join) or rely on
    AQE skew splitting. Cost: one map-side-combined count per key, a
    TakeOrderedAndProject for the heaviest keys (per-partition top-n,
    never a global sort), and a one-row summary agg.
    """
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    # counts feeds the summary agg AND the top-n rank (2 replays of the
    # corpus-wide key-count pass uncut); one cut runs it once.
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt")).select(
        key_str.alias("__k"), "__cnt"
    ).localCheckpoint(eager=False)
    summary = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__cnt").cast("long").alias("max_per_key"),
        dround(F.avg("__cnt"), 2).alias("avg_per_key"),
        dround(F.max("__cnt") / F.avg("__cnt"), 2).alias("skew_ratio"),
    )
    ranked = counts.orderBy(F.col("__cnt").desc(), F.col("__k")).limit(top_n)
    # re-sort the collected top-n (tiny) — collect_list order after a
    # limit is not guaranteed
    # nullif: with zero rows the joined list is '' while the SQL
    # string_agg twin is NULL — map the empty case to NULL so both
    # engines agree on degenerate input (real data never emits '').
    top_str = ranked.agg(
        F.nullif(F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__cnt"), F.col("__k"))),
                    lambda a, b: F.when(a["__cnt"] > b["__cnt"], -1)
                    .when(a["__cnt"] < b["__cnt"], 1)
                    .otherwise(
                        F.when(a["__k"] < b["__k"], -1)
                        .when(a["__k"] > b["__k"], 1)
                        .otherwise(0)
                    ),
                ),
                lambda s: F.concat_ws(":", s["__k"], s["__cnt"].cast("string")),
            ),
            ",",
        ), F.lit("")).alias("top_keys")
    )
    return summary.crossJoin(top_str)


def group_quantile_filter(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    *,
    keep: str = "upper",
) -> DataFrame:
    """Keep each group's rows at or above (``keep='upper'``) / strictly
    below (``'lower'``) the group's exact q-quantile of ``value_col`` —
    the per-source quality gate of a training pipeline ("drop the worst
    half of every source"). Beyond the reference surface (SURVEY.md
    §2.2 north-star extensions).

    The threshold is the EXACT interpolated percentile (percentile_cont
    semantics — reproducible in any engine, unlike approx sketches),
    computed per group in one aggregation; the n_groups-row threshold
    table is broadcast back, so the data side is one scan + a map-side
    join when ``df`` is a direct table scan. When ``df`` carries
    expensive derived lineage (e.g. a computed quality score), cut it
    first (``df.localCheckpoint(eager=False)``) — the threshold branch
    and the data branch are separate consumers, so Catalyst otherwise
    recomputes the lineage for each. Spark's exact percentile aggregates
    a per-group value-counts map, so memory scales with DISTINCT values
    per group — bounded for rounded/score-like columns regardless of
    corpus size; use approx_percentile for unbounded-cardinality raw
    measures.

    Rows with a NULL ``value_col`` are excluded from BOTH sides (the
    percentile ignores them and NULL fails either comparison), so
    'upper' and 'lower' partition only the non-null rows; a group whose
    values are all NULL has a NULL threshold and keeps nothing.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1]: {q}")
    if keep not in ("upper", "lower"):
        raise ValueError(f"keep must be 'upper' or 'lower': {keep}")
    thr = df.groupBy(group_col).agg(F.percentile(value_col, q).alias("__thr"))
    joined = df.join(F.broadcast(thr), group_col)
    pred = (
        F.col(value_col) >= F.col("__thr")
        if keep == "upper"
        else F.col(value_col) < F.col("__thr")
    )
    return joined.filter(pred).drop("__thr")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary over lineitem.

    Exercises the reference's entire physical pipeline in one declarative
    plan: scan -> pushed-down filter -> project -> partial agg -> shuffle
    on (returnflag, linestatus) -> final agg -> sort (SURVEY.md §7
    "minimum end-to-end slice").

    Doubles are rounded via :func:`dround` so results are bit-stable
    across engines and partition orderings (float sums are order-
    sensitive; engine ROUND semantics differ — see functions/scalar.py).
    """
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            dround(F.avg("l_quantity")).alias("avg_qty"),
            dround(F.avg("l_extendedprice")).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def robust_scale(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group robust standardization: (x - median) / IQR — the
    outlier-resistant feature-scaling step of an ML-prep pipeline
    (z-scoring breaks under the same heavy tails
    :func:`zscore_outliers` hunts for). Groups whose IQR is 0
    (constant-ish) scale to 0.0 rather than dividing by zero.

    One grouped EXACT-percentile aggregation (interpolated — engine
    -reproducible, unlike randomized quantile sketches; for corpora
    where exactness can be traded away use
    :func:`sketch_quantile_rollup`), broadcast back onto the stream:
    one stats pass plus a map-side join, no second shuffle. The scaled
    value rounds to 6 decimals for cross-engine stability.
    """
    ks = list(keys)
    v = F.col(value_col).cast("double")
    # stats round to 1e-6 BEFORE entering the arithmetic: interpolated
    # percentiles can differ between engines in the last ulp, and an
    # unrounded median would propagate that into every scaled value's
    # own rounding boundary
    stats = df.groupBy(*ks).agg(
        dround(F.expr(f"percentile({value_col}, 0.5D)"), 6).alias("__med"),
        dround(
            F.expr(f"percentile({value_col}, 0.75D)")
            - F.expr(f"percentile({value_col}, 0.25D)"),
            6,
        ).alias("__iqr"),
    )
    scaled = F.when(F.col("__iqr") > 0, (v - F.col("__med")) / F.col("__iqr")).otherwise(
        F.lit(0.0)
    )
    return df.join(F.broadcast(stats), ks).select(
        *ks, v.alias(value_col), dround(scaled, 6).alias(out_col)
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    *,
    smoothing: float = 10.0,
    out_col: str = "te",
) -> DataFrame:
    """Smoothed target encoding of a categorical column: each category
    maps to ``(sum(label) + m * global_mean) / (n + m)`` — the
    shrinkage-towards-prior rule that keeps rare categories from
    memorizing their few labels (the standard categorical feature for
    gradient-boosted / linear models). NULL categories encode as their
    own group; NULL labels are excluded from sums and counts on both
    the category and global side.

    One grouped aggregation plus a 1-row global aggregate, both
    broadcast back onto the stream — no second shuffle. Label sums run
    in DECIMAL(18,6) (exact, associative; see functions/scalar.py) and
    the encoding rounds to 6 decimals, so the value is reproducible at
    any parallelism and in any engine.
    """
    lab = F.col(label_col).cast("double")
    per_cat = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(lab).cast("double").alias("__n"),
        F.coalesce(F.sum(lab.cast("decimal(18,6)")), F.lit(0).cast("decimal(18,6)"))
        .alias("__s"),
    ).localCheckpoint(eager=False)  # feeds both the global roll-up and the join
    # the global prior DERIVES from the per-category frame — no second
    # scan of the data (DECIMAL sums re-aggregate exactly)
    glob = per_cat.agg(
        F.coalesce(F.sum("__n"), F.lit(0.0)).cast("double").alias("__gn"),
        F.coalesce(F.sum("__s"), F.lit(0).cast("decimal(18,6)")).alias("__gs"),
    )
    m = float(smoothing)
    prior = F.col("__gs").cast("double") / F.greatest(F.col("__gn"), F.lit(1.0))
    enc = (F.col("__s").cast("double") + F.lit(m) * prior) / (F.col("__n") + F.lit(m))
    return (
        df.join(
            F.broadcast(per_cat), F.col(cat_col).eqNullSafe(F.col("__cat")), "left"
        )
        .crossJoin(F.broadcast(glob))
        .select(*df.columns, dround(enc, 6).alias(out_col))
    )


def winsorize(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str = "clipped",
) -> DataFrame:
    """Per-group winsorization: clamp values to the group's
    [``lo``, ``hi``] exact interpolated percentiles — the tail-taming
    companion of :func:`robust_scale` (clip the outliers instead of
    rescaling around them). Same determinism contract: the clip bounds
    round to 1e-6 BEFORE clamping so both engines clamp against
    identical numbers; same plan shape: one grouped stats pass
    broadcast back, no second shuffle.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1: ({lo}, {hi})")
    ks = list(keys)
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*ks).agg(
        dround(F.expr(f"percentile({value_col}, {lo}D)"), 6).alias("__lo"),
        dround(F.expr(f"percentile({value_col}, {hi}D)"), 6).alias("__hi"),
    )
    return df.join(F.broadcast(stats), ks).select(
        *ks,
        v.alias(value_col),
        F.greatest(F.least(v, F.col("__hi")), F.col("__lo")).alias(out_col),
    )


def equi_freq_bins(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Per-group equal-frequency discretization: assign each value the
    bucket index ``1 + #{thresholds < value}`` where the thresholds are
    the group's interpolated (i/n_bins)-quantiles — the feature-binning
    step (decile flags, quantile-bucketed labels) of ML prep, sibling
    of :func:`robust_scale` and :func:`winsorize`. Bins are 1..n_bins;
    ties at a threshold fall into the LOWER bin (strict <), so the rule
    is deterministic and engine-reproducible; heavily repeated values
    can make bins uneven — that's the data, not the rule.

    One grouped exact-percentile aggregation (thresholds rounded to
    1e-6 before comparison, same scheme as robust_scale), broadcast
    back onto the stream; the bin assignment is a size(filter(...))
    over an n_bins-element array — a per-row HOF over a handful of
    elements, not a per-token loop.
    """
    ks = list(keys)
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    fracs = [i / n_bins for i in range(1, n_bins)]
    stats = df.groupBy(*ks).agg(
        F.array(
            *[
                dround(F.expr(f"percentile({value_col}, {f!r}D)"), 6)
                for f in fracs
            ]
        ).alias("__thr")
    )
    v = F.col(value_col).cast("double")
    bin_expr = (
        F.size(F.filter("__thr", lambda t: t < v)) + F.lit(1)
    ).cast("long")
    return df.join(F.broadcast(stats), ks).select(
        *ks, v.alias(value_col), bin_expr.alias(out_col)
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    n_bins: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Per-group Population Stability Index between a reference snapshot
    and a current snapshot of a numeric column — the standard
    train/serve (or epoch-over-epoch) distribution-drift monitor:
    PSI = sum over buckets of (p_cur - p_ref) * ln(p_cur / p_ref), with
    buckets fixed by the REFERENCE side's equal-frequency quantiles and
    proportions floored at ``eps`` so empty buckets stay finite.
    Conventional reading: < 0.1 stable, 0.1-0.2 shifting, >= 0.2 drifted
    — emitted as ``drifted = psi >= 0.2``. The reference has no
    distribution-monitoring surface (SURVEY.md §2.2 north-star
    extensions); pairs with :func:`ks_statistic` (rank-based twin).

    Scale shape: one grouped exact-percentile pass over the reference
    (thresholds rounded to 1e-6, the :func:`equi_freq_bins` rule) is
    broadcast onto BOTH streams; bucket counts partially aggregate
    map-side, so the shuffle carries ~(keys x n_bins) rows regardless of
    input size; totals re-aggregate from the count frame (no second data
    scan). Determinism: proportions are exact integer ratios, each
    bucket's PSI term rounds to 1e-8 before a DECIMAL(18,8) sum, and the
    final PSI rounds to 1e-6 — reproducible at any parallelism and
    bit-equal in the DuckDB oracle.
    """
    ks = list(keys)
    # NULL values carry no distribution information and the strict-<
    # bucket rule diverges between engines on NULL — exclude them
    # explicitly so the contract is NULL-free on both sides.
    ref = ref.filter(F.col(value_col).isNotNull())
    cur = cur.filter(F.col(value_col).isNotNull())
    thr = psi_reference_thresholds(ref, ks, value_col, n_bins=n_bins)
    v = F.col(value_col).cast("double")
    bucket = (F.size(F.filter("__thr", lambda t: t < v)) + F.lit(1)).cast("int")

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        return (
            df.join(F.broadcast(thr), ks)
            .select(*ks, bucket.alias("__b"), F.lit(side).alias("__side"))
        )

    counts = (
        bucketed(ref, "r")
        .unionByName(bucketed(cur, "c"))
        .groupBy(*ks, "__b")
        .agg(
            F.sum(F.when(F.col("__side") == "r", 1).otherwise(0)).cast("long").alias("__nr"),
            F.sum(F.when(F.col("__side") == "c", 1).otherwise(0)).cast("long").alias("__nc"),
        )
    )
    return psi_from_bucket_counts(counts, ks, eps=eps)


def psi_from_bucket_counts(
    counts: DataFrame,
    keys: Sequence[str],
    *,
    eps: float = 1e-4,
) -> DataFrame:
    """The counts→PSI tail of :func:`psi_drift`, factored out so
    alternative count sources plug in — in particular the INCREMENTAL
    path (``streaming/incremental.py::incremental_psi_buckets``), where
    the current-side histogram is the SUM of per-epoch bucket counts
    (bucket counts are additive, so drift monitoring over an unbounded
    ingest never rescans old epochs). ``counts`` carries one row per
    (keys..., __b) with ``__nr`` / ``__nc`` long columns; same
    determinism contract as :func:`psi_drift`.

    Empty-side contract: the eps floors keep every term finite only
    while BOTH sides have rows. A key whose current (or reference) side
    has ZERO rows total — the population vanished or appeared, maximal
    drift — would otherwise form 0/0 = NaN ratios that the decimal cast
    silently turns into a NULL psi with a NULL ``drifted``; instead the
    zero-total case is guarded explicitly: psi = NULL (undefined) and
    ``drifted = true``.
    """
    ks = list(keys)
    counts = counts.localCheckpoint(eager=False)  # feeds totals roll-up + term sum
    totals = counts.groupBy(*ks).agg(
        F.sum("__nr").cast("double").alias("__tr"),
        F.sum("__nc").cast("double").alias("__tc"),
    )
    e = float(eps)
    p_ref = F.greatest(F.col("__nr").cast("double") / F.col("__tr"), F.lit(e))
    p_cur = F.greatest(F.col("__nc").cast("double") / F.col("__tc"), F.lit(e))
    term = dround((p_cur - p_ref) * F.ln(p_cur / p_ref), 8)
    psi = dround(F.sum(term.cast("decimal(18,8)")).cast("double"), 6)
    both = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    return (
        counts.join(F.broadcast(totals), ks)
        .groupBy(*ks)
        .agg(
            F.max("__tr").cast("long").alias("n_ref"),
            F.max("__tc").cast("long").alias("n_cur"),
            psi.alias("psi"),
        )
        .withColumn("psi", F.when(both, F.col("psi")))
        .withColumn("drifted", F.when(both, F.col("psi") >= F.lit(0.2)).otherwise(F.lit(True)))
    )


def psi_reference_thresholds(
    ref: DataFrame, keys: Sequence[str], value_col: str, *, n_bins: int = 10
) -> DataFrame:
    """The pinned reference decile thresholds :func:`psi_drift` buckets
    against, as a standalone frame (keys..., __thr array) — computed
    once at monitor setup and broadcast against every future snapshot /
    ingest epoch (the incremental path's fixed yardstick)."""
    ks = list(keys)
    fracs = [i / n_bins for i in range(1, n_bins)]
    return ref.filter(F.col(value_col).isNotNull()).groupBy(*ks).agg(
        F.array(
            *[dround(F.expr(f"percentile({value_col}, {f!r}D)"), 6) for f in fracs]
        ).alias("__thr")
    )


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed two-sample Kolmogorov-Smirnov statistic:
    D = sup_x |ECDF_a(x) - ECDF_b(x)| over a numeric column — the
    nonparametric drift/shift test that needs no binning choice (the
    rank-based twin of :func:`psi_drift`). Emits one row
    (n_a, n_b, ks_stat). NULL values are excluded per side.

    Scale shape: the sup over x is attained at data points, so the plan
    aggregates each side to per-DISTINCT-VALUE counts first (map-side
    combinable; the frame that remains is value-cardinality-sized, not
    data-sized), full-outer-merges the two count sets by value, then
    takes ONE distributed running-sum pass over the value order
    (:func:`~python_mapreduce_spark.operators.windows.global_running_sum`
    with BOTH sides' counts as weight columns — range exchange +
    per-range-partition window + broadcast offsets, never a single-task
    window; both cumulative counts ride the same exchange as separate
    longs, exact up to 2^63 rows per side, so no bit-packing cliff
    exists anywhere on the path).
    Determinism: ECDF ratios divide exact integer counts (IEEE-identical
    in any engine); the final statistic rounds to 1e-6.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    va = a.select(F.col(value_col).cast("double").alias("v")).filter(F.col("v").isNotNull())
    vb = b.select(F.col(value_col).cast("double").alias("v")).filter(F.col("v").isNotNull())
    counts = (
        va.select("v", F.lit(1).alias("__ca"), F.lit(0).alias("__cb"))
        .unionByName(vb.select("v", F.lit(0).alias("__ca"), F.lit(1).alias("__cb")))
        .groupBy("v")
        .agg(F.sum("__ca").cast("long").alias("__ca"), F.sum("__cb").cast("long").alias("__cb"))
    )
    cum = global_running_sum(
        counts,
        ["v"],
        ["__ca", "__cb"],
        out=["__cuma", "__cumb"],
        num_partitions=num_partitions,
    )
    tot = cum.agg(
        F.sum("__ca").cast("double").alias("__na"),
        F.sum("__cb").cast("double").alias("__nb"),
    )
    gap = F.abs(
        F.col("__cuma").cast("double") / F.col("__na")
        - F.col("__cumb").cast("double") / F.col("__nb")
    )
    # groupBy a literal rather than a global agg: with ZERO input values
    # the statistic does not exist, and a grouped agg emits zero rows
    # (matching the oracle's GROUP BY) where a global agg would invent
    # one all-NULL row.
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(F.lit(1).alias("__g"))
        .agg(
            F.max(F.col("__na")).cast("long").alias("n_a"),
            F.max(F.col("__nb")).cast("long").alias("n_b"),
            dround(F.max(gap), 6).alias("ks_stat"),
        )
        .drop("__g")
    )


def mix_entropy(
    df: DataFrame,
    keys: Sequence[str],
    cat_col: str,
) -> DataFrame:
    """Per-group Shannon entropy of a categorical mix:
    H = -sum p * ln(p) over the group's category proportions, plus the
    normalized H / ln(n_categories) in [0, 1] — the mix-balance metric a
    data card reports per source/shard (a source whose language entropy
    collapses is single-language; a shard whose domain entropy is ~0
    defeats domain mixing). NULL categories count as their own category.
    Emits (keys..., n_rows, n_categories, entropy, entropy_norm);
    single-category groups normalize to 0.0 by convention.

    Scale shape: one (keys, cat) hash aggregation (map-side combined);
    group totals and category counts RE-aggregate from that frame — the
    data is scanned once. Determinism: proportions are exact integer
    ratios; each term rounds to 1e-8 before a DECIMAL(18,8) sum (the
    :func:`psi_drift` ln scheme) and the outputs round to 1e-6.
    """
    ks = list(keys)
    # counts feeds the totals re-agg AND the entropy join (2 corpus
    # scans uncut); one cut of the category-sized frame scans once.
    counts = df.groupBy(*ks, F.col(cat_col).alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    ).localCheckpoint(eager=False)
    # totals derive from the count frame via a second keyed agg +
    # broadcast join (NOT a window: the count frame is category-sized,
    # but a window would still re-shuffle it; the join is map-side)
    totals = counts.groupBy(*ks).agg(F.sum("__n").cast("double").alias("__t"))
    p = F.col("__n").cast("double") / F.col("__t")
    term = dround(-p * F.ln(p), 8)
    ent = dround(F.sum(term.cast("decimal(18,8)")).cast("double"), 6)
    out = (
        counts.join(F.broadcast(totals), ks)
        .groupBy(*ks)
        .agg(
            F.max("__t").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
            ent.alias("entropy"),
        )
    )
    norm = F.when(
        F.col("n_categories") > 1,
        dround(F.col("entropy") / F.ln(F.col("n_categories").cast("double")), 6),
    ).otherwise(F.lit(0.0))
    return out.withColumn("entropy_norm", norm)


def group_ols(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """Per-group simple linear regression (OLS) from sufficient
    statistics: slope, intercept, and r² of y over x computed from ONE
    aggregation of (n, Σx, Σy, Σxy, Σx², Σy²) — the distributed trend
    fit (is this metric drifting up?, per-segment growth rates) that
    needs no iterative solver. Emits (keys..., n, slope, intercept,
    r2); groups with a degenerate x variance (single x value) or a
    constant y carry NULL slope/intercept/r2 (for constant y the fit is
    the horizontal line but r² is 0/0 — reported as NULL rather than
    invented).

    Scale shape: one map-side-combinable hash aggregation; every sum
    runs in DECIMAL (exact, associative — the functions/scalar.py::dsum
    argument), so the sufficient statistics are bit-identical at any
    parallelism and in the DuckDB oracle; the closed-form divisions
    happen once per group in a fixed IEEE expression shape, rounded to
    6 decimals.
    """
    ks = list(keys)
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("decimal(18,6)")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("decimal(18,6)")
    stats = df.groupBy(*ks).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(y).cast("double").alias("__sy"),
        F.sum((x * y).cast("decimal(28,8)")).cast("double").alias("__sxy"),
        F.sum((x * x).cast("decimal(28,8)")).cast("double").alias("__sxx"),
        F.sum((y * y).cast("decimal(28,8)")).cast("double").alias("__syy"),
    )
    nn = F.col("n").cast("double")
    cov_n = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    var_x = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    var_y = nn * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = cov_n / var_x
    intercept = (F.col("__sy") - slope * F.col("__sx")) / nn
    r2 = cov_n * cov_n / (var_x * var_y)
    ok = F.col("__sxx").isNotNull() & (var_x > 0)
    return stats.select(
        *ks,
        "n",
        F.when(ok, dround(slope, 6)).alias("slope"),
        F.when(ok, dround(intercept, 6)).alias("intercept"),
        F.when(ok & (var_y > 0), dround(r2, 6)).alias("r2"),
    )


def class_weights(
    df: DataFrame,
    label_col: str,
) -> DataFrame:
    """Balanced class weights: per label, ``N / (k * n_label)`` (the
    sklearn "balanced" rule — mean weight 1 when classes are even,
    rare classes weighted up) plus the frequency — the loss-weighting
    table a trainer consumes against a skewed label distribution. NULL
    labels form their own class. Emits (label, n, freq, weight),
    ratios rounded to 6 decimals.

    Scale shape: one map-side-combined count per label; N and k
    RE-aggregate from that label-sized frame (one data scan).
    """
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=False)  # feeds the totals roll-up and the output
    tot = counts.agg(
        F.sum("n").cast("double").alias("__N"),
        F.count(F.lit(1)).cast("double").alias("__k"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        dround(F.col("n") / F.col("__N"), 6).alias("freq"),
        dround(F.col("__N") / (F.col("__k") * F.col("n")), 6).alias("weight"),
    )


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col,
    *,
    group_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ROC AUC via the rank (Mann-Whitney) identity:
    AUC = P(score_pos > score_neg) + 0.5 * P(tie) — the
    threshold-free quality number for a filtering/ranking model (e.g. a
    quality classifier deciding which documents survive curation).
    ``label_col`` is a column name or boolean Column; rows with NULL
    score or NULL label are excluded. Emits one row per group (ONE row
    when ``group_cols`` is empty): (group_cols..., n_pos, n_neg, auc);
    AUC is NULL when either class is empty in the group, and zero rows
    are emitted for empty input (matching a grouped oracle).

    Scale shape: the sort-free plan of :func:`ks_statistic` — each
    distinct score aggregates to (n_pos, n_neg) map-side (the frame
    that shuffles is score-cardinality-sized). Ungrouped, the
    cumulative negative count comes from ONE distributed running sum
    over the score order
    (:func:`~python_mapreduce_spark.operators.windows.global_running_sum`)
    — no global sort, no single-task window. Grouped, it is a plain
    window PARTITIONED BY the group keys over the count frame (parallel
    across groups; per-group sorted data is score-cardinality-sized —
    right for many-slice evals; for a FEW huge groups with continuous
    scores, run the ungrouped path per group instead, or pre-round the
    score to bound per-group cardinality).
    The pair count ``2*p*(negs_below) + p*n_ties`` stays in exact
    integers until the single final division (the SUM rides
    DECIMAL(38,0) past the ~4e9-row int64 cliff), so the statistic is
    bit-identical in any engine.
    """
    gs = list(group_cols)
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        *gs,
        F.col(score_col).cast("double").alias("__s"),
        y.cast("boolean").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    counts = base.groupBy(*gs, "__s").agg(
        F.sum(F.col("__y").cast("long")).cast("long").alias("__p"),
        F.sum((~F.col("__y")).cast("long")).cast("long").alias("__n"),
    )
    return auc_from_score_counts(counts, gs, num_partitions=num_partitions)


def auc_from_score_counts(
    counts: DataFrame,
    group_cols: Sequence[str] = (),
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """The counts→AUC tail of :func:`auc_score`, factored out so
    alternative count sources plug in — in particular the INCREMENTAL
    path (``streaming/incremental.py::incremental_score_counts``):
    per-distinct-score (positive, negative) counts are ADDITIVE across
    ingest epochs, so a continuously-evaluated model's AUC recomputes
    from score-cardinality-sized state without rescanning old epochs.
    ``counts`` carries one row per (group_cols..., __s) with long
    ``__p`` / ``__n`` columns; same contract as :func:`auc_score`.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    gs = list(group_cols)
    if gs:
        from pyspark.sql.window import Window  # noqa: PLC0415

        w = (
            Window.partitionBy(*gs)
            .orderBy("__s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = counts.withColumn("__cn", F.sum("__n").over(w))
    else:
        cum = global_running_sum(
            counts, ["__s"], "__n", out="__cn", num_partitions=num_partitions
        )
    # negatives strictly below this score + half the ties, doubled to
    # stay integral: 2*p*(cum_n - n) + p*n
    num2 = F.col("__p") * (F.lit(2) * (F.col("__cn") - F.col("__n")) + F.col("__n"))
    group_keys = gs if gs else [F.lit(1).alias("__g")]
    agg = cum.groupBy(*group_keys).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(num2.cast("decimal(38,0)")).cast("double").alias("__num2"),
    )
    denom = F.lit(2.0) * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        *gs,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            dround(F.col("__num2") / denom, 6),
        ).alias("auc"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 / support from a
    (label, prediction) pair column — the eval table behind every
    "is the filter model good enough to curate with" decision. A class
    appearing only among predictions still gets a row (support 0, NULL
    recall); NULL labels/predictions are their own class (surfacing
    missing metadata rather than dropping it). Emits
    (class, support, predicted, tp, precision, recall, f1), ratios
    rounded to 6; F1 is NULL when precision+recall is 0 or undefined.

    Scale shape: ONE (label, pred) hash agg scans the data (map-side
    combined; the surviving frame is class^2-sized, lazily
    localCheckpoint'ed); marginals, diagonal, and the final full-outer
    assembly all derive from that tiny frame without touching the data
    again.
    """
    conf = (
        df.groupBy(
            F.col(label_col).alias("__l"), F.col(pred_col).alias("__p")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=False)  # three consumers below
    )
    actual = conf.groupBy(F.col("__l").alias("class")).agg(
        F.sum("__n").cast("long").alias("support")
    )
    pred = conf.groupBy(F.col("__p").alias("class")).agg(
        F.sum("__n").cast("long").alias("predicted")
    )
    tp = conf.filter(F.col("__l").eqNullSafe(F.col("__p"))).select(
        F.col("__l").alias("__tc"), F.col("__n").alias("tp")
    )
    # null-safe assembly: a NULL class is a real class (missing
    # metadata), and plain equi-joins would split its row in two and
    # detach its diagonal count
    pred2 = pred.withColumnRenamed("class", "__pc")
    merged = actual.join(
        pred2, F.col("class").eqNullSafe(F.col("__pc")), "full_outer"
    ).select(
        F.coalesce(F.col("class"), F.col("__pc")).alias("class"),
        "support",
        "predicted",
    )
    joined = (
        merged.join(tp, F.col("class").eqNullSafe(F.col("__tc")), "left")
        .select(
            "class",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("predicted", F.lit(0)).cast("long").alias("predicted"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    prec = F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted"))
    rec = F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        F.lit(2.0) * prec * rec / (prec + rec),
    )
    return joined.select(
        "class", "support", "predicted", "tp",
        dround(prec, 6).alias("precision"),
        dround(rec, 6).alias("recall"),
        dround(f1, 6).alias("f1"),
    )


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical columns (two annotators, or model vs. declared
    metadata): kappa = (p_o - p_e) / (1 - p_e) with p_o the observed
    agreement rate and p_e the marginal-product chance rate. NULL
    values form their own category on both sides. Emits ONE row
    (n, po, pe, kappa), rates rounded to 6; kappa is NULL at pe = 1
    (degenerate single-category data); empty input emits zero rows.

    Scale shape: ONE (a, b) hash agg (map-side combined,
    localCheckpoint'ed); both marginals and the diagonal re-aggregate
    from the class^2-sized frame — the data is scanned once.
    """
    conf = (
        df.groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=False)  # marginals + diagonal + total
    )
    ma = conf.groupBy("__a").agg(F.sum("__n").cast("long").alias("__na"))
    mb = conf.groupBy("__b").agg(F.sum("__n").cast("long").alias("__nb"))
    # chance agreement: sum over categories of (marginal_a * marginal_b)
    pe_num = (
        ma.join(mb, F.col("__a").eqNullSafe(F.col("__b")))
        .agg(F.sum(F.col("__na") * F.col("__nb")).cast("double").alias("__pe_num"))
    )
    agg = conf.groupBy(F.lit(1).alias("__g")).agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum(F.when(F.col("__a").eqNullSafe(F.col("__b")), F.col("__n")).otherwise(0))
        .cast("double")
        .alias("__agree"),
    )
    po = F.col("__agree") / F.col("n")
    pe = F.coalesce(F.col("__pe_num"), F.lit(0.0)) / (F.col("n").cast("double") * F.col("n"))
    return (
        agg.crossJoin(F.broadcast(pe_num))
        .select(
            "n",
            dround(po, 6).alias("po"),
            dround(pe, 6).alias("pe"),
            F.when(pe < 1.0, dround((po - pe) / (F.lit(1.0) - pe), 6)).alias("kappa"),
        )
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col,
    *,
    n_bins: int = 10,
    summary: bool = False,
) -> DataFrame:
    """Probability-calibration audit for a [0, 1] score against a
    binary outcome — per-bin reliability rows, or (``summary=True``)
    the one-row Brier score + Expected Calibration Error. A filter
    model whose confidence is uncalibrated quietly biases every
    threshold-based curation decision, so this is the companion check
    to :func:`auc_score` (rank quality) and
    :func:`classification_report` (thresholded quality).

    Per-bin rows: (bin, n, conf, acc, gap) — equal-width bins
    ``least(floor(s * n_bins), n_bins - 1)`` (scores clamped into
    [0, 1]), conf = mean score, acc = empirical positive rate,
    gap = |conf - acc|, all rounded to 6. Summary row:
    (n, brier, ece) with ece = sum_bins |sum(s) - sum(y)| / N — exact
    because each bin's weighted gap telescopes to an absolute
    difference of one DECIMAL sum and one integer count. Empty input
    emits zero rows in both shapes.

    Scale shape: ONE projection + ONE map-side-combined hash agg on the
    bin key produce the (n_bins)-sized frame; the summary re-aggregates
    that frame (the data is scanned once either way). Determinism:
    scores round to 1e-6 before a DECIMAL(28,6) sum; squared errors
    round to 1e-8 before a DECIMAL(28,8) sum; outputs round to 1e-6.
    """
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    s = F.least(F.greatest(F.col(score_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    base = df.select(
        s.alias("__s"), y.cast("boolean").cast("long").alias("__y")
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    binned = base.select(
        F.least(
            F.floor(F.col("__s") * F.lit(n_bins)).cast("long"), F.lit(n_bins - 1)
        ).alias("bin"),
        dround(F.col("__s"), 6).cast("decimal(28,6)").alias("__s6"),
        "__y",
        dround((F.col("__s") - F.col("__y")) * (F.col("__s") - F.col("__y")), 8)
        .cast("decimal(28,8)")
        .alias("__sq"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__s6").alias("__ss"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum("__sq").alias("__ssq"),
    )
    if not summary:
        conf = F.col("__ss").cast("double") / F.col("n")
        acc = F.col("__sy").cast("double") / F.col("n")
        return bins.select(
            "bin",
            "n",
            dround(conf, 6).alias("conf"),
            dround(acc, 6).alias("acc"),
            dround(F.abs(conf - acc), 6).alias("gap"),
        )
    # n * |conf - acc| = |sum(s) - sum(y)| exactly (decimal minus integer)
    gap_mass = F.abs(F.col("__ss") - F.col("__sy").cast("decimal(28,6)"))
    return bins.groupBy(F.lit(1).alias("__g")).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("__ssq").alias("__tsq"),
        F.sum(gap_mass).alias("__tgap"),
    ).select(
        "n",
        dround(F.col("__tsq").cast("double") / F.col("n"), 6).alias("brier"),
        dround(F.col("__tgap").cast("double") / F.col("n"), 6).alias("ece"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Precision-recall curve: one row per DISTINCT score threshold t
    with the metrics of the classifier "predict positive iff score >= t"
    — the threshold-sweep companion to :func:`auc_score` (which collapses
    the sweep to one number) and the input to every operating-point
    choice a curation filter makes. Rows with NULL score/label are
    excluded. Emits (threshold, n_pred, tp, precision, recall, f1)
    ordered by threshold; recall is NULL when there are no positives,
    f1 NULL where precision + recall = 0; empty input emits zero rows.

    Scale shape: identical to :func:`auc_score`'s sort-free plan — one
    map-side-combined hash agg to per-distinct-score (n_pos, n_neg),
    then ONE multi-weight distributed running sum over DESCENDING score
    (both cumulative counts ride the same range exchange; the frame is
    score-cardinality-sized, never data-sized). Totals come from a tiny
    broadcast. Determinism: every metric divides exact integer counts
    and rounds to 1e-6.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    y = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        y.cast("boolean").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    counts = (
        base.groupBy("__s")
        .agg(
            F.sum(F.col("__y").cast("long")).cast("long").alias("__p"),
            F.sum((~F.col("__y")).cast("long")).cast("long").alias("__n"),
        )
        # descending threshold order = ascending order of the negated
        # score; the running sums then accumulate "predicted positive
        # at threshold >= s" counts
        .withColumn("__negs", -F.col("__s"))
    )
    cum = global_running_sum(
        counts,
        ["__negs"],
        ["__p", "__n"],
        out=["__cp", "__cn"],
        num_partitions=num_partitions,
    )
    tot = cum.agg(F.sum("__p").cast("long").alias("__tp_all"))
    n_pred = F.col("__cp") + F.col("__cn")
    prec = F.col("__cp").cast("double") / n_pred.cast("double")
    rec = F.when(
        F.col("__tp_all") > 0, F.col("__cp").cast("double") / F.col("__tp_all")
    )
    f1 = F.when(prec + rec > 0, 2.0 * prec * rec / (prec + rec))
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("__s").alias("threshold"),
        n_pred.cast("long").alias("n_pred"),
        F.col("__cp").alias("tp"),
        dround(prec, 6).alias("precision"),
        dround(rec, 6).alias("recall"),
        dround(f1, 6).alias("f1"),
    )


def lift_gain(
    df: DataFrame,
    score_col: str,
    label_col,
    *,
    n_buckets: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Lift/gain table: rank rows by score DESCENDING, cut the ranking
    into ``n_buckets`` equal-size buckets, and report each bucket's
    positive capture — the campaign-targeting / filter-budget view of a
    ranking model ("the top decile holds 4.1x its share of positives").
    Emits (bucket, n, n_pos, cum_pos, gain, lift) where gain is the
    cumulative fraction of all positives captured through the bucket
    and lift = bucket positive rate / overall rate. Bucket boundaries
    use the deterministic ``floor((rn - 1) * n_buckets / N)`` rule on a
    (score DESC, tiebreak) total order — NOT ntile(), whose remainder
    placement differs between engines. The tiebreak is the row's
    ascending label (negatives first at a tied score) then nothing —
    so ties are only deterministic per (score, label); per-bucket
    COUNTS remain exact because the rule is applied to the aggregated
    per-(score, label) count frame, never to raw rows.

    Scale shape: one hash agg to per-(score, label) counts, one
    distributed running count over descending score (range exchange, no
    single-task window), then each (score, label) stripe is split
    arithmetically across the buckets it spans — rows never shuffle by
    bucket; the final agg is n_buckets-sized.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    y = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        y.cast("boolean").cast("long").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    # per-(score, label) stripe counts; order stripes by (score DESC,
    # label ASC) — the aggregated frame is what gets globally numbered
    counts = (
        base.groupBy("__s", "__y")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .withColumn("__negs", -F.col("__s"))
    )
    cum = global_running_sum(
        counts, ["__negs", "__y"], "__c", out="__end", num_partitions=num_partitions
    )
    tot = cum.agg(
        F.sum("__c").cast("long").alias("__N"),
        F.sum(F.col("__c") * F.col("__y")).cast("long").alias("__P"),
    )
    nb = int(n_buckets)
    # stripe occupies global ranks (__end - __c, __end]; the bucket of
    # rank r is floor((r - 1) * nb / N), so bucket b covers exactly the
    # ranks (ceil(b*N/nb), ceil((b+1)*N/nb)] — every boundary below is
    # exact integer arithmetic (div), no float rounding anywhere. A
    # stripe is exploded only across the buckets it spans.
    s = cum.crossJoin(F.broadcast(tot))
    first_b = F.expr(f"CAST(((__end - __c) * {nb}) DIV __N AS INT)")
    last_b = F.expr(f"CAST(((__end - 1) * {nb}) DIV __N AS INT)")
    exploded = s.withColumn(
        "bucket", F.explode(F.sequence(first_b, last_b))
    )
    b_lo = F.expr(f"(bucket * __N + {nb - 1}) DIV {nb}")
    b_hi = F.expr(f"((bucket + 1) * __N + {nb - 1}) DIV {nb}")
    overlap = (
        F.least(F.col("__end"), b_hi) - F.greatest(F.col("__end") - F.col("__c"), b_lo)
    ).cast("long")
    per_bucket = (
        exploded.withColumn("__take", overlap)
        .filter(F.col("__take") > 0)
        .groupBy("bucket")
        .agg(
            F.sum("__take").cast("long").alias("n"),
            F.sum(F.col("__take") * F.col("__y")).cast("long").alias("n_pos"),
            F.max("__N").alias("__N"),
            F.max("__P").alias("__P"),
        )
    )
    # per_bucket is <= n_buckets rows BY CONSTRUCTION (bucket ids are
    # 0..n_buckets-1), so a plain running-sum window over it is bounded
    # at any input scale — the distributed global_running_sum machinery
    # (eager range checkpoint + offsets collect, ~3 blocking jobs) would
    # buy nothing on a constant-size frame. Identical integer sums.
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_cum = per_bucket.withColumn(
        "cum_pos", F.sum("n_pos").over(wb).cast("long")
    )
    rate_all = F.col("__P").cast("double") / F.col("__N")
    return w_cum.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        "n_pos",
        "cum_pos",
        F.when(
            F.col("__P") > 0,
            dround(F.col("cum_pos").cast("double") / F.col("__P"), 6),
        ).alias("gain"),
        F.when(
            F.col("__P") > 0,
            dround((F.col("n_pos").cast("double") / F.col("n")) / rate_all, 6),
        ).alias("lift"),
    )


def auc_disparity(
    df: DataFrame,
    score_col: str,
    label_col,
    group_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fairness-slice ranking eval: per-group ROC AUC side by side with
    the OVERALL AUC and the gap — the audit that catches a model "good
    on average, broken on a segment" (the per-language / per-domain
    twin of :func:`auc_score`'s single number). Emits one row per group:
    (group_col, n_pos, n_neg, auc, auc_overall, auc_gap); groups missing
    a class carry NULL auc and NULL gap.

    Scale shape: both AUCs are :func:`auc_score` plans (per-distinct-
    score count frames; grouped path windows per group, overall path
    uses the distributed running sum); the overall single row is
    broadcast onto the group rows.
    """
    grouped = auc_score(
        df, score_col, label_col, group_cols=[group_col], num_partitions=num_partitions
    )
    overall = auc_score(df, score_col, label_col, num_partitions=num_partitions).select(
        F.col("auc").alias("auc_overall")
    )
    return grouped.crossJoin(F.broadcast(overall)).select(
        group_col,
        "n_pos",
        "n_neg",
        "auc",
        "auc_overall",
        dround(F.col("auc") - F.col("auc_overall"), 6).alias("auc_gap"),
    )


def mutual_information(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Mutual information between two categorical columns, with both
    marginal entropies and the normalized MI / sqrt(H_a * H_b) — the
    feature-redundancy / metadata-dependence check (is `source` just
    `lang` in disguise?) that :func:`mix_entropy` (one column) and the
    chi-2 scan can't answer jointly. NULLs count as their own category
    on both sides. Emits ONE row (n, h_a, h_b, mi, nmi); nmi is NULL
    when either entropy is 0 (a constant column carries no information
    to normalize by); empty input emits zero rows.

    Scale shape: ONE (a, b) hash agg scans the data (map-side combined,
    lazily localCheckpoint'ed); both marginals re-aggregate from the
    class^2-sized frame and broadcast back onto it — one data scan, no
    second shuffle. Determinism: every p*ln(...) term rounds to 1e-8
    into a DECIMAL(18,8) sum (the :func:`psi_drift` ln scheme); outputs
    round to 1e-6.
    """
    conf = (
        df.groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=False)  # joint terms + both marginals
    )
    tot = conf.agg(F.sum("__n").cast("double").alias("__t"))
    ma = conf.groupBy("__a").agg(F.sum("__n").cast("long").alias("__na"))
    mb = conf.groupBy("__b").agg(F.sum("__n").cast("long").alias("__nb"))
    # null-safe marginal joins: a NULL category is a real category here,
    # and a plain equi-join would silently drop its joint terms
    ma2 = ma.withColumnRenamed("__a", "__a2")
    mb2 = mb.withColumnRenamed("__b", "__b2")
    joint = (
        conf.join(F.broadcast(ma2), F.col("__a").eqNullSafe(F.col("__a2")))
        .join(F.broadcast(mb2), F.col("__b").eqNullSafe(F.col("__b2")))
        .crossJoin(F.broadcast(tot))
    )
    p_ab = F.col("__n") / F.col("__t")
    # p_ab / (p_a * p_b) = n * t / (na * nb) — exact integer ratio
    mi_term = dround(
        p_ab * F.ln(F.col("__n") * F.col("__t") / (F.col("__na") * F.col("__nb"))), 8
    )
    mi_sum = F.sum(mi_term.cast("decimal(18,8)")).cast("double")
    ent = _categorical_entropy
    ha = ent(ma, "__na")
    hb = ent(mb, "__nb")
    out = (
        joint.groupBy(F.lit(1).alias("__g"))
        .agg(F.max("__t").cast("long").alias("n"), mi_sum.alias("__mi"))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
    )
    nmi_ok = (F.col("__ha") > 0) & (F.col("__hb") > 0)
    return out.select(
        "n",
        dround(F.col("__ha"), 6).alias("h_a"),
        dround(F.col("__hb"), 6).alias("h_b"),
        dround(F.col("__mi"), 6).alias("mi"),
        F.when(
            nmi_ok, dround(F.col("__mi") / F.sqrt(F.col("__ha") * F.col("__hb")), 6)
        ).alias("nmi"),
    )


def _categorical_entropy(marginal: DataFrame, n_col: str):
    """One-row (-sum p ln p) frame from a (category, count) marginal,
    with the count frame's total re-derived in the same agg pass.
    Terms follow the 1e-8-DECIMAL ln scheme. Column: __ha/__hb by
    n_col ('__na' -> '__ha')."""
    out_col = "__h" + n_col[-1]
    tot = marginal.agg(F.sum(n_col).cast("double").alias("__mt"))
    p = F.col(n_col) / F.col("__mt")
    term = dround(-p * F.ln(p), 8)
    return (
        marginal.crossJoin(F.broadcast(tot))
        .agg(F.sum(term.cast("decimal(18,8)")).cast("double").alias(out_col))
    )


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col,
    *,
    eps: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence table for a categorical against a binary
    outcome: woe_c = ln(((pos_c + eps) / pos_tot) / ((neg_c + eps) /
    neg_tot)) with additive smoothing so single-class categories stay
    finite, plus each category's information-value contribution
    iv_c = (pos_c/pos_tot - neg_c/neg_tot) * woe_c — the standard
    encode/feature-screen for tabular models (IV < 0.02 ~ useless,
    > 0.5 ~ suspiciously strong). NULL categories are their own row;
    rows with NULL label are excluded. Emits
    (category, n, n_pos, n_neg, woe, iv), rounded to 6 decimals; when
    either class is globally empty every woe/iv is NULL.

    Scale shape: ONE (category) hash agg with conditional sums; class
    totals re-aggregate from that frame and broadcast back — one data
    scan. Determinism: ln evaluates on exact integer+eps ratios and
    rounds to 1e-6 (the cross-engine ln contract of
    :func:`psi_drift`); iv multiplies the rounded woe by an exact
    ratio difference, then rounds.
    """
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(F.col(cat_col).alias("category"), y.cast("boolean").alias("__y")).filter(
        F.col("__y").isNotNull()
    )
    counts = (
        base.groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("__y").cast("long")).cast("long").alias("n_pos"),
            F.sum((~F.col("__y")).cast("long")).cast("long").alias("n_neg"),
        )
        .localCheckpoint(eager=False)  # feeds totals and the output
    )
    tot = counts.agg(
        F.sum("n_pos").cast("double").alias("__pt"),
        F.sum("n_neg").cast("double").alias("__nt"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    ok = (F.col("__pt") > 0) & (F.col("__nt") > 0)
    woe = dround(
        F.ln(
            ((F.col("n_pos") + F.lit(float(eps))) / F.col("__pt"))
            / ((F.col("n_neg") + F.lit(float(eps))) / F.col("__nt"))
        ),
        6,
    )
    iv = dround(
        (F.col("n_pos") / F.col("__pt") - F.col("n_neg") / F.col("__nt")) * woe, 6
    )
    return j.select(
        "category",
        "n",
        "n_pos",
        "n_neg",
        F.when(ok, woe).alias("woe"),
        F.when(ok, iv).alias("iv"),
    )


def jsd_drift(
    a: DataFrame,
    b: DataFrame,
    cat_col: str,
) -> DataFrame:
    """Jensen-Shannon divergence between two snapshots' CATEGORICAL
    distributions — the drift test that completes the monitoring trio
    (:func:`psi_drift` bins numerics against pinned deciles,
    :func:`ks_statistic` is the binning-free numeric test; JSD handles
    categories, is symmetric, bounded by ln 2, and well-defined when a
    category exists on only one side — exactly where PSI's log blows
    up). NULL categories count as their own category. Emits ONE row
    (n_a, n_b, n_categories, jsd); zero rows when both sides are empty;
    jsd is NULL when exactly one side is empty (a zero measure has no
    distribution to diverge from).

    Scale shape: each side collapses to a per-category count map-side;
    the two category-sized frames full-outer-merge by category and ONE
    re-aggregation computes both KL halves — the data is scanned once
    per side, and only category cardinality crosses the shuffle.
    Determinism: each 0.5*p*ln(p/m) term rounds to 1e-8 into a
    DECIMAL(18,8) sum (the :func:`psi_drift` ln scheme); output rounds
    to 1e-6.
    """
    ca = a.groupBy(F.col(cat_col).alias("__c")).agg(
        F.count(F.lit(1)).cast("long").alias("__na")
    )
    cb = b.groupBy(F.col(cat_col).alias("__c")).agg(
        F.count(F.lit(1)).cast("long").alias("__nb")
    )
    return jsd_from_category_counts(ca, cb)


def jsd_from_category_counts(ca: DataFrame, cb: DataFrame) -> DataFrame:
    """:func:`jsd_drift` from pre-aggregated per-category counts —
    (__c, __na) vs (__c, __nb) — the recombination entry point for
    ADDITIVE incremental state (category counts sum across epochs, so
    the streaming monitor in
    ``streaming/incremental.py::incremental_category_counts`` replays
    the one-shot batch answer exactly). Same output contract as
    :func:`jsd_drift`."""
    cb2 = cb.withColumnRenamed("__c", "__c2")
    merged = (
        ca.join(cb2, F.col("__c").eqNullSafe(F.col("__c2")), "full_outer")
        .select(
            F.coalesce("__na", F.lit(0)).cast("long").alias("__na"),
            F.coalesce("__nb", F.lit(0)).cast("long").alias("__nb"),
        )
        .localCheckpoint(eager=False)  # totals + the term pass
    )
    tot = merged.agg(
        F.sum("__na").cast("double").alias("__ta"),
        F.sum("__nb").cast("double").alias("__tb"),
    )
    j = merged.crossJoin(F.broadcast(tot))
    p = F.when(F.col("__ta") > 0, F.col("__na") / F.col("__ta")).otherwise(F.lit(0.0))
    q = F.when(F.col("__tb") > 0, F.col("__nb") / F.col("__tb")).otherwise(F.lit(0.0))
    m = (p + q) / F.lit(2.0)
    term = dround(
        F.when(p > 0, F.lit(0.5) * p * F.ln(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, F.lit(0.5) * q * F.ln(q / m)).otherwise(F.lit(0.0)),
        8,
    )
    return (
        j.groupBy(F.lit(1).alias("__g"))
        .agg(
            F.sum("__na").cast("long").alias("n_a"),
            F.sum("__nb").cast("long").alias("n_b"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
            dround(
                F.sum(term.cast("decimal(18,8)")).cast("double"), 6
            ).alias("__jsd"),
        )
        .select(
            "n_a",
            "n_b",
            "n_categories",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("__jsd")
            ).alias("jsd"),
        )
    )


def dq_audit(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]],
    *,
    unique_cols: Sequence[str] = (),
) -> DataFrame:
    """Declarative data-quality audit (the Deequ/`great_expectations`
    constraint-suite shape): each check is (rule_name, boolean
    predicate) where TRUE passes and FALSE **or NULL** fails (a NULL
    `x BETWEEN ...` is a violation, not a free pass), plus uniqueness
    rules per key column (violations = non-NULL rows beyond the first
    occurrence of each key; NULL keys are completeness's job, not
    uniqueness's). Emits one row per rule:
    (rule, n_checked, n_violations, violation_rate) with the rate
    rounded to 6 decimals, rules in declaration order (unique rules
    after predicate rules).

    Scale shape: ALL predicate rules ride ONE map-side-combined agg
    over a single scan (k conditional sums, then an inline
    explode-to-long of the k-element result — one row in flight);
    each uniqueness rule is one distinct-count agg on its key. No
    per-rule scans, no driver-side rule loop over data.
    """
    parts = []
    if checks:
        agg_cols = [F.count(F.lit(1)).cast("long").alias("__n")]
        for i, (_, pred) in enumerate(checks):
            agg_cols.append(
                F.sum(
                    F.when(pred.isNull() | ~pred, 1).otherwise(0)
                ).cast("long").alias(f"__v{i}")
            )
        wide = df.agg(*agg_cols)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__v{i}").alias("__v"),
                )
                for i, (name, _) in enumerate(checks)
            ]
        )
        long = wide.select("__n", F.explode(pairs).alias("p")).select(
            F.col("p.rule").alias("rule"),
            F.col("__n").alias("n_checked"),
            F.col("p.__v").alias("n_violations"),
        )
        parts.append(long)
    for col in unique_cols:
        u = (
            df.filter(F.col(col).isNotNull())
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_checked"),
                (
                    F.count(F.lit(1)) - F.count_distinct(F.col(col))
                ).cast("long").alias("n_violations"),
            )
            .select(F.lit(f"unique({col})").alias("rule"), "n_checked", "n_violations")
        )
        parts.append(u)
    if not parts:
        raise ValueError("dq_audit needs at least one check or unique column")
    out = parts[0]
    for pz in parts[1:]:
        out = out.unionByName(pz)
    rate = F.when(
        F.col("n_checked") > 0,
        dround(F.col("n_violations") / F.col("n_checked"), 6),
    ).otherwise(F.lit(0.0))
    return out.select("rule", "n_checked", "n_violations", rate.alias("violation_rate"))


#: Benford expected first-digit shares, precomputed in Python so BOTH
#: engines consume the identical doubles (log10 is not required to be
#: correctly rounded, so computing it per-engine could differ 1 ulp).
BENFORD_EXPECTED: dict[int, float] = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford first-digit audit of a positive numeric column: observed
    leading-digit shares against Benford's law, with each digit's
    Pearson chi-squared contribution — the classic fabricated-data /
    unit-mixup screen a finance-grade DQ suite runs next to
    :func:`dq_audit`'s rule checks. Rows with NULL, zero, or negative
    values are excluded (Benford is defined on positive magnitudes).
    Emits one row per observed digit: (digit, n, share, expected,
    chi2_term) with chi2_term = (n - N*p)^2 / (N*p), all rounded to 6
    decimals.

    Scale shape: the leading digit extracts via DECIMAL-string regexp
    (double->string formatting differs across engines; DECIMAL(38,6)
    text is identical) in a pure projection, then ONE map-side-combined
    digit agg; totals re-aggregate from the 9-row frame. The expected
    shares are Python-precomputed literals, so both engines evaluate
    identical doubles.
    """
    digit = F.regexp_extract(
        F.col(value_col).cast("decimal(38,6)").cast("string"), "[1-9]", 0
    )
    base = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(digit.cast("int").alias("digit"))
        .filter(F.col("digit").isNotNull())
    )
    counts = base.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=False)  # feeds the total and the output
    tot = counts.agg(F.sum("n").cast("double").alias("__t"))
    expected = F.element_at(
        F.create_map(
            *[x for d, p in sorted(BENFORD_EXPECTED.items()) for x in (F.lit(d), F.lit(p))]
        ),
        F.col("digit"),
    )
    exp_n = expected * F.col("__t")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            dround(F.col("n") / F.col("__t"), 6).alias("share"),
            dround(expected, 6).alias("expected"),
            dround(
                (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n, 6
            ).alias("chi2_term"),
        )
    )


def correlation_matrix(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Pairwise Pearson correlations across numeric columns from ONE
    aggregation of sufficient statistics — the profiling staple that
    answers "which features are redundant" before modeling (the
    categorical analog is :func:`mutual_information`). Each pair uses
    its PAIRWISE-COMPLETE rows (both sides non-NULL). Emits one row
    per unordered pair: (col_a, col_b, n, corr) with corr rounded to 6
    decimals and NULL when either side has zero variance or n < 2.

    Scale shape: every pair's five sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) ride one map-side-combined global
    aggregate over a single scan (k(k-1)/2 * 6 conditional sums — fine
    for profile-sized k); the pair table explodes from the one-row
    result. Determinism: inputs round to 1e-4 before DECIMAL(38,8)
    sums, so the sufficient statistics are bit-exact cross-engine and
    the final expression is pure double arithmetic on identical
    values.
    """
    cs = list(cols)
    pairs = [(i, j) for i in range(len(cs)) for j in range(len(cs)) if i < j]
    vals = {
        c: dround(F.col(c).cast("double"), 4) for c in cs
    }
    aggs = []
    for i, j in pairs:
        x, y = vals[cs[i]], vals[cs[j]]
        both = F.col(cs[i]).isNotNull() & F.col(cs[j]).isNotNull()
        z = F.lit(None).cast("decimal(38,8)")
        tag = f"{i}_{j}"
        aggs.extend(
            [
                F.sum(F.when(both, 1).otherwise(0)).cast("long").alias(f"__n_{tag}"),
                F.sum(F.when(both, x.cast("decimal(38,8)")).otherwise(z)).alias(f"__sx_{tag}"),
                F.sum(F.when(both, y.cast("decimal(38,8)")).otherwise(z)).alias(f"__sy_{tag}"),
                F.sum(F.when(both, dround(x * y, 8).cast("decimal(38,8)")).otherwise(z)).alias(f"__sxy_{tag}"),
                F.sum(F.when(both, dround(x * x, 8).cast("decimal(38,8)")).otherwise(z)).alias(f"__sxx_{tag}"),
                F.sum(F.when(both, dround(y * y, 8).cast("decimal(38,8)")).otherwise(z)).alias(f"__syy_{tag}"),
            ]
        )
    wide = df.agg(*aggs)
    structs = []
    for i, j in pairs:
        tag = f"{i}_{j}"
        n = F.col(f"__n_{tag}").cast("double")
        sx = F.col(f"__sx_{tag}").cast("double")
        sy = F.col(f"__sy_{tag}").cast("double")
        sxy = F.col(f"__sxy_{tag}").cast("double")
        sxx = F.col(f"__sxx_{tag}").cast("double")
        syy = F.col(f"__syy_{tag}").cast("double")
        cov_n = n * sxy - sx * sy
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        corr = F.when(
            (F.col(f"__n_{tag}") >= 2) & (var_x > 0) & (var_y > 0),
            dround(cov_n / F.sqrt(var_x * var_y), 6),
        )
        structs.append(
            F.struct(
                F.lit(cs[i]).alias("col_a"),
                F.lit(cs[j]).alias("col_b"),
                F.col(f"__n_{tag}").alias("n"),
                corr.alias("corr"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.n", "p.corr"
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set — the
    privacy-governance gate beside PII redaction/pseudonymization
    (``llm/text.py::pii_scrub`` / ``pseudonymize``): a row is
    re-identifiable when its quasi-identifier combination is shared by
    fewer than ``k`` rows. Emits ONE row: (n_rows, n_groups,
    n_groups_at_risk, n_rows_at_risk, rows_at_risk_share, k_anonymous)
    — ``k_anonymous`` is the release gate (true iff NO group is below
    k). NULLs count as values (a NULL birth-year is itself a bucket);
    empty input emits ZERO rows (the grouped-agg convention of
    :func:`ks_statistic`, matching a grouped oracle).

    Scale shape: one map-side-combined hash agg to the group-size
    frame, then ONE re-aggregation of that (group-cardinality-sized)
    frame — the data is scanned once, and nothing row-sized crosses the
    wire twice. The share divides exact longs and rounds to 1e-6.
    """
    qs = list(quasi_cols)
    if not qs:
        raise ValueError("k_anonymity_audit needs at least one quasi-identifier column")
    sizes = df.groupBy(*qs).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    at_risk = F.col("__n") < int(k)
    return sizes.groupBy(F.lit(1).alias("__g")).agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(at_risk.cast("long")).cast("long").alias("n_groups_at_risk"),
        F.sum(F.when(at_risk, F.col("__n")).otherwise(0)).cast("long").alias("n_rows_at_risk"),
    ).select(
        "n_rows",
        "n_groups",
        "n_groups_at_risk",
        "n_rows_at_risk",
        dround(F.col("n_rows_at_risk") / F.col("n_rows").cast("double"), 6).alias(
            "rows_at_risk_share"
        ),
        (F.col("n_groups_at_risk") == 0).alias("k_anonymous"),
    )


def missingness_pattern(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """NULL co-occurrence audit: for every ordered column pair, how
    often both are NULL in the same row, against each column's own NULL
    count — structured (correlated) missingness is an ingest-bug
    signature that per-column null rates (``table_profile``) cannot
    see (two fields each 1% NULL that are ALWAYS null together point at
    one upstream failure, not two). Emits one row per ordered pair
    (col_a, col_b, n_rows, nulls_a, nulls_b, nulls_both, jaccard) with
    jaccard = both / (a + b - both), NULL when neither column has any
    NULLs; symmetric pairs both emitted for joinability.

    Scale shape: ALL pairwise co-null counts come from ONE scan and ONE
    1-row aggregation (k^2/2 conditional sums — column count is small
    and fixed); the pair table is exploded from that single row, so
    nothing data-sized shuffles at all.
    """
    ks = list(cols)
    if len(ks) < 2:
        raise ValueError("missingness_pattern needs at least two columns")
    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for c in ks:
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .cast("long")
            .alias(f"__n_{c}")
        )
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            aggs.append(
                F.coalesce(
                    F.sum((F.col(a).isNull() & F.col(b).isNull()).cast("long")),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__b_{a}_{b}")
            )
    one = df.agg(*aggs).localCheckpoint(eager=False)  # consumed once per pair below
    parts = []
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            for x, y in ((a, b), (b, a)):
                union = F.col(f"__n_{x}") + F.col(f"__n_{y}") - F.col(f"__b_{a}_{b}")
                parts.append(
                    one.select(
                        F.lit(x).alias("col_a"),
                        F.lit(y).alias("col_b"),
                        F.col("__rows").alias("n_rows"),
                        F.col(f"__n_{x}").alias("nulls_a"),
                        F.col(f"__n_{y}").alias("nulls_b"),
                        F.col(f"__b_{a}_{b}").alias("nulls_both"),
                        F.when(
                            union > 0,
                            dround(F.col(f"__b_{a}_{b}") / union.cast("double"), 6),
                        ).alias("jaccard"),
                    )
                )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ab_test_proportions(
    df: DataFrame,
    variant_col: str,
    success_col,
    *,
    control: str,
    z_threshold: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test per experiment variant against a named
    control — the launch-decision readout of an A/B test ("did the
    treatment move conversion, and is the move bigger than noise").
    For each non-control variant: both sides' n/conversions/rates, the
    absolute and relative lift, the pooled-variance z statistic, and
    ``significant = |z| >= z_threshold`` (1.96 ~ two-sided p < 0.05).
    Rows with NULL variant or NULL success flag are excluded; a
    degenerate pooled rate (0 or 1 — no variance) or an empty side
    yields z NULL / significant false rather than a division blow-up.
    A ``control`` value with NO rows produces ZERO output rows (there
    is no baseline to test against) — validate the control name
    upstream; it is not guessable here.

    Scale shape: ONE map-side-combined (variant) count agg; the control
    row broadcasts back onto the (variant-cardinality) frame — the data
    is scanned once, nothing row-sized shuffles twice. Determinism:
    rates/lifts/z round to 1e-6; the z formula is a fixed IEEE
    expression over exact integer counts (sqrt included), identical in
    the oracle.
    """
    y = (F.col(success_col) if isinstance(success_col, str) else success_col).cast(
        "boolean"
    )
    base = df.select(F.col(variant_col).alias("variant"), y.alias("__y")).filter(
        F.col("variant").isNotNull() & F.col("__y").isNotNull()
    )
    # counts feeds the control row AND the treatment rows (2 replays of
    # the corpus-wide variant agg uncut); one cut runs it once.
    counts = base.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__y").cast("long")).cast("long").alias("conv"),
    ).localCheckpoint(eager=False)
    ctrl = counts.filter(F.col("variant") == control).select(
        F.col("n").alias("n_control"), F.col("conv").alias("conv_control")
    )
    t = counts.filter(F.col("variant") != control).crossJoin(F.broadcast(ctrl))
    rate_t = F.col("conv") / F.col("n").cast("double")
    rate_c = F.col("conv_control") / F.col("n_control").cast("double")
    pooled = (F.col("conv") + F.col("conv_control")) / (
        F.col("n") + F.col("n_control")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n") + F.lit(1.0) / F.col("n_control"))
    )
    z = F.when(
        (F.col("n") > 0) & (F.col("n_control") > 0) & (pooled > 0) & (pooled < 1),
        dround((rate_t - rate_c) / se, 6),
    )
    return t.select(
        "variant",
        "n",
        "conv",
        dround(rate_t, 6).alias("rate"),
        "n_control",
        "conv_control",
        dround(rate_c, 6).alias("rate_control"),
        dround(rate_t - rate_c, 6).alias("abs_lift"),
        F.when(F.col("conv_control") > 0, dround(rate_t / rate_c - 1.0, 6)).alias(
            "rel_lift"
        ),
        z.alias("z"),
        F.coalesce(F.abs(z) >= F.lit(float(z_threshold)), F.lit(False)).alias(
            "significant"
        ),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    *,
    l: int = 2,  # noqa: E741 - the metric's standard name
) -> DataFrame:
    """l-diversity audit — k-anonymity's complement
    (:func:`k_anonymity_audit`): a quasi-identifier group can be large
    (k-anonymous) yet still leak if every member shares the SAME
    sensitive value, so the release gate also needs each group to carry
    at least ``l`` DISTINCT sensitive values. Emits ONE row: (n_rows,
    n_groups, min_distinct_sensitive, n_groups_below_l,
    n_rows_below_l, rows_below_l_share, l_diverse). NULL quasi-values
    are buckets (as in the k audit); NULL sensitive values are ignored
    by the distinct count (both engines' count(DISTINCT) semantics), so
    an all-NULL-sensitive group has distinct 0 and always fails. Empty
    input emits ZERO rows (the grouped-agg convention).

    Scale shape: one map-side-combined (quasi..., distinct-sensitive)
    agg to the group frame, then ONE re-aggregation of that
    group-cardinality-sized frame — a single scan, nothing row-sized
    shuffles twice. The share divides exact longs, rounded 1e-6.
    """
    qs = list(quasi_cols)
    if not qs:
        raise ValueError("l_diversity_audit needs at least one quasi-identifier column")
    sizes = df.groupBy(*qs).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.countDistinct(sensitive_col).cast("long").alias("__d"),
    )
    below = F.col("__d") < int(l)
    return sizes.groupBy(F.lit(1).alias("__g")).agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__d").cast("long").alias("min_distinct_sensitive"),
        F.sum(below.cast("long")).cast("long").alias("n_groups_below_l"),
        F.sum(F.when(below, F.col("__n")).otherwise(0)).cast("long").alias("n_rows_below_l"),
    ).select(
        "n_rows",
        "n_groups",
        "min_distinct_sensitive",
        "n_groups_below_l",
        "n_rows_below_l",
        dround(F.col("n_rows_below_l") / F.col("n_rows").cast("double"), 6).alias(
            "rows_below_l_share"
        ),
        (F.col("n_groups_below_l") == 0).alias("l_diverse"),
    )


def referential_integrity_audit(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    *,
    edge: str | None = None,
) -> DataFrame:
    """Referential-integrity audit for one FK edge — the DQ gate that
    catches broken ingests before a join silently drops rows: how many
    child rows point at a parent key that doesn't exist? Emits ONE row:
    (edge, n_child, n_null_keys, n_orphans, orphan_share, ok). NULL
    child keys are counted separately, not as orphans (a NULL FK is
    "no reference" under SQL semantics, not a violation);
    ``orphan_share`` divides by the non-NULL reference count. ``ok``
    iff zero orphans. Union several edges for a whole-schema audit
    (each edge labeled — the registry's ``q_ref_integrity``).

    Scale shape: ONE equi-join of the child's key column against the
    parent's distinct keys (both sides pre-projected to one column, so
    the shuffle carries keys only — Catalyst broadcasts the parent side
    when it's dimension-sized) + one global agg. No row payload ever
    moves.
    """
    ck = child.select(F.col(child_key).alias("__ck"))
    pk = parent.select(F.col(parent_key).alias("__ck")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    tagged = ck.join(pk, "__ck", "left")
    nn = F.col("__ck").isNotNull()
    orphan = nn & F.col("__hit").isNull()
    return tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum((~nn).cast("long")).cast("long").alias("n_null_keys"),
        F.sum(orphan.cast("long")).cast("long").alias("n_orphans"),
    ).select(
        F.lit(edge if edge is not None else f"{child_key}->{parent_key}").alias("edge"),
        "n_child",
        "n_null_keys",
        "n_orphans",
        F.when(
            (F.col("n_child") - F.col("n_null_keys")) > 0,
            dround(
                F.col("n_orphans")
                / (F.col("n_child") - F.col("n_null_keys")).cast("double"),
                6,
            ),
        ).alias("orphan_share"),
        (F.col("n_orphans") == F.lit(0)).alias("ok"),
    )


def gini_concentration(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col,
    *,
    rank_partitions: int | None = None,
) -> DataFrame:
    """Gini coefficient of how ``value_col`` mass concentrates across
    groups — the one-number inequality readout for training-data mix
    questions ("do 3 domains hold 90% of the tokens?"). 0 = perfectly
    even, ->1 = one group holds everything. Emits ONE row: (n_groups,
    total, gini). Uses the exact rank identity
    G = 2*sum(i * x_i) / (n * sum(x)) - (n + 1)/n over group totals
    sorted ascending; ties in totals contribute identically under any
    tie order, and the rank itself tiebreaks on the group keys, so the
    result is deterministic. Groups with NULL keys are buckets; empty
    input emits ZERO rows (grouped-agg convention). Negative totals
    would break the identity — callers aggregate nonneg masses (counts,
    token sums).

    Scale shape: one map-side-combined group agg to the
    group-cardinality frame, then a DISTRIBUTED global rank over that
    frame (:func:`~python_mapreduce_spark.operators.windows.
    global_row_number` — no single-task window even when the group
    count is huge), then one re-aggregation. The raw rows are scanned
    once.
    """
    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    gs = list(group_cols)
    if not gs:
        raise ValueError("gini_concentration needs at least one group column")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    totals = df.groupBy(*gs).agg(F.sum(v).cast("double").alias("__x"))
    ranked = global_row_number(
        totals, ["__x", *gs], out="__i", num_partitions=rank_partitions
    )
    return ranked.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__x").alias("__tot"),
        F.sum(F.col("__i") * F.col("__x")).alias("__iwx"),
    ).select(
        "n_groups",
        dround(F.col("__tot"), 6).alias("total"),
        F.when(
            (F.col("__tot") > 0) & (F.col("n_groups") > 0),
            dround(
                F.lit(2.0) * F.col("__iwx") / (F.col("n_groups") * F.col("__tot"))
                - (F.col("n_groups") + 1) / F.col("n_groups").cast("double"),
                6,
            ),
        ).alias("gini"),
    )


def pareto_share(
    df: DataFrame,
    id_col: str,
    value_col,
    *,
    fractions: Sequence[float] = (0.01, 0.10, 0.20),
    rank_partitions: int | None = None,
) -> DataFrame:
    """Cumulative-share (Lorenz) readout: what share of total
    ``value_col`` mass do the top ``f`` fraction of rows hold, for each
    requested ``f``? The companion to :func:`gini_concentration` when
    the ANSWER needs to be actionable ("capping the top 1% of docs
    drops 18% of tokens"). Emits ONE row: (n_rows, total,
    share_top_<pct>...), shares rounded 1e-6. Top-f cutoff is
    ceil(n * f) rows under the total order (value desc, id asc) — the
    id tiebreak makes the cutoff set, and therefore the share, exactly
    reproducible in the SQL twin. Empty input emits ZERO rows.

    Scale shape: ONE distributed global rank over (neg value, id) —
    range exchange, no single-task window — then one agg with a
    conditional sum per fraction; the data is scanned once and only
    rank + value cross the wire.
    """
    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    fs = [float(f) for f in fractions]
    if not fs or any(not (0.0 < f <= 1.0) for f in fs):
        raise ValueError(f"fractions must sit in (0, 1]: {fractions}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    src = df.select(
        F.col(id_col).alias("__id"), v.cast("double").alias("__x")
    ).withColumn("__negx", -F.col("__x"))
    ranked = global_row_number(
        src, ["__negx", "__id"], out="__i", num_partitions=rank_partitions
    ).localCheckpoint(eager=False)  # the count row and the share agg both read it
    counts = ranked.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("__x").alias("__tot"),
    ).drop("__g")
    # the 1-row count broadcasts back onto the ranked frame (the
    # ab_test_proportions pattern) so each fraction's ceil(n*f) cutoff
    # is a plain rank comparison inside one conditional-sum agg
    joined = ranked.crossJoin(F.broadcast(counts))
    share_cols = []
    for f in fs:
        pct = f"{f * 100:g}".replace(".", "_")
        cut = F.ceil(F.col("n_rows") * F.lit(f))
        share_cols.append(
            F.when(
                F.max("__tot") > 0,
                dround(
                    F.sum(F.when(F.col("__i") <= cut, F.col("__x")).otherwise(0.0))
                    / F.max("__tot"),
                    6,
                ),
            ).alias(f"share_top_{pct}")
        )
    return joined.groupBy(F.lit(1).alias("__g")).agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        dround(F.max("__tot"), 6).alias("total"),
        *share_cols,
    ).drop("__g")


def brier_score(
    df: DataFrame,
    score_col,
    label_col,
) -> DataFrame:
    """Brier score + Murphy skill decomposition inputs for a
    probabilistic classifier — the proper-scoring-rule companion to
    :func:`auc_score` (rank quality) and :func:`calibration_report`
    (reliability bins): mean squared error of the predicted probability
    against the {0,1} outcome. Emits ONE row: (n, base_rate, brier,
    brier_ref, skill) where ``brier_ref = base_rate * (1 - base_rate)``
    is the no-skill climatology forecast and
    ``skill = 1 - brier/brier_ref`` (NULL when the reference is 0 —
    a single-class truth set has no skill baseline). Rows with a NULL
    score or label are excluded; empty/degenerate input yields n=0 with
    NULL metrics (single-agg convention, mirroring the SQL twin).

    Scale shape: ONE map-side-combined global agg over (score, label) —
    sums of squares, no window, no shuffle beyond the final combine.
    Doubles round to 1e-6 AFTER the sums so float order can't flip a
    bit at any parallelism.
    """
    p = (F.col(score_col) if isinstance(score_col, str) else score_col).cast("double")
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    ).cast("int")
    base = df.select(p.alias("__p"), y.alias("__y")).filter(
        F.col("__p").isNotNull() & F.col("__y").isNotNull()
    )
    agged = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__y").alias("__rate"),
        F.avg((F.col("__p") - F.col("__y")) * (F.col("__p") - F.col("__y"))).alias(
            "__brier"
        ),
    )
    ref = F.col("__rate") * (F.lit(1.0) - F.col("__rate"))
    return agged.select(
        "n",
        dround(F.col("__rate"), 6).alias("base_rate"),
        dround(F.col("__brier"), 6).alias("brier"),
        dround(ref, 6).alias("brier_ref"),
        F.when(ref > 0, dround(F.lit(1.0) - F.col("__brier") / ref, 6)).alias("skill"),
    )


def table_checksum(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Order-invariant content digest of a table (or of each group) —
    the replication/migration audit primitive: run it on both sides of
    a copy and diff one tiny result instead of 100 TB of rows. The
    reference has no equivalent; its closest habit is eyeballing row
    counts after a re-run (runner.py's per-job prints), which misses
    any same-cardinality corruption.

    Each row is canonicalized column-by-column (md5 of the value's
    string form; NULL becomes the sentinel ``'N'``, which cannot
    collide with a 32-char hex digest), the fixed-width tokens are
    '|'-joined and digested again, and the row digest's first/second
    8-hex-char words are summed as DECIMAL(38,0). Summation is
    commutative, so the digest is invariant to row order, partitioning
    and parallelism, while any single-cell change moves both words
    with overwhelming probability. Emits per group:
    (group keys..., n_rows, checksum_hi, checksum_lo).

    Scale shape: ONE map-side-combined hash agg over a single scan —
    only (group keys, 3 numbers) per partition cross the shuffle; with
    no ``group_by`` the combine collapses to a 1-row global agg.
    DECIMAL(38,0) keeps the sums exact to ~1e25 rows (2^32 per row),
    so no modular wraparound is needed at any realistic scale.

    Cross-engine caveat (same discipline as the decimal-string
    percentiles elsewhere): md5 runs over ``CAST(col AS STRING)``, so
    callers comparing Spark to another engine must project columns to
    types whose string forms are identical on both sides first (cast
    DOUBLE to DECIMAL, TIMESTAMP to DATE or a formatted string) —
    raw-double formatting is engine-specific.

    ``cols`` defaults to every non-group column in schema order, so the
    whole-table audit is just ``table_checksum(df)``.
    """
    if cols is None:
        cols = [c for c in df.columns if c not in set(group_by)]
    if not cols:
        raise ValueError("table_checksum needs at least one column")
    tokens = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N")) for c in cols
    ]
    row_digest = F.md5(F.concat_ws("|", *tokens))
    hi = F.conv(F.substring(row_digest, 1, 8), 16, 10).cast("decimal(38,0)")
    lo = F.conv(F.substring(row_digest, 9, 8), 16, 10).cast("decimal(38,0)")
    base = df.select(*group_by, hi.alias("__hi"), lo.alias("__lo"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum("__hi"), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum_hi"),
        F.coalesce(F.sum("__lo"), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum_lo"),
    ]
    if group_by:
        return base.groupBy(*group_by).agg(*aggs)
    return base.agg(*aggs)


def anova_oneway(df: DataFrame, group_col: str, value_col) -> DataFrame:
    """One-way ANOVA F statistic: does a numeric metric differ across
    groups more than within them ("did quality scores shift by source",
    "do latencies differ by region"). Emits ONE row: group count k,
    total n, between/within sums of squares and mean squares, and F =
    MSB / MSW. Rows with a NULL group or NULL value are excluded.
    Values quantize to CENTS on entry (the dsum money contract).
    Degenerate frames — fewer than 2 groups, or n <= k (no within
    degrees of freedom), or zero within-variance — yield f_stat NULL
    instead of a division blow-up; the SS columns still report.

    Scale shape: sufficient statistics only — ONE map-side-combined
    (group) agg producing (n_g, sum_g, sumsq_g), then a second agg over
    the k-row frame; the data is scanned once and nothing row-sized
    shuffles twice. Determinism: sums run over INTEGER-CENT
    DECIMAL(19,0) values — exact, associative, and (the subtle part)
    convertible to double in ONE correctly-rounded step by BOTH
    engines. A fractional-scale decimal with raw digits past 2^53
    would instead go int128 -> double -> /10^scale in DuckDB (two
    roundings) vs one BigDecimal rounding in Spark, and the ulp drift
    flips floor-based rounding of the big SS magnitudes (observed live
    on the order-money corpus). From identical doubles every
    downstream expression is fixed-shape IEEE, so the per-group SSW
    terms quantize identically before their DECIMAL sum — bit-identical
    at any partitioning, replayable exactly by an ANSI oracle. SS/MS
    quantize at CENT scale: Spark's floor() lands in a signed long, so
    1e-6 rounding of big SS would overflow past |x| ~ 9.2e12.
    """
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("decimal(19,0)")
    base = df.select(F.col(group_col).alias("g"), yc.alias("__yc")).filter(
        F.col("g").isNotNull() & F.col("__yc").isNotNull()
    )
    per_group = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("__yc").alias("sum_c"),
        F.sum((F.col("__yc") * F.col("__yc")).cast("decimal(38,0)")).alias(
            "sumsq_c"
        ),
    )
    # cents^2 -> units^2 happens in double AFTER the exact-int casts.
    ssw_term = dround(
        (
            F.col("sumsq_c").cast("double")
            - F.col("sum_c").cast("double")
            * F.col("sum_c").cast("double")
            / F.col("n_g")
        )
        / F.lit(10000.0),
        2,
    )
    tot = per_group.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sum_c").cast("double").alias("__sum_c"),
        F.sum("sumsq_c").cast("double").alias("__sumsq_c"),
        F.sum(ssw_term.cast("decimal(38,2)")).cast("double").alias("__ssw"),
    )
    sst = (
        F.col("__sumsq_c") - F.col("__sum_c") * F.col("__sum_c") / F.col("n")
    ) / F.lit(10000.0)
    ssb = sst - F.col("__ssw")
    msb = ssb / (F.col("k_groups") - F.lit(1)).cast("double")
    msw = F.col("__ssw") / (F.col("n") - F.col("k_groups")).cast("double")
    f_ok = (
        (F.col("k_groups") >= 2)
        & (F.col("n") > F.col("k_groups"))
        & (F.col("__ssw") > 0)
    )
    return tot.select(
        "k_groups",
        "n",
        dround(ssb, 2).alias("ss_between"),
        dround(F.col("__ssw"), 2).alias("ss_within"),
        dround(F.when(F.col("k_groups") >= 2, msb), 2).alias("ms_between"),
        dround(F.when(F.col("n") > F.col("k_groups"), msw), 2).alias(
            "ms_within"
        ),
        dround(F.when(f_ok, msb / msw), 6).alias("f_stat"),
    )


def welch_ttest(
    df: DataFrame,
    segment_col: str,
    value_col,
    *,
    a: str,
    b: str,
) -> DataFrame:
    """Welch's two-sample t test between segments ``a`` and ``b`` of a
    numeric metric — the unequal-variance companion to
    :func:`ab_test_proportions` for continuous outcomes (latency,
    spend, tokens per document). Emits ONE row: per-side n and mean,
    the mean difference, the Welch t statistic, and the
    Welch-Satterthwaite degrees of freedom. NULL segment/value rows are
    excluded; either side with n < 2, or both sides with zero variance,
    yields t NULL (dof NULL with it) instead of dividing by zero.

    Values quantize to CENTS on entry (the dsum money contract).

    Scale shape: sufficient statistics via ONE map-side-combined agg of
    conditional sums — no per-side scan, no shuffle beyond the single
    1-row reduction. Determinism: sums run over INTEGER-CENT
    DECIMAL(19,0) values (exact, associative, and convertible to double
    in ONE correctly-rounded step by both Spark and an ANSI oracle —
    see anova_oneway's docstring for why fractional-scale decimals
    double-round in DuckDB); the closed-form t/dof divisions happen
    once in a fixed IEEE shape, rounded to 1e-6 for cross-engine
    hashing. Sample variance uses ``(sumsq - sum^2/n)/(n-1)``.
    """
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("decimal(19,0)")
    s = F.col(segment_col)
    base = df.select(s.alias("__s"), yc.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )

    def side(tag: str, val: str):
        m = F.when(F.col("__s") == val, F.col("__y"))
        return [
            F.count(m).cast("long").alias(f"n_{tag}"),
            (F.sum(m).cast("double") / F.lit(100.0)).alias(f"__sum_{tag}"),
            (
                F.sum((m * m).cast("decimal(38,0)")).cast("double")
                / F.lit(10000.0)
            ).alias(f"__sumsq_{tag}"),
        ]

    t = base.agg(*side("a", a), *side("b", b))
    mean_a = F.col("__sum_a") / F.col("n_a")
    mean_b = F.col("__sum_b") / F.col("n_b")
    var_a = (F.col("__sumsq_a") - F.col("__sum_a") * F.col("__sum_a") / F.col("n_a")) / (
        F.col("n_a") - F.lit(1)
    )
    var_b = (F.col("__sumsq_b") - F.col("__sum_b") * F.col("__sum_b") / F.col("n_b")) / (
        F.col("n_b") - F.lit(1)
    )
    se2_a = var_a / F.col("n_a")
    se2_b = var_b / F.col("n_b")
    ok = (
        (F.col("n_a") >= 2)
        & (F.col("n_b") >= 2)
        & ((se2_a + se2_b) > 0)
    )
    t_stat = F.when(ok, (mean_a - mean_b) / F.sqrt(se2_a + se2_b))
    dof = F.when(
        ok,
        (se2_a + se2_b) * (se2_a + se2_b)
        / (
            se2_a * se2_a / (F.col("n_a") - F.lit(1))
            + se2_b * se2_b / (F.col("n_b") - F.lit(1))
        ),
    )
    return t.select(
        "n_a",
        "n_b",
        dround(F.when(F.col("n_a") > 0, mean_a), 6).alias("mean_a"),
        dround(F.when(F.col("n_b") > 0, mean_b), 6).alias("mean_b"),
        dround(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), mean_a - mean_b), 6
        ).alias("mean_diff"),
        dround(t_stat, 6).alias("t_stat"),
        dround(dof, 6).alias("dof"),
    )


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    value_col,
    *,
    cutoff: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier scores: modified z = 0.6745 * (x - med)
    / MAD, where med is the group's exact median and MAD the exact
    median absolute deviation — the outlier rule that a handful of
    extreme values cannot drag (unlike mean/stddev z-scores, where the
    outliers inflate their own yardstick). |z| > ``cutoff`` (Iglewicz &
    Hoaglin's 3.5 default) flags the row. NULL values pass through with
    z NULL / outlier false; a zero-MAD group (>= half the group is one
    value) has no robust scale, so every row gets z NULL / outlier
    false rather than an infinity.

    Scale shape: two exact-median group aggs (Spark's median and
    DuckDB's both interpolate even counts, so the oracle matches bit
    for bit after 1e-6 rounding) with the medians equi-joined back on
    the keys — per-group state is two scalars, never a collected list;
    rows shuffle on the keys twice, each with map-side-combinable agg
    siblings. Emits (keys..., id, value, robust_z, outlier).
    """
    ks = list(keys)
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    base = df.select(*ks, F.col(id_col).alias("id"), v.alias("value"))
    # med feeds the deviation join AND (via j) the output join; j feeds
    # the MAD agg AND the output join. Uncut that is 4 corpus scans for
    # the 2 passes the algorithm needs — one cut of the tiny per-group
    # median frame and one of the narrow joined frame keeps it at 2.
    med = (
        base.groupBy(*ks)
        .agg(F.median("value").alias("__med"))
        .localCheckpoint(eager=False)
    )
    j = base.join(med, ks).localCheckpoint(eager=False)
    mad = j.groupBy(*ks).agg(
        F.median(F.abs(F.col("value") - F.col("__med"))).alias("__mad")
    )
    j2 = j.join(mad, ks)
    z = F.when(
        F.col("value").isNotNull() & (F.col("__mad") > 0),
        F.lit(0.6745) * (F.col("value") - F.col("__med")) / F.col("__mad"),
    )
    return j2.select(
        *ks,
        "id",
        "value",
        dround(z, 6).alias("robust_z"),
        F.coalesce(F.abs(z) > cutoff, F.lit(False)).alias("outlier"),
    )


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    chi-square companion to :func:`mutual_information` (V is bounded
    [0, 1] and comparable ACROSS tables of different shapes, which raw
    chi2 and MI are not). Emits ONE row: n, r, c, chi2, v, and the
    Bergsma bias-corrected v_corrected (the one to report: plain V
    inflates on small n / many categories). NULL counts as its own
    category on both sides (the q_mutual_info house rule). V needs at
    least a 2x2 table — min(r, c) < 2 yields NULL v/v_corrected; the
    corrected denominator can also degenerate on tiny n (NULL again
    rather than a divide blow-up). Empty input emits one all-NULL
    metrics row (grand aggregate semantics), identical in the oracle.

    Scale shape: ONE (a, b) hash agg scans the data (map-side
    combined); marginals and shape counts re-aggregate from the
    class^2-sized joint frame and broadcast back — one data scan.
    Determinism: observed/expected cell terms are doubles built from
    exact integer counts (single correctly-rounded int->double
    conversions, identical in both engines), each cell's
    (O-E)^2/E quantizes to 1e-6 into a DECIMAL(38,6) sum, and the
    final square roots are fixed IEEE expressions rounded to 1e-6.
    """
    joint = (
        df.groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n_ab"))
        .localCheckpoint(eager=False)  # feeds marginals, shape, terms
    )
    tot = joint.agg(F.sum("__n_ab").cast("double").alias("__n"))
    ma = joint.groupBy("__a").agg(F.sum("__n_ab").cast("long").alias("__na"))
    mb = joint.groupBy("__b").agg(F.sum("__n_ab").cast("long").alias("__nb"))
    shape = (
        ma.agg(F.count(F.lit(1)).cast("long").alias("r"))
        .crossJoin(
            F.broadcast(mb.agg(F.count(F.lit(1)).cast("long").alias("c")))
        )
    )
    ma2 = ma.withColumnRenamed("__a", "__a2")
    mb2 = mb.withColumnRenamed("__b", "__b2")
    cells = (
        joint.join(F.broadcast(ma2), F.col("__a").eqNullSafe(F.col("__a2")))
        .join(F.broadcast(mb2), F.col("__b").eqNullSafe(F.col("__b2")))
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("__na") * F.col("__nb") / F.col("__n")
    term = dround((F.col("__n_ab") - e) * (F.col("__n_ab") - e) / e, 6)
    # The joint frame holds only OBSERVED cells, but chi2 needs every
    # zero cell's (0-E)^2/E = E too. Sum of E over ALL r*c cells is
    # exactly n, so the missing mass is n - sum(E over observed) —
    # no zero-cell enumeration required.
    agg = cells.agg(
        F.max("__n").cast("long").alias("n"),
        F.sum(term.cast("decimal(38,6)")).cast("double").alias("__chi2o"),
        F.sum(dround(e, 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("__e_obs"),
    )
    out = agg.crossJoin(F.broadcast(shape))
    nn = F.col("n").cast("double")
    chi2_full = F.col("__chi2o") + (nn - F.col("__e_obs"))
    phi2 = chi2_full / nn
    kmin = F.least(F.col("r"), F.col("c")).cast("double")
    v = F.when(kmin >= 2, F.sqrt(phi2 / (kmin - F.lit(1.0))))
    # Bergsma-Wicher correction: shrink phi2 and the table shape for
    # the positive bias of plain V on finite samples.
    rr = F.col("r").cast("double")
    cc = F.col("c").cast("double")
    phi2c = F.greatest(
        F.lit(0.0),
        phi2 - (rr - 1.0) * (cc - 1.0) / (nn - F.lit(1.0)),
    )
    rc = rr - (rr - 1.0) * (rr - 1.0) / (nn - F.lit(1.0))
    ccv = cc - (cc - 1.0) * (cc - 1.0) / (nn - F.lit(1.0))
    kminc = F.least(rc, ccv) - F.lit(1.0)
    vc = F.when(
        (kmin >= 2) & (nn > 1) & (kminc > 0), F.sqrt(phi2c / kminc)
    )
    return out.select(
        "n",
        "r",
        "c",
        dround(chi2_full, 6).alias("chi2"),
        dround(v, 6).alias("v"),
        dround(vc, 6).alias("v_corrected"),
    )


def trimmed_mean(
    df: DataFrame,
    keys: Sequence[str],
    value_col,
    *,
    trim: float = 0.1,
) -> DataFrame:
    """Exact per-group trimmed mean: drop the ``floor(n * trim)``
    lowest AND highest values, average the middle — the robust center
    that reports what winsorize clamps (winsorize_by_group keeps n and
    caps tails; this excludes them, the usual "mean without the
    whales" readout). Values quantize to CENTS on entry (the dsum
    money contract); NULL values are excluded; ``trim`` in [0, 0.5).
    Emits (keys..., n, n_used, mean, trimmed_mean), means rounded to
    1e-6; a fully-trimmed group (n_used 0) reports NULL trimmed_mean.

    Ties need no tiebreak column: ranking is by value alone, and when
    equal values straddle the cut the kept MULTISET is identical
    whichever duplicates the row_number happens to cut — the statistic
    is well-defined even though the rank assignment is not.

    Scale shape: one shuffle on the keys feeds a per-key window
    (row_number + count — never a single-task window), then one
    map-side-combined DECIMAL agg; integer-cent sums keep the result
    bit-identical at any parallelism and in the oracle.
    """
    if not 0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5): {trim}")
    ks = list(keys)
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("decimal(19,0)")
    base = df.select(*ks, yc.alias("__yc")).filter(F.col("__yc").isNotNull())
    w = Window.partitionBy(*ks).orderBy(F.col("__yc"))
    wc = Window.partitionBy(*ks)
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wc)
    )
    k_cut = F.floor(F.col("__n") * F.lit(float(trim))).cast("long")
    kept = (F.col("__rn") > k_cut) & (F.col("__rn") <= F.col("__n") - k_cut)
    agg = ranked.groupBy(*ks).agg(
        F.max("__n").cast("long").alias("n"),
        F.sum(F.col("__yc")).cast("double").alias("__sum_all"),
        F.sum(F.when(kept, F.lit(1))).cast("long").alias("n_used"),
        F.sum(F.when(kept, F.col("__yc"))).cast("double").alias("__sum_kept"),
    )
    return agg.select(
        *ks,
        "n",
        F.coalesce(F.col("n_used"), F.lit(0)).alias("n_used"),
        dround(F.col("__sum_all") / F.lit(100.0) / F.col("n"), 6).alias(
            "mean"
        ),
        dround(
            F.when(
                F.col("n_used") > 0,
                F.col("__sum_kept") / F.lit(100.0) / F.col("n_used"),
            ),
            6,
        ).alias("trimmed_mean"),
    )


def mann_whitney_u(
    df: DataFrame,
    segment_col: str,
    value_col,
    *,
    a: str,
    b: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between segments ``a`` and ``b`` of
    a numeric metric — the nonparametric companion to
    :func:`welch_ttest` (no normality assumption; robust to heavy
    tails, ordinal data, and outliers that drag a mean-based t). Emits
    ONE row: per-side n, U for each side, the mean/stddev of U under
    H0, and the tie-corrected normal-approximation z with a 0.5
    continuity correction toward the mean. NULL segment/value rows are
    excluded; an empty side yields NULL statistics, and a fully-tied
    sample (sigma = 0) yields z NULL instead of a division blow-up.
    Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions); reference parity point: bsautrey-style jobs compute
    rank statistics with a single sorted reducer, which this replaces
    with a distributed rank-free formulation.

    Scale shape: NO per-row ranks anywhere. Values quantize to integer
    cents (ties become exact), aggregate to per-DISTINCT-VALUE side
    counts (map-side combinable; the surviving frame is
    value-cardinality-sized), then ONE distributed running-count pass
    (:func:`~python_mapreduce_spark.operators.windows.global_running_sum`
    — range exchange + per-partition window + broadcast offsets, no
    single-task window) yields each tie-group's average rank in closed
    form: avg_rank = cum_below + (t+1)/2. The rank sum follows as
    sum(n_a_v * avg_rank_v) without ever ranking a row — the same
    distinct-value running-sum skeleton as :func:`ks_statistic`.

    Determinism: everything before the final 1-row select is INTEGER
    arithmetic in DECIMAL(38,0) — the doubled rank sum
    2*R_a = sum(n_a_v * (2*cum_below + t + 1)) stays integral (no .5
    drift), and the tie term sum(t^3 - t) is exact far past long range.
    The closed-form z computes once in a fixed IEEE shape from those
    exact integers and rounds to 1e-6 — bit-identical at any
    partitioning, replayable exactly by an ANSI oracle.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    s = F.col(segment_col)
    base = df.select(s.alias("__s"), yc.alias("__yc")).filter(
        F.col("__s").isin(a, b) & F.col("__yc").isNotNull()
    )
    counts = base.groupBy("__yc").agg(
        F.sum(F.when(F.col("__s") == a, 1).otherwise(0))
        .cast("long")
        .alias("__na"),
        F.count(F.lit(1)).cast("long").alias("__t"),
    )
    cum = global_running_sum(
        counts, ["__yc"], "__t", out="__cum", num_partitions=num_partitions
    )
    r2_term = (
        F.col("__na").cast("decimal(38,0)")
        * (
            F.lit(2) * (F.col("__cum") - F.col("__t"))
            + F.col("__t")
            + F.lit(1)
        )
    )
    tie_term = (
        F.col("__t").cast("decimal(38,0)") * F.col("__t") * F.col("__t")
        - F.col("__t")
    )
    # groupBy a literal (not a global agg): with ZERO qualifying rows
    # the statistic does not exist and the grouped agg emits zero rows,
    # matching the oracle's GROUP BY (ks_statistic precedent).
    agg = (
        cum.groupBy(F.lit(1).alias("__g"))
        .agg(
            F.sum("__na").cast("long").alias("n_a"),
            (F.sum("__t") - F.sum("__na")).cast("long").alias("n_b"),
            F.sum(r2_term).cast("double").alias("__r2a"),
            F.sum(tie_term).cast("double").alias("__ties"),
        )
        .drop("__g")
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    n_d = na_d + nb_d
    u_a = (F.col("__r2a") - na_d * (na_d + F.lit(1.0))) / F.lit(2.0)
    u_b = na_d * nb_d - u_a
    mu = na_d * nb_d / F.lit(2.0)
    sigma2 = (
        na_d
        * nb_d
        / F.lit(12.0)
        * ((n_d + F.lit(1.0)) - F.col("__ties") / (n_d * (n_d - F.lit(1.0))))
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    ok = both & (F.col("n_a") + F.col("n_b") > 1)
    z = F.when(
        ok & (sigma2 > 0),
        (u_a - mu - F.lit(0.5) * F.signum(u_a - mu)) / F.sqrt(sigma2),
    )
    return agg.select(
        "n_a",
        "n_b",
        dround(F.when(both, u_a), 1).alias("u_a"),
        dround(F.when(both, u_b), 1).alias("u_b"),
        dround(F.when(both, mu), 1).alias("mu_u"),
        dround(F.when(ok & (sigma2 > 0), F.sqrt(sigma2)), 6).alias("sigma_u"),
        dround(z, 6).alias("z"),
    )


def spearman_corr(
    df: DataFrame,
    x_col,
    y_col,
    *,
    x_scale: float = 100.0,
    y_scale: float = 100.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns — the
    rank-based companion to :func:`correlation_matrix` (monotone
    association that a heavy tail or a single outlier cannot drag, and
    the right statistic when either variable is ordinal). Ties get
    average ranks (the standard rho-with-ties definition: Pearson on
    the average-ranked data). Emits ONE row: n, spearman_rho, and the
    t statistic rho * sqrt((n-2) / (1-rho^2)) with NULL guards (n < 2,
    a constant column, or |rho| = 1). Rows with a NULL on either side
    are excluded. Beyond the reference surface (SURVEY.md §2.2
    north-star extensions).

    Scale shape: NO per-row ranking pass. Each column quantizes to an
    integer grid (``floor(x * scale + 0.5)`` — cents by default, pass
    scale 1.0 for already-integral data), aggregates to per-DISTINCT-
    VALUE counts, and runs BOTH columns' rank ladders through ONE
    distributed running-count pass
    (:func:`~python_mapreduce_spark.operators.windows.global_running_sum`
    over the side-tagged union of the two count frames — one range
    exchange + one offset collect instead of two); each tie group's
    DOUBLED average rank is then the closed form 2*cum - t + 1 (an
    integer — no .5 drift), where the y-side subtracts the x-side's
    total mass n to restart its ladder. Ranks are joined back to the
    rows on the quantized value. One value-cardinality running sum +
    two row-to-distinct joins + one global agg — no single-task window
    anywhere, same skeleton as :func:`mann_whitney_u` /
    :func:`ks_statistic`.

    Determinism: doubled ranks keep everything integral; the five
    sufficient sums (S_x, S_y, S_xx, S_yy, S_xy) accumulate in
    DECIMAL(38,0) (products cast to decimal BEFORE multiplying — long
    overflows at 4N^2 past ~1.5e9 rows). rho is scale-invariant, so
    the doubling cancels; the closed form computes once in a fixed
    IEEE shape from exact integers and rounds to 1e-6.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    xq = F.floor(x * F.lit(float(x_scale)) + F.lit(0.5)).cast("long")
    yq = F.floor(y * F.lit(float(y_scale)) + F.lit(0.5)).cast("long")
    base = df.select(xq.alias("__x"), yq.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    # Consumed by both per-column count aggs AND the row-level rank
    # join (3 scans uncut — Catalyst shares no subtrees); one narrow
    # two-long-per-row materialization replaces the repeats.
    base = base.localCheckpoint(eager=False)

    def side_counts(col: str, side: int) -> DataFrame:
        return base.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("__t")
        ).select(
            F.lit(side).alias("__side"), F.col(col).alias("__val"), "__t"
        )

    # Both ladders in one pass: (side, value) is a total order, so the
    # running count over the tagged union carries x's ladder (side 0)
    # followed by y's; y's cum includes all of x's mass — exactly n —
    # which the broadcast one-row n frame subtracts to restart it.
    n1 = (
        base.groupBy(F.lit(1).alias("__g"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .drop("__g")
    )
    cum = global_running_sum(
        side_counts("__x", 0).unionByName(side_counts("__y", 1)),
        ["__side", "__val"],
        "__t",
        out="__cum",
        num_partitions=num_partitions,
    )
    ranks = cum.crossJoin(F.broadcast(n1)).select(
        "__side",
        "__val",
        (
            F.lit(2) * (F.col("__cum") - F.col("__side") * F.col("__n"))
            - F.col("__t")
            + F.lit(1)
        ).alias("__r2"),
    )
    rx = ranks.filter(F.col("__side") == 0).select(
        F.col("__val").alias("__x"), F.col("__r2").alias("__r2x")
    )
    ry = ranks.filter(F.col("__side") == 1).select(
        F.col("__val").alias("__y"), F.col("__r2").alias("__r2y")
    )
    ranked = base.join(rx, "__x").join(ry, "__y")
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = (
        ranked.groupBy(F.lit(1).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(d("__r2x")).cast("double").alias("__sx"),
            F.sum(d("__r2y")).cast("double").alias("__sy"),
            F.sum(d("__r2x") * F.col("__r2x")).cast("double").alias("__sxx"),
            F.sum(d("__r2y") * F.col("__r2y")).cast("double").alias("__syy"),
            F.sum(d("__r2x") * F.col("__r2y")).cast("double").alias("__sxy"),
        )
        .drop("__g")
    )
    n_d = F.col("n").cast("double")
    cov = n_d * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n_d * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n_d * F.col("__syy") - F.col("__sy") * F.col("__sy")
    rho = F.when((F.col("n") >= 2) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    t_ok = rho.isNotNull() & (F.col("n") > 2) & (F.abs(rho) < 1.0)
    t_stat = F.when(
        t_ok, rho * F.sqrt((n_d - F.lit(2.0)) / (F.lit(1.0) - rho * rho))
    )
    return agg.select(
        "n",
        dround(rho, 6).alias("spearman_rho"),
        dround(t_stat, 6).alias("t_stat"),
    )


def brown_forsythe(df: DataFrame, group_col: str, value_col) -> DataFrame:
    """Brown-Forsythe test (Levene with MEDIAN centers): do groups
    differ in SPREAD, not center — the variance-homogeneity check that
    validates :func:`anova_oneway`'s equal-variance assumption, robust
    to non-normality because the center is each group's median (the
    1974 Brown-Forsythe recommendation over Levene's mean). The
    statistic is the one-way ANOVA F computed on the absolute
    deviations z_ij = |y_ij - median_j|. Emits ONE row: k_groups, n,
    df1 = k-1, df2 = n-k, and f_stat (NULL on the same degenerate
    frames as ANOVA: < 2 groups, no within-df, zero within-variance).
    Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions).

    Scale shape: one exact-median group agg (per-group state is one
    scalar), an equi-join of the k medians back to the rows, then the
    :func:`anova_oneway` sufficient-statistics plan on the transformed
    column — two map-side-combinable aggs and one broadcast-sized join
    beyond a single scan; nothing row-sized shuffles twice.

    Determinism: values quantize to integer CENTS before the median,
    so each median is an integer or an exact .5 midpoint ((a+b)/2 of
    longs is IEEE-exact) and the DOUBLED absolute deviations
    2*|yc - med| are exact HALF-CENT integers in both engines — the
    deviations enter the sufficient statistics with zero float
    ambiguity. The per-group SSW terms convert to DOLLAR^2 scale
    (/200^2) BEFORE the cross-group quantize-then-DECIMAL-sum: at the
    half-cent grid the SS magnitudes reach ~1e18 and dround's floor()
    lands in a signed LONG on Spark — it wraps where DuckDB's
    double-typed floor does not (observed live at sf0.01: F off by
    1e4). Dollar^2 keeps floor(x*100+0.5) inside long range up to
    ~1e16 total SS (same envelope as anova_oneway). F is
    scale-invariant; df are exact integers.
    """
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    base = df.select(F.col(group_col).alias("__g"), yc.alias("__yc")).filter(
        F.col("__g").isNotNull() & F.col("__yc").isNotNull()
    )
    med = base.groupBy("__g").agg(F.median("__yc").alias("__med"))
    z2 = F.abs(
        F.col("__yc").cast("double") * F.lit(2.0)
        - F.col("__med") * F.lit(2.0)
    )
    zc = z2.cast("decimal(19,0)")
    joined = base.join(med, "__g").select("__g", zc.alias("__zc"))
    per_group = joined.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("__zc").alias("sum_c"),
        F.sum((F.col("__zc") * F.col("__zc")).cast("decimal(38,0)")).alias(
            "sumsq_c"
        ),
    )
    # half-cent^2 -> dollar^2 happens in double AFTER the exact casts.
    ssw_term = dround(
        (
            F.col("sumsq_c").cast("double")
            - F.col("sum_c").cast("double")
            * F.col("sum_c").cast("double")
            / F.col("n_g")
        )
        / F.lit(40000.0),
        2,
    )
    tot = per_group.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sum_c").cast("double").alias("__s"),
        F.sum("sumsq_c").cast("double").alias("__ss"),
        F.sum(ssw_term.cast("decimal(38,2)")).cast("double").alias("__ssw"),
    )
    sst = (
        F.col("__ss") - F.col("__s") * F.col("__s") / F.col("n")
    ) / F.lit(40000.0)
    ssb = sst - F.col("__ssw")
    f_ok = (
        (F.col("k_groups") >= 2)
        & (F.col("n") > F.col("k_groups"))
        & (F.col("__ssw") > 0)
    )
    msb = ssb / (F.col("k_groups") - F.lit(1)).cast("double")
    msw = F.col("__ssw") / (F.col("n") - F.col("k_groups")).cast("double")
    return tot.select(
        "k_groups",
        "n",
        F.when(F.col("k_groups") >= 2, F.col("k_groups") - 1)
        .cast("long")
        .alias("df1"),
        F.when(F.col("n") > F.col("k_groups"), F.col("n") - F.col("k_groups"))
        .cast("long")
        .alias("df2"),
        dround(F.when(f_ok, msb / msw), 6).alias("f_stat"),
    )


def jarque_bera(df: DataFrame, group_col: str, value_col) -> DataFrame:
    """Per-group Jarque-Bera normality test: JB = n/6 * (S^2 +
    (K-3)^2/4) from population skewness S and kurtosis K — the
    moment-based shape check that closes the distribution-test family
    (:func:`ks_statistic` two-sample shift, :func:`mann_whitney_u`
    location, :func:`brown_forsythe` spread, JB shape-vs-Gaussian).
    Emits one row per group: n, mean, stddev (population), skewness,
    kurt_excess (K-3), jb. NULL group/value rows are excluded; n < 2
    or zero variance yields NULL shape statistics (the mean still
    reports for n >= 1). Beyond the reference surface (SURVEY.md §2.2
    north-star extensions).

    Scale shape: ONE map-side-combined group agg of the four raw power
    sums (sum y..y^4) — sufficient statistics only, a single scan, and
    per-group state of four decimals; the closed-form moments compute
    on the k-row frame.

    Determinism: values quantize to integer CENTS, and all four power
    sums accumulate EXACTLY in DECIMAL(38,0) (products cast to decimal
    before multiplying). S and K are scale-invariant, so the moments
    compute directly on the cent grid in one fixed IEEE shape from
    identical exact integers — bit-identical at any partitioning.
    Envelope: the 4th-power sum overflows DECIMAL(38) when
    n * (100*|v|_max)^4 > 1e38 — e.g. |v| <= ~330 holds to ~8e19 rows,
    |v| <= ~$10k to ~1e13 rows; pick the money-scale inputs
    accordingly (same class of bound as anova_oneway's long-floor
    note).
    """
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("decimal(19,0)")
    base = df.select(F.col(group_col).alias("g"), yc.alias("__yc")).filter(
        F.col("g").isNotNull() & F.col("__yc").isNotNull()
    )
    p = F.col("__yc")
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(p).cast("double").alias("__s1"),
        F.sum((p * p).cast("decimal(38,0)")).cast("double").alias("__s2"),
        F.sum((p * p * p).cast("decimal(38,0)")).cast("double").alias("__s3"),
        F.sum((p * p * p * p).cast("decimal(38,0)"))
        .cast("double")
        .alias("__s4"),
    )
    n_d = F.col("n").cast("double")
    m1 = F.col("__s1") / n_d
    m2 = F.col("__s2") / n_d - m1 * m1
    m3 = (
        F.col("__s3") / n_d
        - F.lit(3.0) * m1 * (F.col("__s2") / n_d)
        + F.lit(2.0) * m1 * m1 * m1
    )
    m4 = (
        F.col("__s4") / n_d
        - F.lit(4.0) * m1 * (F.col("__s3") / n_d)
        + F.lit(6.0) * m1 * m1 * (F.col("__s2") / n_d)
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    ok = (F.col("n") >= 2) & (m2 > 0)
    skew = F.when(ok, m3 / F.sqrt(m2 * m2 * m2))
    kexc = F.when(ok, m4 / (m2 * m2) - F.lit(3.0))
    jb = F.when(
        ok,
        n_d
        / F.lit(6.0)
        * (skew * skew + kexc * kexc / F.lit(4.0)),
    )
    return agg.select(
        "g",
        "n",
        dround(m1 / F.lit(100.0), 6).alias("mean"),
        dround(F.when(ok, F.sqrt(m2) / F.lit(100.0)), 6).alias("stddev"),
        dround(skew, 6).alias("skewness"),
        dround(kexc, 6).alias("kurt_excess"),
        dround(jb, 6).alias("jb"),
    )


def concentration_report(
    df: DataFrame,
    market_keys: Sequence[str],
    player_col: str,
    weight_col,
    *,
    top_k: int = 4,
) -> DataFrame:
    """Market-concentration report per market: Herfindahl-Hirschman
    index HHI = sum(share_i^2), its normalized form
    (HHI - 1/n) / (1 - 1/n), the effective number of players 1/HHI,
    and the CR_k concentration ratio (top-``top_k`` players' combined
    share) — the antitrust-style companion to
    :func:`gini_concentration` (Gini measures inequality of the whole
    distribution; HHI/CR_k weight the head, which is what domain-mix
    and vendor-risk audits act on). Emits one row per market:
    (market_keys..., n_players, total, hhi, hhi_norm, effective_n,
    cr{top_k}). Zero-total markets report counts with NULL indices;
    single-player markets have hhi 1 and hhi_norm NULL (undefined at
    n = 1). Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions).

    Scale shape: one (market, player) hash agg (map-side combined,
    integer-cent weights), then ONE per-market pass that is both the
    sufficient-statistic agg (n, sum w, sum w^2 in DECIMAL(38,0)) and
    the CR_k cut — a row_number window partitioned BY MARKET over the
    player-sized frame (players per market is the bounded fan-in of a
    rollup, orders of magnitude below row count; no global window
    anywhere). Shares never materialize per player: HHI = sum(w^2) /
    W^2 from exact integers.

    Determinism: weights quantize to integer cents in the first agg;
    sum and sum-of-squares ride DECIMAL(38,0); the CR_k tiebreak is
    (w DESC, player ASC) — total because players are distinct after
    the roll-up. All ratios compute once in fixed IEEE shape, rounded
    to 1e-6.
    """
    mk = list(market_keys)
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    wc = F.floor(w * F.lit(100.0) + F.lit(0.5)).cast("long")
    per = (
        df.select(*mk, F.col(player_col).alias("__p"), wc.alias("__wc"))
        .filter(F.col("__p").isNotNull() & F.col("__wc").isNotNull())
        .groupBy(*mk, "__p")
        .agg(F.sum("__wc").cast("long").alias("__w"))
    )
    rn = F.row_number().over(
        Window.partitionBy(*mk).orderBy(F.col("__w").desc(), F.col("__p").asc())
    )
    ranked = per.withColumn("__rn", rn)
    d = F.col("__w").cast("decimal(38,0)")
    agg = ranked.groupBy(*mk).agg(
        F.count(F.lit(1)).cast("long").alias("n_players"),
        F.sum("__w").cast("double").alias("__tot"),
        F.sum(d * F.col("__w")).cast("double").alias("__sq"),
        F.sum(F.when(F.col("__rn") <= top_k, F.col("__w")))
        .cast("double")
        .alias("__topk"),
    )
    pos = F.col("__tot") > 0
    hhi = F.col("__sq") / (F.col("__tot") * F.col("__tot"))
    n_d = F.col("n_players").cast("double")
    hhi_norm = F.when(
        pos & (F.col("n_players") > 1),
        (hhi - F.lit(1.0) / n_d) / (F.lit(1.0) - F.lit(1.0) / n_d),
    )
    return agg.select(
        *mk,
        "n_players",
        dround(F.col("__tot") / F.lit(100.0), 2).alias("total"),
        dround(F.when(pos, hhi), 6).alias("hhi"),
        dround(hhi_norm, 6).alias("hhi_norm"),
        dround(F.when(pos, F.lit(1.0) / hhi), 6).alias("effective_n"),
        dround(F.when(pos, F.col("__topk") / F.col("__tot")), 6).alias(
            f"cr{int(top_k)}"
        ),
    )


def bh_fdr(
    df: DataFrame,
    key_cols: Sequence[str],
    p_col: str,
    *,
    alpha: float = 0.05,
    num_partitions: int | None = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR control over a set of hypotheses: given
    one p-value per key, find the step-up cutoff k* = max{i : p_(i) <=
    i*alpha/m} and reject exactly the k* smallest p-values — the
    multiple-testing guard that belongs after ANY per-segment test
    fan-out (:func:`welch_ttest` / :func:`mann_whitney_u` /
    :func:`ab_test_proportions` per source, nation, experiment arm...)
    so that screening 10,000 segments at alpha=.05 doesn't hand back
    ~500 false discoveries. Emits one row per hypothesis: (keys...,
    p_value, p_rank, m, bh_critical = rank*alpha/m, rejected). NULL
    p-values are excluded (they are untested hypotheses, not
    evidence). Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions).

    Scale shape: the p-value ORDER is the whole computation, so the
    plan is one distributed global rank
    (:func:`~python_mapreduce_spark.operators.windows.global_row_number`
    — range exchange + per-partition numbering + broadcast offsets, no
    single-task window), one 1-row reduction for m, one for k*
    (max flagged rank), each broadcast back. Works unchanged at one
    hypothesis per customer (millions of rows).

    Determinism: ranking ties on equal p break by the key columns
    (total order — module contract); the step-up comparison
    p <= rank*alpha/m computes in one fixed IEEE shape on both
    engines. Quantize the INPUT p-values (dround 8) if they come from
    a transcendental approximation, so the comparison sees identical
    doubles everywhere.
    """
    ks = list(key_cols)
    base = df.select(*ks, F.col(p_col).cast("double").alias("__p")).filter(
        F.col("__p").isNotNull()
    )
    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415 - avoid module cycle

    ranked = global_row_number(
        base, ["__p", *ks], out="p_rank", num_partitions=num_partitions
    )
    m_row = ranked.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("m")
    ).drop("__g")
    withm = ranked.crossJoin(F.broadcast(m_row))
    crit = (
        F.col("p_rank").cast("double")
        * F.lit(float(alpha))
        / F.col("m").cast("double")
    )
    flagged = withm.withColumn("__crit", crit).withColumn(
        "__flag", F.col("__p") <= F.col("__crit")
    )
    kstar = flagged.groupBy(F.lit(1).alias("__g")).agg(
        F.coalesce(
            F.max(F.when(F.col("__flag"), F.col("p_rank"))), F.lit(0)
        )
        .cast("long")
        .alias("__kstar")
    ).drop("__g")
    return flagged.crossJoin(F.broadcast(kstar)).select(
        *ks,
        F.col("__p").alias("p_value"),
        "p_rank",
        "m",
        dround(F.col("__crit"), 8).alias("bh_critical"),
        (F.col("p_rank") <= F.col("__kstar")).alias("rejected"),
    )


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
) -> DataFrame:
    """First-order partial correlation r_xy.z = (r_xy - r_xz * r_yz) /
    sqrt((1 - r_xz^2) * (1 - r_yz^2)) — the confounder control that
    answers "are x and y still related once z is held fixed", the step
    :func:`correlation_matrix` profiling naturally leads to (a strong
    pairwise corr often just reflects a shared driver). Rows are
    LISTWISE complete (all three columns non-NULL), so the three
    underlying correlations share one n and the formula is coherent.
    Emits ONE row: n, r_xy, r_xz, r_yz, partial_r, and the t statistic
    partial_r * sqrt((n-3) / (1-partial_r^2)) with NULL guards (n < 4,
    any zero variance, |r| = 1 on a controlling edge). Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).

    Scale shape: ONE map-side-combined global aggregate of the nine
    sufficient sums over a single scan — no shuffle beyond the 1-row
    reduction. Determinism: the correlation_matrix recipe — inputs
    round to 1e-4, every sum and product accumulates in
    DECIMAL(38,8), and the closed form computes once in fixed IEEE
    shape, rounded to 1e-6.
    """
    trip = [
        ("x", F.col(x_col)),
        ("y", F.col(y_col)),
        ("z", F.col(z_col)),
    ]
    complete = df.filter(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(z_col).isNotNull()
    )
    vals = {t: dround(c.cast("double"), 4) for t, c in trip}
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for t, _ in trip:
        aggs.append(
            F.sum(vals[t].cast("decimal(38,8)")).cast("double").alias(f"__s{t}")
        )
    for a, b in (("x", "y"), ("x", "z"), ("y", "z")):
        aggs.append(
            F.sum(dround(vals[a] * vals[b], 8).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"__s{a}{b}")
        )
    for t, _ in trip:
        aggs.append(
            F.sum(dround(vals[t] * vals[t], 8).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"__s{t}{t}")
        )
    # groupBy a literal: zero complete rows -> zero output rows (the
    # statistic does not exist), matching the oracle's GROUP BY.
    wide = complete.groupBy(F.lit(1).alias("__g")).agg(*aggs).drop("__g")
    n = F.col("n").cast("double")

    def r(a: str, b: str):
        cov = n * F.col(f"__s{a}{b}") - F.col(f"__s{a}") * F.col(f"__s{b}")
        va = n * F.col(f"__s{a}{a}") - F.col(f"__s{a}") * F.col(f"__s{a}")
        vb = n * F.col(f"__s{b}{b}") - F.col(f"__s{b}") * F.col(f"__s{b}")
        return F.when(
            (F.col("n") >= 2) & (va > 0) & (vb > 0), cov / F.sqrt(va * vb)
        )

    rxy, rxz, ryz = r("x", "y"), r("x", "z"), r("y", "z")
    denom = (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    pr = F.when(
        rxy.isNotNull() & rxz.isNotNull() & ryz.isNotNull() & (denom > 0),
        (rxy - rxz * ryz) / F.sqrt(denom),
    )
    t_stat = F.when(
        pr.isNotNull() & (F.col("n") > 3) & (F.abs(pr) < 1.0),
        pr * F.sqrt((n - F.lit(3.0)) / (F.lit(1.0) - pr * pr)),
    )
    return wide.select(
        "n",
        dround(rxy, 6).alias("r_xy"),
        dround(rxz, 6).alias("r_xz"),
        dround(ryz, 6).alias("r_yz"),
        dround(pr, 6).alias("partial_r"),
        dround(t_stat, 6).alias("t_stat"),
    )


def ols_influence(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    cooks_cutoff: float | None = None,
) -> DataFrame:
    """Regression influence audit for the per-group simple OLS fit
    (:func:`group_ols`): for every observation, leverage h = 1/n +
    (x - xbar)^2 / Sxx, the standardized residual r = e / sqrt(MSE *
    (1 - h)), and Cook's distance D = r^2/2 * h/(1 - h) — then emit
    ONLY the observations with D above the cutoff (default the classic
    4/n rule). This is the "which points are writing the trend line"
    check a fitted slope should always ship with: a segment whose
    growth rate rests on one influential month is a data-quality
    finding, not a trend. Groups where influence is undefined — n <= 2
    (no residual df), zero x-variance, or a perfect fit (MSE = 0,
    nothing can distort it) — flag nothing. Beyond the reference
    surface (SURVEY.md §2.2 north-star extensions).

    Scale shape: one map-side-combined group agg of the six OLS
    sufficient sums, equi-joined back to the rows (k-group frame, one
    shuffle each side), then pure per-row codegen arithmetic and a
    selective filter — output is influential points only, never the
    input row count.

    Determinism: the correlation_matrix recipe — inputs round to 1e-4
    and the sums accumulate in DECIMAL(38,8); every per-row statistic
    computes in one fixed IEEE shape from identical doubles, rounded
    to 1e-6. Keep |x*y| under ~9e9 (dround-8's long-floor bound) —
    rebase indices and rescale money-sized y (e.g. to millions)
    before calling, as q_ols_influence does.
    """
    ks = list(keys)
    x = dround(F.col(x_col).cast("double"), 4)
    y = dround(F.col(y_col).cast("double"), 4)
    # base feeds the sufficient-sums agg AND the join-back (2 scans
    # uncut — each replays the caller's upstream, e.g. q_ols_influence's
    # corpus-wide monthly aggregation); one cut runs it once.
    base = df.select(
        *ks, F.col(id_col).alias("id"), x.alias("__x"), y.alias("__y")
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull()).localCheckpoint(
        eager=False
    )
    stats = base.groupBy(*ks).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__x").cast("decimal(38,8)")).cast("double").alias("__sx"),
        F.sum(F.col("__y").cast("decimal(38,8)")).cast("double").alias("__sy"),
        F.sum(dround(F.col("__x") * F.col("__y"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("__sxy"),
        F.sum(dround(F.col("__x") * F.col("__x"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("__sxx"),
        F.sum(dround(F.col("__y") * F.col("__y"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("__syy"),
    )
    n_d = F.col("__n").cast("double")
    sxx_c = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n_d
    slope = (F.col("__sxy") - F.col("__sx") * F.col("__sy") / n_d) / sxx_c
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n_d
    sse = (
        F.col("__syy")
        - intercept * F.col("__sy")
        - slope * F.col("__sxy")
    )
    mse = sse / (n_d - F.lit(2.0))
    j = base.join(stats, ks)
    h = F.lit(1.0) / n_d + (
        (F.col("__x") - F.col("__sx") / n_d)
        * (F.col("__x") - F.col("__sx") / n_d)
    ) / sxx_c
    e = F.col("__y") - (intercept + slope * F.col("__x"))
    ok = (F.col("__n") > 2) & (sxx_c > 0) & (mse > 0) & (h < 1.0)
    sr = e / F.sqrt(mse * (F.lit(1.0) - h))
    cooks = sr * sr / F.lit(2.0) * (h / (F.lit(1.0) - h))
    cutoff = (
        F.lit(float(cooks_cutoff))
        if cooks_cutoff is not None
        else F.lit(4.0) / n_d
    )
    return (
        j.filter(ok & (cooks > cutoff))
        .select(
            *ks,
            "id",
            F.col("__x").alias("x"),
            F.col("__y").alias("y"),
            dround(h, 6).alias("leverage"),
            dround(sr, 6).alias("std_resid"),
            dround(cooks, 6).alias("cooks_d"),
        )
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    *,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit — the third privacy release gate after
    :func:`k_anonymity_audit` (group size) and :func:`l_diversity_audit`
    (distinct sensitive values): a group can be large AND diverse yet
    still leak if its sensitive-value DISTRIBUTION deviates from the
    table's (e.g. a group that is 95% one diagnosis against a 10%
    base rate). For categorical sensitive attributes the
    ground-distance-free EMD is the total variation distance
    TVD_g = 0.5 * sum_c |p_gc - q_c|; the gate requires max_g TVD <=
    ``t``. Emits ONE row: (n_rows, n_groups, max_tvd,
    n_groups_above_t, n_rows_above_t, rows_above_t_share, t_close).
    NULL quasi-values are buckets and a NULL sensitive value is its
    OWN category (it is distribution mass, unlike l-diversity's
    distinct count which ignores it — both rules documented there).
    Empty input emits ZERO rows (the grouped-agg convention).

    Scale shape: one (quasi..., sensitive) hash agg, one sensitive-
    keyed global category frame BROADCAST onto it (sensitive
    cardinality is category-sized by definition), one per-group
    re-agg, one final 1-row re-agg — single scan, nothing row-sized
    twice. The absent-category mass needs no anti-join:
    sum_absent q_c = 1 - sum_present q_c, so
    TVD = 0.5 * (sum_present |p - q| + (1 - sum_present q)).

    Determinism: p and q divide exact longs; the per-category terms
    quantize to 1e-8 into DECIMAL(38,8) sums (category order is
    partition-dependent), and the closed form computes once in fixed
    IEEE shape, rounded 1e-6.
    """
    qs = list(quasi_cols)
    if not qs:
        raise ValueError("t_closeness_audit needs at least one quasi-identifier column")
    # cell feeds the global distribution, the per-group sizes AND the
    # join spine (4 corpus scans uncut — Catalyst shares no subtrees);
    # one cut of the cell-cardinality frame keeps the scan at one.
    cell = df.groupBy(*qs, F.col(sensitive_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__nc")
    ).localCheckpoint(eager=False)
    glob = cell.groupBy(F.col("__s").alias("__s2")).agg(
        F.sum("__nc").cast("long").alias("__ng")
    )
    tot = glob.agg(F.sum("__ng").cast("long").alias("__tot"))
    # NULL-SAFE joins throughout: a NULL sensitive value is a category
    # and NULL quasi-values are buckets — a plain equi-join would drop
    # exactly those rows (NULL != NULL) and silently understate TVD.
    j = (
        cell.join(F.broadcast(glob), F.col("__s").eqNullSafe(F.col("__s2")))
        .drop("__s2")
        .crossJoin(F.broadcast(tot))
    )
    gsize = cell.groupBy(*[F.col(c).alias(f"__q_{c}") for c in qs]).agg(
        F.sum("__nc").cast("long").alias("__n")
    )
    cond = None
    for c in qs:
        e = F.col(c).eqNullSafe(F.col(f"__q_{c}"))
        cond = e if cond is None else (cond & e)
    j = j.join(gsize, cond).drop(*[f"__q_{c}" for c in qs])
    p = F.col("__nc").cast("double") / F.col("__n").cast("double")
    q = F.col("__ng").cast("double") / F.col("__tot").cast("double")
    per_group = j.groupBy(*qs).agg(
        F.max("__n").alias("__n"),
        F.sum(dround(F.abs(p - q), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("__s1"),
        F.sum(dround(q, 8).cast("decimal(38,8)")).cast("double").alias("__sq"),
    )
    tvd = F.lit(0.5) * (
        F.col("__s1") + (F.lit(1.0) - F.col("__sq"))
    )
    flagged = per_group.withColumn("__tvd", tvd).withColumn(
        "__above", F.col("__tvd") > F.lit(float(t))
    )
    return flagged.groupBy(F.lit(1).alias("__g")).agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("__tvd").alias("__max_tvd"),
        F.sum(F.col("__above").cast("long")).cast("long").alias("n_groups_above_t"),
        F.sum(F.when(F.col("__above"), F.col("__n")).otherwise(0))
        .cast("long")
        .alias("n_rows_above_t"),
    ).select(
        "n_rows",
        "n_groups",
        dround(F.col("__max_tvd"), 6).alias("max_tvd"),
        "n_groups_above_t",
        "n_rows_above_t",
        dround(
            F.col("n_rows_above_t") / F.col("n_rows").cast("double"), 6
        ).alias("rows_above_t_share"),
        (F.col("n_groups_above_t") == 0).alias("t_close"),
    )


def theil_decomposition(df: DataFrame, group_col: str, value_col) -> DataFrame:
    """Theil T inequality index with its exact within/between-group
    decomposition — the property Gini (:func:`gini_concentration`)
    famously lacks: T = T_within + T_between, so "how much of the
    inequality lives INSIDE groups vs BETWEEN their means" is a
    well-posed question. T = (1/n) sum (x/mu) ln(x/mu);
    T_between = sum_g s_g ln(mu_g/mu) (s_g = group g's value share);
    T_within = sum_g s_g T_g. Emits ONE row: n, n_excluded (Theil
    needs POSITIVE values — zero/negative rows are excluded and
    counted), n_groups, theil_total, theil_within, theil_between,
    between_share (= between/total, NULL when total is ~0). The
    decomposition identity holds to the 1e-8 term-quantization
    (asserted in tests at 1e-5). NULL group is its own bucket. Beyond
    the reference surface (SURVEY.md §2.2 north-star extensions).

    Scale shape: one (group) agg of exact integer-cent sums, its
    group-cardinality frame joined back to the rows together with the
    broadcast 1-row global; ONE per-row pass computes both entropy
    terms; one group re-agg and one k-row final agg. Single scan,
    nothing row-sized shuffles twice.

    Determinism: the entropy-query discipline — means divide exact
    DECIMAL cent sums; each transcendental term (ln is the only
    non-arithmetic op, same class as the entropy/log queries)
    quantizes to 1e-8 and accumulates in DECIMAL(38,8) at BOTH the
    per-row and the per-group level, so no double sum is ever
    partition-order-dependent.
    """
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    # labeled feeds the exclusion count, the group stats AND the
    # row-level entropy pass; gstat feeds the global re-agg AND the
    # join. Uncut that is 4 corpus scans — two cuts (one narrow
    # two-column frame, one tiny per-group frame) keep it at one.
    labeled = df.select(F.col(group_col).alias("__grp"), yc.alias("__yc")).filter(
        F.col("__yc").isNotNull()
    ).localCheckpoint(eager=False)
    base = labeled.filter(F.col("__yc") > 0)
    n_excl = labeled.filter(F.col("__yc") <= 0).groupBy(
        F.lit(1).alias("__g")
    ).agg(F.count(F.lit(1)).cast("long").alias("__nx"))
    gstat = base.groupBy(F.col("__grp").alias("__grp2")).agg(
        F.count(F.lit(1)).cast("long").alias("__ng"),
        F.sum(F.col("__yc").cast("decimal(38,0)")).cast("double").alias("__sg"),
    ).localCheckpoint(eager=False)
    tstat = gstat.agg(
        F.sum("__ng").cast("long").alias("__n"),
        F.sum(F.col("__sg").cast("decimal(38,2)")).cast("double").alias("__s"),
    )
    rows = base.join(
        F.broadcast(gstat), F.col("__grp").eqNullSafe(F.col("__grp2"))
    ).crossJoin(F.broadcast(tstat))
    mu = F.col("__s") / F.col("__n").cast("double")
    mu_g = F.col("__sg") / F.col("__ng").cast("double")
    x = F.col("__yc").cast("double")
    t_tot = dround((x / mu) * F.log(x / mu), 8).cast("decimal(38,8)")
    t_grp = dround((x / mu_g) * F.log(x / mu_g), 8).cast("decimal(38,8)")
    per_group = rows.groupBy("__grp2").agg(
        F.max("__ng").alias("__ng"),
        F.max("__sg").alias("__sg"),
        F.max("__n").alias("__n"),
        F.max("__s").alias("__s"),
        F.sum(t_tot).cast("double").alias("__tt"),
        F.sum(t_grp).cast("double").alias("__tg"),
    )
    s_g = F.col("__sg") / F.col("__s")
    t_g = F.col("__tg") / F.col("__ng").cast("double")
    mu2 = F.col("__s") / F.col("__n").cast("double")
    mu_g2 = F.col("__sg") / F.col("__ng").cast("double")
    within_term = dround(s_g * t_g, 8).cast("decimal(38,8)")
    between_term = dround(s_g * F.log(mu_g2 / mu2), 8).cast("decimal(38,8)")
    total_term = dround(F.col("__tt") / F.col("__n").cast("double"), 8).cast(
        "decimal(38,8)"
    )
    final = per_group.groupBy(F.lit(1).alias("__g")).agg(
        F.max("__n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(total_term).cast("double").alias("__total"),
        F.sum(within_term).cast("double").alias("__within"),
        F.sum(between_term).cast("double").alias("__between"),
    )
    out = final.join(F.broadcast(n_excl), "__g", "left").drop("__g")
    return out.select(
        "n",
        F.coalesce(F.col("__nx"), F.lit(0)).cast("long").alias("n_excluded"),
        "n_groups",
        dround(F.col("__total"), 6).alias("theil_total"),
        dround(F.col("__within"), 6).alias("theil_within"),
        dround(F.col("__between"), 6).alias("theil_between"),
        dround(
            F.when(
                F.col("__total") > 1e-12,
                F.col("__between") / F.col("__total"),
            ),
            6,
        ).alias("between_share"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Kruskal-Wallis rank test: do k groups differ in LOCATION,
    assuming nothing about the distributions — the k-group
    generalization of :func:`mann_whitney_u` and the nonparametric
    twin of :func:`anova_oneway` (same question, rank evidence instead
    of variance ratios; immune to the price tail that ANOVA's SS
    chase). H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1), with the
    standard tie correction H_c = H / (1 - sum(t^3 - t)/(N^3 - N)).
    Emits ONE row: k_groups, n, df (k-1), h_stat, h_corrected (NULL
    when every value ties — no rank information exists). NULL
    group/value rows are excluded. Beyond the reference surface
    (SURVEY.md §2.2 north-star extensions).

    Scale shape: the :func:`mann_whitney_u` skeleton generalized —
    values quantize to integer cents, per-DISTINCT-VALUE totals take
    ONE distributed running sum (range exchange + broadcast offsets),
    and each (group, value) cell picks up its tie-group's DOUBLED
    average rank 2*cum - t + 1 by an equi-join on the value; rank sums
    and the tie term then reduce group-wise. No per-row ranks, no
    single-task window, at any group count.

    Determinism: doubled rank sums R2_g and the tie term are exact
    DECIMAL(38,0) integers. The per-group H contributions are scaled
    to R_g^2/(n_g N^2 (N+1)) — bounded by ~1, so quantizing at 1e-12
    into DECIMAL(38,12) is order-independent without any magnitude
    cliff (the unscaled R_g^2/n_g reaches N^3 and would overflow
    dround's long floor past N ~ 1e4); H re-assembles from the scaled
    sum in one fixed IEEE shape, rounded 1e-6.

    Accuracy envelope (ADVICE r7): re-assembling H as 12*N*sum(term)
    amplifies each term's 1e-12 quantization by 12*N*k, so the emitted
    6-decimal h_stat tracks the true H to ~6e-12*N*k absolute — all 6
    printed decimals are exact up to N*k ~ 1e5 and degrade one decimal
    per further decade. Cross-engine determinism is unaffected at ANY
    N (both engines quantize on the identical grid before the identical
    re-assembly); like jarque_bera's overflow note, this documents
    where the printed digits stop being the infinite-precision ones.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415 - avoid module cycle

    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    yc = F.floor(y * F.lit(100.0) + F.lit(0.5)).cast("long")
    base = df.select(F.col(group_col).alias("__grp"), yc.alias("__yc")).filter(
        F.col("__grp").isNotNull() & F.col("__yc").isNotNull()
    )
    # Feeds both the value-count and (group, value)-count aggs; one
    # narrow materialization halves the corpus scans.
    base = base.localCheckpoint(eager=False)
    pv = base.groupBy("__yc").agg(F.count(F.lit(1)).cast("long").alias("__t"))
    cum = global_running_sum(
        pv, ["__yc"], "__t", out="__cum", num_partitions=num_partitions
    )
    r2v = cum.select(
        "__yc",
        (F.lit(2) * F.col("__cum") - F.col("__t") + F.lit(1)).alias("__r2v"),
    )
    ties = cum.groupBy(F.lit(1).alias("__g")).agg(
        F.sum(
            F.col("__t").cast("decimal(38,0)") * F.col("__t") * F.col("__t")
            - F.col("__t")
        )
        .cast("double")
        .alias("__ties")
    ).drop("__g")
    gv = base.groupBy("__grp", "__yc").agg(
        F.count(F.lit(1)).cast("long").alias("__ngv")
    )
    per_group = (
        gv.join(r2v, "__yc")
        .groupBy("__grp")
        .agg(
            F.sum("__ngv").cast("long").alias("__ng"),
            F.sum(F.col("__ngv").cast("decimal(38,0)") * F.col("__r2v"))
            .cast("double")
            .alias("__r2g"),
        )
        # feeds the nrow broadcast AND the main frame: uncut, the
        # gv ⋈ r2v join+agg ran twice (Catalyst shares no subtrees)
        .localCheckpoint(eager=False)
    )
    nrow = per_group.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__ng").cast("long").alias("n"),
    ).drop("__g")
    w = per_group.crossJoin(F.broadcast(nrow))
    n_d = F.col("n").cast("double")
    # scaled contribution: (R2/2)^2 / n_g / (N^2 (N+1)) -- bounded ~1
    term = dround(
        (F.col("__r2g") / F.lit(2.0))
        * (F.col("__r2g") / F.lit(2.0))
        / F.col("__ng").cast("double")
        / (n_d * n_d * (n_d + F.lit(1.0))),
        12,
    ).cast("decimal(38,12)")
    agg = w.groupBy("k_groups", "n").agg(
        F.sum(term).cast("double").alias("__sterm")
    )
    h = F.lit(12.0) * n_d * F.col("__sterm") - F.lit(3.0) * (
        n_d + F.lit(1.0)
    )
    ok = (F.col("k_groups") >= 2) & (F.col("n") >= 2)
    out = agg.crossJoin(F.broadcast(ties))
    denom = F.lit(1.0) - F.col("__ties") / (
        n_d * n_d * n_d - n_d
    )
    return out.select(
        "k_groups",
        "n",
        F.when(F.col("k_groups") >= 2, F.col("k_groups") - 1)
        .cast("long")
        .alias("df"),
        dround(F.when(ok, h), 6).alias("h_stat"),
        dround(F.when(ok & (denom > 0), h / denom), 6).alias("h_corrected"),
    )


def _cm_bucket(key: Column, d: int, width: int) -> Column:
    """Row d's count-min bucket for ``key``: the first 8 hex chars of
    md5('<d>:<key>') mod width — deterministic, engine-replayable (the
    simhash idiom: DuckDB replays it as
    ``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT) % width``)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(int(width)))


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key column
    — the mergeable FREQUENCY sketch beside the engine's cardinality
    (HLL), quantile (KLL) and heavy-hitter (top-k) sketches. Emits the
    sketch as (d, bucket, cnt) rows, at most ``depth * width`` of them
    regardless of input size; NULL keys are excluded (house rule).

    Merge rule: the sketch of a union is the bucket-wise SUM of the
    sketches — union the frames and re-aggregate (pytest-pinned), which
    is what makes per-day/per-shard sketch maintenance + rollup work.

    Scale shape: each input row explodes to ``depth`` (d, bucket) pairs
    feeding ONE map-side-combined count agg; the shuffle carries at
    most depth*width rows per partition, so sketch size is independent
    of corpus size — the whole point. Hashing is md5-derived (one
    fixed-shape expression per depth row), pure Catalyst. Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _cm_bucket(key, d, width).alias("bucket"),
            )
            for d in range(int(depth))
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def count_min_estimate(
    df: DataFrame,
    key_col: str,
    probes: Sequence[str],
    *,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch, beside the
    exact truth: per probe key (exact_count, cm_estimate, overcount).
    The CM guarantee is ONE-SIDED — cm_estimate >= exact_count always
    (collisions only ever add) — with overcount <= 2N/width at
    confidence 1 - (1/2)^depth; emitting both sides makes the query its
    own accuracy report (the q_hll_rollup pattern, but exactly
    replayable: the md5 bucketing is deterministic, so the oracle
    reproduces the ESTIMATES bit-for-bit, not a tolerance flag).

    Scale shape: ONE per-key count agg over the data feeds BOTH the
    sketch (bucket counts are the tf-weighted re-agg of the key frame —
    bit-identical to :func:`count_min_sketch` on the raw stream, which
    is pytest-pinned separately) and the probe-screened exact side, so
    the key stream is scanned once; then a probes-sized (broadcast)
    join against the depth*width-row sketch.
    """
    spark = df.sparkSession
    key = F.col(key_col)
    tf = (
        df.filter(key.isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=False)
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _cm_bucket(key, d, width).alias("bucket"),
            )
            for d in range(int(depth))
        ]
    )
    sk = (
        tf.select(F.explode(pairs).alias("p"), "__n")
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("__n").cast("long").alias("cnt"))
    )
    probe_df = spark.createDataFrame(
        [(p,) for p in probes], f"{key_col} string"
    )
    probe_buckets = probe_df.select(key_col, F.explode(pairs).alias("p")).select(
        key_col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    )
    est = (
        probe_buckets.join(sk, ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_estimate"))
    )
    exact = (
        tf.filter(key.isin(list(probes)))
        .groupBy(key_col)
        .agg(F.sum("__n").cast("long").alias("exact_count"))
    )
    return (
        est.join(exact, [key_col], "left")
        .select(
            key_col,
            F.coalesce(F.col("exact_count"), F.lit(0)).cast("long").alias("exact_count"),
            "cm_estimate",
            (F.col("cm_estimate") - F.coalesce(F.col("exact_count"), F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    group_by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """K-minimum-values distinct sketch: the k smallest 60-bit hash
    values of the DISTINCT ``value_col`` values per group — one
    (group..., h) row each, at most k rows per group.

    Beside HLL (``approx_count_distinct`` / the streaming sketch state)
    this is the set-OPERATIONS sketch: two KMV sketches union by
    "merge and keep the k smallest", and — the thing HLL fundamentally
    cannot do — intersect via the Jaccard fraction observed inside the
    merged sketch (:func:`kmv_intersect_estimate`). "Distinct users in
    segment A AND segment B" over 100 TB becomes a join of two <=k-row
    frames.

    Determinism: the hash is the first 15 hex chars of md5 (60 bits,
    uniform on [0, 2^60)), so the sketch — and every estimate derived
    from it — is a pure function of the value SET: identical at any
    partitioning/parallelism and exactly replayable by an ANSI oracle
    (``('0x' || substr(md5(v), 1, 15))::BIGINT`` in DuckDB). No
    tolerance oracle needed; the driver hash-compares estimates
    bit-for-bit.

    Scale shape: one distinct-agg (map-side combined) narrows the data
    to (group, h) pairs, then the k-cut is a per-group top-k window —
    Catalyst plans a WindowGroupLimit, so each input partition forwards
    at most k rows per group. Estimate error is ~1/sqrt(k-2) (Beyer et
    al. 2007; Bar-Yossef et al.'s KMV): k=256 gives ~6%.
    """
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    from python_mapreduce_spark.operators.windows import topk_per_group  # noqa: PLC0415

    gb = list(group_by)
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*gb, h.alias("h"))
        .distinct()
    )
    if not gb:
        # Global k-cut as TakeOrderedAndProject (per-partition heaps +
        # tiny merge) — a keyless window would funnel every distinct
        # hash through one task.
        return hashes.orderBy("h").limit(k)
    return topk_per_group(hashes, gb, [F.col("h").asc()], k).drop("rn")


#: 2^60 as an exact double — the KMV hash domain size. (k-1) * 2^60 is
#: also exactly representable (k <= 2^53), so the estimate is ONE
#: correctly-rounded IEEE division on both engines.
_KMV_DOMAIN = float(1 << 60)


def kmv_distinct_estimate(
    sketch: DataFrame,
    *,
    group_by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_sketch`: per group,
    (k-1) / h_(k) scaled to the hash domain when the sketch is full,
    else the EXACT count (a sketch with fewer than k hashes saw every
    distinct value). Emits (group..., n_kmv DOUBLE, sketch_full BOOL).
    Runs entirely on the <=k-row-per-group sketch frame."""
    gb = list(group_by)
    agg = (
        sketch.groupBy(*gb).agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.max("h").alias("__hk"),
        )
        if gb
        else sketch.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.max("h").alias("__hk"),
        )
    )
    full = F.col("__n") >= F.lit(k)
    est = F.when(
        full,
        F.lit(float(k - 1) * _KMV_DOMAIN) / F.col("__hk").cast("double"),
    ).otherwise(F.col("__n").cast("double"))
    return agg.select(
        *gb,
        F.floor(est * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0),
        full,
    ).toDF(*gb, "n_kmv", "sketch_full")


def kmv_intersect_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 256,
) -> DataFrame:
    """Set operations on two ungrouped KMV sketches: union and
    intersection cardinality estimates, one output row
    (n_union_kmv DOUBLE, n_intersect_kmv DOUBLE, jaccard_kmv DOUBLE).

    Union sketch = k smallest of the merged hash sets (a valid KMV of
    A ∪ B by construction). Within that union sketch, the fraction of
    hashes present in BOTH input sketches is an unbiased Jaccard
    estimate (each union-sketch member is a uniform random distinct
    element of A ∪ B), so n̂_∩ = jaccard * n̂_∪ (Beyer et al. 2007).
    Every frame here is <=k rows (broadcast joins); the raw data was
    left behind at sketch time.
    """
    a = sketch_a.select("h").withColumn("__in_a", F.lit(True))
    b = sketch_b.select("h").withColumn("__in_b", F.lit(True))
    merged = (
        a.join(F.broadcast(b), "h", "full_outer")
        .select(
            "h",
            F.coalesce("__in_a", F.lit(False)).alias("in_a"),
            F.coalesce("__in_b", F.lit(False)).alias("in_b"),
        )
    )
    # k-cut of the <=2k-row merged frame as TakeOrderedAndProject.
    union_sketch = merged.orderBy("h").limit(k)
    stats = union_sketch.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.max("h").alias("__hk"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).cast("long").alias("__both"),
    )
    full = F.col("__n") >= F.lit(k)
    nonempty = F.col("__n") > 0
    n_union = F.when(
        full, F.lit(float(k - 1) * _KMV_DOMAIN) / F.col("__hk").cast("double")
    ).otherwise(F.col("__n").cast("double"))
    # Explicit empty-sketch guard: Spark's 0/0 double division is NULL
    # where DuckDB's is NaN — make both sides emit NULL.
    jac = F.when(
        nonempty, F.col("__both").cast("double") / F.col("__n").cast("double")
    )
    return stats.select(
        (F.floor(n_union * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "n_union_kmv"
        ),
        (F.floor(jac * n_union * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "n_intersect_kmv"
        ),
        (F.floor(jac * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "jaccard_kmv"
        ),
    )


#: Cumulative Poisson(1) CDF thresholds scaled to the 52-bit bootstrap
#: hash domain (floor(P(X <= j) * 2^52), j = 0..5): a uniform 52-bit
#: integer u maps to the replicate weight w = #{thresholds <= u} — the
#: inverse-CDF draw as pure INTEGER comparisons, identical on any
#: engine. Weights cap at 6 (P(X > 5) ~ 6e-4; the truncation bias is
#: far below bootstrap noise at any real row count).
_BOOT_POISSON_CUTS = (
    1656781714176974,
    3313563428353948,
    4141954285442435,
    4418084571138597,
    4487117142562638,
    4500923656847446,
)
_BOOT_DOMAIN = 1 << 52  # 13 hex chars of md5 — exact as a double


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    replicates: int = 40,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean — with NO
    random number generator: replicate r resamples each row with
    weight w = Poisson(1) drawn by inverse-CDF from the 52-bit integer
    md5(id || '|' || r). The weights are a pure function of
    (id, replicate), so the whole procedure is deterministic at any
    partitioning, replayable exactly by an ANSI oracle, and stable
    across reruns — the engine's seeded-md5 sampling discipline
    (hash_split / weighted_sample / deterministic_shuffle) extended to
    uncertainty quantification.

    Emits ONE row: (n_rows BIGINT, mean_full DOUBLE, ci_lo DOUBLE,
    ci_hi DOUBLE) — the plug-in mean plus the [lo, hi] percentile
    bootstrap interval over ``replicates`` resampled means.

    Scale shape: one scan fans each row out to ``replicates``
    (replicate, weighted-cents) pairs — explode in the scan stage, no
    extra shuffle — and ONE map-side-combined agg reduces them to
    ``replicates`` rows of integer-cent DECIMAL sufficient sums (the
    ANOVA discipline: integer-scale decimals convert to double in one
    correctly-rounded step on both engines). The percentile over the
    R-row means frame sorts deterministically (no order-dependent
    float accumulation). A replicate whose total weight is 0 yields a
    NULL mean, which the percentile ignores on both engines.
    """
    if replicates < 2:
        raise ValueError("bootstrap needs >= 2 replicates")
    vals = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.floor(F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("decimal(28,0)")
        .alias("__cents"),
    ).filter(F.col("__cents").isNotNull())
    fanned = vals.select(
        "__id", "__cents", F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("__r")
    )
    u = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("__id"), F.col("__r"))), 1, 13), 16, 10
    ).cast("long")
    w = sum(
        (u >= F.lit(cut)).cast("int") for cut in _BOOT_POISSON_CUTS
    ).cast("long")
    rep = (
        fanned.withColumn("__w", w)
        .groupBy("__r")
        .agg(
            F.sum(F.col("__cents") * F.col("__w")).cast("decimal(38,0)").alias("__s"),
            F.sum("__w").cast("long").alias("__n"),
        )
        .select(
            F.when(
                F.col("__n") > 0,
                F.col("__s").cast("double") / F.col("__n").cast("double") / F.lit(100.0),
            ).alias("__mean")
        )
    )
    ci = rep.agg(
        F.expr(
            f"percentile(__mean, array({lo!r}D, {hi!r}D))"
        ).alias("__ci")
    ).select(
        (F.floor(F.col("__ci")[0] * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "ci_lo"
        ),
        (F.floor(F.col("__ci")[1] * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "ci_hi"
        ),
    )
    base = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.floor(
                F.sum("__cents").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(100.0)
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0),
        ).alias("mean_full"),
    )
    return base.join(F.broadcast(ci))


def bootstrap_diff_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    a: str,
    b: str,
    *,
    replicates: int = 40,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the DIFFERENCE of
    means between two segments (A/B uplift with uncertainty — the
    companion to the two-proportion z-test ``ab_test_proportions``,
    for continuous metrics where the normal approximation is the wrong
    tool). Same RNG-free machinery as :func:`bootstrap_mean_ci`: the
    replicate weight of a row is a Poisson(1) inverse-CDF draw from
    md5(id || '|' || r) — deterministic, partitioning-invariant,
    exactly oracle-replayable. Each group is resampled independently
    (its rows carry their own ids), which is the standard two-sample
    bootstrap.

    Emits ONE row: (n_a BIGINT, n_b BIGINT, diff_full DOUBLE,
    ci_lo DOUBLE, ci_hi DOUBLE, significant BOOLEAN) — plug-in
    mean(a) - mean(b), the [lo, hi] percentile interval of the
    resampled differences, and whether the interval excludes zero.

    Scale shape: identical to :func:`bootstrap_mean_ci` with the agg
    keyed on replicate only — conditional sums split the two groups
    inside ONE map-side-combined pass, so the wire still carries
    ``replicates`` rows of DECIMAL sufficient sums.
    """
    if replicates < 2:
        raise ValueError("bootstrap needs >= 2 replicates")
    vals = df.filter(F.col(group_col).isin(a, b)).select(
        F.col(id_col).cast("string").alias("__id"),
        (F.col(group_col) == a).alias("__is_a"),
        F.floor(F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("decimal(28,0)")
        .alias("__cents"),
    ).filter(F.col("__cents").isNotNull())
    fanned = vals.select(
        "__id",
        "__is_a",
        "__cents",
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("__r"),
    )
    u = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("__id"), F.col("__r"))), 1, 13), 16, 10
    ).cast("long")
    w = sum((u >= F.lit(cut)).cast("int") for cut in _BOOT_POISSON_CUTS).cast("long")
    zero = F.lit(0).cast("decimal(28,0)")
    rep = (
        fanned.withColumn("__w", w)
        .groupBy("__r")
        .agg(
            F.sum(F.when(F.col("__is_a"), F.col("__cents") * F.col("__w")).otherwise(zero))
            .cast("decimal(38,0)")
            .alias("__sa"),
            F.sum(F.when(F.col("__is_a"), F.col("__w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("__na"),
            F.sum(F.when(~F.col("__is_a"), F.col("__cents") * F.col("__w")).otherwise(zero))
            .cast("decimal(38,0)")
            .alias("__sb"),
            F.sum(F.when(~F.col("__is_a"), F.col("__w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("__nb"),
        )
        .select(
            F.when(
                (F.col("__na") > 0) & (F.col("__nb") > 0),
                F.col("__sa").cast("double") / F.col("__na").cast("double") / F.lit(100.0)
                - F.col("__sb").cast("double") / F.col("__nb").cast("double") / F.lit(100.0),
            ).alias("__d")
        )
    )
    ci = rep.agg(
        F.expr(f"percentile(__d, array({lo!r}D, {hi!r}D))").alias("__ci")
    ).select(
        (F.floor(F.col("__ci")[0] * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "ci_lo"
        ),
        (F.floor(F.col("__ci")[1] * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "ci_hi"
        ),
    )
    base = vals.agg(
        F.sum(F.col("__is_a").cast("long")).cast("long").alias("n_a"),
        F.sum((~F.col("__is_a")).cast("long")).cast("long").alias("n_b"),
        F.when(
            (F.sum(F.col("__is_a").cast("long")) > 0)
            & (F.sum((~F.col("__is_a")).cast("long")) > 0),
            F.floor(
                (
                    F.sum(F.when(F.col("__is_a"), F.col("__cents")).otherwise(zero)).cast(
                        "double"
                    )
                    / F.sum(F.col("__is_a").cast("long")).cast("double")
                    - F.sum(F.when(~F.col("__is_a"), F.col("__cents")).otherwise(zero)).cast(
                        "double"
                    )
                    / F.sum((~F.col("__is_a")).cast("long")).cast("double")
                )
                / F.lit(100.0)
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0),
        ).alias("diff_full"),
    )
    out = base.join(F.broadcast(ci))
    return out.select(
        "n_a",
        "n_b",
        "diff_full",
        "ci_lo",
        "ci_hi",
        F.when(
            F.col("ci_lo").isNotNull(),
            (F.col("ci_lo") > 0.0) | (F.col("ci_hi") < 0.0),
        ).alias("significant"),
    )
