"""Row-level relational operators: project, filter, sample, union, limit.

Reference equivalents are all map-fn patterns (SURVEY.md §2.2):
projection = reshaping the emitted value, filtering = returning [] for a
line, sampling = file-level Bernoulli (O5), union = multi-dir scan. Here
they are trivially thin wrappers — their value is naming the capability
surface and carrying the scale notes; Catalyst does the heavy lifting
(pushdown, pruning) because the plan is declarative.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame


def project(df: DataFrame, cols: Sequence[str | Column]) -> DataFrame:
    """Column pruning reaches the scan (ReadSchema in explain())."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Predicate pushdown reaches the scan (PushedFilters in explain())."""
    return df.filter(predicate)


def sample_rows(df: DataFrame, fraction: float, *, seed: int = 42) -> DataFrame:
    """Row-level Bernoulli sample — finer-grained than the reference's
    whole-file downsample (O5, mapper.py:103-108); see
    sources.readers.sample_files for the file-granularity variant."""
    return df.sample(fraction=fraction, seed=seed)


def _md5_bucket(id_col: str, salt: str = "") -> Column:
    """First 4 hex chars of ``md5(id || salt)`` — the deterministic
    sampling bucket shared by :func:`domain_mix`, :func:`hash_split`,
    and :func:`weighted_sample`: uniform over 65536 values, reproducible
    in any engine, independent of row order/partitioning."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    return F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4)


def _bucket_threshold(frac: float) -> str:
    """``round(frac * 65536)`` rendered as the 4-hex-digit threshold the
    bucket is compared against (strict ``<``). Clamped to 0xffff: a
    fraction within 1/131072 of 1.0 would otherwise round to 65536,
    whose 5-digit hex string compares lexicographically BELOW most
    4-digit buckets and would silently keep ~6% instead of ~100%. The
    clamp costs at most 1/65536 of the requested rate (the rule's
    granularity anyway); callers treat frac >= 1 as an unconditional
    keep before reaching here."""
    return format(min(0xFFFF, max(0, round(frac * 65536))), "04x")


def domain_mix(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    target: dict[str, float],
) -> DataFrame:
    """Deterministic hash-based domain rebalancing: keep each row of
    domain d with probability ``target[d]`` — the training-data "domain
    mixing" step that downsamples over-represented sources to a target
    distribution. Domains absent from ``target`` are dropped.

    Keep rule: first 4 hex chars of md5(id) compared against the
    fraction as a hex threshold — uniform, reproducible in any engine
    (granularity 1/65536), and independent of row order or partitioning.
    A pushed-down filter at any scale: no shuffle, no UDF, no RNG state.
    Beyond the reference surface (SURVEY.md §2.2 north-star extensions);
    the seeded-Bernoulli variant for non-auditable sampling is
    :func:`stratified_sample`.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    bucket = _md5_bucket(id_col)
    pred = F.lit(False)  # empty target => every domain dropped
    for domain, frac in target.items():
        p = F.col(domain_col) == domain
        if frac < 1.0:
            # Strict < against the clamped 4-hex threshold; frac >= 1.0
            # keeps the whole domain unconditionally (see
            # _bucket_threshold for the clamp rationale).
            p = p & (bucket < F.lit(_bucket_threshold(frac)))
        pred = pred | p
    return df.filter(pred)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    *,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: tag each row with a
    split name by hashing its id — the canonical dataset-split step of a
    training pipeline. Weights are normalized; assignment is by
    cumulative threshold over the first 4 hex chars of
    ``md5(id || salt)`` (granularity 1/65536), so it is reproducible in
    any engine, independent of row order/partitioning, and stable under
    re-runs and corpus growth (a given id never changes split unless the
    salt does). Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions); the keep/drop variant of the same rule is
    :func:`domain_mix`.

    A pure projected CASE expression — no shuffle, no UDF, no RNG state
    at any scale. The last split absorbs the rounding remainder so every
    row is always assigned — unless an earlier prefix of splits already
    covers the whole [0, 1) range (e.g. a trailing zero-weight split),
    in which case that prefix's last clause goes unconditional so no row
    can leak into a split the caller declared empty.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if not splits:
        raise ValueError("splits must name at least one split")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    weights = [w for _, w in splits]
    if min(weights) < 0 or sum(weights) <= 0:
        raise ValueError(f"split weights must be >= 0 with a positive sum: {weights}")
    total = float(sum(weights))
    bucket = _md5_bucket(id_col, salt)
    expr, cum = None, 0.0
    for name, w in splits[:-1]:
        cum += w / total
        if round(cum * 65536) >= 65536:
            # Cumulative coverage reached 1.0 (within the rule's
            # granularity): claim everything left, including bucket
            # 'ffff' — the 0xffff clamp would leak that bucket past
            # every zero-weight remainder into the last split.
            clause = F.lit(True)
        else:
            clause = bucket < F.lit(_bucket_threshold(cum))
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    last = splits[-1][0]
    assigned = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, assigned)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling: keep each row with
    probability equal to its (clamped to [0, 1]) weight — e.g. keep
    documents proportionally to a quality score, the importance-style
    downsampling step of a training pipeline. Beyond the reference
    surface (SURVEY.md §2.2 north-star extensions).

    The keep rule generalizes :func:`domain_mix` from per-domain
    constants to per-row weights: first 4 hex chars of
    ``md5(id || salt)`` compared against the weight rendered as a 4-hex
    threshold (floor(w * 65536), granularity 1/65536; weights >= 1 keep
    unconditionally, <= 0 drop). Reproducible in any engine, invariant
    to row order/partitioning, re-run stable, and a pure filter — no
    shuffle, no UDF, no RNG state at any scale.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    bucket = _md5_bucket(id_col, salt)
    # Per-row threshold, so the hex rendering happens in the engine
    # (floor instead of _bucket_threshold's round; the >= 1.0 branch
    # below plays the role of its clamp).
    thr = F.lpad(F.lower(F.hex(F.floor(w * 65536).cast("long"))), 4, "0")
    keep = F.when(w >= 1.0, F.lit(True)).when(w <= 0.0, F.lit(False)).otherwise(bucket < thr)
    return df.filter(keep)


def repeat_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    *,
    salt: str = "",
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic weighted UP/down-sampling: emit each row
    ``floor(w)`` times plus one fractional extra with probability
    ``w - floor(w)``, so expected multiplicity equals the weight — the
    epoch-mixing step that oversamples high-value/low-resource data
    (weights above 1 repeat documents across epochs; below 1 this
    degenerates to :func:`weighted_sample`). Copies are numbered in
    ``copy_col`` (1..n) so downstream shuffles can decorrelate them.
    Beyond the reference surface (SURVEY.md §2.2 north-star extensions).

    The fractional keep reuses the md5-bucket rule (one decision per
    row — reproducible in any engine, no RNG state); the repeat is an
    ``explode(sequence(...))`` fanned out in the scan stage — no
    shuffle, no UDF at any scale. NULL or non-positive weights drop the
    row; weights are read as multiplicities, not probabilities, so no
    clamp applies.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    n_base = F.floor(w).cast("long")
    frac = w - n_base
    thr = F.lpad(F.lower(F.hex(F.floor(frac * 65536).cast("long"))), 4, "0")
    extra = (frac > 0) & (_md5_bucket(id_col, salt) < thr)
    n_copies = n_base + extra.cast("long")
    out = df.withColumn("__n_copies", n_copies).filter(F.col("__n_copies") > 0)
    return out.withColumn(
        copy_col, F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n_copies")))
    ).drop("__n_copies")


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-balanced domain sampling — the multilingual mixing
    rule of XLM-R/mT5: resample so domain d's share moves from p_d
    toward p_d^alpha (alpha < 1 flattens the distribution toward
    uniform, boosting low-resource domains' relative share). Realized as
    pure downsampling: keep rate r_d = (c_min / c_d)^(1 - alpha), which
    keeps the smallest domain whole and thins larger ones. Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).

    Per-row keeps use the deterministic md5-bucket rule via
    :func:`weighted_sample` — reproducible in any engine, no RNG state.
    At alpha = 0.5 the rate is ``sqrt(c_min / c_d)`` computed with IEEE
    sqrt (exactly specified, bit-identical across engines); other alphas
    go through ``pow``, correctly rounded on mainstream libm but not
    IEEE-mandated — oracle-compared pipelines should stick to 0.5.

    Plan shape at 100 TB: one column-pruned counting pass over
    ``domain_col``, a domains-row rate table broadcast back onto the
    data, then a pushed-down filter — no data-side shuffle anywhere.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    # The domains-row count frame feeds the min aggregate AND the rate
    # table (2 scans uncut — each replays the corpus-wide counting
    # pass); one cut of the tiny frame keeps it to one pass.
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=False)
    )
    mn = counts.agg(F.min("__n").alias("__mn"))
    ratio = F.col("__mn").cast("double") / F.col("__n").cast("double")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        F.col(domain_col), rate.alias("__rate")
    )
    joined = df.join(F.broadcast(rates), domain_col)
    return weighted_sample(joined, id_col, F.col("__rate"), salt=salt).drop("__rate")


def group_reservoir(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    *,
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic k-per-group uniform sample WITHOUT replacement:
    rank each group's rows by ``md5(id || salt)`` (id as tiebreak) and
    keep the first k — reservoir sampling's result, reproducibly: any
    engine, any run, any partitioning draws the same rows, and rotating
    the salt re-deals the sample. The per-row rate rules
    (:func:`weighted_sample` et al.) can't hit an EXACT per-group count;
    this is the eval-set / human-review draw that needs one. Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions; the
    reference's downsample O5 is file-level and seed-free).

    Cost: one shuffle on ``group_col`` plus a per-group sort — the
    standard per-group top-k window (groups are the parallel unit; no
    single-task stage). For a group of n rows the sort is O(n log n);
    when k << n on 100 TB groups, pre-thin with
    ``weighted_sample(rate ~ c*k/n)`` first and let this operator cut
    the exact k from the survivors.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.window import Window  # noqa: PLC0415

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """Bag union by column name — the reference's multi-dir input concat
    (mapper.py:75-78), schema-safe."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    *,
    seed: int = 42,
    key: str | None = None,
) -> DataFrame:
    """Per-stratum sampling — the reference's downsample (O5,
    mapper.py:103-108) upgraded from one global file-level rate to a
    rate per stratum. Strata absent from ``fractions`` are dropped.

    Two modes:
      * ``key=None`` (production): ``df.sampleBy`` — per-row Bernoulli,
        seeded, executed inside the scan stage (no shuffle).
      * ``key='col'`` (deterministic): include a stratum's row when
        ``key % round(1/fraction) == 0`` — exactly reproducible in any
        engine, so results are oracle-comparable; with an entity key
        (e.g. order key over lineitem) it samples whole entities, the
        closest analog of the reference's whole-file inclusion.
    Both are a pushed-down filter at any scale: no shuffle, no UDF.
    """
    from pyspark.sql import functions as F

    if key is None:
        return df.sampleBy(strata_col, fractions, seed)
    pred = None
    for stratum, frac in fractions.items():
        denom = max(1, round(1.0 / frac))
        p = (F.col(strata_col) == stratum) & (
            F.pmod(F.col(key), F.lit(denom)) == 0
        )
        pred = p if pred is None else (pred | p)
    return df.filter(pred)


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Melt wide measure columns into (measure, value) rows — the
    inverse of pivot, and the reference's map-fn pattern of emitting one
    (metric_name, value) item per metric per line (O6 flatMap,
    README.txt:254-261). Spark plans an Expand node: rows are fanned out
    in the scan stage with no shuffle, no UDF, and column pruning still
    reaches the scan for the melted subset."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def limit_rows(df: DataFrame, n: int) -> DataFrame:
    """LIMIT; with an orderBy upstream Spark plans TakeOrderedAndProject
    (per-partition top-n, then one merge — no global sort materialized)."""
    return df.limit(n)


def upsert(base: DataFrame, updates: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """Keyed merge/upsert: rows from ``updates`` replace same-key rows in
    ``base``; unmatched base rows pass through (MERGE semantics over
    immutable files — lakehouse MERGE without a table format).

    Shaped as ``updates UNION (base ANTI-JOIN updates)``: one shuffle on
    the key (broadcast when updates is small — the common case of a
    trickle of corrections against a 100 TB base), no full-outer join
    and no per-column coalesce. Rewrite-on-write: pair with
    ``write_parquet(partition_by=...)`` to rewrite only affected
    partitions.

    ``updates`` must be key-unique (enforce upstream with
    ``dropDuplicates(key)``) — duplicate update keys would both survive.
    """
    keys = [key] if isinstance(key, str) else list(key)
    survivors = base.join(updates.select(*keys), on=keys, how="left_anti")
    return updates.unionByName(survivors)


def recover_and_clear_swap(path: str, tmp: str, old: str) -> None:
    """Crash recovery for the write-to-temp / two-rename swap protocol
    (shared by :func:`compact_files` and the streaming upsert sink): if
    a previous run died between the two renames — data stranded in
    ``old`` with nothing at ``path`` — restore it; then clear any stale
    ``tmp``/``old`` so the next swap's renames cannot collide."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)
    for stale in (tmp, old):
        if os.path.isdir(stale):
            shutil.rmtree(stale)


def swap_into(path: str, tmp: str, old: str) -> None:
    """The two-rename swap: move the current ``path`` (if any) aside to
    ``old``, promote ``tmp``, drop ``old``. NOT atomic for concurrent
    readers (there is a window with no directory at ``path``; on object
    stores / Delta-style tables use a metadata commit instead); it IS
    crash-safe when every run calls :func:`recover_and_clear_swap`
    before writing ``tmp``."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    if os.path.isdir(path):
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)


def compact_files(
    spark,
    path: str,
    *,
    target_partitions: int,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction: rewrite a dataset directory into
    ``target_partitions`` files (streaming sinks and incremental loads
    accrete tiny files; scans then pay per-file open/footer cost —
    the classic small-files tax at 100 TB).

    Rewrite-to-temp then the shared recover-and-swap protocol
    (:func:`recover_and_clear_swap` / :func:`swap_into` — see their
    docstrings for the atomicity caveat and crash contract). Returns
    the number of files written. coalesce() (no shuffle) — compaction
    only merges, never splits.
    """
    import glob  # noqa: PLC0415

    tmp = f"{path.rstrip('/')}__compact_tmp"
    old = f"{path.rstrip('/')}__compact_old"
    recover_and_clear_swap(path, tmp, old)
    df = spark.read.format(fmt).load(path)
    df.coalesce(target_partitions).write.mode("overwrite").format(fmt).save(tmp)
    swap_into(path, tmp, old)
    return len(glob.glob(f"{path}/*.{fmt}"))


def repartition_and_sort(
    df: DataFrame,
    key: str | Sequence[str],
    *,
    num_partitions: int | None = None,
    order: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Hash-partition by key, sort within each partition — the reference's
    exact output contract: reducer output is grouped and key-ordered PER
    PARTITION with no order across partitions (external sort O14
    disk_sort.py:32-97 feeding hash partitions O8 shuffler.py:71-77).

    At scale this is the cheap ordering: one shuffle, per-partition
    sorts, no global range exchange. Use global ``orderBy`` only when a
    total order is genuinely required (it adds a range-partitioning pass
    over a sampled key distribution).
    """
    keys = [key] if isinstance(key, str) else list(key)
    out = (
        df.repartition(num_partitions, *keys)
        if num_partitions
        else df.repartition(*keys)
    )
    return out.sortWithinPartitions(*(order or keys))


def diff_tables(
    a: DataFrame,
    b: DataFrame,
    key: str | Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Keyed table reconciliation: classify every key as ``same`` /
    ``changed`` / ``only_a`` / ``only_b`` between two snapshots — the
    validation pass run when migrating a pipeline between engines or
    comparing a rebuilt table against production. (It is exactly the
    check this repo's own oracle harness performs against DuckDB,
    packaged as an operator.)

    One full outer join on the key; BOTH the key match and the value
    comparisons are null-safe (NULL == NULL counts as equal, NULL vs
    value as changed) — a NULL-keyed row present on both sides is
    compared, not mis-reported as an only_a + only_b pair (ADVICE r4
    item 4). Duplicate keys are the caller's contract violation — the
    join would fan out — so keys must be unique per side (the standard
    snapshot shape). Returns (key..., status).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    keys = [key] if isinstance(key, str) else list(key)
    pa = a.select(*keys, *compare_cols, F.lit(True).alias("__in_a"))
    pb = b.select(
        *[F.col(k).alias(f"__b_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(True).alias("__in_b"),
    )
    cond = None
    for k in keys:
        c = pa[k].eqNullSafe(pb[f"__b_{k}"])
        cond = c if cond is None else cond & c
    j = pa.join(pb, cond, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__b_{c}"))
        same = eq if same is None else same & eq
    status = (
        F.when(F.col("__in_b").isNull(), "only_a")
        .when(F.col("__in_a").isNull(), "only_b")
        .when(same, "same")
        .otherwise("changed")
    )
    out_keys = [
        F.coalesce(F.col(k), F.col(f"__b_{k}")).alias(k) for k in keys
    ]
    return j.select(*out_keys, status.alias("status"))


def replication_audit(
    a: DataFrame,
    b: DataFrame,
    key: str | Sequence[str],
    compare_cols: Sequence[str],
    *,
    group_by: str | Sequence[str],
) -> DataFrame:
    """Two-phase replication audit — the 100 TB way to answer "is the
    copy identical, and if not, where": phase 1 digests BOTH sides per
    group with :func:`~python_mapreduce_spark.operators.aggregates.
    table_checksum` (one map-side-combined agg per side; only (group,
    3 numbers) rows meet in a tiny join), phase 2 row-diffs ONLY the
    groups whose digests disagree (a broadcast semi join on the — by
    construction tiny — divergent-group list screens both scans; when
    ``group_by`` is the physical partition column, Catalyst prunes
    phase 2 to the divergent partitions and matching data is never
    re-read). Running :func:`diff_tables` on both full tables instead
    would shuffle 2x the data on the key for what is usually a 100%%
    match.

    Emits one row per group:
    (group..., verdict, n_rows_a, n_rows_b, n_row_only_a, n_row_only_b,
    n_row_changed, n_row_same) where verdict is ``match`` /
    ``mismatch`` / ``only_a`` / ``only_b``. Row-level counts for
    ``mismatch`` groups come from the phase-2 diff keyed on
    (group cols + key) — a row that moved groups therefore shows as
    only_a in its old group and only_b in its new one, which is how a
    partition-level audit should see it; ``only_a``/``only_b`` group
    counts come straight from the digests (no second scan). Same
    caveats as the digest: project columns to engine-identical string
    forms first when auditing across engines, and ``key`` must be
    unique per side within a group (diff_tables' snapshot contract).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from python_mapreduce_spark.operators.aggregates import table_checksum  # noqa: PLC0415

    gb = [group_by] if isinstance(group_by, str) else list(group_by)
    keys = [key] if isinstance(key, str) else list(key)
    digest_cols = [*keys, *compare_cols]
    da = table_checksum(a.select(*gb, *digest_cols), digest_cols, group_by=gb)
    db = table_checksum(b.select(*gb, *digest_cols), digest_cols, group_by=gb)
    pb = db.select(
        *[F.col(g).alias(f"__b_{g}") for g in gb],
        F.col("n_rows").alias("__b_n"),
        F.col("checksum_hi").alias("__b_hi"),
        F.col("checksum_lo").alias("__b_lo"),
    )
    cond = reduce(
        lambda acc, g: acc & da[g].eqNullSafe(pb[f"__b_{g}"]),
        gb[1:],
        da[gb[0]].eqNullSafe(pb[f"__b_{gb[0]}"]),
    )
    j = da.join(pb, cond, "full_outer")
    verdict = (
        F.when(F.col("__b_n").isNull(), "only_a")
        .when(F.col("n_rows").isNull(), "only_b")
        .when(
            (F.col("n_rows") == F.col("__b_n"))
            & (F.col("checksum_hi") == F.col("__b_hi"))
            & (F.col("checksum_lo") == F.col("__b_lo")),
            "match",
        )
        .otherwise("mismatch")
    )
    groups = j.select(
        *[F.coalesce(F.col(g), F.col(f"__b_{g}")).alias(g) for g in gb],
        verdict.alias("verdict"),
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows_a"),
        F.coalesce(F.col("__b_n"), F.lit(0)).alias("n_rows_b"),
    )
    # One row per group: materialize once so the digest scans aren't
    # replayed for each of the two consumers below (divergent list +
    # final output), and the broadcast ships a settled tiny frame.
    groups = groups.localCheckpoint()
    # Phase 2: row-level diff restricted to mismatching groups. The
    # divergent list is tiny relative to the data — broadcast it so the
    # semi join screens both scans without a shuffle.
    div = F.broadcast(groups.filter(F.col("verdict") == "mismatch").select(*gb))
    fa = a.join(div, [a[g].eqNullSafe(div[g]) for g in gb], "semi")
    fb = b.join(div, [b[g].eqNullSafe(div[g]) for g in gb], "semi")
    diff = diff_tables(
        fa.select(*gb, *digest_cols),
        fb.select(*gb, *digest_cols),
        [*gb, *keys],
        compare_cols,
    )
    counts = diff.groupBy(*gb).agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("status") == s, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias(f"n_row_{s}")
            for s in ("only_a", "only_b", "changed", "same")
        ]
    )
    out = groups.join(
        counts,
        [groups[g].eqNullSafe(counts[g]) for g in gb],
        "left",
    ).select(
        *[groups[g] for g in gb],
        "verdict",
        "n_rows_a",
        "n_rows_b",
        # only_a/only_b groups never reach phase 2: their row counts ARE
        # the digest counts. match groups are all-same by definition.
        F.when(F.col("verdict") == "only_a", F.col("n_rows_a"))
        .otherwise(F.coalesce(F.col("n_row_only_a"), F.lit(0)))
        .cast("long")
        .alias("n_row_only_a"),
        F.when(F.col("verdict") == "only_b", F.col("n_rows_b"))
        .otherwise(F.coalesce(F.col("n_row_only_b"), F.lit(0)))
        .cast("long")
        .alias("n_row_only_b"),
        F.coalesce(F.col("n_row_changed"), F.lit(0)).cast("long").alias("n_row_changed"),
        F.when(F.col("verdict") == "match", F.col("n_rows_a"))
        .otherwise(F.coalesce(F.col("n_row_same"), F.lit(0)))
        .cast("long")
        .alias("n_row_same"),
    )
    return out


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Per-domain frequency capping: keep at most ``cap`` rows per
    domain, chosen deterministically — the "no single host dominates
    the corpus" guard every web-scale training pipeline runs (the
    complement of :func:`domain_mix`, which rebalances by FRACTION;
    capping bounds the absolute count, which is what protects against
    the head domains at 100 TB).

    Which rows survive is decided by md5(id || salt) ascending (id
    tiebreak) — uniform, auditable, reproducible in any engine, and
    independent of row order/partitioning; changing the salt re-deals
    the survivors.

    Plan shape: one window ``row_number() <= cap`` over the domain.
    Spark's WindowGroupLimit rewrites that filter into a per-map-task
    top-``cap`` heap per domain followed by a final per-domain limit,
    so a billion-row head domain never funnels through one task's full
    sort — shuffle payload is ~cap rows per domain per map partition.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive: {cap}")
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def stratified_exact_split(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    *,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Exact-proportion stratified split: within every stratum, assign
    splits by POSITION in the md5-shuffled order so the realized counts
    are exact (floor(frac * n) per leading split, remainder to the
    last) — unlike :func:`hash_split`, whose thresholds are exact only
    in expectation. The price is a count aggregation + a window; the
    gain is per-stratum proportions that hold for 10-row strata, where
    hash thresholds can misallocate badly.

    Assignment rule: rank rows per stratum by md5(id || salt) (id
    tiebreak); row r of n goes to the first split whose cumulative
    rounded count covers r. Deterministic and order-independent, but —
    by design — NOT stable under corpus growth (positions shift);
    growth-stable assignment is hash_split's contract.

    Plan shape: ONE scan, one shuffle — the per-stratum size comes from
    an unordered whole-partition ``count(*)`` window sharing the
    row_number window's hash partitioning (Catalyst reuses the
    exchange), not from a second aggregate + join over the input. A
    pathologically hot single stratum sorts in one window partition;
    for that regime use hash_split.
    """
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    if not splits:
        raise ValueError("splits must name at least one split")
    weights = [w for _, w in splits]
    if min(weights) < 0 or sum(weights) <= 0:
        raise ValueError(f"split weights must be >= 0 with a positive sum: {weights}")
    total = float(sum(weights))
    strata = list(strata_cols)

    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.col(id_col)
    )
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*strata))
    )

    expr, cum = None, 0.0
    for name, wt in splits[:-1]:
        cum += wt / total
        clause = F.col("__rn") <= F.floor(F.lit(cum) * F.col("__n"))
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    last = splits[-1][0]
    assigned = F.lit(last) if expr is None else expr.otherwise(last)
    return ranked.withColumn(split_col, assigned).drop("__rn", "__n")


def quality_quota_select(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    *,
    frac: float = 0.5,
    min_per_group: int = 0,
) -> DataFrame:
    """Global quality selection with per-group floors: keep the overall
    top ``frac`` of rows by score, PLUS the top ``min_per_group`` rows
    of every group that the global cut would starve — the curation step
    that keeps the best of the corpus without silently deleting the
    long-tail domains/languages a balanced training mix needs.

    Selection is deterministic: global rank by (score DESC, id ASC)
    against floor(frac * N); group floors by the same order within the
    group. Returns the input rows plus a ``reason`` column
    ('global' — made the cut; 'quota' — rescued by its group floor).

    Plan shape: the global cut is a threshold on the distributed rank
    (operators/windows.py::global_row_number scheme — range exchange,
    no single-task window); the floor is a per-group
    ``row_number() <= min_per_group`` window that WindowGroupLimit
    bounds map-side. N comes from counting the rank pass's
    materialized (localCheckpoint'ed) frame, so the upstream plan runs
    exactly once.
    """
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    if not 0 < frac <= 1:
        raise ValueError(f"frac must be in (0, 1]: {frac}")
    neg = df.withColumn("__neg", -F.col(score_col))
    ranked = global_row_number(neg, ["__neg", id_col], out="__grank").drop("__neg")
    k = int(frac * ranked.count())
    wg = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.col(id_col))
    both = ranked.withColumn("__qrank", F.row_number().over(wg))
    out = both.filter(
        (F.col("__grank") <= k) | (F.col("__qrank") <= min_per_group)
    ).withColumn(
        "reason",
        F.when(F.col("__grank") <= k, "global").otherwise("quota"),
    )
    return out.drop("__grank", "__qrank")


def token_budget_cut(
    df: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget curation: walk the corpus in (score DESC, id ASC)
    order and keep documents while the running token total stays within
    ``budget`` — "give me the best N-token training set", the last step
    before tokenization once quality scores exist. A document is kept
    iff the running sum THROUGH it is <= budget (documents larger than
    the remaining budget are skipped only if they appear later in the
    order — the rule is a prefix cut, not a knapsack; deterministic and
    auditable).

    Returns the kept rows with their ``cum_tokens`` running total.

    Plan shape: the running sum is
    operators/windows.py::global_running_sum — range exchange +
    per-range-partition window + broadcast offsets, so no single-task
    ``SUM() OVER (ORDER BY ...)`` exists at any scale; the cut itself
    is a pushed-down filter.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415

    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    neg = df.withColumn("__neg", -F.col(score_col))
    cum = global_running_sum(neg, ["__neg", id_col], tokens_col, out="cum_tokens")
    return cum.filter(F.col("cum_tokens") <= budget).drop("__neg")


def golden_record(
    df: DataFrame,
    keys: Sequence[str],
    completeness_cols: Sequence[str],
    recency_col: str,
    tiebreak_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Survivorship merge (MDM "golden record"): collapse duplicate
    records per key to ONE survivor chosen by (most fields populated,
    then most recent, then highest tiebreak id) — the
    entity-consolidation step after identity resolution, and the rule
    engine behind "keep the best copy" dedup when copies disagree.
    Emits one row per key: (keys..., completeness, recency_ms,
    tiebreak, payload_cols...).

    Scale shape: ONE hash aggregation — the survivor is
    ``max(struct(completeness, recency_ms, tiebreak, payload...))``
    whose lexicographic struct comparison IS the survivorship rule, so
    partial aggregation picks per-partition survivors map-side and the
    shuffle carries one candidate row per key per partition (a window
    + rank formulation would shuffle every duplicate). The unique
    tiebreak decides before any payload field is compared, so the
    result is deterministic at any parallelism. NULL recency sorts
    below every real timestamp (coalesced to -1).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    ks = list(keys)
    completeness = reduce(
        lambda a, b: a + b,
        [F.col(c).isNotNull().cast("int") for c in completeness_cols],
    ).alias("completeness")
    rec = F.coalesce(F.unix_millis(F.col(recency_col)), F.lit(-1)).alias("recency_ms")
    packed = F.struct(
        completeness,
        rec,
        F.col(tiebreak_col).alias("tiebreak"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    won = df.groupBy(*ks).agg(F.max(packed).alias("__w"))
    return won.select(
        *ks,
        F.col("__w.completeness").cast("long").alias("completeness"),
        F.col("__w.recency_ms").alias("recency_ms"),
        F.col("__w.tiebreak").alias("tiebreak"),
        *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
    )


def time_split_embargo(
    df: DataFrame,
    ts_col: str,
    *,
    train_end: str,
    test_start: str,
    out: str = "split",
) -> DataFrame:
    """Temporal train/test split with an EMBARGO gap: rows before
    ``train_end`` train, rows at/after ``test_start`` test, and rows in
    between are embargoed (kept, labeled, and flagged ``purged`` so the
    loader drops them) — the leakage-safe split for time-correlated
    data (Lopez de Prado's purged split: a random or hash split lets
    samples adjacent in time straddle train/test and leak label
    information through autocorrelation; the embargo buffer breaks
    that). Pure projection — no shuffle, no RNG; the predicate pushes
    down to the scan when a caller filters one split.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if not train_end < test_start:
        raise ValueError(f"need train_end < test_start: {train_end!r} vs {test_start!r}")
    ts = F.col(ts_col)
    split = (
        F.when(ts < F.lit(train_end).cast("timestamp"), F.lit("train"))
        .when(ts >= F.lit(test_start).cast("timestamp"), F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn(out, split).withColumn("purged", F.col(out) == "embargo")


def nucleus_categories(
    df: DataFrame,
    group_cols: Sequence[str],
    cat_col: str,
    *,
    p: float = 0.9,
) -> DataFrame:
    """Top-p ("nucleus") truncation of a categorical distribution per
    group: order categories by count (ties -> category value), keep the
    smallest head whose cumulative share reaches ``p`` — the long-tail
    cut a mixing recipe applies to domains/sources before assigning
    weights (the tail beyond the nucleus is noise-sized and gets pooled
    or dropped). A category is kept iff the mass BEFORE it is < p, so
    the boundary category that crosses p is included and every group
    keeps >= 1 category. NULL categories count as their own category.
    Emits (group_cols..., category, n, share, cum_share, kept), shares
    rounded to 6 decimals.

    Scale shape: one map-side-combined (group, category) count scans
    the data; the ordering window and running sum operate on that
    category-sized frame PARTITIONED BY group (parallel across groups,
    never a SinglePartition funnel); group totals re-aggregate from the
    same frame and broadcast back. Determinism: shares are exact
    integer ratios; the keep rule compares integer mass
    (cum_before * 1 < p * total evaluated as doubles on exact counts).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.window import Window  # noqa: PLC0415

    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415

    gs = list(group_cols)
    counts = (
        df.groupBy(*gs, F.col(cat_col).alias("category"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # feeds totals and the windowed head
    )
    totals = counts.groupBy(*gs).agg(F.sum("n").cast("long").alias("__t"))
    # NULLS LAST explicitly: Spark's ascending default is nulls-first,
    # ANSI/DuckDB's is nulls-last — a NULL category would otherwise
    # take a different position in the cumulative order per engine
    w = (
        Window.partitionBy(*[F.col(g) for g in gs])
        .orderBy(F.col("n").desc(), F.col("category").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("__cum", F.sum("n").over(w))
    if gs:
        # null-safe group join: a NULL group key is a real group
        t2 = totals
        for g in gs:
            t2 = t2.withColumnRenamed(g, f"__t_{g}")
        cond = reduce(
            lambda x, y: x & y,
            [F.col(g).eqNullSafe(F.col(f"__t_{g}")) for g in gs],
        )
        j = cum.join(F.broadcast(t2), cond)
    else:
        j = cum.crossJoin(F.broadcast(totals))
    return j.select(
        *gs,
        "category",
        "n",
        dround(F.col("n") / F.col("__t"), 6).alias("share"),
        dround(F.col("__cum") / F.col("__t"), 6).alias("cum_share"),
        (
            (F.col("__cum") - F.col("n")).cast("double")
            < F.lit(float(p)) * F.col("__t")
        ).alias("kept"),
    )
