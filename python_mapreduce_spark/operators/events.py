"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's event processing stops at per-key aggregation
(SURVEY.md §2.2); ordered-sequence questions ("how many users did A,
then B, then C?", "how many of January's new users came back a week
later?") require per-user temporal joins it cannot express. Both
operators here are pure DataFrame compositions — no UDFs, no windows
over a single partition — and every per-user intermediate is one row
per user, so the shuffles stay user-keyed and narrow at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    *,
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion: step i counts a user as converted if
    they performed ``steps[i]`` STRICTLY AFTER their earliest
    qualifying time for step i-1 (and, with ``within_seconds``, within
    that window of it). Returns one row per step: (step, step_name,
    n_users), where n_users is non-increasing down the funnel.

    Plan shape: level i is "per-user earliest qualifying timestamp" —
    one row per user — built from level i-1 by a user-keyed equi-join
    onto the step's events plus a min-agg; with k steps that is k-1
    narrow joins, each shuffling at most one row per user plus that
    step's events. Step counts are 1-row aggregates unioned together.
    Deterministic: min() over timestamps, strict ordering.
    """
    if not steps:
        raise ValueError("steps must name at least one funnel step")
    user, ts, step = F.col(user_col), F.col(ts_col), F.col(step_col)
    # each level is consumed TWICE (next level's join + its own count)
    # and level i's plan contains level i-1's — without the lineage cut
    # level 1's scan would re-execute O(k) times. Levels are one row per
    # user, so the checkpoint is output-sized.
    levels = [
        df.filter(step == steps[0])
        .groupBy(user.alias("u"))
        .agg(F.min(ts).alias("t"))
        .localCheckpoint(eager=False)
    ]
    for s in steps[1:]:
        ev = df.filter(step == s).select(user.alias("u"), ts.alias("__ts"))
        cond = F.col("__ts") > F.col("t")
        if within_seconds is not None:
            cond = cond & (
                F.col("__ts") <= F.col("t") + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        levels.append(
            ev.join(levels[-1], "u")
            .filter(cond)
            .groupBy("u")
            .agg(F.min("__ts").alias("t"))
            .localCheckpoint(eager=False)
        )
    counts = [
        lvl.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("step_name"),
            "n_users",
        )
        for i, lvl in enumerate(levels)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    horizons: Sequence[int] = (1, 7),
) -> DataFrame:
    """Day-cohort retention: cohort = each user's first-activity date;
    retention at horizon k = the fraction of the cohort active exactly
    k days after that date. Returns (cohort, n_users, and per horizon
    n_day<k> + ret_day<k>).

    Plan shape: first-activity is one user-keyed min-agg (one row per
    user); activity is the distinct (user, day) set; each horizon is a
    user-keyed semi-join of the cohort frame against activity at
    first+k — everything stays one-row-per-user, and the final
    aggregation is keyed by cohort date. Deterministic counts; the
    ratio rounds at 4 decimals.
    """
    user, ts = F.col(user_col), F.col(ts_col)
    first = df.groupBy(user.alias("u")).agg(F.min(F.to_date(ts)).alias("cohort"))
    # one horizon join consumes activity PER horizon — cut the lineage
    # so the raw scan + distinct runs once, not len(horizons) times
    activity = (
        df.select(user.alias("u"), F.to_date(ts).alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    flags: list[Column] = []
    joined = first
    for k in horizons:
        act_k = activity.select(
            "u", F.date_sub(F.col("d"), int(k)).alias("cohort"), F.lit(True).alias(f"__a{k}")
        ).distinct()
        joined = joined.join(act_k, ["u", "cohort"], "left")
        flags.append(F.coalesce(F.col(f"__a{k}"), F.lit(False)))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_users")]
    for k, fl in zip(horizons, flags):
        aggs.append(F.sum(fl.cast("long")).cast("long").alias(f"n_day{k}"))
    out = joined.groupBy("cohort").agg(*aggs)
    for k in horizons:
        out = out.withColumn(
            f"ret_day{k}",
            dround(F.col(f"n_day{k}") / F.col("n_users").cast("double"), 4),
        )
    return out


def last_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    *,
    window_minutes: int = 1440,
) -> DataFrame:
    """Last-touch marketing attribution: each conversion attributes to
    the same user's most recent touch at-or-before it, PROVIDED the
    touch falls within ``window_minutes`` — the standard
    click-to-purchase credit rule. Emits one row per conversion:
    (conv_id, user, conv_ts_ms, touch_id, mins_since, attributed);
    conversions with no in-window touch carry NULLs and
    ``attributed = false``.

    Scale shape: this is the as-of join
    (:func:`~python_mapreduce_spark.operators.joins.asof_join` — one
    user-keyed shuffle, a streaming last(ignorenulls) window, no pandas)
    after touches pre-reduce to one row per (user, ts) keeping the max
    id — which both makes ties deterministic and shrinks the join input
    (the reduction is a map-side-combinable hash agg). Millisecond
    integer timestamps keep the window arithmetic exact; the minutes
    delta rounds to 4 decimals. Ids keep their NATIVE type — a cast to
    long would silently NULL non-numeric ids under ansi.enabled=false,
    collapsing all touches onto one NULL id; the tie rule is therefore
    max() in the id column's own ordering (numeric for numeric ids,
    lexicographic for strings — deterministic either way).
    """
    from python_mapreduce_spark.operators.joins import asof_join  # noqa: PLC0415

    conv = conversions.select(
        F.col(id_col).alias("conv_id"),
        F.col(user_col).alias("user"),
        F.unix_millis(F.col(ts_col)).alias("conv_ts_ms"),
    )
    tch = (
        touches.select(
            F.col(user_col).alias("user"),
            F.unix_millis(F.col(ts_col)).alias("touch_ts_ms"),
            F.col(id_col).alias("touch_id"),
        )
        .groupBy("user", "touch_ts_ms")
        .agg(F.max("touch_id").alias("touch_id"))
    )
    joined = asof_join(
        conv, tch, "user", "conv_ts_ms", "touch_ts_ms",
        ["touch_id", "touch_ts_ms"], suffix="",
    )
    within = (
        F.col("touch_id").isNotNull()
        & (F.col("conv_ts_ms") - F.col("touch_ts_ms") <= int(window_minutes) * 60_000)
    )
    mins = dround(
        (F.col("conv_ts_ms") - F.col("touch_ts_ms")).cast("double") / F.lit(60000.0), 4
    )
    return joined.select(
        "conv_id",
        "user",
        "conv_ts_ms",
        F.when(within, F.col("touch_id")).alias("touch_id"),
        F.when(within, mins).alias("mins_since"),
        F.coalesce(within, F.lit(False)).alias("attributed"),
    )


def assoc_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_both: int = 1,
) -> DataFrame:
    """Association rules over per-basket item sets: for every ordered
    item pair (antecedent -> consequent) present together in at least
    ``min_both`` baskets, the support / confidence / lift triple — the
    market-basket co-occurrence miner (which event habitually precedes
    which, which domains co-occur per user), the basket-level sibling of
    document-incidence :func:`~python_mapreduce_spark.llm.text.token_pmi`.
    Emits (antecedent, consequent, n_both, support, confidence, lift),
    all ratios rounded to 6 decimals.

    Scale shape: baskets pre-dedup to the distinct (basket, item) frame
    (map-side combined); pairs come from that frame's self-join on the
    basket key, so cost is sum over baskets of (items-per-basket)^2 —
    bounded by the item vocabulary per basket, never corpus-quadratic;
    per-item basket counts and the basket total RE-aggregate from the
    same distinct frame (one data scan feeds everything, lineage-cut).
    Lift divides exact integer counts in a fixed IEEE expression shape.
    """
    items = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds pairs, per-item counts, and the total
    )
    n_item = items.groupBy(F.col("i").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    n_baskets = items.agg(F.count_distinct("b").cast("long").alias("n_baskets"))
    pairs = (
        items.alias("a")
        .join(items.alias("c"), "b")
        .filter(F.col("a.i") != F.col("c.i"))
        .groupBy(
            F.col("a.i").alias("antecedent"), F.col("c.i").alias("consequent")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= int(min_both))
    )
    na, nc, nb, nn = (
        F.col("__na").cast("double"),
        F.col("__nc").cast("double"),
        F.col("n_both").cast("double"),
        F.col("n_baskets").cast("double"),
    )
    return (
        pairs.join(
            F.broadcast(n_item.select(F.col("item").alias("antecedent"), F.col("n_item").alias("__na"))),
            "antecedent",
        )
        .join(
            F.broadcast(n_item.select(F.col("item").alias("consequent"), F.col("n_item").alias("__nc"))),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            dround(nb / nn, 6).alias("support"),
            dround(nb / na, 6).alias("confidence"),
            dround(nb / na / (nc / nn), 6).alias("lift"),
        )
    )


def rolling_distinct(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    *,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct actors per day — the WAU/MAU staple
    ("7-day active users as of each day"), computed EXACTLY and
    distributed. For every (key, observed activity day), the count of
    distinct ids active in the ``window_days`` window ENDING that day.
    Emits (keys..., day, rolling_distinct).

    Scale shape: the raw stream first collapses to the distinct
    (key, day, id) frame (map-side combined — the only pass over the
    data); each of those rows then fans out to the <= ``window_days``
    future days it keeps the actor "active" for (a bounded sequence
    explode, output-proportional); a second distinct absorbs actors
    active on several days of one window, and a semi-join against the
    key's observed days drops phantom trailing days. Every shuffle key
    is (key, day[, id]) — no window function at all, so no per-key
    ordering bottleneck, and the classic alternative (a RANGE frame
    with COUNT(DISTINCT), which Spark cannot express) is never needed.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: {window_days}")
    ks = list(keys)
    daily = (
        df.select(*ks, F.to_date(F.col(ts_col)).alias("day"), F.col(id_col).alias("id"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds both the fan-out and the observed-day set
    )
    days = daily.select(*ks, "day").distinct()
    contrib = (
        daily.select(
            *ks,
            "id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
            ).alias("day"),
        )
        .distinct()
    )
    return (
        contrib.join(days, [*ks, "day"], "left_semi")
        .groupBy(*ks, "day")
        .agg(F.count(F.lit(1)).cast("long").alias("rolling_distinct"))
    )


def decayed_trending(
    df: DataFrame,
    item_col: str | Column,
    ts_col: str,
    *,
    halflife_hours: float = 24.0,
    k: int = 10,
) -> DataFrame:
    """Exponentially-decayed trending score: each event contributes
    ``2^(-(age_ms) / halflife_ms)`` toward its item, ages measured from
    the stream's latest event; the top-``k`` items by decayed score —
    the "what's hot right now" ranking that plain windowed counts
    cannot express (an event an hour ago outweighs ten from last week).
    Emits (item, n_events, score, rank), rank 1..k by
    (score DESC, item ASC).

    Scale shape: the as-of timestamp is a 1-row aggregate broadcast
    back; each event's decay term is a projection rounded to 1e-8 and
    summed per item in DECIMAL(28,8) (exact, associative, and
    engine-reproducible — pow() can drift an ulp between libm and the
    JVM, so the rounding happens BEFORE the sum, the established ln
    scheme); the final top-k is a TakeOrderedAndProject over the
    item-sized frame, never a global sort.
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    hl_ms = float(halflife_hours) * 3_600_000.0
    asof = df.agg(F.max(F.unix_millis(F.col(ts_col))).alias("__asof"))
    term = dround(
        F.pow(
            F.lit(2.0),
            -(F.col("__asof") - F.unix_millis(F.col(ts_col))).cast("double") / F.lit(hl_ms),
        ),
        8,
    )
    scored = (
        df.crossJoin(F.broadcast(asof))
        .select(item.alias("item"), term.cast("decimal(28,8)").alias("__term"))
        .groupBy("item")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dround(F.sum("__term").cast("double"), 6).alias("score"),
        )
    )
    # the global rank runs over the ITEM-cardinality aggregate frame,
    # and even there the engine rule holds: no single-partition window,
    # ever — global_row_number ranks via a range exchange + broadcast
    # prefix offsets (the q_window_rank_scalable machinery).
    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    ranked = global_row_number(
        scored.withColumn("__ord", -F.col("score")), ["__ord", "item"], out="rank"
    )
    return ranked.filter(F.col("rank") <= int(k)).select(
        "item", "n_events", "score", "rank"
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every observed (from_state, to_state) step, the
    count and the row-conditional probability P(to | from) — the
    behavioral fingerprint behind next-event prediction, anomaly
    scoring ("this sequence's steps are all low-probability"), and
    funnel design. ``order_cols`` must totally order each key's events
    (pass a tiebreak id alongside the timestamp); rows with NULL state
    are excluded before pairing, so a NULL never fabricates or breaks a
    transition. Emits (from_state, to_state, n, prob), prob rounded to
    6 decimals.

    Scale shape: one per-key window (partitioned by key — parallel
    across keys, never a SinglePartition funnel) pairs each event with
    its successor; the pair stream collapses map-side into a
    state^2-sized count frame, and the from-state totals re-aggregate
    from THAT frame (lazily localCheckpoint'ed) — the data is scanned
    once, and nothing larger than the state alphabet crosses the
    driver.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    trans = (
        df.filter(F.col(state_col).isNotNull())
        .select(key_col, *order_cols, F.col(state_col).alias("__st"))
        .withColumn("__prev", F.lag("__st").over(w))
        .filter(F.col("__prev").isNotNull())
    )
    counts = (
        trans.groupBy(
            F.col("__prev").alias("from_state"), F.col("__st").alias("to_state")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # feeds totals and the output
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").cast("double").alias("__t"))
    return counts.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        dround(F.col("n") / F.col("__t"), 6).alias("prob"),
    )


def conversion_lag(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    *,
    window_minutes: int = 1440,
) -> DataFrame:
    """Latency distribution of the attributed click-to-conversion lag:
    the exact p50/p90/p99 of minutes-since-touch over all attributed
    conversions (per :func:`last_touch_attribution`'s rule), plus the
    attachment rate — the funnel-health number behind "how long does a
    purchase take, and how many attach at all". Emits ONE row
    (n_conversions, n_attributed, attach_rate, lag_p50, lag_p90,
    lag_p99); percentiles are ','-compatible DECIMAL(18,4) strings
    (NULL when nothing attributes); zero rows on empty conversions.

    Scale shape: the attribution as-of join (one user-keyed shuffle,
    streaming window) feeds ONE global aggregate; `percentile` is
    Spark's exact interpolated aggregate (== DuckDB quantile_cont),
    emitted as decimal strings for bit-identical text in both engines.
    """
    att = last_touch_attribution(
        conversions, touches, user_col, ts_col, id_col,
        window_minutes=window_minutes,
    )
    pct = F.expr(
        "percentile(CASE WHEN attributed THEN mins_since END,"
        " array(0.5D, 0.9D, 0.99D))"
    )
    as_str = lambda i: F.col("__p").getItem(i).cast("decimal(18,4)").cast("string")  # noqa: E731
    return (
        att.groupBy(F.lit(1).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum(F.col("attributed").cast("long")).cast("long").alias("n_attributed"),
            pct.alias("__p"),
        )
        .select(
            "n_conversions",
            "n_attributed",
            dround(F.col("n_attributed") / F.col("n_conversions"), 6).alias("attach_rate"),
            as_str(0).alias("lag_p50"),
            as_str(1).alias("lag_p90"),
            as_str(2).alias("lag_p99"),
        )
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    state_col: str,
    *,
    depth: int = 3,
    k: int = 10,
) -> DataFrame:
    """Top-k initial behavior paths: each key's first ``depth`` states
    (in ``order_cols`` order, which must totally order events — pass a
    tiebreak id) joined with '>' into a path string, counted across
    keys, ranked — the "how do sessions start" table funnels are
    designed from. Keys with fewer than ``depth`` events contribute
    their shorter prefix; NULL states render as '' within the path;
    ties rank deterministically by path string. Emits
    (path, n_keys, rank) for rank <= k.

    Scale shape: one per-key window (partitioned by key) takes the
    first ``depth`` rows; the per-key path builds via
    array_sort(collect_list(struct)) — order restored per key with NO
    global sort; path counts collapse map-side; the final rank runs as
    global_row_number over the path-cardinality aggregate frame (range
    exchange + broadcast offsets — the engine-wide no-single-partition-
    window rule holds even on tiny frames).
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    headed = (
        df.select(key_col, *order_cols, F.col(state_col).alias("__st"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(depth))
    )
    paths = headed.groupBy(key_col).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn", "__st"))),
                lambda s: F.coalesce(s["__st"], F.lit("")),
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    ranked = global_row_number(
        counts.withColumn("__ord", -F.col("n_keys")), ["__ord", "path"], out="rank"
    )
    return ranked.filter(F.col("rank") <= int(k)).select("path", "n_keys", "rank")


def gap_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-key time-completeness audit: between each key's first and
    last active DAY, how many daily buckets exist, how many have data,
    and how many are MISSING — the "did ingestion silently skip a day"
    check a freshness monitor runs per source/partner feed. Rows with
    NULL key or NULL timestamp are excluded. Emits
    (key, first_day, last_day, n_expected, n_observed, n_missing,
    coverage) with days as 'yyyy-MM-dd' strings and coverage rounded to
    6 decimals.

    Scale shape: one map-side-combined (key, day) distinct-ish agg
    collapses the stream to active days; per-key min/max/count
    re-aggregate from that day-sized frame — the data is scanned once
    and NOTHING is exploded (the expected count is date arithmetic, not
    a generated calendar join).
    """
    base = (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), F.to_date(ts_col).alias("__d"))
        .groupBy("key", "__d")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    agg = base.groupBy("key").agg(
        F.min("__d").alias("__first"),
        F.max("__d").alias("__last"),
        F.count(F.lit(1)).cast("long").alias("n_observed"),
    )
    expected = (F.datediff(F.col("__last"), F.col("__first")) + F.lit(1)).cast("long")
    return agg.select(
        "key",
        F.date_format("__first", "yyyy-MM-dd").alias("first_day"),
        F.date_format("__last", "yyyy-MM-dd").alias("last_day"),
        expected.alias("n_expected"),
        "n_observed",
        (expected - F.col("n_observed")).alias("n_missing"),
        dround(F.col("n_observed") / expected, 6).alias("coverage"),
    )


def user_churn(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Day-over-day user churn: for each active day, how many distinct
    users were retained from the previous day, how many are new (to
    the previous day, not all history), and how many of the previous
    day's users churned — the daily engagement-health triplet. Rows
    with NULL user or NULL timestamp are excluded; only days with
    current activity emit (a day after the last active day would be
    all-churn and no audience). Emits
    (day, active, retained, new_users, churned) with day as a
    'yyyy-MM-dd' string.

    Scale shape: the stream collapses to a distinct (user, day) frame
    (map-side combined); each active row fans to exactly TWO
    (comparison-day, user) rows (itself, and itself shifted to the
    next day as "previous"), so one (day, user) agg reconstructs the
    cur/prev flags and one day agg produces the triplet — no
    day-over-day self-join of distinct-user sets, no COUNT(DISTINCT)
    window.
    """
    # days feeds both fan-out arms (2 replays of the corpus-wide
    # distinct agg uncut); one cut of the (user, day) frame runs it once.
    days = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    fan = days.select("u", F.col("d").alias("cmp"), F.lit(1).alias("cur"), F.lit(0).alias("prev")).unionByName(
        days.select("u", F.date_add("d", 1).alias("cmp"), F.lit(0).alias("cur"), F.lit(1).alias("prev"))
    )
    flags = fan.groupBy("cmp", "u").agg(
        F.max("cur").alias("c"), F.max("prev").alias("p")
    )
    out = flags.groupBy("cmp").agg(
        F.sum("c").cast("long").alias("active"),
        F.sum(F.col("c") * F.col("p")).cast("long").alias("retained"),
        F.sum(F.col("c") * (1 - F.col("p"))).cast("long").alias("new_users"),
        F.sum((1 - F.col("c")) * F.col("p")).cast("long").alias("churned"),
    )
    return out.filter(F.col("active") > 0).select(
        F.date_format("cmp", "yyyy-MM-dd").alias("day"),
        "active",
        "retained",
        "new_users",
        "churned",
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Corpus-level session summary over gap-based sessions
    (:func:`~python_mapreduce_spark.operators.windows.sessionize` with
    the same ``gap_ms`` rule): session count, events per session, and
    the exact p50/p90/p99 of session DURATION minutes — the
    engagement-depth row next to :func:`user_churn`'s breadth triplet.
    Single-event sessions have duration 0. Rows with NULL user or NULL
    timestamp are excluded. Emits ONE row (n_sessions, n_events,
    events_per_session, dur_p50, dur_p90, dur_p99); durations are
    DECIMAL(18,4)-string minutes (the cross-engine percentile
    contract); zero rows on empty input.

    Scale shape: sessionize's one user-keyed shuffle + two streaming
    windows; sessions collapse to one (user, session) row map-side;
    ONE global aggregate computes counts and the exact interpolated
    percentiles. Millisecond integer math end to end until the final
    minute division.
    """
    from python_mapreduce_spark.operators.windows import sessionize  # noqa: PLC0415

    base = df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    sess = sessionize(base, [user_col], ts_col, [ts_col], gap_ms=gap_ms)
    per_session = sess.groupBy(F.col(user_col).alias("__u"), F.col("session_id")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        (
            (F.max(F.unix_millis(F.col(ts_col))) - F.min(F.unix_millis(F.col(ts_col))))
            .cast("double")
            / F.lit(60000.0)
        ).alias("__dur"),
    )
    pct = F.expr("percentile(__dur, array(0.5D, 0.9D, 0.99D))")
    as_str = lambda i: F.col("__p").getItem(i).cast("decimal(18,4)").cast("string")  # noqa: E731
    return (
        per_session.groupBy(F.lit(1).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("__n").cast("long").alias("n_events"),
            pct.alias("__p"),
        )
        .select(
            "n_sessions",
            "n_events",
            dround(F.col("n_events") / F.col("n_sessions"), 6).alias("events_per_session"),
            as_str(0).alias("dur_p50"),
            as_str(1).alias("dur_p90"),
            as_str(2).alias("dur_p99"),
        )
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    *,
    bins: int = 5,
) -> DataFrame:
    """RFM segmentation: per user, Recency (days since their last
    event, vs. the corpus's last timestamp), Frequency (event count)
    and Monetary (value sum), each scored 1..bins by GLOBAL quantile
    thresholds, then rolled up to segment sizes — the classic
    marketing/engagement cohorting table. Scores use exact
    interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont) computed over the USER frame and broadcast back; a
    value <= the k-th threshold scores k (recency scores INVERT so
    fresher = higher). NULL users/timestamps are excluded; NULL values
    count 0 toward monetary. Emits (r_score, f_score, m_score,
    n_users), scores as ints.

    Scale shape: one user-keyed agg collapses the stream; thresholds
    are a one-row aggregate of that user-sized frame broadcast back
    (never a sort); scoring is a projected CASE; the rollup is one
    tiny (bins^3-max) hash agg. Integer day/count/DECIMAL-rounded sum
    inputs keep the threshold comparisons engine-exact.
    """
    base = df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    asof = base.agg(F.max(F.unix_millis(F.col(ts_col))).alias("__asof"))
    users = (
        base.crossJoin(F.broadcast(asof))
        .groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.floor(
                (F.max("__asof") - F.max(F.unix_millis(F.col(ts_col))))
                / F.lit(86_400_000)
            ).cast("long").alias("__r"),
            F.count(F.lit(1)).cast("long").alias("__f"),
            # per-row round into a DECIMAL sum: a raw double sum is
            # partition-order-dependent and would break the hash
            F.sum(
                dround(F.coalesce(F.col(value_col), F.lit(0.0)), 4).cast(
                    "decimal(28,4)"
                )
            ).cast("double").alias("__m"),
        )
        .localCheckpoint(eager=False)  # thresholds + scoring
    )
    qs = [i / bins for i in range(1, bins)]
    arr = "array(" + ", ".join(f"{q}D" for q in qs) + ")"
    thr = users.agg(
        F.expr(f"percentile(__r, {arr})").alias("__tr"),
        F.expr(f"percentile(__f, {arr})").alias("__tf"),
        F.expr(f"percentile(__m, {arr})").alias("__tm"),
    )

    def score(col: str, tcol: str):
        # 1 + number of thresholds strictly below the value
        return (
            F.lit(1)
            + F.size(F.filter(F.col(tcol), lambda t: t < F.col(col)))
        ).cast("int")

    scored = users.crossJoin(F.broadcast(thr)).select(
        (F.lit(bins + 1) - score("__r", "__tr")).cast("int").alias("r_score"),
        score("__f", "__tf").alias("f_score"),
        score("__m", "__tm").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def survival_curve(
    df: DataFrame,
    duration_col: str,
    event_col,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Kaplan-Meier survival estimate over right-censored durations —
    the time-to-event curve behind churn/retention questions ("what
    fraction of users survive past day t, accounting for users we are
    still observing"): S(t) = prod over event times u <= t of
    (1 - d_u / n_u), with d_u deaths at u and n_u at risk just before
    u; censored subjects leave the risk set without a death term.
    ``event_col`` is a boolean column/name (true = event observed,
    false = censored at that duration). Emits one row per distinct
    duration: (duration, n_risk, n_events, n_censored, survival),
    survival rounded to 1e-6. NULL durations/flags are excluded.

    Determinism: the product runs as a RUNNING SUM of ln terms scaled
    to 1e-8 integers (floor(ln * 1e8 + 0.5) as long — exact integer
    arithmetic through the distributed running sum), exponentiated once
    at the end; when every at-risk subject dies at u (d_u = n_u) the
    ln is -inf, so the term uses a -1e12 sentinel whose exp underflows
    to exactly 0.0 in IEEE — both engines replay the identical rule.

    Scale shape: one map-side-combined hash agg to per-duration
    (deaths, censored) counts, then TWO distributed running sums over
    the duration order (the risk set must be known before the ln terms
    exist) — both over the duration-cardinality frame, range exchange +
    broadcast offsets, never a single-task window.
    """
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415

    t = F.col(duration_col).cast("double")
    e = (F.col(event_col) if isinstance(event_col, str) else event_col).cast("boolean")
    counts = (
        df.select(t.alias("t"), e.alias("__e"))
        .filter(F.col("t").isNotNull() & F.col("__e").isNotNull())
        .groupBy("t")
        .agg(
            F.sum(F.col("__e").cast("long")).cast("long").alias("__d"),
            F.sum((~F.col("__e")).cast("long")).cast("long").alias("__c"),
        )
        .withColumn("__dc", F.col("__d") + F.col("__c"))
    )
    cum = global_running_sum(
        counts, ["t"], "__dc", out="__cumdc", num_partitions=num_partitions
    )
    tot = cum.agg(F.sum("__dc").cast("long").alias("__N"))
    r = cum.crossJoin(F.broadcast(tot)).withColumn(
        "__nr", F.col("__N") - (F.col("__cumdc") - F.col("__dc"))
    )
    term8 = (
        F.when(F.col("__d") == 0, F.lit(0).cast("long"))
        .when(
            F.col("__d") < F.col("__nr"),
            F.floor(
                F.ln(F.lit(1.0) - F.col("__d").cast("double") / F.col("__nr").cast("double"))
                * F.lit(1e8)
                + F.lit(0.5)
            ).cast("long"),
        )
        .otherwise(F.lit(-(10**12)).cast("long"))
    )
    s = global_running_sum(
        r.withColumn("__t8", term8), ["t"], "__t8", out="__cln8",
        num_partitions=num_partitions,
    )
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415

    return s.select(
        F.col("t").alias("duration"),
        F.col("__nr").cast("long").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.col("__c").alias("n_censored"),
        dround(F.exp(F.col("__cln8").cast("double") / F.lit(1e8)), 6).alias("survival"),
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average over irregular samples: per key, each
    sample's value is weighted by how long it REMAINED the current
    value (until the key's next sample) — the correct mean for
    gauge-style series sampled on change (a plain AVG over-weights
    bursts of updates; this is TimescaleDB's ``time_weight('LOCF')``
    companion to :func:`resample_locf`). The key's LAST sample has no
    successor and carries zero weight — the standard left-closed
    convention, documented. Emits (keys..., n_samples, span_ms, twavg);
    ``twavg`` is NULL for keys with a single sample (zero span). NULL
    timestamps/values are excluded.

    Scale shape: one per-KEY lead window over the samples (never
    SinglePartition), then one map-side-combined keyed agg; weighted
    sums ride DECIMAL(28,6) (value rounded 1e-6 x exact ms longs) so
    the division is engine-exact. Ties on ts are made total by a value
    tiebreak in the window order (equal-ts samples get zero weight
    except the last of the tie run — deterministic both sides).
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    ks = list(keys)
    base = df.select(
        *ks,
        F.unix_millis(F.col(ts_col)).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__t").isNotNull() & F.col("__v").isNotNull())
    w = Window.partitionBy(*ks).orderBy("__t", "__v")
    dt = (F.lead("__t").over(w) - F.col("__t")).cast("long")
    weighted = base.withColumn("__dt", F.coalesce(dt, F.lit(0)))
    # each term rounds to 1e-6 BEFORE the decimal cast, so the decimal
    # is exactly representable and both engines sum identical values
    wsum = F.sum(dround(F.col("__v") * F.col("__dt"), 6).cast("decimal(28,6)"))
    span = F.sum("__dt").cast("long")
    return (
        weighted.groupBy(*ks)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            span.alias("span_ms"),
            wsum.alias("__ws"),
        )
        .select(
            *ks,
            "n_samples",
            "span_ms",
            F.when(
                F.col("span_ms") > 0,
                dround(F.col("__ws").cast("double") / F.col("span_ms"), 6),
            ).alias("twavg"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    bucket: str = "1 hour",
) -> DataFrame:
    """Open-high-low-close bars per key per time bucket — the classic
    series-compaction aggregate (metrics dashboards, finance candles):
    open/close are the values at the bucket's first/last timestamp,
    high/low the extremes, plus the sample count. Tie rule (pinned so
    both engines agree): several samples on the exact open (close)
    timestamp resolve to the MINIMUM (MAXIMUM) value — the
    lexicographic min/max of (ts, value). NULL ts/values are excluded.
    Emits (keys..., bucket_start, n, open, high, low, close) with
    bucket_start a formatted string.

    Scale shape: ONE map-side-combined hash agg over (keys, bucket) —
    open/close ride min/max over a packed (ts, value) struct, so no
    window, no second scan, no per-bucket sort anywhere.
    """
    ks = list(keys)
    base = df.select(
        *ks,
        F.window(F.col(ts_col), bucket).getField("start").alias("__b"),
        F.unix_millis(F.col(ts_col)).alias("__t"),
        dround(F.col(value_col), 6).alias("__v"),
    ).filter(F.col("__t").isNotNull() & F.col("__v").isNotNull())
    return (
        base.groupBy(*ks, "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(F.struct("__t", "__v")).getField("__v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(F.struct("__t", "__v")).getField("__v").alias("close"),
        )
        .select(
            *ks,
            F.date_format("__b", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "n",
            "open",
            "high",
            "low",
            "close",
        )
    )


def bollinger_bands(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    *,
    window: int = 20,
    k: float = 2.0,
) -> DataFrame:
    """Bollinger bands per key over an ordered series — the rolling
    mean +- k rolling population stddevs envelope, plus the outlier
    verdict (value outside its own band): the classic anomaly screen
    over per-bucket metrics (daily volumes, hourly error rates) that
    :func:`ohlc_bars` / :func:`time_weighted_avg` feed. Emits one row
    per input row: (keys..., order_col, value, ma, upper, lower,
    outlier). Bands are NULL (outlier false) until a key has a FULL
    ``window`` of trailing rows — a 3-row warmup band is noise, not a
    signal. ``stddev_pop`` (not sample) so the formula replays exactly
    in the SQL twin; doubles round to 1e-6.

    Scale shape: ONE partitioned running window (rowsBetween
    -(window-1)..0) per key — state is the frame, never the series;
    keys partition the shuffle, so no single-task window regardless of
    series length. At 100 TB the key space (metric x entity) is the
    parallelism; a single pathological mega-key is bounded by the
    series length, not the table.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    ks = list(keys)
    if not ks:
        raise ValueError("bollinger_bands needs at least one key column (partitioning)")
    if int(window) < 2:
        raise ValueError(f"window must be >= 2: {window}")
    w = (
        Window.partitionBy(*ks)
        .orderBy(order_col)
        .rowsBetween(-(int(window) - 1), 0)
    )
    v = F.col(value_col).cast("double")
    full = F.count(v).over(w) >= int(window)
    ma = F.when(full, dround(F.avg(v).over(w), 6))
    sd = F.when(full, F.stddev_pop(v).over(w))
    upper = dround(ma + F.lit(float(k)) * sd, 6)
    lower = dround(ma - F.lit(float(k)) * sd, 6)
    return df.select(
        *ks,
        F.col(order_col),
        dround(v, 6).alias("value"),
        ma.alias("ma"),
        upper.alias("upper"),
        lower.alias("lower"),
        F.coalesce((v > upper) | (v < lower), F.lit(False)).alias("outlier"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimate over right-censored
    durations — :func:`survival_curve`'s companion: Kaplan-Meier
    answers "what fraction survives past t", Nelson-Aalen answers "how
    much hazard has accumulated by t" (H(t) = sum over event times
    u <= t of d_u / n_u), which is additive, better behaved in small
    risk sets, and the quantity hazard-ratio eyeballing wants. Also
    emits its Poisson-type variance sum(d_u / n_u^2) and the Breslow
    survival estimate exp(-H) (always >= the KM estimate — a useful
    cross-check between the two registry curves). One row per distinct
    duration: (duration, n_risk, n_events, n_censored, cum_hazard,
    hazard_var, na_survival). NULL durations/flags are excluded.

    Determinism: the same integer-ladder discipline as survival_curve —
    each hazard increment quantizes to a 1e-8-scaled long (and each
    variance increment to a 1e-12-scaled long: d/n^2 needs the finer
    grid), so the running accumulation is EXACT integer arithmetic at
    any partitioning; no sentinel is needed because d_u <= n_u always
    (d_u = n_u just adds 1.0 to the hazard — H is finite where KM's ln
    blows up, which is exactly the estimator's appeal).

    Scale shape: identical to survival_curve — one per-duration count
    agg, ONE risk-set running sum, then BOTH the hazard and variance
    ladders ride a single multi-weight
    :func:`~python_mapreduce_spark.operators.windows.global_running_sum`
    pass (they share the range exchange), never a single-task window.
    """
    from python_mapreduce_spark.functions.scalar import dround  # noqa: PLC0415
    from python_mapreduce_spark.operators.windows import global_running_sum  # noqa: PLC0415

    t = F.col(duration_col).cast("double")
    e = (F.col(event_col) if isinstance(event_col, str) else event_col).cast(
        "boolean"
    )
    counts = (
        df.select(t.alias("t"), e.alias("__e"))
        .filter(F.col("t").isNotNull() & F.col("__e").isNotNull())
        .groupBy("t")
        .agg(
            F.sum(F.col("__e").cast("long")).cast("long").alias("__d"),
            F.sum((~F.col("__e")).cast("long")).cast("long").alias("__c"),
        )
        .withColumn("__dc", F.col("__d") + F.col("__c"))
    )
    cum = global_running_sum(
        counts, ["t"], "__dc", out="__cumdc", num_partitions=num_partitions
    )
    tot = cum.agg(F.sum("__dc").cast("long").alias("__ntot"))
    r = cum.crossJoin(F.broadcast(tot)).withColumn(
        "__nr", F.col("__ntot") - (F.col("__cumdc") - F.col("__dc"))
    )
    d_d = F.col("__d").cast("double")
    nr_d = F.col("__nr").cast("double")
    h8 = F.floor(d_d / nr_d * F.lit(1e8) + F.lit(0.5)).cast("long")
    v12 = F.floor(d_d / (nr_d * nr_d) * F.lit(1e12) + F.lit(0.5)).cast("long")
    s = global_running_sum(
        r.withColumn("__h8", h8).withColumn("__v12", v12),
        ["t"],
        ["__h8", "__v12"],
        out=["__ch8", "__cv12"],
        num_partitions=num_partitions,
    )
    ch = F.col("__ch8").cast("double") / F.lit(1e8)
    return s.select(
        F.col("t").alias("duration"),
        F.col("__nr").cast("long").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.col("__c").alias("n_censored"),
        dround(ch, 6).alias("cum_hazard"),
        dround(F.col("__cv12").cast("double") / F.lit(1e12), 8).alias(
            "hazard_var"
        ),
        dround(F.exp(-ch), 6).alias("na_survival"),
    )
