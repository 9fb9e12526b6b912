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
