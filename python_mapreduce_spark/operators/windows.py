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
