"""Event-time windowed and stateful streaming operators.

All absent from the reference, which has no event-time concept at all —
its only state is the per-server seen-files dict (SURVEY.md §2.2
"Streaming — watermarks / late data"). These wrap Spark's native
machinery: tumbling/sliding windows, session windows, and
applyInPandasWithState for arbitrary per-key state.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation; works on both
    batch and streaming frames. With ``watermark`` set on a stream, late
    rows beyond the delay are dropped and append-mode windows finalize."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    win = F.window(ts, duration, slide) if slide else F.window(ts, duration)
    return df.groupBy(win.alias("win"), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-gap session windows (merge while events arrive within
    ``gap``); batch mode emits all sessions, streaming append emits
    watermark-closed ones."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    return df.groupBy(F.session_window(ts, gap).alias("win"), *keys).agg(*aggs)


def stateful_running_max(
    stream: DataFrame, key: str, value_col: str
) -> DataFrame:
    """Custom stateful operator: per-key running maximum across
    micro-batches via applyInPandasWithState (reference has no analog —
    closest is the per-server file ledger, O23).

    Emits the updated running max per key per batch ('update' semantics);
    the final row per key equals the global max.
    """

    def update_max(
        key_tuple: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        running = state.get[0] if state.exists else None
        for pdf in pdfs:
            m = pdf[value_col].max()
            running = float(m) if running is None else max(running, float(m))
        if running is not None:
            state.update((running,))
            yield pd.DataFrame({key: [key_tuple[0]], "running_max": [running]})

    return stream.groupBy(key).applyInPandasWithState(
        update_max,
        outputStructType=f"{key} string, running_max double",
        stateStructType="running_max double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_cusum(
    stream: DataFrame,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    *,
    target: float,
    allowance: float = 0.0,
    threshold: float = 4.0,
) -> DataFrame:
    """Streaming CUSUM drift monitor: the online companion to the batch
    ``operators.windows.cusum_changepoints`` — per-key one-sided
    cumulative sums carried ACROSS micro-batches in
    applyInPandasWithState state, so a slow level shift in a metric
    fires an alarm mid-stream instead of at the next batch audit.
    ``target``/``allowance``/``threshold`` mean exactly what they mean
    in the batch operator; state per key is three scalars (s+, s-, rows
    seen) regardless of stream length.

    Rows inside each micro-batch are processed in ``order_cols`` order
    (pass a TOTAL order — ts plus a unique tiebreak) and batches arrive
    in file order under the incremental harness, so the fold is
    deterministic end-to-end for a fixed file layout; NULL
    values advance the row count but carry no evidence (batch-operator
    rule). Emits one row per key per batch: the post-batch sums, the
    alarm flag, and rows_seen ('update' semantics — the LAST row per
    key is the final verdict, which is what the batch replay checks).
    """

    def update(
        key_tuple: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sp, sn, seen = state.get if state.exists else (0.0, 0.0, 0)
        rows = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(list(order_cols), kind="mergesort")
            for x in pdf[value_col]:
                d = 0.0 if pd.isna(x) else float(x) - target
                sp = max(0.0, sp + d - allowance)
                sn = max(0.0, sn - d - allowance)
                rows += 1
        if rows:
            seen += rows
            state.update((sp, sn, seen))
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "cusum_pos": [sp],
                    "cusum_neg": [sn],
                    "alarm": [sp > threshold or sn > threshold],
                    "rows_seen": [seen],
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key} string, cusum_pos double, cusum_neg double, "
            "alarm boolean, rows_seen long"
        ),
        stateStructType="cusum_pos double, cusum_neg double, rows_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
