"""Z-order (Morton-curve) clustering for data-skipping parquet layouts.

The reference's sink (reducer.py:90-139) rotates unordered part files;
downstream scans read everything. At 100 TB the dominant cost of most
queries is the scan, and parquet min/max footer statistics let an engine
skip whole row groups — IF the writer clustered rows so each file covers
a narrow value range. Sorting by one column gives perfect skipping on
that column and none on any other; interleaving the bits of several
columns' quantile-bucket ranks (a Morton / Z-order code) gives useful
skipping on EVERY participating column at once, which is why warehouse
engines expose it as ``ZORDER BY`` / ``CLUSTER BY``.

Spark-first implementation, no UDFs anywhere:

1. per column, one bounded ``approxQuantile`` pass learns ``2^bits - 1``
   split points (driver holds <= 255 doubles per column at the default
   ``bits=8`` — independent of table size);
2. each row's bucket rank is ``size(filter(splits, s -> s <= value))``
   — a JVM higher-order function over a broadcast literal array, so the
   bucketing is skew-proof (rank by quantile, not by raw value) and
   needs no shuffle;
3. the Morton code is a fixed ``bits * n_cols``-term bitwise
   shift/or expression (whole-stage codegen);
4. the write is ``repartitionByRange(code)`` + ``sortWithinPartitions``
   — one range exchange, then each output file covers a contiguous
   stretch of the curve and therefore a small hyper-rectangle of the
   original column space.

NULLs rank into bucket 0 (they cluster together at the curve origin,
matching the "nulls first" footer-stats convention). Constant columns
degenerate to a single bucket and simply stop contributing bits.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    TimestampNTZType,
    TimestampType,
)

__all__ = ["zorder_code", "zorder_write"]


def _as_double(df: DataFrame, col: str) -> Column:
    """A double-valued ordering surrogate for a z-order column.

    Numeric columns cast directly; date/timestamp columns go through
    epoch seconds (their natural total order). Anything else is
    rejected — string z-ordering needs a caller-chosen numeric
    surrogate (e.g. a rank or a prefix code), and silently hashing
    would destroy the range locality the curve exists to provide.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, NumericType):
        return F.col(col).cast("double")
    if isinstance(dt, DateType):
        return F.col(col).cast("timestamp").cast("long").cast("double")
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.col(col).cast("long").cast("double")
    raise TypeError(
        f"zorder column {col!r} has type {dt.simpleString()}; "
        "z-order needs a numeric/date/timestamp column (provide a "
        "numeric surrogate for strings)"
    )


def _splits_multi(
    df: DataFrame, cols: Sequence[str], bits: int, rel_err: float
) -> dict[str, list[float]]:
    """Deduped ascending quantile split points, ALL columns in ONE
    approxQuantile job (one corpus scan instead of one per column —
    each column's sketch is still built independently from its own
    non-null values, so the split points are identical to the
    per-column passes). NaN is pre-nulled because approxQuantile only
    ignores nulls; date/timestamp surrogates can never be NaN but a
    raw double column can."""
    if not cols:
        return {}
    names = [f"__q{i}" for i in range(len(cols))]
    probe = df.select(
        *[
            F.when(~F.isnan(v), v).alias(n)
            for n, v in ((n, _as_double(df, c)) for n, c in zip(names, cols))
        ]
    )
    n = (1 << bits) - 1
    probs = [i / (n + 1) for i in range(1, n + 1)]
    qss = probe.approxQuantile(names, probs, rel_err)
    out: dict[str, list[float]] = {}
    for c, qs in zip(cols, qss):
        dedup: list[float] = []
        for q in qs:
            if not dedup or q > dedup[-1]:
                dedup.append(q)
        out[c] = dedup
    return out


def zorder_code(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 8,
    code_col: str = "__zcode",
    rel_err: float = 0.001,
    splits: Mapping[str, Sequence[float]] | None = None,
) -> DataFrame:
    """Append a Morton z-order code column interleaving ``cols``.

    ``bits`` quantile-rank bits per column (default 8 = 256 buckets);
    ``bits * len(cols)`` must fit a signed long, so at most 63 total
    bits. The code is only used for range-partitioning and
    within-partition sort — its absolute value is meaningless.

    ``splits`` optionally provides explicit ascending split points per
    column (``{col: [s1, s2, ...]}``, at most ``2^bits - 1`` each),
    skipping the approxQuantile pass for those columns — the warehouse
    ``CLUSTER BY RANGE`` idiom for known domains, and the way to make
    the code fully deterministic (the quantile sketch's merge order is
    partitioning-dependent). Columns absent from the mapping still get
    the quantile pass.
    """
    if not cols:
        raise ValueError("zorder_code needs at least one column")
    k = len(cols)
    if bits < 1 or bits * k > 63:
        raise ValueError(
            f"bits * len(cols) = {bits * k} must be in [1, 63] to fit a long"
        )
    learned = _splits_multi(
        df,
        [c for c in cols if splits is None or c not in splits],
        bits,
        rel_err,
    )
    buckets: list[Column] = []
    for c in cols:
        if splits is not None and c in splits:
            sp = [float(s) for s in splits[c]]
            if sp != sorted(set(sp)):
                raise ValueError(f"splits for {c!r} must be strictly ascending")
            if len(sp) > (1 << bits) - 1:
                raise ValueError(
                    f"{len(sp)} splits for {c!r} exceed 2^{bits}-1 buckets"
                )
        else:
            sp = learned[c]
        if not sp:
            # All-NULL or constant-below-first-split column: one bucket.
            buckets.append(F.lit(0).cast("long"))
            continue
        arr = F.array(*[F.lit(s) for s in sp])
        v = _as_double(df, c)
        # NULL value => lambda yields NULL => filtered out => bucket 0.
        buckets.append(
            F.size(F.filter(arr, lambda s: s <= v)).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return df.withColumn(code_col, z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
    splits: Mapping[str, Sequence[float]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered along the z-order curve of
    ``cols``: range-partition on the code (each output file owns a
    contiguous curve segment => a tight min/max box on every clustered
    column), sort within each file so row-group stats stay tight even
    when one file holds several row groups, then drop the helper column.
    """
    coded = zorder_code(df, cols, bits=bits, code_col="__zcode", splits=splits)
    if num_files is None:
        num_files = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    out = (
        coded.repartitionByRange(num_files, "__zcode")
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
    )
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.parquet(path)
