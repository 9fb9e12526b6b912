"""Sinks: partitioned file writers with rotation and compression.

Reference equivalent O21 (reducer.py:90-139): ujson part-files rotated
every ``max_number_dumped_items_reducer`` items, optional gzip, uuid part
names. Spark's writers subsume all of it: ``maxRecordsPerFile`` is the
rotation knob, codecs cover compression, and partitioned layout
(``partitionBy``) adds the directory-pruning structure the reference
lacks — at 100 TB, partition columns are what lets downstream scans skip
data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def _writer(
    df: DataFrame,
    mode: str,
    compression: str | None,
    max_records_per_file: int | None,
    partition_by: Sequence[str] | None,
):
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_json(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """JSON-lines sink — the reference's native output format
    (ujson lines, reducer.py:91), with rotation + gzip via options."""
    _writer(df, mode, compression, max_records_per_file, partition_by).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = None,
    max_records_per_file: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    _writer(df, mode, compression, max_records_per_file, partition_by).option(
        "header", header
    ).csv(path)


def write_text(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Single-string-column text sink (reference line files)."""
    _writer(df, mode, compression, max_records_per_file, None).text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = "snappy",
    max_records_per_file: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Columnar sink — the scale default (pushdown + pruning on re-read)."""
    _writer(df, mode, compression, max_records_per_file, partition_by).parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = "zstd",
    max_records_per_file: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink — columnar alternative for Hive-ecosystem interchange."""
    _writer(df, mode, compression, max_records_per_file, partition_by).orc(path)


def write_avro(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Avro sink — gated like sources.readers.read_avro (the spark-avro
    module is external and absent in this environment)."""
    try:
        _writer(df, mode, None, None, partition_by).format("avro").save(path)
    except Exception as e:  # noqa: BLE001 - classify, then re-raise
        if "Failed to find data source: avro" in str(e):
            raise NotImplementedError(
                "spark-avro is not deployed in this environment; add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
            ) from e
        raise


def write_bucketed_table(
    df: DataFrame,
    name: str,
    *,
    buckets: int,
    key: str | Sequence[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (optionally bucket-sorted) managed table.

    THE shuffle-elimination tool for repeated big-big joins: two tables
    bucketed on the same key with the same bucket count join with NO
    Exchange — each task zips bucket i with bucket i. At 100 TB, paying
    one bucketed write to remove a shuffle from every downstream join is
    the standard trade. (The reference cannot express this: its hash
    partitioning exists only inside a single job's shuffle,
    shuffler.py:71-77.)
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(name)
