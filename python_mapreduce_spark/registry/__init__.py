"""Query registry: the operator inventory the driver verifies.

Each entry pairs a Spark implementation (a callable ``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle that DuckDB runs over the
same parquet tables. ``sql=None`` marks genuinely non-SQL-expressible
operators (custom stateful streaming, approximate sketches) — the driver
then records a weaker rows-only check.

Conventions that make the hash comparison work (see __spark_entry__.py):
  * every computed column is aliased identically on both sides;
  * double aggregates are rounded (2-4 decimals) on both sides so float
    summation order can't flip a bit;
  * timestamps are emitted as formatted strings;
  * any query whose row *identity* depends on order (top-k) carries a
    total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One verified operator: Spark impl + DuckDB oracle (or rows-only)."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""


def all_queries() -> dict[str, Query]:
    """Aggregate every category module's QUERIES dict (stable order)."""
    from python_mapreduce_spark.registry import (  # noqa: PLC0415 - lazy, avoids import cycles
        core,
        extra,
        joins,
        llm,
        mr,
        streaming,
        tpch2,
        tpch3,
        windows,
    )

    out: dict[str, Query] = {}
    for mod in (core, extra, tpch2, tpch3, joins, windows, mr, llm, streaming):
        for name, q in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = q
    return out
