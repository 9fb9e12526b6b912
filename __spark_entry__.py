"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``python_mapreduce_spark`` package; this file
only adapts the registry to the driver's three-function contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launches from.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from python_mapreduce_spark.operators.aggregates import pricing_summary  # noqa: E402
from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import tune  # noqa: E402
from python_mapreduce_spark.sources.readers import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    tune(spark)
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return pricing_summary(lineitem)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted -> rows-only)."""
    return {name: q.sql for name, q in all_queries().items() if q.sql is not None}
