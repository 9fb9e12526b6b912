"""Shared helpers for registry query implementations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_mapreduce_spark.session import tune
from python_mapreduce_spark.sources.readers import load_table


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one benchmark table with engine runtime confs applied."""
    tune(spark)
    return load_table(spark, sf_dir, name)
