"""Placeholder — filled in as operators land."""

from python_mapreduce_spark.registry import Query

QUERIES: dict[str, Query] = {}
