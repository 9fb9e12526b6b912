"""Sources: scans over files and the test-table catalog.

Reference equivalents: directory glob scan (mapper.py:75-85), text-line
reader with gzip codec (mapper.py:87-94), multi-dir union of inputs
(mapper.py:26,77), file-level Bernoulli downsample (mapper.py:103-108).
Spark gives all of these declaratively; this module is the thin veneer
that exposes them as named operators.
"""

from python_mapreduce_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_jsonl,
    read_parquet,
    read_text,
    register_views,
    sample_files,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "read_text",
    "register_views",
    "sample_files",
]
