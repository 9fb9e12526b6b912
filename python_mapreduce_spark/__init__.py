"""python_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine exposing the query and data-processing capabilities of
the reference MapReduce framework (bsautrey/python-mapreduce, surveyed in
SURVEY.md) as first-class, idiomatic PySpark DataFrame operators. Nothing
here ports the reference's physical machinery (Redis shuffle, external
merge sort, phase barriers) — Spark's Catalyst/Tungsten/DAG-scheduler
stack replaces all of it (SURVEY.md §3-4).

Layout:
    session     SparkSession factory + scale-aware tuning
    sources     readers (text/json/csv/parquet, multi-dir, gzip) + table catalog
    sinks       writers (rotation, compression, partitioning)
    operators   relational / aggregate / join / window / set-op operators
    functions   scalar function veneer (string/date/math/json)
    mapreduce   compatibility facade: flat_map / reduce_groups over DataFrames
    streaming   incremental ingest (file ledger -> checkpointed streams)
    llm         training-data pipeline ops: dedup, similarity, text, multimodal
    registry    the query registry consumed by __spark_entry__.py
"""

from python_mapreduce_spark.session import get_spark, tune

__version__ = "0.1.0"

__all__ = ["get_spark", "tune", "__version__"]
