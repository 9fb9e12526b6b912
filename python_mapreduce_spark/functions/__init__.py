"""Scalar function veneer.

The reference has no scalar function library at all — every string/date/
math/json manipulation is arbitrary Python inside user map functions
(reference README.txt:254-261, SURVEY.md §2.2 "Scalar fns"). Here the
surface is pyspark.sql.functions (JVM-side, codegen'd); this package adds
only the engine-specific helpers the built-ins lack.
"""

from python_mapreduce_spark.functions.scalar import dround, sql_dround, tokenize

__all__ = ["dround", "sql_dround", "tokenize"]
