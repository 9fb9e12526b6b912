"""Audit every registry query's output schema for complex (array/map/struct)
columns — the driver's canonicalizer (pandas sort_values over all columns)
crashes on unhashable cells, so any query that can enter the driver's check
window must emit only atomic types. Also flags DecimalType precision > 18
(VERDICT r8: Spark hands the driver decimal.Decimal objects where DuckDB
hands float64 and the driver hash is representation-sensitive)."""
import sys
from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

sys.path.insert(0, "/root/repo")
from python_mapreduce_spark.registry import all_queries

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
bad = {}
for name, q in all_queries().items():
    try:
        df = q.fn(spark, sf)
        complex_cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ] + [
            f"{f.name} (decimal p={f.dataType.precision})"
            for f in df.schema.fields
            if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18
        ]
        if complex_cols:
            bad[name] = complex_cols
    except Exception as e:
        bad[name] = f"ERROR {type(e).__name__}: {e}"
print("queries with complex-typed output columns:")
for k, v in bad.items():
    print(f"  {k}: {v}")
print(f"{len(bad)} flagged / {len(all_queries())} total")
