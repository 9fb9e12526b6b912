"""SparkSession factory and runtime tuning.

The reference's "cluster config" is a hand-written .cfg of ports, dirs and
memory budgets (reference configs.py:6-48); its parallelism is
locations x 25 workers (configs.py:24). Here the equivalent surface is a
SparkSession with scale-aware defaults: AQE for runtime re-planning
(partition coalescing, skew-join splitting, join-strategy switching),
Arrow for every Python<->JVM hop, and shuffle partitions sized to the
environment rather than Spark's legacy 200.

Two entry points:
  * get_spark()  — build a session (used by tests / bench / standalone).
  * tune(spark)  — apply the *runtime-settable* subset to an existing
    session (used when a harness hands us its own session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that can be applied to a live session (spark.conf.set).
_RUNTIME_CONF: dict[str, str] = {
    # Deterministic timestamp semantics; required for oracle comparison
    # (DuckDB timestamps are UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime partition coalescing, skew-join splitting, dynamic
    # join-strategy switch. At 100 TB this is what rescues a bad static
    # partition count or a skewed key.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalesces on shuffle-READ size, which is blind to join/explode
    # fan-out inside the stage: a 2 MB postings shuffle that joins into
    # millions of pairs gets squeezed onto one core. A small floor keeps
    # tiny shuffles spread across the cluster; at scale partitions are
    # far above both this floor and the 64 MB advisory target, so the
    # setting only affects the small-input regime it is meant for.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # Arrow-vectorize every pandas_udf / applyInPandas / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: keep permissive SQL semantics matching both the schemaless
    # reference (bad records -> null, not job abort) and DuckDB defaults
    # for the comparisons we run.
    "spark.sql.ansi.enabled": "false",
    # With ANSI off this build falls back to the pre-3.0 legacy
    # size(NULL) = -1, which silently poisons any aggregate over
    # size(tokenize(text)) when text is NULL (each NULL doc SUBTRACTS
    # one token). Pin the modern semantics: size(NULL) = NULL, matching
    # DuckDB's len(NULL) and every oracle.
    "spark.sql.legacy.sizeOfNull": "false",
    # Parquet TIMESTAMP(NANOS) (e.g. events.ts) is otherwise an illegal
    # type for Spark; surface it as nanos-since-epoch longs and let the
    # reader normalize (sources/readers.py::load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Confs that must be set before the JVM starts (session build time only).
_BUILD_CONF: dict[str, str] = {
    # local[N] -> the driver is the only JVM; give it the machine.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    # localCheckpoint blocks are reclaimed by ContextCleaner only after
    # the driver JVM garbage-collects the RDD handle; with a 48g heap
    # ordinary GC almost never runs, so checkpoint blocks from finished
    # queries accumulate (measured r11: 100 -> 534 -> 888 MB of dead
    # blocks over 3 bench passes of the 13 heavy queries with the
    # default 30min periodic GC). A short periodic-GC interval caps the
    # float at one pass's worth (re-measured: plateau, see
    # OPTIMIZATION_r11.md). Driver-side System.gc() every 3min costs
    # ~100ms on this heap — noise.
    "spark.cleaner.periodicGC.interval": os.environ.get(
        "SPARK_GRAFT_PERIODIC_GC", "3min"
    ),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.default.parallelism": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.ui.enabled": "false",
    # No console progress bars: they interleave with stdout and have
    # corrupted a captured bench record (BENCH_r04 "parsed": null).
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Bigger Arrow batches amortize Python worker round-trips.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
    # Python-worker allocator hygiene (r11, measured): numpy temporaries
    # above ~4 MB madvise(MADV_HUGEPAGE) and glibc mmap/munmaps every
    # buffer above 128 KB, so a stage of N concurrent pandas-UDF workers
    # turns vectorized scoring into hugepage-fault + TLB-shootdown storms
    # (observed 89% kernel time machine-wide; 32-proc A/B: 3.49 s -> 0.68 s
    # per task, worker stime 3.03 s -> 0.31 s). Serve big temporaries from
    # a reused heap instead: no hugepage madvise, mmap only above 128 MB,
    # keep up to 128 MB of freed heap per worker (bounded retention —
    # ~4 GB across 32 workers; size alongside executor.pyspark.memory in
    # deployments). Env-overridable for hosts where THP pays off.
    "spark.executorEnv.NUMPY_MADVISE_HUGEPAGE": os.environ.get(
        "SPARK_GRAFT_NP_HUGEPAGE", "0"
    ),
    "spark.executorEnv.MALLOC_MMAP_THRESHOLD_": os.environ.get(
        "SPARK_GRAFT_MALLOC_MMAP", str(128 * 1024 * 1024)
    ),
    "spark.executorEnv.MALLOC_TRIM_THRESHOLD_": os.environ.get(
        "SPARK_GRAFT_MALLOC_TRIM", str(128 * 1024 * 1024)
    ),
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "python-mapreduce-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    Safe to call repeatedly — Spark returns the existing session, and we
    re-apply the runtime confs to it.
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    for k, v in {**_BUILD_CONF, **_RUNTIME_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Called at the top of every registry query so that a session created by
    an external harness (whatever its build confs) still gets UTC
    timestamps, AQE and Arrow.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    return spark
