"""Readers: scans over datasets and the table catalog.

The reference's source model is "a dataset is a directory (or list of
directories) of newline files, optionally gzipped" (reference
mapper.py:75-94, scheduler.py:509). Spark's file sources subsume that:
multi-path reads, glob filters, automatic .gz decompression, and —
critically for 100 TB — driver-side split planning with locality instead
of the reference's filename-hash file ownership (mapper.py:96-101).

All readers accept a str or a list of str paths (the reference's
``input_dirs`` list). Formats beyond text (csv/json/parquet) are a strict
upgrade: the reference parses raw lines in user map functions
(mapper.py:58-59).
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

#: The driver-generated benchmark tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _paths(paths: str | Sequence[str]) -> list[str]:
    return [paths] if isinstance(paths, str) else list(paths)


#: Suffixes that mark a file as still being written (writer conventions:
#: Flink/Hadoop ``.inprogress``/``._COPYING_``, generic ``.tmp``).
INFLIGHT_SUFFIXES: tuple[str, ...] = (".tmp", ".inprogress", "._COPYING_")


def visible_files(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    require_success: bool = False,
    inflight_suffixes: Sequence[str] = INFLIGHT_SUFFIXES,
) -> list[str]:
    """Enumerate input files, skipping ones still being written (O4).

    The reference actively lock-probes files and skips any still open by
    a writer (mapper.py:159-181). Distributed filesystems have no flock,
    so the Spark-native equivalent is convention-based visibility:

      * files with an in-flight suffix (``.tmp``/``.inprogress``/...)
        are skipped — writers write-then-rename;
      * ``_``/``.``-prefixed files are skipped (Hadoop hidden/metadata);
      * with ``require_success``, a directory is only eligible once its
        ``_SUCCESS`` marker exists (the whole-job commit protocol).

    Uses the Hadoop FileSystem API through the JVM gateway, so it works
    for any scheme Spark can read (file://, hdfs://, s3a://); listing is
    driver-side and O(files), the same cost Spark's own file index pays.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path

    def eligible(name: str) -> bool:
        if name.startswith(("_", ".")):
            return False
        return not any(name.endswith(s) for s in inflight_suffixes)

    out: list[str] = []
    for p in _paths(paths):
        path = HPath(p)
        fs = path.getFileSystem(hconf)
        if not fs.exists(path):
            continue
        if fs.getFileStatus(path).isDirectory():
            if require_success and not fs.exists(HPath(p, "_SUCCESS")):
                continue
            for st in fs.listStatus(path):
                if not st.isDirectory() and eligible(st.getPath().getName()):
                    out.append(st.getPath().toString())
        elif eligible(path.getName()):
            out.append(p)
    return sorted(out)


def read_text(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    whole_text: bool = False,
    glob: str | None = None,
    recursive: bool = False,
    visible_only: bool = False,
    require_success: bool = False,
) -> DataFrame:
    """Line-oriented text scan (reference O1+O2, mapper.py:75-94).

    ``.gz`` inputs decompress automatically (the reference special-cases
    this at mapper.py:87-90; Spark's text source does it natively).
    Returns a single ``value: string`` column — the reference's "raw line
    into the map function" contract (mapper.py:58-59).

    ``visible_only`` resolves inputs through :func:`visible_files` first,
    skipping in-flight files (reference O4, mapper.py:159-181);
    ``require_success`` additionally gates directories on ``_SUCCESS``.
    """
    if visible_only or require_success:
        paths = visible_files(spark, paths, require_success=require_success)
        if not paths:
            from pyspark.sql.types import StringType, StructField, StructType  # noqa: PLC0415

            return spark.createDataFrame([], StructType([StructField("value", StringType())]))
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.text(_paths(paths), wholetext=whole_text)


def read_jsonl(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    schema=None,
    corrupt_column: str | None = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan — the reference's ujson item files (shuffler.py:75).

    PERMISSIVE mode lands unparseable lines in ``corrupt_column`` rather
    than failing the job — the declarative version of the reference's
    LINE_ERROR capture (reducer.py:58-64).
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if corrupt_column:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(_paths(paths))


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    schema=None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan. Explicit schema preferred at scale (inference = extra pass)."""
    reader = spark.read.option("header", header).option("sep", sep)
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", "true")
    return reader.csv(_paths(paths))


def read_parquet(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    merge_schema: bool = False,
    schema=None,
) -> DataFrame:
    """Columnar scan — predicate pushdown + column pruning reach the footer.

    ``merge_schema=True`` unions the footers of every file so a dataset
    whose schema EVOLVED across batches (columns added over time) reads
    as the superset schema, with absent columns NULL — the standard
    long-lived-ingest situation. Off by default: merging costs a footer
    pass over every file, which at 100 TB is exactly the metadata storm
    the default single-footer read avoids.

    An explicit ``schema`` skips footer inference entirely — the right
    default at scale, and the only way to read back a partitioned sink
    that wrote zero data files (Spark emits just ``_SUCCESS`` for an
    empty partitioned write, leaving nothing to infer from).
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*_paths(paths))


def read_orc(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """ORC scan — same pushdown/pruning guarantees as parquet, for
    interchange with Hive-era data lakes."""
    return spark.read.orc(*_paths(paths))


def read_avro(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Avro scan — row-oriented interchange (Kafka/schema-registry lakes).

    Avro is an EXTERNAL Spark module (org.apache.spark:spark-avro); this
    environment has no network to fetch it, so the reader is gated: it
    raises a clear, actionable error instead of Spark's opaque
    "failed to find data source" when the module is absent.
    """
    try:
        return spark.read.format("avro").load(_paths(paths))
    except Exception as e:  # noqa: BLE001 - classify, then re-raise
        if "Failed to find data source: avro" in str(e):
            raise NotImplementedError(
                "spark-avro is not deployed in this environment; add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
            ) from e
        raise


def sample_files(paths: Sequence[str], fraction: float, seed: int = 42) -> list[str]:
    """File-level Bernoulli downsample (reference O5, mapper.py:103-108).

    The reference includes each whole input FILE with probability
    ``downsample``; row-level `df.sample` is usually better, but this
    preserves the exact file-granularity semantics when needed (e.g.
    sampling log directories where files are time-buckets).
    """
    rng = random.Random(seed)
    return [p for p in paths if rng.random() < fraction]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one benchmark table from a scale-factor directory.

    ``events.ts`` normalization — the generator has shipped it as both
    parquet TIMESTAMP(NANOS) (read as nanos-since-epoch longs under the
    ``nanosAsLong`` conf, session.py) and TIMESTAMP(MICROS) without a
    timezone (read as TIMESTAMP_NTZ). Either way, surface a session-TZ
    TimestampType: the session runs UTC (tune()), so the NTZ→LTZ cast is
    a deterministic relabeling, and downstream time functions
    (unix_millis, windowing, watermarks) see the type they require.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415 - avoid module-level cycle

    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            require_utc_session(spark)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def require_utc_session(spark: SparkSession) -> None:
    """Guard for NTZ→LTZ casts: they are a pure relabeling ONLY when the
    session timezone is UTC (the generator writes UTC wall-clock micros).
    On any other timezone the cast would silently shift every event
    instant, so fail loudly and point at the fix. Any zero-offset zone
    id counts as UTC ('Etc/UTC', 'GMT', '+00:00', ... — e.g. inherited
    from the JVM default on a UTC host), not just the literal 'UTC'."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if not _is_utc_zone(tz):
        raise ValueError(
            f"events.ts is TIMESTAMP_NTZ and spark.sql.session.timeZone={tz!r}; "
            "the NTZ->timestamp cast is only correct under UTC. Call "
            "python_mapreduce_spark.session.tune(spark) (or set the conf to "
            "'UTC') before loading events."
        )


def _is_utc_zone(tz: str | None) -> bool:
    """True iff the zone id is wall-clock-identical to UTC year-round."""
    if tz in {"UTC", "GMT", "Etc/UTC", "Etc/GMT", "Z", "Zulu", "Universal",
              "Etc/Universal", "+00:00", "UTC+00:00", "GMT+00:00", "GMT0", "Etc/GMT0"}:
        return True
    if tz is None:
        return False
    try:
        from datetime import datetime, timedelta  # noqa: PLC0415
        from zoneinfo import ZoneInfo  # noqa: PLC0415

        z = ZoneInfo(tz)
        # Two probe dates catch DST zones that only visit UTC seasonally
        # (e.g. Europe/London in winter).
        return all(
            z.utcoffset(datetime(2026, m, 1)) == timedelta(0) for m in (1, 7)
        )
    except Exception:
        return False


def load_tables(spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLES) -> dict[str, DataFrame]:
    """Load benchmark tables keyed by name."""
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLES) -> None:
    """Register the benchmark tables as temp views for spark.sql queries."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
