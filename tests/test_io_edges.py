"""IO edge coverage: CSV roundtrip, corrupt-record capture (the
reference's LINE_ERROR path, reducer.py:58-64), stratified sampling,
scalar UDF registration (the reference's dynamic function registry, O7)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_csv_roundtrip_with_schema(spark, tables, tmp_path):
    from python_mapreduce_spark.sources.readers import read_csv
    from python_mapreduce_spark.sources.sinks import write_csv

    df = tables["nation"]
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = read_csv(spark, out, schema=df.schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in df.collect()
    )


def test_corrupt_jsonl_lands_in_corrupt_column(spark, tmp_path):
    # PERMISSIVE mode: bad lines become rows with _corrupt_record set,
    # not job failures — the declarative version of LINE_ERROR capture.
    p = tmp_path / "lines.json"
    p.write_text('{"a": 1}\n{"a": 2}\nnot json at all\n{"a": 3}\n')
    from python_mapreduce_spark.sources.readers import read_jsonl

    schema = "a long, _corrupt_record string"
    df = read_jsonl(spark, str(p), schema=schema).cache()
    assert df.count() == 4
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record
    assert df.filter(F.col("a").isNotNull()).count() == 3


def test_multi_dir_scan_unions_inputs(spark, tables, tmp_path):
    # The reference's dataset = a LIST of directories scanned into one
    # bag (mapper.py:26, 75-78); Spark readers take path lists natively.
    from python_mapreduce_spark.sources.readers import read_text
    from python_mapreduce_spark.sources.sinks import write_text

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    docs = tables["documents"].select("text")
    docs.limit(10).write.mode("overwrite").text(d1)
    docs.limit(25).write.mode("overwrite").text(d2)
    combined = read_text(spark, [d1, d2])
    assert combined.count() == 35


def test_stratified_sample_by_key(tables):
    li = tables["lineitem"]
    fractions = {"A": 0.5, "N": 0.1, "R": 0.0}
    sampled = li.sampleBy("l_returnflag", fractions, seed=42)
    counts = {
        r.l_returnflag: r.n
        for r in sampled.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "R" not in counts  # fraction 0 -> excluded
    assert 0.3 < counts["A"] / totals["A"] < 0.7
    assert 0.02 < counts["N"] / totals["N"] < 0.25


def test_scalar_udf_registration_in_sql(spark, tables):
    # The reference resolves user functions by name from a per-project
    # registry (O7, mapper.py:44-53); Spark's equivalent is
    # spark.udf.register making the function callable from SQL.
    @F.pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    spark.udf.register("net_price", net_price)
    tables["lineitem"].createOrReplaceTempView("li_udf_test")
    got = spark.sql(
        "SELECT sum(net_price(l_extendedprice, l_discount)) AS s FROM li_udf_test"
    ).collect()[0].s
    expected = (
        tables["lineitem"]
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s"))
        .collect()[0]
        .s
    )
    assert abs(got - expected) < 1e-6 * abs(expected)


def test_orc_roundtrip_partitioned(spark, tables, tmp_path):
    # ORC sink/scan parity with parquet (SURVEY.md §2.2 scans/sinks row):
    # partitioned layout prunes directories, values survive the roundtrip.
    from python_mapreduce_spark.sources.readers import read_orc
    from python_mapreduce_spark.sources.sinks import write_orc

    li = tables["lineitem"].select("l_orderkey", "l_quantity", "l_returnflag")
    path = str(tmp_path / "orc")
    write_orc(li, path, partition_by=["l_returnflag"])
    back = read_orc(spark, path)
    assert back.count() == li.count()
    # partition column round-trips as a directory key
    flags = {r.l_returnflag for r in back.select("l_returnflag").distinct().collect()}
    assert flags == {r.l_returnflag for r in li.select("l_returnflag").distinct().collect()}
    # partition pruning: the flag filter becomes a PartitionFilter on the
    # scan (directory pruning), not a row filter
    one = back.filter(F.col("l_returnflag") == "A")
    assert one.count() == li.filter(F.col("l_returnflag") == "A").count()
    explained = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in explained and "l_returnflag" in explained.split("PartitionFilters")[1][:120]


def test_parquet_rotation_max_records_per_file(tables, tmp_path):
    # Reference O21 rotates output every N items (reducer.py:90-139);
    # Spark's maxRecordsPerFile is the same knob.
    import glob

    from python_mapreduce_spark.sources.sinks import write_parquet

    df = tables["orders"].select("o_orderkey", "o_totalprice")
    n = df.count()
    path = str(tmp_path / "rotated")
    write_parquet(df.coalesce(1), path, max_records_per_file=100)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) >= n // 100  # one part per 100 records (per task)


def test_visible_files_skips_inflight(spark, tmp_path):
    # Reference O4 (mapper.py:159-181): files still being written are
    # skipped. The distributed-FS equivalent is convention-based
    # visibility — in-flight suffixes, hidden/metadata prefixes, and an
    # optional _SUCCESS commit gate.
    from python_mapreduce_spark.sources.readers import read_text, visible_files

    d = tmp_path / "incoming"
    d.mkdir()
    (d / "a.txt").write_text("one\ntwo\n")
    (d / "b.txt").write_text("three\n")
    (d / "c.txt.tmp").write_text("partial\n")
    (d / "d.txt.inprogress").write_text("partial\n")
    (d / "_committing").write_text("")
    (d / ".hidden").write_text("nope\n")

    vis = visible_files(spark, str(d))
    assert [p.rsplit("/", 1)[1] for p in vis] == ["a.txt", "b.txt"]

    got = read_text(spark, str(d), visible_only=True)
    assert sorted(r.value for r in got.collect()) == ["one", "three", "two"]

    # _SUCCESS gate: directory invisible until the commit marker lands
    assert visible_files(spark, str(d), require_success=True) == []
    assert read_text(spark, str(d), require_success=True).count() == 0
    (d / "_SUCCESS").write_text("")
    assert len(visible_files(spark, str(d), require_success=True)) == 2

    # a bare file path still resolves (and in-flight bare files don't)
    assert visible_files(spark, str(d / "a.txt")) == [str(d / "a.txt")]
    assert visible_files(spark, str(d / "c.txt.tmp")) == []
    # nonexistent paths are simply absent, not an error
    assert visible_files(spark, str(tmp_path / "nope")) == []


def test_avro_io_is_cleanly_gated(spark, tmp_path):
    # spark-avro is an external module with no offline deploy path here;
    # the readers/sinks must fail with an actionable error, not Spark's
    # opaque "failed to find data source".
    import pytest

    from python_mapreduce_spark.sources.readers import read_avro
    from python_mapreduce_spark.sources.sinks import write_avro

    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_avro(df, str(tmp_path / "a"))
    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "a"))


def test_compact_files_merges_small_files(spark, tables, tmp_path):
    # Small-files compaction: many tiny parts -> few, values intact,
    # swap is atomic-ish (old dir never half-visible under the path).
    import glob

    from python_mapreduce_spark.operators.relational import compact_files

    df = tables["orders"].select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "shard")
    df.repartition(16).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 16
    n_before = df.count()

    n_files = compact_files(spark, path, target_partitions=2)
    assert n_files <= 2
    back = spark.read.parquet(path)
    assert back.count() == n_before
    assert not glob.glob(f"{path}__compact_*")


def test_compact_files_recovers_from_mid_swap_crash(spark, tables, tmp_path):
    # Simulate a kill between the two swap renames: nothing at path, data
    # stranded in __compact_old, stale __compact_tmp present. Re-running
    # must restore the dataset and compact it.
    import glob
    import os

    from python_mapreduce_spark.operators.relational import compact_files

    df = tables["orders"].select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "shard")
    df.repartition(8).write.parquet(path)
    n_before = spark.read.parquet(path).count()

    os.rename(path, f"{path}__compact_old")
    os.makedirs(f"{path}__compact_tmp")
    n_files = compact_files(spark, path, target_partitions=2)
    assert n_files <= 2
    assert spark.read.parquet(path).count() == n_before
    assert not glob.glob(f"{path}__compact_*")


def test_ntz_load_requires_utc_session(spark, tmp_path):
    # events.ts as TIMESTAMP_NTZ is relabeled to TimestampType only when
    # the session timezone is UTC; any other timezone must fail loudly
    # instead of silently shifting every instant.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from python_mapreduce_spark.sources.readers import load_table
    from python_mapreduce_spark.streaming.incremental import normalize_event_ts

    sf = tmp_path / "sf"
    sf.mkdir()
    tbl = pa.table(
        {"ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")), "v": [1]}
    )
    pq.write_table(tbl, str(sf / "events.parquet"))

    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="UTC"):
            load_table(spark, str(sf), "events")
        ntz = spark.read.parquet(str(sf / "events.parquet"))
        if dict(ntz.dtypes).get("ts") == "timestamp_ntz":
            with pytest.raises(ValueError, match="UTC"):
                normalize_event_ts(ntz)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ok = load_table(spark, str(sf), "events")
        assert dict(ok.dtypes)["ts"] == "timestamp"
        # zero-offset aliases are equivalent and must not raise
        for alias in ("Etc/UTC", "GMT", "+00:00"):
            spark.conf.set("spark.sql.session.timeZone", alias)
            load_table(spark, str(sf), "events")
        # a seasonal-UTC zone (DST) is NOT equivalent
        spark.conf.set("spark.sql.session.timeZone", "Europe/London")
        with pytest.raises(ValueError, match="UTC"):
            load_table(spark, str(sf), "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_read_parquet_merge_schema_unions_generations(spark, tmp_path):
    from python_mapreduce_spark.sources.readers import read_parquet
    from python_mapreduce_spark.sources.sinks import write_parquet

    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    write_parquet(spark.createDataFrame([(1, 10)], "id long, a long"), g1)
    write_parquet(spark.createDataFrame([(2, 20, "x")], "id long, a long, b string"), g2)
    merged = read_parquet(spark, [g1, g2], merge_schema=True)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    # the pre-evolution generation reads the new column as NULL
    assert rows == {1: (10, None), 2: (20, "x")}
