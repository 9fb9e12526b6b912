"""Core relational queries: smoke + DuckDB oracle equivalence at sf0.001.

Mirrors the driver's t2 gate (row-count + name-sorted columns +
order-insensitive value hash) so regressions surface in pytest before the
driver sees them.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import canon


@pytest.fixture(scope="module")
def duck(sf_dir):
    from python_mapreduce_spark.sources.readers import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_have_oracles_or_reason():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(sdf) >= 0  # rows-only contract: runs and returns a frame
        return
    odf = duck.sql(sql).df()
    scols, _, shash = canon(sdf)
    ocols, _, ohash = canon(odf)
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} != {len(odf)}"
    assert scols == ocols
    assert shash == ohash, f"value hash mismatch for {name}"


def test_bench_summary_line_stays_tail_window_safe():
    # The driver parses the LAST stdout line from a bounded tail
    # capture; the full record overflowed it at 117 queries
    # (BENCH_r05 "parsed": null). Pin that the summary form stays
    # small and driver-schema-complete at ANY registry size.
    import json

    from bench import make_summary_line

    record = {
        "metric": "headline_queries_total_runtime",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"q_{'x' * 30}_{i:04d}": i / 7.0 for i in range(500)},
        "sf": 0.1,
        "value_normalized": 120.0,
        "calibration": {"drift": 1.234},
    }
    line = make_summary_line(record)
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert {"value", "unit", "queries", "sf"} <= set(parsed)
    assert len(parsed["queries"]) == 10
    assert parsed["n_queries"] == 500
    # the inlined queries are exactly the 10 heaviest
    assert min(parsed["queries"].values()) >= 499 / 7.0 - 10
