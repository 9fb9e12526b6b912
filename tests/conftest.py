"""Shared test fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from python_mapreduce_spark.session import get_spark

    s = get_spark(
        "pytest",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            # Fresh warehouse per session: the in-memory catalog forgets
            # tables between sessions but their directories persist, and
            # saveAsTable refuses to reuse an existing location.
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_"),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from python_mapreduce_spark.sources.readers import load_tables

    return load_tables(spark, sf_dir)
