"""Physical-plan inspection.

The reference has no optimizer to inspect (SURVEY.md §4.1: "no rewrite
layer of any kind"); in this engine Catalyst owns optimization, and
these helpers make its decisions assertable in tests: did the filter
reach the parquet scan (PushedFilters)? did the scan prune columns
(ReadSchema)? did the small side broadcast? Regressions in any of these
are 100x-at-scale problems that still pass small-data correctness tests
— which is exactly why they get their own assertions.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain('formatted'))."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the scan node claims to push into the data source."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema:\s*struct<(.*?)>", plan):
        cols.extend(f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is broadcast (hash or nested-loop)."""
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
