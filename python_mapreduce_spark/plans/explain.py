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


def _tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """(indent, name, id) per node of the formatted plan's tree section,
    in preorder."""
    tree = plan.split("\n\n")[0]
    out: list[tuple[int, str, int]] = []
    for line in tree.splitlines():
        m = re.match(r"^([\s+:*-]*)([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", line)
        if m:
            out.append((len(m.group(1)), m.group(2).strip(), int(m.group(3))))
    return out


def single_partition_windows(df: DataFrame) -> list[int]:
    """Node ids of Window operators fed by a SinglePartition Exchange —
    the third silent 100 TB scale hazard (every row through ONE task;
    Spark itself warns 'No Partition Defined for Window operation').

    Walks each Window's child chain in the formatted plan tree through
    the partitioning-preserving unary nodes (Sort/Project/Filter/
    WindowGroupLimit) to the first Exchange (or ReusedExchange — its
    Arguments echo the reused exchange's partitioning) and checks its
    Arguments for SinglePartition. A Window stacked directly on another
    unpartitioned Window has no Exchange of its own, but the bottom
    Window of the stack is always caught, so the query flags.
    """
    plan = formatted_plan(df)
    nodes = _tree_nodes(plan)
    exchange_args = {
        int(m.group(1)): m.group(2)
        for m in re.finditer(
            r"^\((\d+)\) Exchange\nInput[^\n]*\nArguments: ([^\n]*)", plan, re.M
        )
    }
    # A ReusedExchange carries no Arguments of its own; resolve it to
    # the exchange it reuses.
    for m in re.finditer(r"^\((\d+)\) ReusedExchange \[Reuses operator id: (\d+)\]", plan, re.M):
        exchange_args[int(m.group(1))] = exchange_args.get(int(m.group(2)), "")
    passthrough = ("Sort", "Project", "Filter", "WindowGroupLimit")
    hits: list[int] = []
    for i, (_indent, name, nid) in enumerate(nodes):
        if name != "Window":
            continue
        j = i + 1
        while j < len(nodes) and nodes[j][1] in passthrough:
            j += 1
        if j < len(nodes) and nodes[j][1] in ("Exchange", "ReusedExchange"):
            if "SinglePartition" in exchange_args.get(nodes[j][2], ""):
                hits.append(nid)
    return hits
