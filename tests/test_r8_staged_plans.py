"""Plan-hygiene audit for the STAGED round-8 registry entries —
the same three scale-hazard checks the registered set gets in
test_plan_hygiene.py (row-at-a-time Python, unconditioned cross join,
single-partition window), applied BEFORE the entries earn a registry
slot. Entries built on global_row_number / global_running_sum execute
their counting pass at build time (localCheckpoint contract); the
audit inspects the final DataFrame's physical plan, where the
distributed-rank scheme shows as per-partition windows keyed on the
partition id, never a SinglePartition exchange.

q_stream_cusum is excluded: building it runs a Structured Streaming
query (its scale shape is pinned by the streaming suite instead).
"""

from __future__ import annotations

import pytest

from python_mapreduce_spark.plans.explain import (
    formatted_plan,
    single_partition_windows,
)
from python_mapreduce_spark.registry import r8_staged

SF_DIR = "/root/testdata/sf0.001"

AUDITED = [
    (name, q)
    for name, q in r8_staged.QUERIES.items()
    if name != "q_stream_cusum"
]


@pytest.mark.parametrize("name,q", AUDITED, ids=[n for n, _ in AUDITED])
def test_staged_plan_has_no_scale_hazards(spark, name, q):
    df = q.fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    assert "CartesianProduct" not in plan, f"{name}: unconditioned cross join in plan"
    hits = single_partition_windows(df)
    assert not hits, (
        f"{name}: Window node(s) {hits} fed by a SinglePartition "
        "Exchange — unpartitioned window funnels all rows through one task"
    )
