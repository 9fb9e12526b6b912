"""Plan inspection utilities (Catalyst is the optimizer — these verify
it did what the scale design expects)."""

from python_mapreduce_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
]
