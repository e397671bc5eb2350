"""Plan inspection utilities."""

from data_lake_staging_engine_spark.plans.inspect import (
    codegen_ids,
    has_exchange,
    join_kinds,
    partial_aggregation,
    physical_plan,
    pushed_filters,
    read_columns,
    scan_for,
    scans,
)

__all__ = [
    "codegen_ids",
    "has_exchange",
    "join_kinds",
    "partial_aggregation",
    "physical_plan",
    "pushed_filters",
    "read_columns",
    "scan_for",
    "scans",
]
