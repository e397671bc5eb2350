"""Physical-plan inspection helpers (SURVEY.md §4 posture, made checkable).

The 100 TB story rests on properties of the *physical plan*, not the
code: filters reaching the parquet scan, projections pruning the read
schema, small dims broadcast instead of shuffled, pipelines staying
inside whole-stage codegen, and no accidental cartesian products.
These helpers expose those properties so tests can pin them — a plan
regression then fails CI the same way a wrong result would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (same text as ``explain("formatted")``)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def scans(plan: str) -> list[dict[str, str]]:
    """Parse per-scan attributes: location, PushedFilters, ReadSchema."""
    out = []
    for block in re.split(r"\n\(\d+\) ", plan):
        if not block.startswith("Scan parquet"):
            continue
        attrs: dict[str, str] = {}
        for key in ("Location", "PushedFilters", "ReadSchema"):
            m = re.search(rf"^{key}: (.+)$", block, re.MULTILINE)
            if m:
                attrs[key] = m.group(1)
        out.append(attrs)
    return out


def scan_for(plan: str, table: str) -> dict[str, str]:
    """The scan block reading ``<table>.parquet`` (raises if absent)."""
    for s in scans(plan):
        if f"{table}.parquet" in s.get("Location", ""):
            return s
    raise AssertionError(f"no parquet scan of {table!r} in plan:\n{plan}")


def pushed_filters(plan: str, table: str) -> str:
    return scan_for(plan, table).get("PushedFilters", "[]")


def read_columns(plan: str, table: str) -> set[str]:
    """Column names in the scan's ReadSchema — the pruning check."""
    schema = scan_for(plan, table).get("ReadSchema", "")
    return set(re.findall(r"(\w+):", schema))


def join_kinds(plan: str) -> list[str]:
    """Join operator names in plan order (e.g. BroadcastHashJoin)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def codegen_ids(plan: str) -> set[int]:
    """Distinct whole-stage-codegen span ids — wider spans, fewer ids."""
    return {int(m) for m in re.findall(r"codegen id : (\d+)", plan)}


def has_exchange(plan: str) -> bool:
    return "Exchange" in plan


def partial_aggregation(plan: str) -> bool:
    """True when aggregation is split into partial (map-side combine)
    and final stages — the property that bounds shuffle volume by the
    number of groups rather than the number of rows."""
    return len(re.findall(r"HashAggregate", plan)) >= 2
