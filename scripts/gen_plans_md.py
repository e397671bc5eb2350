#!/usr/bin/env python
"""Generate PLANS.md — the per-query physical-plan audit table.

The 100 TB posture lives in plan properties (SURVEY.md §4): filters
reaching the parquet scan, pruned read schemas, broadcast dims, bounded
shuffle counts, wide codegen spans, and the absence of accidental
cartesians. tests/test_plans.py pins ~38 of those properties as hard
assertions; this script makes the WHOLE registry auditable at a glance
by tabulating, for every query, what the current Catalyst output
actually contains.

Usage: python scripts/gen_plans_md.py   (rewrites PLANS.md at repo root)

Notes:
- Queries that execute during DataFrame construction (streaming drains,
  iterative components, eager sinks) return a materialized relation;
  their row reports `executes-internally` and the shuffle/join columns
  describe the RETURNED relation's plan (usually trivial), not the
  internal job — their internal posture is documented in the operator
  docstrings and pinned by dedicated tests instead.
- Run at sf0.01 with the engine session (fixture split sizing). The
  table is committed so plan drift shows up in review diffs; regenerate
  after any operator change.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_staging_engine_spark.plans.inspect import (  # noqa: E402
    codegen_ids,
    join_kinds,
    physical_plan,
    scans,
)
from data_lake_staging_engine_spark.registry import registry  # noqa: E402
from data_lake_staging_engine_spark.session import (  # noqa: E402
    fixture_split_bytes,
    get_spark,
)

SF_DIR = "/root/testdata/sf0.01"

# Operators worth calling out by name when they appear: each is a
# specific scale posture (driver-merged top-k, map-side group limits,
# generators, bucketed exchange-free joins).
NOTABLE = (
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "Generate",
    "Window",
    "SortAggregate",
    "ObjectHashAggregate",
    "Expand",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapCoGroupsInPandas",
)


def summarize(plan: str) -> dict:
    scan_rows = scans(plan)
    scan_bits = []
    for s in scan_rows:
        loc = s.get("Location", "")
        m = re.search(r"([\w.]+)\.parquet", loc)
        table = m.group(1) if m else "?"
        pushed = s.get("PushedFilters", "[]")
        n_pushed = 0 if pushed.strip() in ("[]", "") else pushed.count(",") + 1
        n_cols = len(re.findall(r"(\w+):", s.get("ReadSchema", "")))
        scan_bits.append(f"{table}({n_cols}c{',' + str(n_pushed) + 'pf' if n_pushed else ''})")
    joins = join_kinds(plan)
    join_counts: dict[str, int] = {}
    for j in joins:
        join_counts[j] = join_counts.get(j, 0) + 1
    join_str = " ".join(
        f"{k}x{v}" if v > 1 else k for k, v in sorted(join_counts.items())
    )
    notable = [op for op in NOTABLE if op in plan]
    return {
        "scans": " ".join(scan_bits) or "—",
        "joins": join_str or "—",
        "shuffles": plan.count("hashpartitioning("),
        "codegen": len(codegen_ids(plan)),
        "notable": " ".join(notable) or "—",
    }


def main() -> None:
    spark = get_spark(max_partition_bytes=fixture_split_bytes())
    rows = []
    for name, rq in registry().items():
        try:
            df = rq.fn(spark, SF_DIR)
            plan = physical_plan(df)
            info = summarize(plan)
            # A LocalRelation / memory-sink read means the query ran its
            # real work during construction (streaming drain, iterative
            # loop, eager sink + read-back): the returned plan is not
            # the interesting one.
            if "LocalTableScan" in plan or "Scan ExistingRDD" in plan:
                info["notable"] = (
                    "executes-internally " + info["notable"]
                ).replace(" —", "")
            rows.append((name, info))
            print(f"{name}: ok", flush=True)
        except Exception as exc:  # noqa: BLE001 - audit must report all
            rows.append(
                (name, {"scans": f"ERROR {type(exc).__name__}", "joins": "—",
                        "shuffles": "—", "codegen": "—", "notable": "—"})
            )
            print(f"{name}: ERROR {exc}", flush=True)

    out = [
        "# PLANS — per-query physical-plan audit (auto-generated)",
        "",
        "Regenerate with `python scripts/gen_plans_md.py` (sf0.01, engine",
        "session). Columns: **scans** = table(read-cols, pushed-filters);",
        "**joins** = physical join operators; **shuffles** = count of",
        "`hashpartitioning` exchanges; **codegen** = distinct whole-stage",
        "codegen spans; **notable** = posture-relevant operators.",
        "`executes-internally` marks queries whose real work runs during",
        "DataFrame construction (streaming drains, iterative loops, eager",
        "sinks) — their internal posture is pinned by dedicated tests, not",
        "this table. Hard assertions for ~38 key properties live in",
        "tests/test_plans.py; this table exists so drift in ANY query's",
        "plan shows up as a review diff.",
        "",
        "| query | scans | joins | shuffles | codegen | notable |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for name, info in rows:
        out.append(
            f"| `{name}` | {info['scans']} | {info['joins']} | "
            f"{info['shuffles']} | {info['codegen']} | {info['notable']} |"
        )
    out.append("")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(rows)} rows)", flush=True)


if __name__ == "__main__":
    main()
