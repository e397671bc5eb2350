#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (run from the repo root)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_staging_engine_spark.registry import registry  # noqa: E402

FAMILIES = {
    "a": "Staging surface (the reference's pipeline + lake maintenance)",
    "b": "Relational core",
    "c": "Window functions & time series",
    "d": "Scalar function packs",
    "e": "Structured Streaming",
    "f": "Python extension points (UDF/pandas/UDTF/DataSource plumbing)",
    "g": "LLM-data-pipeline operators",
}


def main() -> None:
    reg = registry()
    lines = [
        "# QUERIES — auto-generated registry catalog",
        "",
        "Generated from `data_lake_staging_engine_spark.registry` "
        "(`python scripts/gen_queries_md.py`). One row per registered query; "
        "tier H = hash-matched against the DuckDB oracle at sf=0.01, "
        "R = rows-only (approximate/stubbed/iterative by design). "
        "Full semantics: SURVEY.md §2; implementation docstrings in the "
        "operator modules.",
        "",
    ]
    by_fam: dict[str, list] = {}
    for name, rq in reg.items():
        by_fam.setdefault(name[0], []).append(rq)
    total_h = 0
    for fam in sorted(by_fam):
        lines.append(f"## {FAMILIES.get(fam, fam)}")
        lines.append("")
        lines.append("| name | tier | what it does |")
        lines.append("| --- | --- | --- |")
        for rq in by_fam[fam]:
            doc = (rq.fn.__doc__ or "").strip().splitlines()
            first = doc[0].strip() if doc else ""
            tier = "H" if rq.oracle is not None else "R"
            total_h += tier == "H"
            lines.append(f"| `{rq.name}` | {tier} | {first} |")
        lines.append("")
    lines.append(
        f"**Totals: {len(reg)} queries, {total_h} hash-tier, "
        f"{len(reg) - total_h} rows-only.**"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(reg)} queries, {total_h} hash-tier")


if __name__ == "__main__":
    main()
