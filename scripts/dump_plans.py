#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to text files.

Used for the optimization-round evidence (plans/rNN/<query>_before.txt
and _after.txt): run once from a worktree at the pre-round commit and
once at HEAD, against the SAME sf dir, so plan-shape claims (join
strategy, Exchange count, pushed filters) are diffable by a reader who
cannot run Spark.

Usage:
    python scripts/dump_plans.py --repo /root/repo --sf-dir /root/testdata/sf0.1 \
        --out plans/r16 --suffix _after g02_dedup_near g02b_dedup_lsh ...

Notes:
- The plan is captured at construction time (AdaptiveSparkPlan
  isFinalPlan=false): the INITIAL shape, which is what the code
  determines; AQE runtime rewrites are called out in the round notes
  where they matter.
- Queries that execute work during construction (eager checkpoints,
  streaming drains) pay that work here; their returned relation's plan
  is what gets dumped, matching the PLANS.md convention.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True, help="repo root to import from")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--suffix", default="", help="e.g. _before / _after")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from data_lake_staging_engine_spark.plans.inspect import physical_plan
    from data_lake_staging_engine_spark.registry import registry
    from data_lake_staging_engine_spark.session import (
        fixture_split_bytes,
        get_spark,
    )

    spark = get_spark(max_partition_bytes=fixture_split_bytes())
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        try:
            df = reg[name].fn(spark, args.sf_dir)
            plan = physical_plan(df)
        except Exception as exc:  # noqa: BLE001 - evidence must report all
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name}{args.suffix} — sf_dir={args.sf_dir}\n"
                f"# repo={args.repo}\n\n{plan}\n"
            )
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
