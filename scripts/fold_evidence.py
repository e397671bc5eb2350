#!/usr/bin/env python
"""Recompute the driver-evidence fold and print the next round's
bookkeeping — makes the per-round rotation of driver_evidence.py
mechanical (the round-10 entry checklist's item 1).

Reads every CORRECTNESS_r*.json (latest-wins over clean rows), compares
against the committed LAST_VERIFIED / CHANGED_IN, and prints:

1. ready-to-paste ``_R0N`` band tuples for driver_evidence.py;
2. which CHANGED_IN markers the newest round satisfied (drop them) and
   which still lack post-change evidence (keep them);
3. the projected next sweep window (band 0 + stalest band 1, 50 slots);
4. round-mirror users (driver_evidence.round_mirror_users) whose
   evidence would go stale if ROUND_MIRROR_CHANGED were bumped — the
   list to re-mark after any future duck_round edit.

Pure bookkeeping — no Spark session; safe to run any time.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def recompute_fold() -> dict[str, int]:
    fold: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", p).group(1))
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            clean = row.get("err") in (None, "no_oracle") and row.get(
                "hash_match"
            ) in (True, None)
            if clean:
                fold[name] = max(fold.get(name, 0), rnd)
    return fold


def main() -> None:
    from data_lake_staging_engine_spark.driver_evidence import (
        CHANGED_IN,
        LAST_VERIFIED,
        ROUND_MIRROR_CHANGED,
        round_mirror_users,
    )
    from data_lake_staging_engine_spark.registry import registry

    fold = recompute_fold()
    latest = max(fold.values())
    print(f"artifacts cover rounds up to r{latest}; {len(fold)} names\n")

    by_round: dict[int, list[str]] = defaultdict(list)
    for name, rnd in sorted(fold.items()):
        by_round[rnd].append(name)
    print("# ready-to-paste bands (latest-wins fold):")
    for rnd in sorted(by_round):
        names = ", ".join(f'"{n}"' for n in sorted(by_round[rnd]))
        body = textwrap.indent(textwrap.fill(names + ",", 72), "    ")
        print(f"_R{rnd:02d} = (  # {len(by_round[rnd])} names\n{body}\n)")

    satisfied = sorted(n for n, r in CHANGED_IN.items() if fold.get(n, 0) >= r)
    pending = sorted(n for n, r in CHANGED_IN.items() if fold.get(n, 0) < r)
    print(f"\nCHANGED_IN satisfied by artifacts (drop): {satisfied or 'none'}")
    print(f"CHANGED_IN still pending (keep): {pending or 'none'}")

    stale_book = {
        n: (r, fold.get(n)) for n, r in LAST_VERIFIED.items() if fold.get(n, 0) > r
    }
    if stale_book:
        print(f"\nLAST_VERIFIED behind artifacts (fold these): {sorted(stale_book)}")

    reg = registry()
    window = list(reg)[:50]
    print(f"\nprojected next 50-row sweep window (current registry order):")
    print(textwrap.indent(textwrap.fill(" ".join(window), 72), "  "))

    users = sorted(round_mirror_users({n: rq.fn for n, rq in reg.items()}))
    print(
        f"\nround-mirror users ({len(users)}; ROUND_MIRROR_CHANGED="
        f"{ROUND_MIRROR_CHANGED}) — re-mark ALL of these on the next "
        "duck_round change:"
    )
    print(textwrap.indent(textwrap.fill(" ".join(users), 72), "  "))


if __name__ == "__main__":
    main()
