#!/usr/bin/env python
"""One-shot oracle-parity sweep at an arbitrary SF dir.

The driver proves correctness at sf0.01 only; tests/test_oracle_parity
replicates that, and tests/test_cross_sf_parity adds sf0.001 as a
second, smaller shape. This script covers the remaining direction —
UP-scale parity (default sf0.1, the bench shape) — where a different
class of size-dependent assumption can hide: strategy probes flipping
(bitmap vs token-join), broadcast thresholds, arithmetic overflow,
oracle SQL whose cost explodes.

Usage:
    python scripts/parity_sweep.py [sf_dir] [--skip name ...] \
        [--resume-from prior_run.log] [--master local[4]] \
        [--shuffle-partitions 3]

``--master``/``--shuffle-partitions`` build a session with a
deliberately different parallelism — results must be invariant to the
partition count (no partition-id dependence, no unordered collect), so
an odd configuration (local[4], 3 shuffle partitions) is a robustness
axis of its own. BASELINE.md records a 159/159 clean run at sf0.001
under exactly that configuration.

Prints one line per query (H tier: ok/FAIL + seconds; R tier: rows +
seconds) and a final JSON summary line. Heavy-oracle queries can be
skipped explicitly; every skip is printed so coverage gaps are never
silent. ``--resume-from`` re-reads a prior (possibly killed) run's
stdout and skips every query that already produced a result line —
the recovery path when one oracle stalls (e.g. g26's recursive-CTE
closure at sf0.1): kill, then resume with the stall added to --skip.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_staging_engine_spark.registry import registry  # noqa: E402
from data_lake_staging_engine_spark.session import (  # noqa: E402
    fixture_split_bytes,
    get_spark,
)
from data_lake_staging_engine_spark.testing import (  # noqa: E402
    compare,
    duck_connection,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="sweep only these queries — the touched-axes re-run shape "
        "(VERDICT r08 #6: on an operator edit, re-run the invariance "
        "axes for the touched queries instead of the full 159)",
    )
    ap.add_argument("--resume-from", default=None)
    ap.add_argument(
        "--oracle-sf-dir",
        default=None,
        help="run DuckDB oracles against this dir instead of sf_dir — "
        "for the row-order/layout axis, where Spark reads a shuffled "
        "multi-file copy (scripts/make_shuffled_copy.py) and the oracle "
        "keeps the original single-file layout (same multiset)",
    )
    ap.add_argument(
        "--rows-only",
        action="store_true",
        help="execute every query (count rows) WITHOUT oracle compare — "
        "the scale-robustness smoke for SF dirs where the DuckDB "
        "oracles are intractable (e.g. the 10x replica: g26's "
        "recursive CTE, the near-dup oracles); proves every operator "
        "RUNS at the scale (no OOM, no crash), which is the class the "
        "round-12 study caught on g02d",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", default=None)
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="extra session conf (repeatable) — probe semantic knobs "
        "like spark.sql.ansi.enabled that a driver-owned session might "
        "set differently",
    )
    args = ap.parse_args()

    resumed: set[str] = set()
    if args.resume_from:
        with open(args.resume_from) as f:
            for line in f:
                m = re.match(r"(\w+): (ok|rows-only|FAIL|ERROR)", line)
                if m:
                    resumed.add(m.group(1))
        print(f"resuming: {len(resumed)} queries already done", flush=True)

    if args.master or args.shuffle_partitions or args.conf:
        from pyspark.sql import SparkSession

        from data_lake_staging_engine_spark.session import tune_session

        builder = (
            SparkSession.builder.master(args.master or "local[*]")
            # Match get_spark's heap sizing: a 1g-default driver JVM
            # OOMs on the heavier dedup queries once AQE coalescing is
            # probed off, which wedges the session and cascades errors
            # through the rest of the sweep (observed on g28).
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            )
            .config("spark.ui.enabled", "false")
        )
        if args.shuffle_partitions:
            builder = builder.config(
                "spark.sql.shuffle.partitions", args.shuffle_partitions
            )
        for kv in args.conf:
            key, _, val = kv.partition("=")
            builder = builder.config(key, val)
        spark = tune_session(builder.getOrCreate())
        # Re-apply AFTER tune_session so a probed knob tune_session
        # itself manages (e.g. spark.sql.adaptive.enabled) still wins;
        # static-only confs already took effect at builder time.
        for kv in args.conf:
            key, _, val = kv.partition("=")
            try:
                spark.conf.set(key, val)
            except Exception:
                pass
    else:
        spark = get_spark(max_partition_bytes=fixture_split_bytes())
    # --rows-only never touches the oracle, and the target dir may be
    # directory-form parquet DuckDB's single-file views cannot read.
    con = None if args.rows_only else duck_connection(
        args.oracle_sf_dir or args.sf_dir
    )
    reg = registry()

    if args.only is not None:
        unknown = set(args.only) - set(reg)
        if unknown:
            sys.exit(f"--only names not in registry: {sorted(unknown)}")
        reg = {n: rq for n, rq in reg.items() if n in args.only}

    results: dict[str, dict] = {}
    n_fail = 0
    for name, rq in reg.items():
        if name in resumed:
            results[name] = {"status": "resumed"}
            continue
        if name in args.skip:
            print(f"{name}: SKIPPED (explicit)", flush=True)
            results[name] = {"status": "skipped"}
            continue
        t0 = time.monotonic()
        try:
            if rq.oracle is None or args.rows_only:
                n = rq.fn(spark, args.sf_dir).count()
                dt = time.monotonic() - t0
                print(f"{name}: rows-only ran, {n} rows  ({dt:.1f}s)", flush=True)
                results[name] = {"status": "ran", "rows": n, "sec": round(dt, 2)}
            else:
                res = compare(name, rq.fn(spark, args.sf_dir), con, rq.oracle)
                dt = time.monotonic() - t0
                status = "ok" if res.ok else f"FAIL {res.detail}"
                print(
                    f"{name}: {status}, {res.spark_rows} rows  ({dt:.1f}s)",
                    flush=True,
                )
                results[name] = {
                    "status": "ok" if res.ok else "fail",
                    "detail": res.detail,
                    "rows": res.spark_rows,
                    "sec": round(dt, 2),
                }
                if not res.ok:
                    n_fail += 1
        except Exception as exc:  # noqa: BLE001 - sweep must report, not die
            dt = time.monotonic() - t0
            print(f"{name}: ERROR {type(exc).__name__}: {exc}  ({dt:.1f}s)", flush=True)
            results[name] = {"status": "error", "detail": str(exc)[:200]}
            n_fail += 1

    total_sec = sum(r.get("sec", 0) for r in results.values())
    summary = {
        "sf_dir": args.sf_dir,
        "n": len(results),
        "failures": n_fail,
        "total_sec": round(total_sec, 1),
    }
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
