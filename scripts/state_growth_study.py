#!/usr/bin/env python
"""Streaming state growth study (VERDICT r12 #8).

The batch operators have measured 10x curves (scaling_study.py); the
stateful streaming family did not — and state is exactly what breaks
first at 100 TB event volumes (store size, per-batch commit cost,
drain time).  For each stateful query and each SF dir of a ladder,
under each state-store provider, this records:

- drain wall-clock (AvailableNow over the landing),
- max ``numRowsTotal`` across the drain's progress events (the state
  row count the store actually held),
- on-disk state dir bytes at drain end (HDFS-store delta files vs
  RocksDB SSTs+changelog — measured before the checkpoint is
  released, via streaming.runner.LAST_RUN_STATS).

Queries: e03 (session windows), e06 (applyInPandasWithState fold),
e08 (stream-stream interval join), e12 (stream-stream OUTER join) —
the four whose state the round-12 verdict called unmeasured.

Usage:
    python scripts/make_replicated_copy.py /root/testdata/sf0.1 \
        /tmp/sf1_replica --copies 10
    python scripts/state_growth_study.py \
        --sf-dirs sf0.1=/root/testdata/sf0.1,sf1=/tmp/sf1_replica

Prints one JSON line; human table to stderr.  Round-13 numbers live
in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_staging_engine_spark.registry import registry  # noqa: E402
from data_lake_staging_engine_spark.session import (  # noqa: E402
    fixture_split_bytes,
    get_spark,
)
from data_lake_staging_engine_spark.streaming import runner  # noqa: E402

QUERIES = [
    "e03_stream_session",
    "e06_stream_stateful",
    "e08_stream_stream_join",
    "e12_stream_outer_join",
]

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        type=str,
        default="sf0.1=/root/testdata/sf0.1,sf1=/tmp/sf1_replica",
        help="comma-separated label=path ladder, smallest first",
    )
    ap.add_argument(
        "--providers", type=str, default="hdfs,rocksdb",
        help="state-store providers to sweep (hdfs,rocksdb)",
    )
    args = ap.parse_args()
    sf_dirs = []
    for spec in args.sf_dirs.split(","):
        label, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--sf-dirs entry {spec!r} is not label=path")
        sf_dirs.append((label.strip(), path.strip()))
    providers = [p.strip() for p in args.providers.split(",") if p.strip()]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        cores=cpus,
        shuffle_partitions=cpus,
        max_partition_bytes=fixture_split_bytes(),
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    results: dict[str, dict] = {}
    for provider in providers:
        if provider == "rocksdb":
            spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
        else:
            spark.conf.unset(_PROVIDER_KEY)
        for name in QUERIES:
            for label, sf_dir in sf_dirs:
                t0 = time.perf_counter()
                n = reg[name].fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                if runner.LAST_RUN_STATS is None:
                    # ADVICE r13: a broken stats capture must not pass
                    # as a measured zero — say so on the results row.
                    print(
                        f"  WARNING: {name} [{provider}] {label}: "
                        "LAST_RUN_STATS is None (stats capture failed); "
                        "state_rows/state_bytes below are UNMEASURED",
                        file=sys.stderr,
                    )
                stats = runner.LAST_RUN_STATS or {}
                row = {
                    "drain_s": round(dt, 2),
                    "rows_out": n,
                    "state_rows": stats.get("state_rows"),
                    "state_bytes": stats.get("state_dir_bytes"),
                    "batches": stats.get("batches"),
                }
                results[f"{name}|{provider}|{label}"] = row
                print(
                    f"  {name} [{provider}] {label}: {dt:.1f}s "
                    f"out={n} state_rows={row['state_rows']} "
                    f"state_bytes={row['state_bytes']}",
                    file=sys.stderr,
                )
    spark.conf.unset(_PROVIDER_KEY)
    print(json.dumps({"metric": "state_growth_study", "results": results}))


if __name__ == "__main__":
    main()
