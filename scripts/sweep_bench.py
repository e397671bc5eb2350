#!/usr/bin/env python
"""Full-registry sweep bench (VERDICT r03 #5, made repeatable).

Runs EVERY registered query at $SPARK_GRAFT_SF_DIR (default sf0.1) in
one warmed session with the noop sink — the hygiene measurement that
catches in-sweep inflation (accumulated streaming state, sink leaks)
that per-query benches hide. Prints one JSON line:

  {"metric": "sweep_total", "value": N, "unit": "sec", "n_queries": Q,
   "failures": [...], "slow_tail": {name: sec for entries >= 5 s},
   "dist": {"lt1": a, "1to5": b, "5to10": c, "ge10": d}, "sf": 0.1}
"""

from __future__ import annotations

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(
        cores=cpus,
        shuffle_partitions=cpus,
        max_partition_bytes=fixture_split_bytes(),
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # Same warm-up as bench.py: JVM/codegen + streaming fixed costs.
    from data_lake_staging_engine_spark.streaming.runner import landing_copy

    reg["b20_agg_groupby"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    landing_copy(spark, sf_dir, "events")
    smoke_dir = os.path.join(os.path.dirname(os.path.abspath(sf_dir)), "sf0.001")
    if os.path.isdir(smoke_dir):
        reg["e01_stream_tumbling"].fn(spark, smoke_dir).count()
        # The sweep order runs the never-driver-verified LSH/dedup
        # family FIRST (evidence policy), so without this the wide
        # bitmap/minhash codegen compile lands in the first timed
        # entries (measured +50-150% on g02b/c/d/e cold). Warm it at
        # the smoke SF — same plan shapes, trivial data.
        reg["g02d_dedup_ngram"].fn(spark, smoke_dir).count()
        reg["g02b_dedup_lsh"].fn(spark, smoke_dir).count()

    timings: dict[str, float] = {}
    failures: list[str] = []
    for name in sorted(reg):
        t0 = time.perf_counter()
        try:
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # record, keep sweeping
            failures.append(f"{name}: {type(e).__name__}")
        timings[name] = round(time.perf_counter() - t0, 3)

    vals = list(timings.values())
    print(
        json.dumps(
            {
                "metric": "sweep_total",
                "value": round(sum(vals), 3),
                "unit": "sec",
                "n_queries": len(timings),
                "failures": failures,
                "slow_tail": {
                    n: t
                    for n, t in sorted(
                        timings.items(), key=lambda kv: -kv[1]
                    )
                    if t >= 5.0
                },
                # full per-query table (r16): the optimization round's
                # examined-every-operator checklist reads seconds off
                # this dump instead of re-timing queries one by one.
                "timings": timings,
                "dist": {
                    "lt1": sum(v < 1 for v in vals),
                    "1to5": sum(1 <= v < 5 for v in vals),
                    "5to10": sum(5 <= v < 10 for v in vals),
                    "ge10": sum(v >= 10 for v in vals),
                },
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
