#!/usr/bin/env python
"""Cross-SF scaling study: wall time per query at sf0.001/0.01/0.1 and
the 10x-data step ratio (sf0.01 -> sf0.1).

The bench gate proves the engine is fast at ONE scale; this study
probes the SHAPE of the cost curve, which is what survives a 100x
scale-up. Reading the ratio column:

  ~<= 1.5   fixed-overhead-dominated (session/streaming machinery) —
            the data term is not yet visible at these SFs;
  ~<= 11    at-most-linear in data (10x rows, ratio near 10 means the
            scan/shuffle term dominates and grows proportionally);
  >  13     SUPERLINEAR — a quadratic candidate-pair term, an
            iteration count growing with N, or a collapsing
            single-partition stage; investigate before trusting at
            scale.

Each (query, sf) cell is the MIN of --reps runs (min, not mean: the
study asks about the cost curve, and host-load noise only ever adds).
Usage: python scripts/scaling_study.py [--reps 2] [--queries a,b,...]
Prints one JSON line; the human table goes to stderr.
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

SF_DIRS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]

# bench.HEADLINE plus the iterative / banded heavy tail whose scaling
# shape matters most at 100 TB.
DEFAULT_QUERIES = [
    "b20_agg_groupby",
    "b10_join_inner",
    "b15_join_broadcast",
    "b18_join_asof",
    "b41_topk_per_group",
    "c03_win_running_sum",
    "c05_win_range_interval",
    "d05_fn_array",
    "g02_dedup_near",
    "g03b_simsearch_knn",
    "g05_text_tokenize",
    "g07_text_tfidf",
    "a09_sink_parquet_partitioned",
    "a15_bucketed_join",
    "e01_stream_tumbling",
    "e08_stream_stream_join",
    "g02d_dedup_ngram",
    "g31_dedup_segments",
    "e12_stream_outer_join",
    "d13_fn_url",
    # heavy tail beyond the bench headline
    "g02b_dedup_lsh",
    "g02c_dedup_simhash",
    "g26_dedup_clusters",
    "g28_semantic_dedup",
    "g13_kmeans_iterations",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    def _positive_int(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--reps must be >= 1")
        return n

    ap.add_argument("--reps", type=_positive_int, default=2)
    ap.add_argument("--queries", type=str, default="")
    args = ap.parse_args()
    names = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        if args.queries
        else DEFAULT_QUERIES
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        cores=cpus,
        shuffle_partitions=cpus,
        max_partition_bytes=fixture_split_bytes(),
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # Warm-up: JVM/codegen + the one-time streaming machinery, as bench
    # does, so the smallest SF's numbers aren't startup-polluted.
    from data_lake_staging_engine_spark.streaming.runner import landing_copy

    materialize(reg["b20_agg_groupby"].fn(spark, SF_DIRS[0][1]))
    landing_copy(spark, SF_DIRS[0][1], "events")
    reg["e01_stream_tumbling"].fn(spark, SF_DIRS[0][1]).count()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for sf_label, sf_dir in SF_DIRS:
            best = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                materialize(reg[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][sf_label] = round(best, 3)
            print(f"  {name} {sf_label}: {best:.3f}s", file=sys.stderr)

    table = []
    for name in names:
        r = results[name]
        ratio = round(r["sf0.1"] / r["sf0.01"], 2) if r["sf0.01"] > 0 else None
        table.append((name, r["sf0.001"], r["sf0.01"], r["sf0.1"], ratio))
    print(
        f"\n{'query':32s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
        f"{'x10 ratio':>9s}",
        file=sys.stderr,
    )
    for name, a, b, c, ratio in table:
        flag = "  <-- SUPERLINEAR" if ratio is not None and ratio > 13 else ""
        ratio_s = f"{ratio:9.2f}" if ratio is not None else f"{'n/a':>9s}"
        print(
            f"{name:32s} {a:8.3f} {b:8.3f} {c:8.3f} {ratio_s}{flag}",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "scaling_study", "reps": args.reps,
                      "results": results}))


if __name__ == "__main__":
    main()
