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
    ap.add_argument(
        "--sf-dirs",
        type=str,
        default="",
        help=(
            "comma-separated label=path overrides for the SF ladder, "
            "smallest first (e.g. sf0.1=/root/testdata/sf0.1,"
            "sf1=/tmp/sf1_replica built by make_replicated_copy.py); "
            "the ratio column is last-dir / second-to-last-dir — pass "
            "--step when that step is not the default 10x, or the "
            "SUPERLINEAR flag mislabels results"
        ),
    )
    ap.add_argument(
        "--step",
        type=float,
        default=10.0,
        help=(
            "data multiple between the last two SF dirs (default 10). "
            "The SUPERLINEAR flag fires at ratio > 1.3 * step — 13 for "
            "the default 10x ladder (ADVICE r12: the threshold derives "
            "from the step, not a constant)"
        ),
    )
    args = ap.parse_args()
    superlinear_at = 1.3 * args.step
    sf_dirs = SF_DIRS
    if args.sf_dirs:
        sf_dirs = []
        for spec in args.sf_dirs.split(","):
            label, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--sf-dirs entry {spec!r} is not label=path")
            sf_dirs.append((label.strip(), path.strip()))
        if len(sf_dirs) < 2:
            raise SystemExit("--sf-dirs needs at least two dirs for a ratio")
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

    materialize(reg["b20_agg_groupby"].fn(spark, sf_dirs[0][1]))
    landing_copy(spark, sf_dirs[0][1], "events")
    reg["e01_stream_tumbling"].fn(spark, sf_dirs[0][1]).count()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for sf_label, sf_dir in sf_dirs:
            best = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                materialize(reg[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][sf_label] = round(best, 3)
            print(f"  {name} {sf_label}: {best:.3f}s", file=sys.stderr)

    lo_label, hi_label = sf_dirs[-2][0], sf_dirs[-1][0]
    table = []
    for name in names:
        r = results[name]
        ratio = (
            round(r[hi_label] / r[lo_label], 2) if r[lo_label] > 0 else None
        )
        table.append((name, [r[lbl] for lbl, _ in sf_dirs], ratio))
    header = "".join(f"{lbl:>9s}" for lbl, _ in sf_dirs)
    print(f"\n{'query':32s}{header} {'step ratio':>10s}", file=sys.stderr)
    for name, cells, ratio in table:
        flag = (
            "  <-- SUPERLINEAR"
            if ratio is not None and ratio > superlinear_at
            else ""
        )
        cells_s = "".join(f"{v:9.3f}" for v in cells)
        ratio_s = f"{ratio:10.2f}" if ratio is not None else f"{'n/a':>10s}"
        print(f"{name:32s}{cells_s} {ratio_s}{flag}", file=sys.stderr)
    print(json.dumps({"metric": "scaling_study", "reps": args.reps,
                      "results": results}))


if __name__ == "__main__":
    main()
