#!/usr/bin/env python
"""Render the OPTIMIZATION_r16.md examination checklist.

Joins three evidence sources into one markdown table, one row per
registered query:

- seconds from a full-registry sweep run (scripts/sweep_bench.py with
  the r16 ``timings`` key — pass the captured JSON line's file),
- the plan-shape columns from PLANS.md (auto-generated per-query
  physical-plan audit),
- this round's per-query decision (changed / left alone + why),
  maintained in the DECISIONS/FAMILY_DEFAULTS maps below.

Usage: python scripts/gen_r16_checklist.py /tmp/sweep_r16.json
Prints markdown to stdout; OPTIMIZATION_r16.md includes the output.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_staging_engine_spark.registry import registry  # noqa: E402

# Queries restructured this round (ledger §1-§2; plan dumps in
# plans/r16/).  Everything else was examined and deliberately left
# alone — the table says why.
CHANGED = {
    "g02_dedup_near": "CHANGED §2: prefix-collision join SMJ -> size-gated BroadcastHashJoin (10x: 37-46 -> 11-14 s)",
    "g02b_dedup_lsh": "CHANGED §1: probe-side round-robin spread before the banding self-join; pre-verify distinct dropped (10x: 50.6 -> 6-12 s)",
    "g02d_dedup_ngram": "CHANGED §1+§2 (routes to banding at 10x): same spread + broadcast tiers (10x: 85-96 -> 52 s)",
    "g02e_dedup_lsh_shingle": "CHANGED §1: banding spread + no pre-verify distinct (10x: 100-104 -> 39-48 s); masks-inline on its verify tried and reverted (negative result, §2)",
    "g12_contamination": "CHANGED §2 via _jaccard_pairs: broadcast collision tier (10x: 38-41 -> 10-15 s)",
    "g21_dedup_agreement": "CHANGED §2 via _jaccard_pairs: broadcast collision tier (10x: 46-53 -> 23-28 s)",
    "g26_dedup_clusters": "CHANGED §2: masks-INLINE fused-verify tier feeds its rep graph (expand=False terminus; 10x: 48.5 -> 18-28 s)",
    "g30_dedup_incremental": "CHANGED §2: masks-INLINE tier — popcount verify fused into the collision join condition (plans/r16/g30_*.10x.txt; 10x: 39-42 -> 36-38 s)",
    "g32_dedup_band_probe": "CHANGED (r15 rep-space probe carried; §6 broadcast gate): probe O(batch), corpus-size-flat to 30x (BASELINE.md r16 curve)",
    "a14_bad_records": "CHANGED §4: R-tier -> hash tier via deterministic key-rule corruption (VERDICT r15 #5); sub-second 25-row ingest",
    "b20_agg_groupby": "measurement fix §3: untimed re-warm after the g32 index build de-positions it (1.2-1.9 s band restored); plan already minimal (partial agg + 1 exchange)",
}

# Family-level default decisions for queries left alone.  Wording is
# deliberate: each names the property that makes further optimization
# not worth a change at this scale, verified from PLANS.md + the sweep.
FAMILY_DEFAULTS = {
    "a": "left alone: staging/scan surface — scan-bounded, pruned ReadSchema/PushedFilters (PLANS.md), 0-1 exchanges; sink queries pay the write itself",
    "b": "left alone: relational surface — broadcast on the provably small side, partial map-side aggregation before the single exchange (PLANS.md row)",
    "c": "left alone: one partitionBy exchange + a single Window pass; no redundant second shuffle (PLANS.md)",
    "d": "left alone: pure projection packs — zero exchanges, one codegen span; scan-bounded (PLANS.md)",
    "e": "left alone: cost is the AvailableNow micro-batch drain machinery; state bounded by watermarks both sides (r15 verdict plan audit); emitted rows must stay batch-boundary-identical, so batching is pinned",
    "f": "left alone: Python-boundary surface — Arrow/pandas forms with select-before-UDF column pruning; per-task init amortized (guide §4.5)",
    "g": "left alone: explode+agg / broadcast-dim shapes in single codegen spans where eligible (PLANS.md); no pair explosion anywhere",
}

# Per-query overrides where the family default would be vague or the
# query has a deliberate, documented posture worth naming.
OVERRIDES = {
    "a31_versioned_compaction": "left alone after isolation (r16): sweep 40.8 s was cold-session + storm; isolated warm 12.9-13.0 s, split drain1 2 micro-batches / versioned compact / late drain — per-micro-batch streaming+publish machinery; maxFilesPerTrigger=1 IS the multi-committed-leaf scenario the query exists to prove, not a tunable",
    "a18_python_datasource": "left alone BY DESIGN: the declared Python DataSource API surface — the per-row Python reader is the API's cost; bounded fixture input",
    "g02c_dedup_simhash": "left alone after isolation (r16): 10.3-11.9 s warm = OUTPUT-bound — 4.41M distinct candidate pairs (35% of all doc pairs; corpus-correlated block collisions) from a 12.6M-row collision stream, sim+banding only 2.3 s; docstring already positions it as the unverified candidate GENERATOR, g02b/g02e are the recall-safe scale paths; rep-spacing the sig join would shave only the 2.9x key-duplication for real churn on an R-tier output",
    "g03d_embed_neardup": "left alone: threshold pairs over bounded anchors; norms precomputed map-side",
    "a09_sink_parquet_partitioned": "left alone: partitioned sink; output sizing via the staged coalesce; cost is the write (headline row, stable 1.0-1.3 s)",
    "a13_stream_ingest_foreachbatch": "left alone: the reference pipeline e2e; foreachBatch upsert, landing copy amortized via runner cache",
    "a15_bucketed_join": "left alone: bucketed co-located join — zero-exchange join is the point (headline row)",
    "a26_scan_binaryfile": "left alone: binaryFile ingest; opaque payload never crosses a shuffle",
    "b19_join_cross": "left alone: the DECLARED cartesian surface (125 rows, bounded)",
    "b31_agg_salted_skew": "left alone: IS the two-level salted aggregation pattern (guide §2.5)",
    "b35_join_salted_skew": "left alone: IS the salted-join pattern (guide §2.5); broadcast dims",
    "b36_histogram": "left alone: broadcast-bounds crossJoin is 1-row x N — bounded by construction",
    "e10_batch_twin": "left alone: batch twin of the env-gated e10 runtime; FlatMapGroupsInPandas with pruned input",
    "f01_udf_python": "left alone BY DESIGN: the declared row-at-a-time UDF surface; f02/f07 carry the vectorized twins (plan table pins BatchEvalPython vs ArrowEvalPython)",
    "f06_udtf": "left alone BY DESIGN: the declared UDTF surface (eval per row is the API's cost)",
    "f08_multimodal_decode": "left alone: Arrow mapInPandas decode, select-first pruning, decoder init once per task (guide §4.5)",
    "f08b_multimodal_quarantine": "left alone: quarantine-not-crash decode twin; same Arrow batch shape",
    "f09_multimodal_framesample": "left alone: 1:N frame expansion without a shuffle",
    "g03_simsearch_topk": "left alone: bounded 10-query-vector cross-score; norms precomputed map-side",
    "g03b_simsearch_knn": "left alone: broadcast brute-force KNN over bounded queries (headline row)",
    "g03c_simsearch_lsh": "left alone: hyperplane-LSH buckets — the designed sublinear path",
    "g03e_simsearch_ivf": "left alone: IVF inverted lists, nprobe-bounded candidates",
    "g04_centroids": "left alone: one exchange, map-side partial agg over exploded vectors",
    "g13_kmeans_iterations": "left alone: 2 Lloyd iterations, broadcast centroids, persisted input (value-pinned vs seeded NumPy)",
    "g19_stratified_sample": "left alone: digest-prefix rule — deterministic, layout-independent, no shuffle",
    "g22_corpus_split": "left alone: digest-prefix split, membership survives ingest; no shuffle",
    "g25_sequence_pack": "left alone: FFD-style packing via window over bounded capacity groups",
    "g28_semantic_dedup": "left alone: IVF-bucketed candidates -> in-bucket exact cosine; never all-pairs",
    "g31_dedup_segments": "left alone: segment digest dedup + reassembly, window-based (headline row, 1.0-1.2 s)",
}


def plan_rows() -> dict[str, str]:
    out: dict[str, str] = {}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    for line in open(path):
        m = re.match(r"\| `([a-z0-9_]+)` \| (.+) \|$", line.strip())
        if m:
            name = m.group(1)
            cells = [c.strip() for c in m.group(2).split(" | ")]
            if len(cells) == 5:
                scans, joins, shuffles, codegen, notable = cells
                out[name] = f"shuffles={shuffles}, joins={joins}, {notable}" if notable != "—" else f"shuffles={shuffles}, joins={joins}"
    return out


def main() -> None:
    sweep = json.load(open(sys.argv[1]))
    timings = sweep.get("parsed", sweep).get("timings") or sweep["timings"]
    plans = plan_rows()
    reg = registry()
    print("| query | sf0.1 sweep (s) | plan shape (PLANS.md) | decision |")
    print("| --- | --- | --- | --- |")
    for name in sorted(reg):
        t = timings.get(name)
        tcell = f"{t:.2f}" if t is not None else "—"
        decision = CHANGED.get(name) or OVERRIDES.get(name) or FAMILY_DEFAULTS[name[0]]
        print(f"| `{name}` | {tcell} | {plans.get(name, 'executes-internally')} | {decision} |")


if __name__ == "__main__":
    main()
