"""Which queries have first-party driver CORRECTNESS evidence, and when.

The driver's per-round sweep writes at most 50 rows to
``CORRECTNESS_r{N}.json`` and iterates ``__spark_entry__.queries()`` in
insertion order — so registry ordering IS evidence policy.

History of the window rotation:

- r01/r02 both burned all 50 slots on the alphabetical prefix
  (a01..b34; a14/b23 ran rows-only, the rest hash-green twice).
- r03 swept 49 c..g queries green; d10_fn_decimal_interval hash-failed
  (DecimalType canonicalization, fixed round 4 at the emit boundary).
- r04 ended without a driver correctness run (no CORRECTNESS_r04).
- r05 swept the remaining 50 never-verified entries — 40 hash-green,
  10 R-tier rows-only ran, 0 failures; d10's retry is green.
- r06 led with the 10 never-verified entries and re-proved the stalest
  r02-era prefix (a01..b24).  0 failures.  Every registered query now
  has driver evidence.
- r07 led with the 13-member changed-since-verified band and re-proved
  the b25..b34 r02 tail plus the stalest r03 entries.  0 failures.
- r08 led with the 47-member round-8 changed band (the duck_round
  std::round fix + a27 ``F.get`` + g26/g28 checkpoint release) and the
  3 stalest r03 entries (f04 f05 f06) — 45 hash-green, 5 R-tier
  rows-only ran (g02b g02e g03c g03e g28), 0 failures.
- r09 executed the changed-first policy exactly: the 41-member round-9
  hardening band (time-hostile/degenerate/empty-input/adversarial
  sweeps) + 6 r03 + 3 r05 stalest — 44 hash-green, 6 R-tier rows-only
  ran (g02b g02e g03c g03e g13 g28), 0 failures.  Every CHANGED_IN
  marker was satisfied, so the r10 fold drained the band to empty and
  the window finally rotates onto the stale r03/r05/r06 mass.
- r10 drained the ENTIRE r03/r05 backlog plus all 13 round-10
  CHANGED_IN markers in one 50-row window — all clean (no R-tier
  entries landed in this window), 0 failures.  Oldest remaining
  evidence after the fold: r06 (25 names).
- r11 led with the six round-11 changed markers (the kill/restart +
  ADVICE-r10 band) and drained the whole r06 band plus the full r07
  band and part of r08 — 47 hash-green, 3 R-tier rows-only ran (a14
  b23 g02c), 0 failures.  Oldest remaining evidence after the fold:
  r08 (27 names), which led the r12 window.
- r12 led with the nine round-12 changed markers (pipeline guards,
  VersionedTable, the near-dup strategy rebuild, the g28 IVF scaling
  fix) and drained the whole r08 band plus the oldest r09 entries —
  49 hash-green, 1 R-tier rows-only ran (g28), 0 failures.  Oldest
  remaining evidence after the fold: r09 (21 names — the whole
  f03-f10 UDF family and the ANN/dedup scale paths), which leads the
  r13 window.
- r13 led with the 24 round-13 changed markers (the 'auto'
  shuffle-partitions fallback, the fs-backend lift, the g32 banding
  factor-out) plus the three new operators and drained the whole r09
  band — 44 hash-green, 6 R-tier rows-only ran (g02b g02e g03c g03e
  g13 g32), 0 failures.  Oldest remaining evidence after the fold:
  r10 (29 names — the b40-b56 relational tail, d07/d09/d10, a25/a26,
  and the g06-g27 text/corpus singles), which leads the r14 window.
- r14 led with the six round-14 changed markers (versioned
  compaction, persisted band index, quarantine observe, SimHash
  re-band) plus the new a31 operator and drained the whole r10 band —
  47 hash-green, 3 R-tier rows-only ran (g02c g32 a14), 0 failures.
  Oldest remaining evidence after the fold: r11 (29 names — the
  b14-b34 relational middle, the c-window singles, d01/d02/d06/d11/
  d13, f01/f09, g01/g25/g31), which leads the r15 window.
- r15 led with the nine round-15 changed markers (the rep-space
  dedup rework: publish CAS, band-index params, rep banding/probe/
  components) and drained the whole r11 band plus the oldest r12
  entries — 46 hash-green, 4 R-tier rows-only ran (b23 g02b g02e
  g32), 0 failures.  All markers satisfied; oldest remaining
  evidence after the fold: r12 (26 names — the window/function
  singles plus g04/g07-g08b/g11/g18/g20/g23/g28/g29), which leads
  the r16 window behind the round-16 changed band below.
- r16 led with the twelve round-16 changed markers (collision-free
  publish dirs, the a14 hash-tier upgrade, the banding/collision-join
  optimization band) and drained the whole r12 band plus the oldest
  r13 entries — 46 hash-green, 4 R-tier rows-only ran (g02b g02e g28
  g32), 0 failures.  All markers satisfied; oldest remaining
  evidence after the fold: r13 (26 names — the e-stream family,
  f03-f10, the g03 ANN family, g05/g05b/g13/g16), which leads the
  r17 window behind the round-17 changed band below.

``LAST_VERIFIED`` maps each query to the round of its most recent
first-party row (hash-green, or rows-only-ran for R-tier).

``CHANGED_IN`` marks queries whose Spark code or oracle text changed
MATERIALLY in a given round (ADVICE r06): when ``CHANGED_IN[name] >
LAST_VERIFIED[name]`` the recorded evidence no longer describes the
current text, so the query re-enters the window AHEAD of every
untouched entry.  Members are the queries the current round's work
actually touched (added commit-by-commit as the edits land); all five
round-14 markers were satisfied by CORRECTNESS_r14 and dropped in the
r15 fold.

The mechanical backstop remains: ``round_mirror_users()`` below walks
each registered callable's static call graph and source text for the
cross-engine rounding mirror; tests/test_registry_order.py asserts
every user is either verified on post-fix text (``LAST_VERIFIED >=
ROUND_MIRROR_CHANGED``) or marked here.

After each round, fold the new CORRECTNESS greens in here (bump the
round number, drop satisfied CHANGED_IN markers) and update
tests/test_registry_order.py.  ``scripts/fold_evidence.py`` prints the
ready-to-paste bands.  Source of truth:
CORRECTNESS_r{01,02,03,05,06,07,08,09,10,11,12,13,14,15,16}.json,
folded 2026-08-18 at round-17 entry (the fold is machine-checked by
test_last_verified_matches_correctness_artifacts).
"""

from __future__ import annotations

import types

# fmt: off
_R13 = (  # CORRECTNESS_r13.json greens not re-proven since — the
    # stalest evidence in the registry; they lead band 1 of the r17
    # window.
    "e01_stream_tumbling", "e02_stream_sliding", "e03_stream_session",
    "e04_stream_watermark", "e05_stream_dedup", "e06_stream_stateful",
    "e08_stream_stream_join", "e09_stream_static_join", "e10_batch_twin",
    "e11_stream_dedup_then_window", "e12_stream_outer_join",
    "f03_pandas_udf_grouped_agg", "f04_apply_in_pandas", "f06_udtf",
    "f07_arrow_udf", "f08_multimodal_decode", "f10_cogroup_in_pandas",
    "g03_simsearch_topk", "g03b_simsearch_knn", "g03c_simsearch_lsh",
    "g03d_embed_neardup", "g03e_simsearch_ivf", "g05_text_tokenize",
    "g05b_token_bpe", "g13_kmeans_iterations", "g16_event_funnel",
)
_R14 = (  # CORRECTNESS_r14.json greens not re-proven since.
    "a11_catalog_sync", "a12_incremental_ingest",
    "a13_stream_ingest_foreachbatch", "a15_bucketed_join",
    "a18_python_datasource", "a19_stream_upsert", "a21_schema_evolution",
    "a25_scan_xml", "a26_scan_binaryfile", "a28_multi_format_union",
    "a29_scd2_dimension", "b02_filter_pred", "b03_distinct",
    "b10_join_inner", "b11_join_left", "b12_join_right_full",
    "b13_join_semi", "b18_join_asof", "b37_null_ordering",
    "b40_sort_limit_topk", "b41_topk_per_group", "b42_group_by_all",
    "b50_union_all", "b51_intersect", "b52_except", "b53_subquery_scalar",
    "b54_subquery_in", "b55_subquery_corr_exists", "b56_join_lateral",
    "d07_fn_json", "d09_fn_variant", "d10_fn_decimal_interval",
    "f08b_multimodal_quarantine", "g02c_dedup_simhash",
    "g06_text_wordcount", "g08c_text_langid", "g08d_text_fingerprint",
    "g09_multimodal_record", "g10_embed_join_docs", "g14_text_clean",
    "g15_vocab_prune", "g17_text_bigrams", "g19_stratified_sample",
    "g22_corpus_split", "g24_pii_scrub", "g27_corpus_mixture",
)
_R15 = (  # CORRECTNESS_r15.json greens not re-proven since.
    "a09_sink_parquet_partitioned", "a16_partition_pruned_scan",
    "a17_dynamic_partition_overwrite", "a20_observed_metrics",
    "a27_scan_text", "b01_project_arith", "b14_join_anti",
    "b15_join_broadcast", "b16_join_theta", "b17_join_range_interval",
    "b19_join_cross", "b20_agg_groupby", "b21_agg_having",
    "b22_agg_countdistinct", "b23_agg_approx_cd", "b24_agg_rollup",
    "b25_agg_cube", "b26_agg_grouping_sets", "b27_agg_stats",
    "b28_agg_percentile", "b29_agg_collect_sorted", "b30_agg_minmax_by",
    "b31_agg_salted_skew", "b32_pivot", "b33_unpivot",
    "b34_sample_systematic", "c02_win_lag_lead", "c06_win_first_last",
    "c08_win_forward_fill", "c10_win_sessionize", "d01_fn_string",
    "d02_fn_date", "d06_fn_explode", "d11_fn_bitwise", "d13_fn_url",
    "e07_stream_late_data", "f01_udf_python", "f09_multimodal_framesample",
    "g01_dedup_exact", "g25_sequence_pack", "g31_dedup_segments",
)
_R16 = (  # CORRECTNESS_r16.json — 50-row window, 46 hash-green + 4
    # R-tier rows-only (g02b g02e g28 g32); led with the twelve
    # round-16 changed markers, then the whole r12 band and the oldest
    # r13 entries; all markers satisfied, band drained.
    "a01_scan_parquet", "a02_scan_csv", "a03_scan_json",
    "a04_normalize_columns", "a05_apply_schema_cast",
    "a06_partition_derive", "a07_dedup_keep_latest",
    "a08_quality_nullcounts", "a10_compaction", "a14_bad_records",
    "a22_versioned_snapshot", "a23_schema_widening", "a24_sink_orc",
    "a30_landing_reconcile", "a31_versioned_compaction",
    "b35_join_salted_skew", "b36_histogram", "b38_sql_cte_chain",
    "c01_win_ranking", "c03_win_running_sum", "c04_win_moving_rows",
    "c05_win_range_interval", "c07_gapfill", "c09_win_nth_trailing",
    "d03_fn_math", "d04_fn_cond", "d05_fn_array", "d08_fn_struct",
    "d12_fn_trig", "f02_pandas_udf_scalar", "f05_map_in_pandas",
    "g02_dedup_near", "g02b_dedup_lsh", "g02d_dedup_ngram",
    "g02e_dedup_lsh_shingle", "g04_centroids", "g07_text_tfidf",
    "g08_text_stats", "g08b_text_quality", "g11_events_user_join",
    "g12_contamination", "g18_embed_quantize", "g20_unigram_logprob",
    "g21_dedup_agreement", "g23_text_repetition", "g26_dedup_clusters",
    "g28_semantic_dedup", "g29_quality_gate", "g30_dedup_incremental",
    "g32_dedup_band_probe",
)
# fmt: on

LAST_VERIFIED: dict[str, int] = {
    **{name: 13 for name in _R13},
    **{name: 14 for name in _R14},
    **{name: 15 for name in _R15},
    **{name: 16 for name in _R16},
}

# Queries whose Spark code or oracle text materially changed in the
# given round.  CHANGED_IN[name] > LAST_VERIFIED[name] => the recorded
# evidence predates the current text => band 0 (ADVICE r06).  Drop an
# entry once a later CORRECTNESS round re-proves the query.
CHANGED_IN: dict[str, int] = {
    # All twelve round-16 markers were satisfied by CORRECTNESS_r16
    # and dropped in the r17 fold.  Round-17 (second optimization
    # round) edits add their markers below as they land.
    #
    # _bitmap_vocab's exact size now rides the vocab checkpoint as an
    # observed metric (one fewer job per strategy-routed dedup
    # invocation) and _minhash_lsh_neardup's n_reps rides the d2r
    # checkpoint the same way — executed text of every strategy-core
    # user changed.
    "g02_dedup_near": 17,
    "g02b_dedup_lsh": 17,
    "g02d_dedup_ngram": 17,
    "g02e_dedup_lsh_shingle": 17,
    "g12_contamination": 17,
    "g26_dedup_clusters": 17,
    "g30_dedup_incremental": 17,
    "g32_dedup_band_probe": 17,
    # g21: the two embedding lookups share one projection, the dim
    # probe is NULL-safe, and the broadcast gate drops to 32 MB
    # (ADVICE r16 both items).
    "g21_dedup_agreement": 17,
    # g02c: the Manku Hamming verify (bit_count(xor) <= 8) rides the
    # collision join — OUTPUT changed (R-tier; VERDICT r16 #5 ordered
    # the re-band; recall floor re-measured 0.92/0.9219).
    "g02c_dedup_simhash": 17,
    # run_to_memory freezes the sink JVM-side (localCheckpoint)
    # instead of the collect+createDataFrame Python round-trip —
    # executed text of every run_to_memory streaming query changed.
    # (e10_transform_with_state shares the change but is env-gated/
    # never-verified, so it carries no marker by the band-0 rule.)
    "e01_stream_tumbling": 17,
    "e02_stream_sliding": 17,
    "e03_stream_session": 17,
    "e04_stream_watermark": 17,
    "e05_stream_dedup": 17,
    "e06_stream_stateful": 17,
    "e07_stream_late_data": 17,
    "e08_stream_stream_join": 17,
    "e09_stream_static_join": 17,
    "e11_stream_dedup_then_window": 17,
    "e12_stream_outer_join": 17,
    # g03e/g28: map-only centroid assignment (the k x N row_number
    # windows replaced by an in-row comparator sort against a one-row
    # broadcast codebook) + the normalized working set materialized
    # once (g28's k-sizing count observe-fused onto it) — outputs
    # proven byte-identical at sf0.001/0.01/0.1, but the executed
    # text changed materially.
    "g03e_simsearch_ivf": 17,
    "g28_semantic_dedup": 17,
    # f10: the customer side's c_custkey < 200 predicate applied
    # transitively to the events scan before the cogroup (Spark cannot
    # infer a filter across the opaque pandas function) — output proven
    # byte-identical at sf0.001/0.01/0.1 and oracle-green, but the
    # executed text changed materially.
    "f10_cogroup_in_pandas": 17,
}

# Convenience view: every query with any first-party driver evidence.
DRIVER_VERIFIED: frozenset[str] = frozenset(LAST_VERIFIED)

# Round of the most recent change to the cross-engine round-mirror
# formula (functions.determinism.duck_round and its twins).  When the
# formula changes again, bump this — test_registry_order then forces
# every mechanically-derived user to re-enter the sweep window.
ROUND_MIRROR_CHANGED = 8

# Names whose presence in a callable's static call graph marks it a
# round-mirror user: the JVM-side mirror + its aggregation wrappers and
# the Python scalar twin used by the UDF family.
_ROUND_MIRROR_NAMES = frozenset(
    {"duck_round", "dec_sum", "dec_sum_expr", "_pyduck_round"}
)
_PKG_PREFIX = "data_lake_staging_engine_spark"


def _code_names(code: types.CodeType) -> set[str]:
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _reaches_round_mirror(fn, _seen=None) -> bool:
    """Static reachability from ``fn`` to a round-mirror symbol.

    BFS over co_names through module globals, restricted to functions
    defined in this package — no Spark session needed, and streaming
    queries (whose returned DataFrame's plan is a memory-sink
    LocalRelation that hides the expression) are caught the same way as
    batch ones.  Over-approximation is fine: a false positive only
    re-proves a query one round early.
    """
    seen = set() if _seen is None else _seen
    if fn in seen:
        return False
    seen.add(fn)
    code = getattr(fn, "__code__", None)
    if code is None:
        return False
    names = _code_names(code)
    if names & _ROUND_MIRROR_NAMES:
        return True
    glb = getattr(fn, "__globals__", {})
    for n in names:
        obj = glb.get(n)
        if (
            isinstance(obj, types.FunctionType)
            and obj.__module__.startswith(_PKG_PREFIX)
            and _reaches_round_mirror(obj, seen)
        ):
            return True
    return False


def _embeds_round_mirror_text(fn) -> bool:
    """Inline-twin detector: the callable's own source embeds a
    round-mirror formula the call graph can't see — a numpy/math
    reimplementation inside a pandas UDF (f02/f03) or a SQL-text
    FLOOR/0.5 mirror (b38, g18).  Both engines must change such sites
    in lock-step, so they are users for evidence policy."""
    import inspect
    import re

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return False
    return bool(re.search(r"(?i)floor", src)) and "0.5" in src


def round_mirror_users(callables: dict[str, object]) -> set[str]:
    """Mechanically derive the round-mirror user set (ADVICE r08) from a
    ``{name: callable}`` mapping — call-graph reachability plus the
    inline source scan.  Replaces the hand-listed CHANGED_IN band that
    missed nine users in round 8."""
    return {
        name
        for name, fn in callables.items()
        if _reaches_round_mirror(fn) or _embeds_round_mirror_text(fn)
    }


def changed_since_verified(name: str) -> bool:
    """True when the query's text is newer than its driver evidence."""
    last = LAST_VERIFIED.get(name)
    return last is None or CHANGED_IN.get(name, 0) > last


def sweep_rank(name: str, has_oracle: bool) -> tuple[int, int, str]:
    """Sort key putting the most evidence-starved queries first.

    Band 0: evidence does not describe the current text — either never
            driver-verified (none today) or changed-since-verified
            (``CHANGED_IN`` newer than ``LAST_VERIFIED``).
            Alphabetical.
    Band 1: verified on current text — ordered by last-verified round
            ASCENDING (stalest evidence first), then name.  After the
            r16 fold the r12 band re-enters ahead of the r13 mass,
            which precedes r14/r15 greens.
    ``has_oracle`` kept in the signature for call-site stability; both
    bands order hash tier and rows-only alike.
    """
    if changed_since_verified(name):
        return (0, 0, name)
    return (1, LAST_VERIFIED[name], name)
