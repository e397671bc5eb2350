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

``LAST_VERIFIED`` maps each query to the round of its most recent
first-party row (hash-green, or rows-only-ran for R-tier).

``CHANGED_IN`` marks queries whose Spark code or oracle text changed
MATERIALLY in a given round (ADVICE r06): when ``CHANGED_IN[name] >
LAST_VERIFIED[name]`` the recorded evidence no longer describes the
current text, so the query re-enters the window AHEAD of every
untouched entry.  Current members:

- **Round-8 duck_round users the r08 hand-list missed** (ADVICE r08):
  the r08 window was hand-listed from plan scans and omitted nine
  queries whose output goes through the round-8-changed ``duck_round``
  — a20 (observed-metrics projection), c01 (ROUND(percent_rank,6)),
  the e01/e02/e03/e04/e09/e11 streaming sums, and g13 (k-means inertia
  rounding).  Their r05-r07 evidence predates the round-8 text, so
  they lead the r09 window.  The marked set is now derived
  MECHANICALLY — ``round_mirror_users()`` below walks each registered
  callable's static call graph and source text; tests/
  test_registry_order.py asserts every user is either verified on
  post-fix text (``LAST_VERIFIED >= ROUND_MIRROR_CHANGED``) or marked
  here.
- **Three inline round-to-cents sites beyond even ADVICE's list**
  (e06, e10_batch_twin, f10), surfaced by the same mechanical scan —
  formula unchanged (see the CHANGED_IN comment) but re-proven once
  under the conservative re-verify policy.
- ``b38_sql_cte_chain`` @9: its inline SQL still carried the pre-fix
  ``FLOOR(y + 0.5)`` mirror (rounds up one ulp below a half-integer,
  loses the sign of -0.0); round 9 swept the round-8 exact-mirror fix
  into the SQL text (operators/relational.py).

After each round, fold the new CORRECTNESS greens in here (bump the
round number, drop satisfied CHANGED_IN markers) and update
tests/test_registry_order.py.  Source of truth:
CORRECTNESS_r0{1,2,3,5,6,7,8}.json, re-read 2026-08-14 (the fold is
machine-checked by test_last_verified_matches_correctness_artifacts).
"""

from __future__ import annotations

import types

# fmt: off
_R03 = (
    # CORRECTNESS_r03.json greens not re-proven since — the stalest
    # evidence in the registry, so they lead band 1 of the r09 window.
    "f07_arrow_udf", "f10_cogroup_in_pandas", "g01_dedup_exact",
    "g05_text_tokenize", "g05b_token_bpe", "g06_text_wordcount",
    "g08c_text_langid",
)
_R05 = (
    # CORRECTNESS_r05.json greens not re-proven since.
    "a23_schema_widening", "a24_sink_orc", "a25_scan_xml",
    "a26_scan_binaryfile", "b36_histogram", "b37_null_ordering",
    "b40_sort_limit_topk", "b41_topk_per_group", "b42_group_by_all",
    "b50_union_all", "b51_intersect", "b52_except",
    "b53_subquery_scalar", "b54_subquery_in",
    "b55_subquery_corr_exists", "b56_join_lateral",
    "d10_fn_decimal_interval", "g08d_text_fingerprint",
    "g09_multimodal_record", "g10_embed_join_docs",
    "g13_kmeans_iterations", "g14_text_clean", "g15_vocab_prune",
    "g17_text_bigrams", "g19_stratified_sample", "g22_corpus_split",
    "g24_pii_scrub", "g27_corpus_mixture",
)
_R06 = (
    # CORRECTNESS_r06.json greens not re-proven since.
    "a01_scan_parquet", "a02_scan_csv", "a03_scan_json",
    "a04_normalize_columns", "a05_apply_schema_cast",
    "a06_partition_derive", "a07_dedup_keep_latest",
    "a08_quality_nullcounts", "a09_sink_parquet_partitioned",
    "a10_compaction", "a11_catalog_sync", "a12_incremental_ingest",
    "a13_stream_ingest_foreachbatch", "a14_bad_records",
    "a16_partition_pruned_scan", "a17_dynamic_partition_overwrite",
    "a19_stream_upsert", "a20_observed_metrics", "a21_schema_evolution",
    "a22_versioned_snapshot", "a28_multi_format_union",
    "a29_scd2_dimension", "b02_filter_pred", "b03_distinct",
    "b10_join_inner", "b11_join_left", "b12_join_right_full",
    "b13_join_semi", "b14_join_anti", "b16_join_theta",
    "b17_join_range_interval", "b18_join_asof", "b19_join_cross",
    "b21_agg_having", "b22_agg_countdistinct", "b23_agg_approx_cd",
    "b24_agg_rollup", "c10_win_sessionize", "d13_fn_url",
    "g31_dedup_segments",
)
_R07 = (
    # CORRECTNESS_r07.json greens not re-proven since.
    "b26_agg_grouping_sets", "b29_agg_collect_sorted",
    "b30_agg_minmax_by", "b32_pivot", "b33_unpivot",
    "b34_sample_systematic", "c01_win_ranking", "c02_win_lag_lead",
    "c06_win_first_last", "c07_gapfill", "d01_fn_string", "d02_fn_date",
    "d06_fn_explode", "d07_fn_json", "d08_fn_struct", "d09_fn_variant",
    "d11_fn_bitwise", "e01_stream_tumbling", "e02_stream_sliding",
    "e03_stream_session", "e04_stream_watermark", "e05_stream_dedup",
    "e06_stream_stateful", "e07_stream_late_data",
    "e08_stream_stream_join", "e09_stream_static_join", "e10_batch_twin",
    "e11_stream_dedup_then_window", "e12_stream_outer_join",
    "f01_udf_python", "f08_multimodal_decode",
    "f09_multimodal_framesample", "g02c_dedup_simhash",
    "g25_sequence_pack",
)
_R08 = (
    # CORRECTNESS_r08.json — 45 hash-green + 5 R-tier rows-only ran
    # (g02b g02e g03c g03e g28, oracle=None by design); 0 failures.
    "a15_bucketed_join", "a18_python_datasource", "a27_scan_text",
    "b01_project_arith", "b15_join_broadcast", "b20_agg_groupby",
    "b25_agg_cube", "b27_agg_stats", "b28_agg_percentile",
    "b31_agg_salted_skew", "b35_join_salted_skew", "b38_sql_cte_chain",
    "c03_win_running_sum", "c04_win_moving_rows",
    "c05_win_range_interval", "c08_win_forward_fill",
    "c09_win_nth_trailing", "d03_fn_math", "d04_fn_cond", "d05_fn_array",
    "d12_fn_trig", "f02_pandas_udf_scalar", "f03_pandas_udf_grouped_agg",
    "f04_apply_in_pandas", "f05_map_in_pandas", "f06_udtf",
    "g02_dedup_near", "g02b_dedup_lsh", "g02d_dedup_ngram",
    "g02e_dedup_lsh_shingle", "g03_simsearch_topk", "g03b_simsearch_knn",
    "g03c_simsearch_lsh", "g03d_embed_neardup", "g03e_simsearch_ivf",
    "g04_centroids", "g07_text_tfidf", "g08_text_stats",
    "g08b_text_quality", "g11_events_user_join", "g12_contamination",
    "g16_event_funnel", "g18_embed_quantize", "g20_unigram_logprob",
    "g21_dedup_agreement", "g23_text_repetition", "g26_dedup_clusters",
    "g28_semantic_dedup", "g29_quality_gate", "g30_dedup_incremental",
)
# fmt: on

LAST_VERIFIED: dict[str, int] = {
    **{name: 3 for name in _R03},
    **{name: 5 for name in _R05},
    **{name: 6 for name in _R06},
    **{name: 7 for name in _R07},
    **{name: 8 for name in _R08},
}

# Queries whose Spark code or oracle text materially changed in the
# given round.  CHANGED_IN[name] > LAST_VERIFIED[name] => the recorded
# evidence predates the current text => band 0 (ADVICE r06).  Drop an
# entry once a later CORRECTNESS round re-proves the query.
# fmt: off
CHANGED_IN: dict[str, int] = {
    # duck_round users the r08 window missed (ADVICE r08) — text changed
    # in round 8, evidence is r05-r07; see module docstring.
    "a20_observed_metrics": 8, "c01_win_ranking": 8,
    "e01_stream_tumbling": 8, "e02_stream_sliding": 8,
    "e04_stream_watermark": 8,
    "e09_stream_static_join": 8, "e11_stream_dedup_then_window": 8,
    "g13_kmeans_iterations": 8,
    # round-9 TIME-HOSTILE corpus finds (scripts/make_adversarial_corpus
    # --time-hostile + tests/test_time_hostile.py) — the two SURVEY §7
    # hard-list risks that were in fact wrong, plus the pandas-boundary
    # crash and the span-proportional grid:
    # b18: strict `p.ts > e.ts` via RANGE -1µs frame (lag() matched the
    # TIED row on (user_id, ts) duplicates — sweep read 172 vs 166);
    # e03: oracle gap flag `>=` -> `>` (Spark session_window MERGES at
    # exactly last+gap — sweep read 535 vs 634);
    # e06: prune to (user_id, value) before applyInPandasWithState
    # (its deserializer forces timestamp[ns]; year-1500 ts crashed the
    # worker); c07/c08: distributed two-level year->hour grid, no
    # grid-side broadcast (grid is SPAN-proportional — 6.7M hours on
    # the hostile corpus hung the single-task sequence + broadcast).
    "b18_join_asof": 9, "e03_stream_session": 9, "c07_gapfill": 9,
    "c08_win_forward_fill": 9,
    # e08/e12: event-time validity gate (epoch-adjacent rows are born
    # late against the initial epoch-0 watermark; far-future clocks
    # poison it) — gate + mirrored oracle predicates;
    # f04's CHANGED_IN was already 9 (degenerate sweep) and its
    # round-9 text additionally prunes ts before the pandas boundary.
    "e08_stream_stream_join": 9, "e12_stream_outer_join": 9,
    # Inline round-to-cents sites surfaced by the round-9 MECHANICAL
    # derivation (round_mirror_users) that even ADVICE r08 missed.
    # Their formula did NOT change in round 8 — audited this round:
    # the naive floor(|v|*100 + 0.5) cents conversion is exact under
    # the events-table 2-decimal contract (|v|*100 lands within one
    # ulp of an integer, never near a half), same as f03's r08-green
    # cents step — but the policy re-proves every derived user on
    # post-change evidence once rather than hand-excluding them.
    # (e06/e10_batch_twin/f10 were 8 here; re-marked 9 below by the
    # adversarial audit's NULL-skipping cents fold.)
    # round-9 sweep of the exact std::round mirror into b38's inline
    # SQL text (was the pre-fix FLOOR(y + 0.5) form).
    "b38_sql_cte_chain": 9,
    # round-9 idiom normalization: d07's MapType access moved from
    # .getItem("k") to try_element_at (same NULL-on-missing value, new
    # plan text — VERDICT r08 demerit #2).
    "d07_fn_json": 9,
    # round-9 fuzz find: b27's corr hardened to safe_corr (plain F.corr
    # throws DIVIDE_BY_ZERO under ANSI on zero-variance groups; twin
    # marginals masked to the pairwise-complete row set).
    "b27_agg_stats": 9,
    # round-9 degenerate-data division sweep (the b27 find generalized;
    # tests/test_degenerate_groups.py): g16's conversion try_divide,
    # f04's z-score n=1/sd=0 NULL guard, b36's hi==lo bucket-0 CASE on
    # both engines.
    "g16_event_funnel": 9, "f04_apply_in_pandas": 9, "b36_histogram": 9,
    # round-9 empty-input audit (tests/test_empty_input.py): explicit-
    # schema read-back after partitioned writes (a09 a16 a17 + the
    # StagingPipeline sync behind a13) and the _doc_bitmaps vocab==0
    # floor (the 8 bitmap-dedup users, derived by the same static
    # reachability scan as round_mirror_users).
    "a09_sink_parquet_partitioned": 9, "a13_stream_ingest_foreachbatch": 9,
    "a16_partition_pruned_scan": 9, "a17_dynamic_partition_overwrite": 9,
    "g02_dedup_near": 9, "g02b_dedup_lsh": 9, "g02d_dedup_ngram": 9,
    "g02e_dedup_lsh_shingle": 9, "g12_contamination": 9,
    "g21_dedup_agreement": 9, "g26_dedup_clusters": 9,
    "g30_dedup_incremental": 9,
    # round-9 ADVERSARIAL-corpus audit (scripts/make_adversarial_corpus
    # + tests/test_adversarial_corpus.py): zero-norm cosine try_divide /
    # exclusion across the similarity family (g03*, g21, g28),
    # NULL-skipping SQL-SUM semantics in the pandas/state folds (e06,
    # e10_batch_twin, f03, f10), NULL-text guards in the UDTF and
    # multimodal encoders (f06, f08), f04's NULL-aware z-score moments,
    # try_parse_json in d09, and the NULL-/malformed-JSON-faithful
    # oracles of d07/d08/d09.
    "d08_fn_struct": 9, "d09_fn_variant": 9,
    "e06_stream_stateful": 9, "e10_batch_twin": 9,
    "f03_pandas_udf_grouped_agg": 9, "f06_udtf": 9,
    "f08_multimodal_decode": 9, "f10_cogroup_in_pandas": 9,
    "g03_simsearch_topk": 9, "g03b_simsearch_knn": 9,
    "g03c_simsearch_lsh": 9, "g03d_embed_neardup": 9,
    "g03e_simsearch_ivf": 9, "g28_semantic_dedup": 9,
}
# fmt: on

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
            (``CHANGED_IN`` newer than ``LAST_VERIFIED``: the round-8
            duck_round users the r08 window missed, plus the round-9
            hardening sweeps — SQL-mirror, degenerate-division,
            empty-input, adversarial-corpus, time-hostile).
            Alphabetical.
    Band 1: verified on current text — ordered by last-verified round
            ASCENDING (stalest evidence first), then name.  The r03
            pandas-UDF/text tail re-enters ahead of the r05 mass,
            which precedes r06/r07/r08 greens.
    ``has_oracle`` kept in the signature for call-site stability; both
    bands order hash tier and rows-only alike.
    """
    if changed_since_verified(name):
        return (0, 0, name)
    return (1, LAST_VERIFIED[name], name)
