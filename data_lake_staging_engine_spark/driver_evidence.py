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
- r06 led with the 10 never-verified entries (a28 a29 c09 c10 d12 d13
  e12 g29 g30 g31 — all hash-green first try) and spent the 40 spare
  slots on the stalest r02-era prefix (a01..b24; a14/b23 rows-only by
  design).  0 failures.  Every registered query now has driver
  evidence.
- r07 led with the 13-member changed-since-verified band (d11 e02 e07
  e12 f08 f09 g02b g02c g02e g03c g25 g26 g28 — all proven on current
  text: 45 of the 50 rows hash-green, 5 R-tier rows-only ran) and
  re-proved the b25..b34 r02 tail plus the stalest r03 entries
  (c01-c08, d01-d09, most of the e-family, f01).  0 failures.

``LAST_VERIFIED`` maps each query to the round of its most recent
first-party row (hash-green, or rows-only-ran for R-tier).

``CHANGED_IN`` marks queries whose Spark code or oracle text changed
MATERIALLY in a given round (ADVICE r06): when ``CHANGED_IN[name] >
LAST_VERIFIED[name]`` the recorded evidence no longer describes the
current text, so the query re-enters the window AHEAD of every
untouched entry.  Current members (all round-8 edits; 47 — they fill
the r08 window with 3 spare slots for the stalest r03 tail):

- The **duck_round std::round fix** (the bulk): ``floor(|x*p| + 0.5)``
  rounds UP when ``|x*p|`` sits one ulp below a half-integer, where
  DuckDB's std::round truncates — found by a targeted probe, fixed by
  splitting the integer part before the fraction compare
  (functions/determinism.py; Python/numpy twins in udfs.py f02/f03).
  Every query whose analyzed plan contains the round pattern (42) plus
  the two UDF-internal users (f02 f03) is marked.  The fix is
  value-identical on ALL fixture data — re-proven this round by full
  oracle parity at sf0.01 (159/159), cross-SF at sf0.001 (150/150),
  and the sf0.1 sweep — the divergence class is measure-zero and now
  fuzz-pinned (test_fuzz_duck_round + @example pins).
- ``a27_scan_text`` — tab-split projection moved from ``.getItem`` to
  ``F.get`` (ANSI empty-split hardening, VERDICT r07 #2).
- ``g26_dedup_clusters`` / ``g28_semantic_dedup`` — the components
  delta-iteration no longer checkpoints the frontier and releases
  superseded per-round checkpoints (ADVICE r07; same fixpoint, new
  execution path).

After each round, fold the new CORRECTNESS greens in here (bump the
round number, drop satisfied CHANGED_IN markers) and update
tests/test_registry_order.py.  Source of truth:
CORRECTNESS_r0{1,2,3,5,6,7}.json, re-read 2026-08-14.
"""

from __future__ import annotations

# fmt: off
_R03 = (
    # CORRECTNESS_r03.json greens not re-proven since: the pandas-UDF
    # family and the oldest text/sim entries — the stalest evidence in
    # the registry, so they lead the r08 window (VERDICT r07 #2).
    "f02_pandas_udf_scalar", "f03_pandas_udf_grouped_agg",
    "f04_apply_in_pandas", "f05_map_in_pandas", "f06_udtf",
    "f07_arrow_udf", "f10_cogroup_in_pandas", "g01_dedup_exact",
    "g02_dedup_near", "g02d_dedup_ngram", "g03_simsearch_topk",
    "g03b_simsearch_knn", "g03d_embed_neardup", "g04_centroids",
    "g05_text_tokenize", "g05b_token_bpe", "g06_text_wordcount",
    "g07_text_tfidf", "g08_text_stats", "g08b_text_quality",
    "g08c_text_langid",
)
_R05 = (
    # CORRECTNESS_r05.json greens not re-proven since.
    "a23_schema_widening", "a24_sink_orc", "a25_scan_xml",
    "a26_scan_binaryfile", "a27_scan_text", "b35_join_salted_skew",
    "b36_histogram", "b37_null_ordering", "b38_sql_cte_chain",
    "b40_sort_limit_topk", "b41_topk_per_group", "b42_group_by_all",
    "b50_union_all", "b51_intersect", "b52_except",
    "b53_subquery_scalar", "b54_subquery_in",
    "b55_subquery_corr_exists", "b56_join_lateral",
    "d10_fn_decimal_interval", "g03e_simsearch_ivf",
    "g08d_text_fingerprint", "g09_multimodal_record",
    "g10_embed_join_docs", "g11_events_user_join", "g12_contamination",
    "g13_kmeans_iterations", "g14_text_clean", "g15_vocab_prune",
    "g16_event_funnel", "g17_text_bigrams", "g18_embed_quantize",
    "g19_stratified_sample", "g20_unigram_logprob",
    "g21_dedup_agreement", "g22_corpus_split", "g23_text_repetition",
    "g24_pii_scrub", "g27_corpus_mixture",
)
_R06 = (
    # CORRECTNESS_r06.json greens not re-proven since (e12 moved to r07).
    "a01_scan_parquet", "a02_scan_csv", "a03_scan_json",
    "a04_normalize_columns", "a05_apply_schema_cast",
    "a06_partition_derive", "a07_dedup_keep_latest",
    "a08_quality_nullcounts", "a09_sink_parquet_partitioned",
    "a10_compaction", "a11_catalog_sync", "a12_incremental_ingest",
    "a13_stream_ingest_foreachbatch", "a14_bad_records",
    "a15_bucketed_join", "a16_partition_pruned_scan",
    "a17_dynamic_partition_overwrite", "a18_python_datasource",
    "a19_stream_upsert", "a20_observed_metrics", "a21_schema_evolution",
    "a22_versioned_snapshot", "a28_multi_format_union",
    "a29_scd2_dimension", "b01_project_arith", "b02_filter_pred",
    "b03_distinct", "b10_join_inner", "b11_join_left",
    "b12_join_right_full", "b13_join_semi", "b14_join_anti",
    "b15_join_broadcast", "b16_join_theta", "b17_join_range_interval",
    "b18_join_asof", "b19_join_cross", "b20_agg_groupby",
    "b21_agg_having", "b22_agg_countdistinct", "b23_agg_approx_cd",
    "b24_agg_rollup", "c09_win_nth_trailing", "c10_win_sessionize",
    "d12_fn_trig", "d13_fn_url", "g29_quality_gate",
    "g30_dedup_incremental", "g31_dedup_segments",
)
_R07 = (
    # CORRECTNESS_r07.json — 45 hash-green + 5 R-tier rows-only ran
    # (g02b g02c g02e g03c g28, oracle=None by design); 0 failures.
    "b25_agg_cube", "b26_agg_grouping_sets", "b27_agg_stats",
    "b28_agg_percentile", "b29_agg_collect_sorted", "b30_agg_minmax_by",
    "b31_agg_salted_skew", "b32_pivot", "b33_unpivot",
    "b34_sample_systematic", "c01_win_ranking", "c02_win_lag_lead",
    "c03_win_running_sum", "c04_win_moving_rows",
    "c05_win_range_interval", "c06_win_first_last", "c07_gapfill",
    "c08_win_forward_fill", "d01_fn_string", "d02_fn_date",
    "d03_fn_math", "d04_fn_cond", "d05_fn_array", "d06_fn_explode",
    "d07_fn_json", "d08_fn_struct", "d09_fn_variant", "d11_fn_bitwise",
    "e01_stream_tumbling", "e02_stream_sliding", "e03_stream_session",
    "e04_stream_watermark", "e05_stream_dedup", "e06_stream_stateful",
    "e07_stream_late_data", "e08_stream_stream_join",
    "e09_stream_static_join", "e10_batch_twin",
    "e11_stream_dedup_then_window", "e12_stream_outer_join",
    "f01_udf_python", "f08_multimodal_decode",
    "f09_multimodal_framesample", "g02b_dedup_lsh",
    "g02c_dedup_simhash", "g02e_dedup_lsh_shingle",
    "g03c_simsearch_lsh", "g25_sequence_pack", "g26_dedup_clusters",
    "g28_semantic_dedup",
)
# fmt: on

LAST_VERIFIED: dict[str, int] = {
    **{name: 3 for name in _R03},
    **{name: 5 for name in _R05},
    **{name: 6 for name in _R06},
    **{name: 7 for name in _R07},
}

# Queries whose Spark code or oracle text materially changed in the
# given round.  CHANGED_IN[name] > LAST_VERIFIED[name] => the recorded
# evidence predates the current text => band 0 (ADVICE r06).  Drop an
# entry once a later CORRECTNESS round re-proves the query.
# fmt: off
CHANGED_IN: dict[str, int] = {
    # duck_round std::round fix (42 plan-visible users + f02/f03 UDF
    # internals), a27 F.get hardening, d05 F.get + duck_round, g26/g28
    # checkpoint-release — all round 8, all value-identical on fixtures
    # (see module docstring).
    "a15_bucketed_join": 8, "a18_python_datasource": 8, "a27_scan_text": 8,
    "b01_project_arith": 8, "b15_join_broadcast": 8, "b20_agg_groupby": 8,
    "b25_agg_cube": 8, "b27_agg_stats": 8, "b28_agg_percentile": 8,
    "b31_agg_salted_skew": 8, "b35_join_salted_skew": 8,
    "b38_sql_cte_chain": 8, "c03_win_running_sum": 8,
    "c04_win_moving_rows": 8, "c05_win_range_interval": 8,
    "c08_win_forward_fill": 8, "c09_win_nth_trailing": 8,
    "d03_fn_math": 8, "d04_fn_cond": 8, "d05_fn_array": 8,
    "d12_fn_trig": 8, "f02_pandas_udf_scalar": 8,
    "f03_pandas_udf_grouped_agg": 8, "g02_dedup_near": 8,
    "g02b_dedup_lsh": 8, "g02d_dedup_ngram": 8,
    "g02e_dedup_lsh_shingle": 8, "g03_simsearch_topk": 8,
    "g03b_simsearch_knn": 8, "g03c_simsearch_lsh": 8,
    "g03d_embed_neardup": 8, "g03e_simsearch_ivf": 8, "g04_centroids": 8,
    "g07_text_tfidf": 8, "g08_text_stats": 8, "g08b_text_quality": 8,
    "g11_events_user_join": 8, "g12_contamination": 8,
    "g16_event_funnel": 8, "g18_embed_quantize": 8,
    "g20_unigram_logprob": 8, "g21_dedup_agreement": 8,
    "g23_text_repetition": 8, "g26_dedup_clusters": 8,
    "g28_semantic_dedup": 8, "g29_quality_gate": 8,
    "g30_dedup_incremental": 8,
}
# fmt: on

# Convenience view: every query with any first-party driver evidence.
DRIVER_VERIFIED: frozenset[str] = frozenset(LAST_VERIFIED)


def changed_since_verified(name: str) -> bool:
    """True when the query's text is newer than its driver evidence."""
    last = LAST_VERIFIED.get(name)
    return last is None or CHANGED_IN.get(name, 0) > last


def sweep_rank(name: str, has_oracle: bool) -> tuple[int, int, str]:
    """Sort key putting the most evidence-starved queries first.

    Band 0: evidence does not describe the current text — either never
            driver-verified (none today; r06 closed that backlog) or
            changed-since-verified (``CHANGED_IN`` newer than
            ``LAST_VERIFIED``: the round-8 edits a27 d05 g26 g28).
            Alphabetical.
    Band 1: verified on current text — ordered by last-verified round
            ASCENDING (stalest evidence first), then name.  The r03
            pandas-UDF/text tail re-enters ahead of the r05 mass,
            which precedes r06/r07 greens.
    ``has_oracle`` kept in the signature for call-site stability; both
    bands order hash tier and rows-only alike.
    """
    if changed_since_verified(name):
        return (0, 0, name)
    return (1, LAST_VERIFIED[name], name)
