"""Registry ordering = driver-evidence policy (VERDICT r06 item 1).

The driver records at most 50 CORRECTNESS rows per round, iterating
``queries()`` in insertion order.  After folding the r08 greens into
``LAST_VERIFIED`` (all 159 names driver-evidenced; the r08 window
closed the 47-member round-8 changed band plus f04/f05/f06), the
entries whose evidence does not describe their CURRENT text are:

- the nine round-8 duck_round users the r08 hand-list missed
  (ADVICE r08) — a20, c01, e01-e04, e09, e11, g13;
- three inline round-to-cents sites (e06, e10_batch_twin, f10) the
  mechanical derivation (``driver_evidence.round_mirror_users``)
  surfaced beyond even ADVICE's list — formula unchanged but
  re-proven once under the conservative policy;
- ``b38_sql_cte_chain``, whose inline SQL got the round-9 sweep of the
  exact std::round mirror;
- ``d07_fn_json`` (try_element_at normalization) and
  ``b27_agg_stats`` (safe_corr hardening — the round-9 fuzz find),
  both changed in round 9;
- the round-9 degenerate-data division sweep: ``g16_event_funnel``
  (try_divide conversion), ``f04_apply_in_pandas`` (z-score NULL
  guard), ``b36_histogram`` (hi = lo bucket-0 CASE) — see
  tests/test_degenerate_groups.py;
- the round-9 empty-input audit: explicit-schema read-back in
  a09/a13/a16/a17 and the _doc_bitmaps vocab==0 floor in the 8
  bitmap-dedup users — see tests/test_empty_input.py;
- the round-9 ADVERSARIAL-corpus audit (zero-norm embeddings, NULL
  values/text, malformed JSON — tests/test_adversarial_corpus.py):
  try_divide/zero-norm-exclusion cosine in g03/g03b/g03c/g03d/g03e/
  g21/g28, NULL-skipping cents/moment folds in e06/e10_batch_twin/
  f03/f04/f10, NULL-text guards in f06/f08, try_parse_json in d09,
  and NULL-faithful oracles for d07/d08/d09.

These tests pin the r09 window shape: that 41-member changed band
first, then the stalest r03/r05 entries filling the remaining slots.

Env tolerance: ``e10_transform_with_state`` registers only when
google.protobuf is importable (streaming/queries.py gate).  In such an
environment it is legitimately never-verified and joins the window
head; the assertions below derive the expected head from what is
ACTUALLY registered instead of hard-coding this env's 159 names.
"""

from data_lake_staging_engine_spark.driver_evidence import (
    CHANGED_IN,
    DRIVER_VERIFIED,
    LAST_VERIFIED,
    ROUND_MIRROR_CHANGED,
    changed_since_verified,
    round_mirror_users,
    sweep_rank,
)
from data_lake_staging_engine_spark.registry import registry

# Text newer than driver evidence as of round 9 (see driver_evidence.py)
# — an independent mirror of CHANGED_IN so a drive-by edit to either
# side fails loudly.  9 duck_round users the r08 window missed + 3
# derivation-surfaced cents sites + b38's round-9 SQL-mirror sweep +
# d07's try_element_at normalization.
# fmt: off
CHANGED_BAND = {
    "a09_sink_parquet_partitioned", "a13_stream_ingest_foreachbatch",
    "a16_partition_pruned_scan", "a17_dynamic_partition_overwrite",
    "a20_observed_metrics", "b18_join_asof", "b27_agg_stats",
    "b36_histogram",
    "b38_sql_cte_chain", "c01_win_ranking", "c07_gapfill",
    "c08_win_forward_fill", "d07_fn_json",
    "d08_fn_struct", "d09_fn_variant",
    "e01_stream_tumbling", "e02_stream_sliding", "e03_stream_session",
    "e04_stream_watermark", "e06_stream_stateful",
    "e08_stream_stream_join",
    "e09_stream_static_join", "e10_batch_twin",
    "e12_stream_outer_join",
    "e11_stream_dedup_then_window", "f03_pandas_udf_grouped_agg",
    "f04_apply_in_pandas", "f06_udtf", "f08_multimodal_decode",
    "f10_cogroup_in_pandas", "g02_dedup_near", "g02b_dedup_lsh",
    "g02d_dedup_ngram", "g02e_dedup_lsh_shingle",
    "g03_simsearch_topk", "g03b_simsearch_knn", "g03c_simsearch_lsh",
    "g03d_embed_neardup", "g03e_simsearch_ivf", "g12_contamination",
    "g13_kmeans_iterations", "g16_event_funnel", "g21_dedup_agreement",
    "g26_dedup_clusters", "g28_semantic_dedup", "g30_dedup_incremental",
}
# fmt: on

# Registered only when google.protobuf is available; never-verified by
# construction wherever it registers.
ENV_GATED = {"e10_transform_with_state"}


def _band0(reg):
    return sorted(n for n in reg if changed_since_verified(n))


def test_changed_band_heads_the_window():
    reg = registry()
    names = list(reg)
    head = _band0(reg)
    assert names[: len(head)] == head
    assert set(head) - ENV_GATED == CHANGED_BAND
    # Every changed marker refers to a real, already-verified query.
    assert set(CHANGED_IN) <= DRIVER_VERIFIED


def test_round_mirror_users_all_marked_or_reproven():
    """ADVICE r08: the round-8 changed band was hand-listed and missed
    nine duck_round users.  Derive the user set mechanically (static
    call-graph + inline-source scan, no Spark needed) and require every
    member to be either driver-verified on post-change text or carry a
    CHANGED_IN marker at least as new as the change.  When duck_round
    changes again, bumping ROUND_MIRROR_CHANGED makes this test force
    the re-marking."""
    reg = registry()
    users = round_mirror_users({n: rq.fn for n, rq in reg.items()})
    # Sanity floor: the derivation sees the known big users; an
    # accidentally-empty scan must not pass vacuously.
    assert {"b20_agg_groupby", "c03_win_running_sum", "e01_stream_tumbling",
            "f02_pandas_udf_scalar", "b38_sql_cte_chain"} <= users
    stale = {
        n
        for n in users
        if LAST_VERIFIED.get(n, 0) < ROUND_MIRROR_CHANGED
        and CHANGED_IN.get(n, 0) < ROUND_MIRROR_CHANGED
        and n not in ENV_GATED
    }
    assert not stale, f"round-mirror users with pre-change evidence and no marker: {sorted(stale)}"


def test_window_fills_with_stalest_evidence():
    reg = registry()
    names = list(reg)
    window = names[:50]
    head = _band0(reg)
    # The stalest band-1 evidence is the 7-member r03 pandas-UDF/text
    # tail, then the r05 band (g13 is lifted out of it into band 0).
    assert not any(r <= 2 for r in LAST_VERIFIED.values())
    stale_r03 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 3 and not changed_since_verified(n)
    )
    assert len(stale_r03) == 6  # the 7-member r03 tail minus f10 (band 0)
    stale_r05 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 5 and not changed_since_verified(n)
    )
    stale_r06 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 6 and not changed_since_verified(n)
    )
    # 30 changed + 6 r03 fill the head; the first 14 r05 entries complete
    # the 50; the r05 remainder and r06+ bands start past the window.
    assert window == (head + stale_r03 + stale_r05 + stale_r06)[:50]
    # Everything past the window is ordered by non-decreasing evidence
    # round (r05 remainder <= r06 <= r07 <= r08).
    tail_rounds = [LAST_VERIFIED[n] for n in names[50:]]
    assert tail_rounds == sorted(tail_rounds)


def test_sweep_rank_orders_by_staleness():
    assert sweep_rank("b38_sql_cte_chain", True)[0] == 0
    assert sweep_rank("g13_kmeans_iterations", True)[0] == 0
    r03 = sweep_rank("f07_arrow_udf", True)
    r05 = sweep_rank("b56_join_lateral", True)
    r06 = sweep_rank("a01_scan_parquet", True)
    r07 = sweep_rank("b26_agg_grouping_sets", True)
    r08 = sweep_rank("b20_agg_groupby", True)
    assert r03 < r05 < r06 < r07 < r08
    assert r03[0] == 1  # verified, just stale — band 1


def test_all_queries_have_driver_evidence():
    reg = registry()
    known = set(LAST_VERIFIED)
    # Every registered query is evidenced, modulo a freshly-registered
    # env-gated variant; every evidenced name is really registered —
    # no typo can silently drop a query out of the rotation.
    assert set(reg) - known <= ENV_GATED
    assert known <= set(reg)
    assert len(reg) >= len(known)


def test_order_deterministic():
    assert list(registry()) == list(registry())


def test_last_verified_matches_correctness_artifacts():
    """LAST_VERIFIED is hand-folded from the driver's CORRECTNESS_r*.json
    files; recompute the fold (latest-wins over clean rows) and require
    the bookkeeping to claim nothing the artifacts don't support.  A
    fold round NEWER than LAST_VERIFIED is legal — it means a fresh
    driver round ran and the fold update is pending — but an OLDER one
    (or a name with no artifact row at all) is fabricated evidence."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fold: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", p).group(1))
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            clean = row.get("err") in (None, "no_oracle") and row.get(
                "hash_match"
            ) in (True, None)
            if clean:
                fold[name] = max(fold.get(name, 0), rnd)
    assert fold, "no CORRECTNESS artifacts found"
    unsupported = {
        n: (r, fold.get(n)) for n, r in LAST_VERIFIED.items() if fold.get(n, 0) < r
    }
    assert not unsupported, f"LAST_VERIFIED claims without artifact rows: {unsupported}"
