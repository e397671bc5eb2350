"""Registry ordering = driver-evidence policy (VERDICT r06 item 1).

The driver records at most 50 CORRECTNESS rows per round, iterating
``queries()`` in insertion order.  After folding the r07 greens into
``LAST_VERIFIED`` (all 159 names driver-evidenced; the r07 window
closed the 13-member changed band and the r02-era tail), the entries
whose evidence does not describe their CURRENT text are the round-8
edits — dominated by the duck_round std::round fix (42 plan-visible
users + f02/f03 UDF internals), plus the a27 ``F.get`` hardening and
the g26/g28 checkpoint-release change: 47 names, all re-proven
value-identical locally on all three fixture SFs (see
driver_evidence.py).  These tests pin the r08 window shape: that
47-member changed band first, then the 3 stalest r03 entries filling
the remaining slots.

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
    changed_since_verified,
    sweep_rank,
)
from data_lake_staging_engine_spark.registry import registry

# Text newer than driver evidence as of round 8 (see driver_evidence.py)
# — an independent mirror of CHANGED_IN so a drive-by edit to either
# side fails loudly. 42 duck_round plan users + f02/f03 (UDF-internal
# duck_round twins) + a27 (F.get) + g26/g28 (checkpoint release).
# fmt: off
CHANGED_BAND = {
    "a15_bucketed_join", "a18_python_datasource", "a27_scan_text",
    "b01_project_arith", "b15_join_broadcast", "b20_agg_groupby",
    "b25_agg_cube", "b27_agg_stats", "b28_agg_percentile",
    "b31_agg_salted_skew", "b35_join_salted_skew", "b38_sql_cte_chain",
    "c03_win_running_sum", "c04_win_moving_rows",
    "c05_win_range_interval", "c08_win_forward_fill",
    "c09_win_nth_trailing", "d03_fn_math", "d04_fn_cond",
    "d05_fn_array", "d12_fn_trig", "f02_pandas_udf_scalar",
    "f03_pandas_udf_grouped_agg", "g02_dedup_near", "g02b_dedup_lsh",
    "g02d_dedup_ngram", "g02e_dedup_lsh_shingle", "g03_simsearch_topk",
    "g03b_simsearch_knn", "g03c_simsearch_lsh", "g03d_embed_neardup",
    "g03e_simsearch_ivf", "g04_centroids", "g07_text_tfidf",
    "g08_text_stats", "g08b_text_quality", "g11_events_user_join",
    "g12_contamination", "g16_event_funnel", "g18_embed_quantize",
    "g20_unigram_logprob", "g21_dedup_agreement", "g23_text_repetition",
    "g26_dedup_clusters", "g28_semantic_dedup", "g29_quality_gate",
    "g30_dedup_incremental",
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


def test_window_fills_with_stalest_evidence():
    reg = registry()
    names = list(reg)
    window = names[:50]
    head = _band0(reg)
    # No r02-era evidence is left (the r07 window re-proved b25..b34);
    # the r03 pandas-UDF/text tail is now the stalest band.
    assert not any(r <= 2 for r in LAST_VERIFIED.values())
    stale_r03 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 3 and n not in CHANGED_IN
    )
    assert len(stale_r03) == 10
    stale_r05 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 5 and n not in CHANGED_IN
    )
    assert window == (head + stale_r03 + stale_r05)[:50]
    # Everything past the window is ordered by non-decreasing evidence
    # round (r05 remainder <= r06 <= r07).
    tail_rounds = [LAST_VERIFIED[n] for n in names[50:]]
    assert tail_rounds == sorted(tail_rounds)


def test_sweep_rank_orders_by_staleness():
    assert sweep_rank("a27_scan_text", True)[0] == 0
    assert sweep_rank("g26_dedup_clusters", True)[0] == 0
    r03 = sweep_rank("f04_apply_in_pandas", True)
    r05 = sweep_rank("b56_join_lateral", True)
    r06 = sweep_rank("a01_scan_parquet", True)
    r07 = sweep_rank("b26_agg_grouping_sets", True)
    assert r03 < r05 < r06 < r07
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
