"""Registry ordering = driver-evidence policy (VERDICT r06 item 1).

The driver records at most 50 CORRECTNESS rows per round, iterating
``queries()`` in insertion order.  After folding the r15 greens into
``LAST_VERIFIED`` (the r15 window drained the whole r11 band and
satisfied all nine round-15 CHANGED_IN markers), the changed band
holds the two ADVICE-r15 markers (g12/g21 execute the reshaped
_jaccard_pairs text on r13 evidence) plus whatever round-16 edits
actually touch — added to CHANGED_IN commit-by-commit as they land,
mirrored here in CHANGED_BAND so a drive-by edit to either side
fails loudly.

The r16 window therefore leads with the changed band, then rotates
onto the stalest remaining evidence: the 26-member r12 band (b35/
b36/b38, the c-window singles, d03-d12, f02/f05, and the g04-g29
text/ANN singles — VERDICT r15 #1's explicit list), then the oldest
r13 entries filling the remaining slots.

Env tolerance: ``e10_transform_with_state`` registers only when
google.protobuf is importable (streaming/queries.py gate).  In such an
environment it is legitimately never-verified and joins the window
head; the assertions below derive the expected head from what is
ACTUALLY registered instead of hard-coding this env's 162 names.
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

# Text newer than driver evidence as of round 17 (see driver_evidence
# CHANGED_IN) — the independent mirror.  Round-17 edits add names here
# in the same commit that adds their CHANGED_IN marker.
CHANGED_BAND: set[str] = {
    # round 17: _bitmap_vocab's exact size and _minhash_lsh_neardup's
    # n_reps ride their checkpoint jobs as observed metrics — executed
    # text of every strategy-core user changed.
    "g02_dedup_near",
    "g02b_dedup_lsh",
    "g02d_dedup_ngram",
    "g02e_dedup_lsh_shingle",
    "g12_contamination",
    "g26_dedup_clusters",
    "g30_dedup_incremental",
    "g32_dedup_band_probe",
    # round 17: g21's embedding lookups share one projection
    # (NULL-safe dim probe, 32 MB gate — ADVICE r16).
    "g21_dedup_agreement",
    # round 17: g02c gained the Manku Hamming verify (output changed;
    # VERDICT r16 #5).
    "g02c_dedup_simhash",
    # round 17: run_to_memory freezes the sink JVM-side — every
    # registered streaming drain's executed text changed.
    "e01_stream_tumbling",
    "e02_stream_sliding",
    "e03_stream_session",
    "e04_stream_watermark",
    "e05_stream_dedup",
    "e06_stream_stateful",
    "e07_stream_late_data",
    "e08_stream_stream_join",
    "e09_stream_static_join",
    "e11_stream_dedup_then_window",
    "e12_stream_outer_join",
    # round 17: g03e/g28 centroid assignment went map-only (window ->
    # in-row comparator sort) with the normalized working set
    # materialized once; outputs byte-identical, executed text changed.
    "g03e_simsearch_ivf",
    "g28_semantic_dedup",
    # round 17: f10's events scan carries the transitive c_custkey
    # < 200 predicate (output byte-identical, oracle-green).
    "f10_cogroup_in_pandas",
}

# Registered only when google.protobuf is available; never-verified by
# construction wherever it registers.
ENV_GATED = {"e10_transform_with_state"}

# Freshly registered this round — no driver row can exist yet; they sit
# in band 0 (never-verified) and lead the sweep window.  Fold into
# LAST_VERIFIED (and empty this set) once CORRECTNESS_r15 lands.
NEW_IN_ROUND: set[str] = set()


def _band0(reg):
    return sorted(n for n in reg if changed_since_verified(n))


def test_changed_band_heads_the_window():
    reg = registry()
    names = list(reg)
    head = _band0(reg)
    assert names[: len(head)] == head
    assert set(head) - ENV_GATED == CHANGED_BAND | NEW_IN_ROUND
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
        # never-verified names (fresh registrations, env-gated) carry
        # no PRE-change evidence to invalidate — they are band 0 and
        # get first-party evidence on current text by construction
        if n in LAST_VERIFIED
        and LAST_VERIFIED[n] < ROUND_MIRROR_CHANGED
        and CHANGED_IN.get(n, 0) < ROUND_MIRROR_CHANGED
        and n not in ENV_GATED
    }
    assert not stale, f"round-mirror users with pre-change evidence and no marker: {sorted(stale)}"


def test_window_fills_with_stalest_evidence():
    reg = registry()
    names = list(reg)
    window = names[:50]
    head = _band0(reg)
    # Band 1 is ordered stalest-first: r13, then r14, then r15/r16.
    assert not any(r <= 12 for r in LAST_VERIFIED.values())
    stale_r13 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 13 and not changed_since_verified(n)
    )
    # the post-r16-fold stalest band is 26 names; members with a
    # round-17 CHANGED_IN marker sit in band 0 instead
    assert sum(1 for r in LAST_VERIFIED.values() if r == 13) == 26
    assert len(stale_r13) == 26 - sum(
        1 for n in CHANGED_BAND if LAST_VERIFIED.get(n) == 13
    )
    stale_r14 = sorted(
        n for n, r in LAST_VERIFIED.items() if r == 14 and not changed_since_verified(n)
    )
    # head + 26 r13 fill the first 26+len(head) slots; the oldest r14
    # entries complete the 50.
    assert window == (head + stale_r13 + stale_r14)[:50]
    # Everything past the window is ordered by non-decreasing evidence
    # round (r13 remainder <= r14 <= r15).
    tail_rounds = [LAST_VERIFIED[n] for n in names[50:]]
    assert tail_rounds == sorted(tail_rounds)


def test_sweep_rank_orders_by_staleness():
    r13 = sweep_rank("g16_event_funnel", True)
    r14 = sweep_rank("b40_sort_limit_topk", True)
    r15 = sweep_rank("b14_join_anti", True)
    r16 = sweep_rank("b36_histogram", True)
    assert r13 < r14 < r15 < r16
    assert r13[0] == 1  # verified, just stale — band 1
    # Marked edits re-enter band 0 ahead of everything.
    for name in CHANGED_BAND:
        assert sweep_rank(name, True)[0] == 0


def test_all_queries_have_driver_evidence():
    reg = registry()
    known = set(LAST_VERIFIED)
    # Every registered query is evidenced, modulo a freshly-registered
    # env-gated variant; every evidenced name is really registered —
    # no typo can silently drop a query out of the rotation.
    assert set(reg) - known <= ENV_GATED | NEW_IN_ROUND
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


def test_survey_section2_enumerates_the_registry():
    """VERDICT r09 #2: SURVEY §2 'IS the contract', so its family tables
    must enumerate exactly what the registry serves — the registry must
    never be a superset of the tables (a23/a24/g27 were registered,
    driver-verified, QUERIES.md-documented, yet invisible to a reader
    auditing §2 table-by-table).  Parse every backticked query name out
    of §2's table rows and diff against the registry, modulo the
    documented env gate."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SURVEY.md")) as f:
        text = f.read()
    sec2 = text.split("## 2.", 1)[1].split("\n## ", 1)[0]
    table_names = set()
    for line in sec2.splitlines():
        if line.lstrip().startswith("|"):
            m = re.match(r"\s*\|\s*`([a-z]\d+[a-z]?_[a-z0-9_]+)`", line)
            if m:
                table_names.add(m.group(1))
    reg = set(registry())
    missing_rows = reg - table_names - ENV_GATED
    assert not missing_rows, f"registered queries with no SURVEY §2 table row: {sorted(missing_rows)}"
    phantom_rows = table_names - reg - ENV_GATED
    assert not phantom_rows, f"SURVEY §2 rows with no registered query: {sorted(phantom_rows)}"
