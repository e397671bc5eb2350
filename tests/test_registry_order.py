"""Registry ordering = driver-evidence policy (VERDICT r05 items 1-2).

The driver records at most 50 CORRECTNESS rows per round, iterating
``queries()`` in insertion order.  After folding the r05 greens into
``LAST_VERIFIED`` (149 names), the queries lacking first-party driver
evidence are the round-5 deferred band (a28 a29 c09 c10 d12 g29 g30)
plus the round-6 additions (d13 e12 g31) — 10 names.  These tests pin
the r06 window shape: the never-verified entries first, then the
STALEST verified evidence (the r02-era prefix, last proven before the
split-sizing/decimal-emit changes) filling the remaining 40 slots,
with fresher r03/r05 evidence behind it.

Env tolerance: ``e10_transform_with_state`` registers only when
google.protobuf is importable (streaming/queries.py gate).  In such an
environment it is legitimately never-verified and joins the window
head; the assertions below derive the expected head from what is
ACTUALLY registered instead of hard-coding this env's 159 names.
"""

from data_lake_staging_engine_spark.driver_evidence import (
    DRIVER_VERIFIED,
    LAST_VERIFIED,
    sweep_rank,
)
from data_lake_staging_engine_spark.registry import registry

NEVER_VERIFIED = {
    "a28_multi_format_union",
    "a29_scd2_dimension",
    "c09_win_nth_trailing",
    "c10_win_sessionize",
    "d12_fn_trig",
    "g29_quality_gate",
    "g30_dedup_incremental",
    # round-6 additions — never inside a driver window yet
    "d13_fn_url",
    "g31_dedup_segments",
    "e12_stream_outer_join",
}

# Registered only when google.protobuf is available; never-verified by
# construction wherever it registers.
ENV_GATED = {"e10_transform_with_state"}


def _unverified_head(reg):
    return sorted(set(reg) - DRIVER_VERIFIED)


def test_never_verified_head_the_window():
    reg = registry()
    names = list(reg)
    head = _unverified_head(reg)
    assert names[: len(head)] == head
    assert set(head) - ENV_GATED == NEVER_VERIFIED
    assert not (NEVER_VERIFIED & DRIVER_VERIFIED)


def test_window_fills_with_stalest_evidence():
    reg = registry()
    names = list(reg)
    window = names[:50]
    # 10 never-verified (+ env-gated e10 where registered) + the
    # stalest (r02-era) re-verifications filling the rest.
    head = _unverified_head(reg)
    stale = sorted(n for n, r in LAST_VERIFIED.items() if r == 2)
    assert len(stale) == 50
    n_fill = 50 - len(head)
    assert window == head + stale[:n_fill]
    # Everything past the window is fresher evidence than anything in
    # the stale band (r02 <= r03 <= r05, monotone non-decreasing tail).
    tail_rounds = [LAST_VERIFIED[n] for n in names[50:]]
    assert tail_rounds == sorted(tail_rounds)


def test_sweep_rank_orders_by_staleness():
    assert sweep_rank("a28_multi_format_union", True)[0] == 0
    r02 = sweep_rank("a01_scan_parquet", True)
    r03 = sweep_rank("c01_win_ranking", True)
    r05 = sweep_rank("b56_join_lateral", True)
    assert r02 < r03 < r05


def test_all_queries_still_registered():
    reg = registry()
    expected = len(LAST_VERIFIED) + len(NEVER_VERIFIED)
    assert expected <= len(reg) <= expected + len(ENV_GATED)
    assert DRIVER_VERIFIED <= set(reg)
    # LAST_VERIFIED names all correspond to real registered queries —
    # no typo can silently drop a query out of the rotation.
    assert set(LAST_VERIFIED) <= set(reg)
    assert NEVER_VERIFIED <= set(reg)


def test_order_deterministic():
    assert list(registry()) == list(registry())
