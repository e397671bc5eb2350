"""Registry ordering = driver-evidence policy (VERDICT r02 item 1).

The driver records at most 50 CORRECTNESS rows per round, iterating
``queries()`` in insertion order.  These tests pin that the first 50
entries are exactly the evidence-starved ones: never driver-verified,
hash tier, c-g families.
"""

from data_lake_staging_engine_spark.driver_evidence import DRIVER_VERIFIED
from data_lake_staging_engine_spark.registry import registry


def test_window_is_unverified_oracled_cdefg():
    reg = registry()
    window = list(reg)[:50]
    assert all(n not in DRIVER_VERIFIED for n in window)
    assert all(reg[n].oracle is not None for n in window)
    assert all(n[0] in "cdefg" for n in window)


def test_all_queries_still_registered():
    reg = registry()
    # 139 registered in this env (e10_transform_with_state is env-gated).
    assert len(reg) >= 139
    # Verified prefix is still present, just demoted to the tail.
    assert DRIVER_VERIFIED <= set(reg)
    tail = list(reg)[-len(DRIVER_VERIFIED) :]
    assert set(tail) == set(DRIVER_VERIFIED)


def test_order_deterministic():
    assert list(registry()) == list(registry())
