"""Cross-SF oracle parity: every hash-tier query must ALSO match DuckDB
at sf0.001 — a data shape the driver never exercises (it sweeps only
sf0.01).

Why this suite exists: correctness claims that hold at one fixture size
can encode that size. The round-7 sweep that introduced this file caught
exactly one such bug — e12's watermark-flushed-region cutoff assumed the
raw-stream max ts governed the watermark, but Catalyst pushes the
event_type conjunct through the EventTimeWatermark operator, so the real
watermark tracks the per-type max. At sf0.01 the signup/corpus gap was
28 min (inside the 60-min safety); at sf0.001 it is ~4.7 h, and two tail
signups silently never flushed. Anything size-dependent — strategy
switches (bitmap vs token-join verify), empty groups, watermark gaps,
broadcast thresholds — gets a second, differently-shaped data point
here.

Runtime: ~2.5 min for the full tier (sf0.001 is ~1/10th of sf0.01).
Skipped when the session-level SF override already points at sf0.001
(then test_oracle_parity covers it and this would be a duplicate run).
"""

import os

import pytest

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare, duck_connection

_SMALL_SF = "/root/testdata/sf0.001"
_REG = registry()
_ORACLE_NAMES = [n for n, rq in _REG.items() if rq.oracle is not None]

# Slow tier (pytest.ini): full-registry second-SF parity drive.
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR") == _SMALL_SF,
        reason="session SF override already runs the main parity suite at sf0.001",
    ),
]


@pytest.fixture(scope="module")
def duck_small():
    con = duck_connection(_SMALL_SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_cross_sf_parity(name, spark, duck_small):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, _SMALL_SF), duck_small, rq.oracle)
    assert res.ok, f"{name} at sf0.001: {res.detail} {res.mismatches[:3]}"
