"""transformWithStateInPandas (e10) is gated on google.protobuf — its
driver-side state server crashes at startup without it (reproduced:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError for
google.protobuf.descriptor). Where the dependency exists the query is
registered hash-tier and this test runs it; here it documents the gap
and e06 (applyInPandasWithState) carries custom-stateful coverage.

Gate re-validated on pyspark 4.1.2, 2026-08-14 (round 7): a minimal
transformWithStateInPandas query still dies in the streaming runner
init with `ImportError: cannot import name 'descriptor' from
'google.protobuf'`. Re-check recipe when the environment changes:
`python -c "import google.protobuf.descriptor"` — the moment that
import succeeds, _tws_supported() flips true, e10 self-registers, and
test_e10_oracle_parity stops skipping; nothing else needs editing."""

import pytest

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.streaming.queries import _tws_supported
from data_lake_staging_engine_spark.testing import compare


def test_e10_registration_matches_runtime_support():
    assert ("e10_transform_with_state" in registry()) == _tws_supported()


def test_e10_oracle_parity(spark, duck, sf_dir):
    pytest.importorskip("google.protobuf")
    rq = registry()["e10_transform_with_state"]
    res = compare("e10", rq.fn(spark, sf_dir), duck, rq.oracle)
    assert res.ok, res.detail
