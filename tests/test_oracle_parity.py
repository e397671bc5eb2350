"""Replicates the driver's t2 gate locally: every registered query with
an oracle must match DuckDB exactly at sf=0.01 (SURVEY.md §5.3 #1)."""

import pytest

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare, hash_unsafe_columns

_REG = registry()
_ORACLE_NAMES = [n for n, rq in _REG.items() if rq.oracle is not None]
_ROWS_ONLY_NAMES = [n for n, rq in _REG.items() if rq.oracle is None]


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity(name, spark, duck, sf_dir):
    rq = _REG[name]
    df = rq.fn(spark, sf_dir)
    # DecimalType/DateType outputs canonicalize differently across the
    # driver's pandas paths — guaranteed hash-fail even when values are
    # equal (SURVEY §5.4 items 9/11; the r03 d10 failure).  Schema-level
    # gate so the class is caught before any value comparison.
    unsafe = hash_unsafe_columns(df)
    assert not unsafe, f"{name}: hash-unsafe output columns {unsafe}"
    res = compare(name, df, duck, rq.oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"
    # H-tier queries must never emit NaN: pandas-era tooling conflates
    # NaN with NULL, so a NaN that happens to line up with an oracle
    # NULL is a latent hash mismatch (VERDICT r02 "What's wrong" #3).
    assert not res.spark_has_nan, f"{name}: H-tier query emitted NaN"


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    rq = _REG[name]
    df = rq.fn(spark, sf_dir)
    assert df.count() >= 0
