"""NUMERIC-hostile corpus pins — the SEVENTH hostile axis (round 11).

The round-9 corpora attacked keys, clocks, identities, and the
NON-FINITE measure class; round 10 added text and JSON values.  None
attacked FINITE measure magnitudes — and the engine's decimal money
contract has a domain: ``make_adversarial_corpus.py --numeric-hostile``
rewrites events.value, the lineitem money columns, and o_totalprice
with 1e300/±, 1e16 (one past DECIMAL(18,2) capacity), -0.0, the
min-subnormal 5e-324, 2^53+1, and 1e15-adjacent values.

Round-11 full-registry sweep findings (BASELINE.md):

1. **29/159 queries CRASH on huge-but-finite measures** — every
   decimal money cast throws NUMERIC_VALUE_OUT_OF_RANGE under ANSI on
   Spark, the DuckDB oracles raise ConversionException on the same
   casts, b01/b27 overflow int64, and the streaming family dies with
   STREAM_FAILED wrapping the same arithmetic.  Both engines crash:
   this is the crash-vs-contract class, the finite-but-out-of-DOMAIN
   sibling of the round-9 non-finite probe (22/159).  Remediation:
   the measure contract gained a domain bound
   (``quarantine_nonfinite(..., max_abs=...)`` /
   ``validate_ingest(measure_max_abs=...)``); 1e12 keeps DECIMAL(18,2)
   sums four orders of magnitude of headroom at 100 TB row counts.
2. **The remaining 113 hash-tier queries HASH-MATCHED** over the
   sign-of-zero, subnormal, and 2^53-boundary classes — the
   cross-engine determinism story holds for every finite value both
   engines can represent through the plan.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.contracts import (
    quarantine_nonfinite,
    quarantine_nonfinite_vectors,
)
from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import TESTDATA_TABLES, compare
from scripts.make_adversarial_corpus import build

_REG = registry()

#: money-domain bound for DECIMAL(18,2) measure columns (see
#: quarantine_nonfinite docstring)
MONEY_MAX_ABS = 1e12

_GATE = {
    "events": ("value",),
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount"),
    "orders": ("o_totalprice",),
}


@pytest.fixture(scope="module")
def numeric_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("numeric_hostile"))
    build(d, "/root/testdata/sf0.001", numeric_hostile=True)
    return d


def _duck_for(d, multi=()):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        glob = "/*.parquet" if t in multi else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet{glob}')"
        )
    return con


def test_finite_overflow_crash_class_pinned(spark, numeric_sf_dir):
    """Finding 1's mechanism, pinned on BOTH engines: a finite 1e300
    measure kills the decimal money cast.  If either engine changes
    behavior (e.g. a future Spark relaxes ANSI decimal casts), the
    domain-bound remediation must be revisited."""
    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        _REG["b20_agg_groupby"].fn(spark, numeric_sf_dir).collect()
    con = duckdb.connect()
    with pytest.raises(duckdb.Error):
        con.execute("SELECT CAST(1e300 AS DECIMAL(18,2))")
    con.close()


# Queries that touch the poisoned measures yet survived the raw corpus
# hash-green in the round-11 sweep: percentile interpolation,
# histogram bucketing, lag/lead, min/max_by, and the Arrow-batched
# pandas scalar path all agree across engines on -0.0, 5e-324, 2^53+1,
# and 1e300 — the classes that flow through the plan WITHOUT a decimal
# cast.  Pinned so a future edit can't silently regress them.
H_SURVIVORS = [
    "b28_agg_percentile",
    "b36_histogram",
    "c02_win_lag_lead",
    "b30_agg_minmax_by",
    "f02_pandas_udf_scalar",
]


@pytest.mark.parametrize("name", H_SURVIVORS)
def test_survivor_parity_on_raw_numeric_corpus(name, spark, numeric_sf_dir):
    rq = _REG[name]
    con = _duck_for(numeric_sf_dir)
    try:
        res = compare(name, rq.fn(spark, numeric_sf_dir), con, rq.oracle)
        assert res.ok, f"{name} on numeric-hostile corpus: {res.detail}"
    finally:
        con.close()


@pytest.fixture(scope="module")
def gated_sf_dir(spark, numeric_sf_dir, tmp_path_factory):
    """The corpus after the measure-domain quarantine (max_abs=1e12)
    over every poisoned table — the remediation's output."""
    d = str(tmp_path_factory.mktemp("numeric_gated"))
    for t in TESTDATA_TABLES:
        src = os.path.join(numeric_sf_dir, f"{t}.parquet")
        if t in _GATE:
            df = spark.read.parquet(src)
            clean, bad = quarantine_nonfinite(
                df, *_GATE[t], max_abs=MONEY_MAX_ABS
            )
            assert bad.count() > 0, f"{t}: corpus should trip the gate"
            clean.coalesce(1).write.parquet(os.path.join(d, f"{t}.parquet"))
        else:
            con = duckdb.connect()
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{d}/{t}.parquet' (FORMAT parquet)"
            )
            con.close()
    return d


# One representative per crash signature: decimal agg (b20), windowed
# decimal sum (c03), forward-fill decimal (c08), long overflow
# (b01/b27), bucketed-join decimal (a15), decimal pack (d10), pandas
# fold whose ORACLE crashed (f03), streaming cents fold whose oracle
# crashed (e10), streaming window agg (e01).
H_REMEDIATED = [
    "b20_agg_groupby",
    "c03_win_running_sum",
    "c08_win_forward_fill",
    "b01_project_arith",
    "b27_agg_stats",
    "a15_bucketed_join",
    "d10_fn_decimal_interval",
    "f03_pandas_udf_grouped_agg",
    "e10_batch_twin",
    "e01_stream_tumbling",
]


@pytest.mark.parametrize("name", H_REMEDIATED)
def test_remediated_hash_green_on_gated_corpus(name, spark, gated_sf_dir):
    rq = _REG[name]
    con = _duck_for(gated_sf_dir, multi=tuple(_GATE))
    try:
        res = compare(name, rq.fn(spark, gated_sf_dir), con, rq.oracle)
        assert res.ok, f"{name} on domain-gated corpus: {res.detail}"
    finally:
        con.close()


def test_max_abs_subsumes_infinity_and_keeps_nulls(spark):
    df = spark.createDataFrame(
        [(1, 9.0), (2, None), (3, float("inf")), (4, float("-inf")),
         (5, float("nan")), (6, 11.0), (7, -11.0)],
        "id long, v double",
    )
    clean, bad = quarantine_nonfinite(df, "v", max_abs=10.0)
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    assert sorted(r.id for r in bad.collect()) == [3, 4, 5, 6, 7]


def test_vector_max_abs_component_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, None), (3, [1e300, 0.0]),
         (4, [float("nan"), 0.0]), (5, [0.0, -20.0])],
        "id long, emb array<double>",
    )
    clean, bad = quarantine_nonfinite_vectors(df, "emb", max_abs=10.0)
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    assert sorted(r.id for r in bad.collect()) == [3, 4, 5]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
