"""Negative-money parity (ADVICE r01): the cents-accumulating closures
(f03, f10, e06, e10 batch twin) round each value as
``floor(abs(v)*100 + 0.5)`` and must restore the sign before summing —
the fixture ``events.value`` domain is non-negative, so this latent
divergence needs a synthetic corpus with negative values to surface.
Each query runs against its REGISTERED oracle SQL on the same synthetic
parquet, exactly like the driver's sweep."""

import datetime as dt
import os

import duckdb
import pytest

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare

_REG = registry()

# values chosen exact-at-2-decimals, mixed sign, with a sign flip inside
# every user's stream so an unsigned accumulation visibly diverges
_VALUES = [-1.23, 4.56, -1000.01, 0.0, 2.5, -2.5, 777.77, -0.01]


@pytest.fixture(scope="module")
def neg_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("neg_sf"))
    base = dt.datetime(2024, 1, 1)
    events = [
        (
            i,
            base + dt.timedelta(minutes=7 * i),
            i % 5,
            "purchase" if i % 2 else "refund",
            _VALUES[i % len(_VALUES)],
            "{}",
        )
        for i in range(64)
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    cust = [
        (i, f"Customer#{i}", "BUILDING" if i % 2 else "MACHINERY")
        for i in range(5)
    ]
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_mktsegment string"
    ).coalesce(1).write.parquet(os.path.join(d, "customer.parquet"))
    return d


@pytest.fixture(scope="module")
def neg_duck(neg_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{neg_sf_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    ["f03_pandas_udf_grouped_agg", "f10_cogroup_in_pandas", "e06_stream_stateful",
     "e10_batch_twin"],
)
def test_signed_cents_parity(name, spark, neg_sf_dir, neg_duck):
    rq = _REG[name]
    df = rq.fn(spark, neg_sf_dir)
    res = compare(name, df, neg_duck, rq.oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"


# --------------------------------------------------------------------------
# Edge-domain parity for the ADVICE r05 fixes: c10's epoch bucketing must
# FLOOR (not truncate toward zero) so pre-1970 timestamps with fractional
# seconds bucket identically to DuckDB's //, and d11's bitwise ops must be
# width-independent for values far beyond the fixture's 0..149 user_ids.
# Same shape as the signed-cents suite: registered query + registered
# oracle over a synthetic adversarial corpus.
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_sf"))
    base = dt.datetime(1969, 12, 31, 12, 0, 0)  # crosses the epoch
    rows, offset = [], dt.timedelta(0)
    for i in range(48):
        # mostly-in-session gaps with periodic >30min session breaks;
        # thirds carry .5s so pre-1970 micros are non-multiples of 1e6
        # (the exact inputs where truncation != floor)
        offset += dt.timedelta(minutes=95 if i % 4 == 0 else 25)
        frac = dt.timedelta(milliseconds=500) if i % 3 == 0 else dt.timedelta(0)
        rows.append(
            (
                i,
                base + offset + frac,
                (i % 3) * (2**40 + 7) + i,  # ~1.1e12: far beyond int32
                "purchase" if i % 2 else "refund",
                1.0,
                "{}",
            )
        )
    # Targeted session-boundary flip: a 1800.5 s gap from a fractional
    # pre-1970 start. Floor bucketing gives seconds -2 -> 1799 (gap
    # 1801, NEW session, matching DuckDB //); truncation gives -1 ->
    # 1799 (gap 1800, same session) — so the pre-fix code produces a
    # DIFFERENT session_seq here, proving the test is not vacuous.
    rows.append(
        (1000, dt.datetime(1969, 12, 31, 23, 59, 58, 500000), 999, "purchase", 1.0, "{}")
    )
    rows.append(
        (1001, dt.datetime(1970, 1, 1, 0, 29, 59), 999, "purchase", 1.0, "{}")
    )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{edge_sf_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "c10_win_sessionize",
        "d11_fn_bitwise",
        # e02: Spark window() floors to the slide boundary; the oracle
        # must floor too (DuckDB // truncates — the c10 class)
        "e02_stream_sliding",
    ],
)
def test_edge_domain_parity(name, spark, edge_sf_dir, edge_duck):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, edge_sf_dir), edge_duck, rq.oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"
