"""Degenerate-group / degenerate-range parity (round-9 sweep).

Under ANSI mode — the Spark 4 default, hence also the driver's vanilla
session — division by zero THROWS in Spark while DuckDB emits NULL.
The round-9 contract-domain fuzz caught ``F.corr`` throwing on
zero-variance groups (b27 -> safe_corr), and the follow-up audit of
every division site in the engine found three more REACHABLE cases,
all fixture-latent (the fixture data never produces the degenerate
shape, so seven rounds of green sweeps could not see them):

- **g16_event_funnel**: a market segment where no user ever signed up
  makes ``SUM(signed) = 0`` — the conversion ratio threw; now
  try_divide (NULL, matching the oracle).
- **f04_apply_in_pandas**: an event_type with a single event hit
  ``ZeroDivisionError`` inside the z-score UDF (len(v)-1 == 0), and a
  constant group divided by sd == 0 — the task crashed outright; now
  both emit NULL z like the oracle's ``x / stddev_samp OVER w``.
- **b36_histogram**: a constant o_totalprice column makes hi == lo; the
  unguarded width divide threw on Spark AND the engines disagreed on
  the fallthrough (DuckDB NULL/0 -> LEAST(NULL,19) = 19); now a
  hi = lo CASE lands every row in bucket 0 on both engines (the g18
  quantizer precedent).

Each query runs against its REGISTERED oracle over a synthetic
degenerate corpus — the exact inputs where the pre-fix code crashed —
using the same fixture pattern as tests/test_negative_values.py.
b27_agg_stats is included to pin safe_corr's NULL cases (n=1 group,
constant column, one-sided nulls) through the driver-shaped compare.
"""

import datetime as dt
import os

import duckdb
import pytest

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare

_REG = registry()


@pytest.fixture(scope="module")
def deg_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("deg_sf"))
    base = dt.datetime(2024, 3, 1)

    # events: a singleton event_type ("solo"), a constant-value type
    # ("flat"), a varied one ("normal") — f04's degenerate groups —
    # plus signup/purchase streams arranged so segment MACHINERY has
    # purchases but ZERO signups (g16's degenerate segment).
    events = []
    eid = 0

    def ev(user, etype, value, minutes):
        nonlocal eid
        events.append(
            (eid, base + dt.timedelta(minutes=minutes), user, etype, value, "{}")
        )
        eid += 1

    ev(0, "solo", 41.5, 0)                      # n=1 group
    for i in range(5):
        ev(0, "flat", 7.0, 10 + i)              # constant group
    for i, v in enumerate([1.25, -3.5, 10.0, 10.0, 2.75, 0.0]):
        ev(0, "normal", v, 30 + i)              # healthy group
    # BUILDING users: signup then purchase (one converts, one does not)
    ev(1, "signup", 1.0, 100)
    ev(1, "purchase", 5.0, 160)
    ev(2, "signup", 1.0, 100)
    # MACHINERY users: purchases only — the zero-signup segment
    ev(3, "purchase", 9.0, 100)
    ev(4, "purchase", 2.0, 110)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    cust = [
        (1, "Customer#1", "BUILDING"),
        (2, "Customer#2", "BUILDING"),
        (3, "Customer#3", "MACHINERY"),
        (4, "Customer#4", "MACHINERY"),
    ]
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_mktsegment string"
    ).coalesce(1).write.parquet(os.path.join(d, "customer.parquet"))

    # lineitem: per-returnflag degenerate shapes for safe_corr —
    # 'S' single row (NULL corr), 'C' constant quantity (NULL corr),
    # 'N' one-sided nulls (the pairwise-masking falsifying shape:
    # corr over complete pairs only => exactly -1.0), 'R' healthy.
    li = [
        ("S", 3.0, 120.00),
        ("C", 5.0, 100.00), ("C", 5.0, 250.00), ("C", 5.0, 175.50),
        ("N", None, 0.00), ("N", 1.0, 0.01), ("N", 2.0, 0.00),
        ("R", 1.0, 10.00), ("R", 2.0, 30.00), ("R", 7.0, 55.25),
        ("R", 4.0, 41.75),
    ]
    spark.createDataFrame(
        li, "l_returnflag string, l_quantity double, l_extendedprice double"
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))

    # orders: constant total price — b36's degenerate range
    orders = [(i, 5000.0) for i in range(12)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_totalprice double"
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
    return d


@pytest.fixture(scope="module")
def deg_duck(deg_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("events", "customer", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{deg_sf_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    ["b27_agg_stats", "b36_histogram", "g16_event_funnel", "f04_apply_in_pandas"],
)
def test_degenerate_parity(name, spark, deg_sf_dir, deg_duck):
    rq = _REG[name]
    df = rq.fn(spark, deg_sf_dir)
    res = compare(name, df, deg_duck, rq.oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"


def test_degenerate_shapes_are_degenerate(spark, deg_sf_dir, deg_duck):
    """Non-vacuousness: the corpus really contains the shapes the fixes
    target — a zero-signup segment, a singleton and a constant
    event_type group, a zero-width price range, and NULL-corr
    returnflag groups — and the hardened paths emit the NULL/0 the
    oracles agree on."""
    rows = {
        r[0]: r[1:]
        for r in deg_duck.execute(
            "SELECT c.c_mktsegment, "
            "SUM(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END) "
            "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
            "GROUP BY 1"
        ).fetchall()
    }
    assert rows["MACHINERY"] == (0,)
    g16 = {r.c_mktsegment: r.conversion for r in
           _REG["g16_event_funnel"].fn(spark, deg_sf_dir).collect()}
    assert g16["MACHINERY"] is None and g16["BUILDING"] == 0.5
    f04 = _REG["f04_apply_in_pandas"].fn(spark, deg_sf_dir)
    by_type = {
        r.event_type: r.z
        for r in f04.collect()
        if r.event_type in ("solo", "flat")
    }
    assert by_type == {"solo": None, "flat": None}
    b36 = {r.bucket: r.n for r in _REG["b36_histogram"].fn(spark, deg_sf_dir).collect()}
    assert b36 == {0: 12}
    b27 = {r.l_returnflag: r.corr_qty_price for r in
           _REG["b27_agg_stats"].fn(spark, deg_sf_dir).collect()}
    assert b27["S"] is None and b27["C"] is None and b27["N"] == -1.0
