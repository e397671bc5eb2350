"""Time-hostile regression pins (round 9).

The time-hostile adversarial corpus (scripts/make_adversarial_corpus.py
--time-hostile) surfaced three real divergences the polite fixtures
could never show — all three in surfaces SURVEY.md §7's hard-list had
explicitly ranked as risks:

1. b18 (hard-list #2): ``lag()`` over a row ordering returns the TIED
   row on a (user_id, ts) duplicate, violating the strict ``p.ts >
   e.ts`` as-of contract (sweep: spark=172 vs oracle=166). Fixed with a
   RANGE frame ending at -1 µs.
2. e03 (hard-list #3): Spark ``session_window`` MERGES an event at
   exactly last_ts + gap (the merge iterator treats end == next start
   as overlap); the oracle's ``>=`` split flag emitted 634 sessions vs
   Spark's 535. Fixed to a strict ``>`` flag.
3. e06/f04: the applyInPandas(WithState) input deserializers cast
   timestamps to Arrow timestamp[ns]; a year-1500 event crashes the
   worker even though neither fold reads ts. Fixed by pruning to the
   columns actually read before the pandas boundary.
4. e08/e12: Structured Streaming's watermark starts at epoch 0, so
   epoch-adjacent rows are born late and their joined pairs silently
   vanish (spark=47 vs oracle=75), and one far-future clock would drag
   the watermark centuries ahead. Fixed with the event-time validity
   gate (_gate_event_time), mirrored in the oracles.

Plus the c07/c08 scale bug: the hour grid is SPAN-proportional, so one
hostile timestamp (1500..2260 => 6.7M hours) blew up the single-task
``sequence()`` explode and the grid-side broadcast. Fixed with the
distributed two-level year->hour generation (operators/windows.py
``_dense_hour_grid``); the span test here proves a multi-century grid
actually computes.

Each parity test runs the REGISTERED query against its REGISTERED
oracle on the same synthetic parquet — the driver-sweep shape.
"""

import datetime as dt
import os

import duckdb
import pytest
# Slow tier (pytest.ini): hostile-timestamp parity sweep.
pytestmark = pytest.mark.slow


from pyspark.sql import functions as F

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare

_REG = registry()


@pytest.fixture(scope="module")
def hostile_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("time_hostile"))
    rows = []
    # user 13: six events at EXACT 1800 s gaps -> ONE session_window
    # session (merge-at-boundary), one c10 session.
    t13 = dt.datetime(2024, 3, 1)
    rows += [
        (1300 + i, t13 + dt.timedelta(seconds=1800 * i), 13, "click", 1.25, "{}")
        for i in range(6)
    ]
    # user 11: six events at 1801 s gaps -> every event its own session.
    t11 = dt.datetime(2024, 4, 1)
    rows += [
        (1100 + i, t11 + dt.timedelta(seconds=1801 * i), 11, "click", 2.5, "{}")
        for i in range(6)
    ]
    # user 12: singleton click, then a (click, purchase) pair TIED at
    # the identical timestamp — the strict as-of must skip the tied
    # click (1201) and match the singleton (1200).
    t12 = dt.datetime(2024, 5, 1)
    rows += [
        (1200, t12, 12, "click", 1.0, "{}"),
        (1201, t12 + dt.timedelta(seconds=1800), 12, "click", 1.0, "{}"),
        (1202, t12 + dt.timedelta(seconds=1800), 12, "purchase", 3.75, "{}"),
    ]
    # user 14: a purchase whose ONLY earlier-or-equal row is tied ->
    # no strict match; BOTH engines must drop it (inner as-of).
    t14 = dt.datetime(2024, 6, 1)
    rows += [
        (1400, t14, 14, "click", 1.0, "{}"),
        (1401, t14, 14, "purchase", 2.0, "{}"),
    ]
    # user 7: timestamps far outside pandas' datetime64[ns] range
    # (1677..2262) on BOTH sides — the e06 worker-crash shape.
    rows += [
        (700, dt.datetime(1500, 6, 15, 12, 34, 56), 7, "purchase", 10.01, "{}"),
        (701, dt.datetime(9999, 1, 1), 7, "purchase", 0.99, "{}"),
        (702, dt.datetime(2024, 1, 1), 7, "purchase", -5.5, "{}"),
    ]
    # NULL join keys: a NULL-user click then a NULL-user purchase.
    # JOIN equality matches NOTHING on NULL (the oracle's ASOF drops
    # purchase 901), but window partitionBy groups all NULL keys into
    # one partition and matches them to each other — the round-9
    # null-key corpus caught b18 doing exactly that (200 vs 182 rows).
    rows += [
        (900, dt.datetime(2024, 8, 1, 12, 0, 0), None, "click", 1.0, "{}"),
        (901, dt.datetime(2024, 8, 1, 12, 30, 0), None, "purchase", 2.0, "{}"),
    ]
    # user 8: an epoch-adjacent signup/purchase pair (born late against
    # Structured Streaming's initial epoch-0 watermark — the e08/e12
    # silent-drop shape; the validity gate excludes it on BOTH engines)
    # plus a sane in-window pair that must survive.
    rows += [
        (800, dt.datetime(1969, 12, 31, 23, 59, 59, 999999), 8, "signup", 1.0, "{}"),
        (801, dt.datetime(1970, 1, 1, 0, 5, 0), 8, "purchase", 2.0, "{}"),
        (802, dt.datetime(2024, 7, 1, 12, 0, 0), 8, "signup", 1.0, "{}"),
        (803, dt.datetime(2024, 7, 1, 12, 5, 0), 8, "purchase", 2.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{hostile_sf_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "b18_join_asof",
        "e03_stream_session",
        "e06_stream_stateful",
        # f04: applyInPandas converts every input column; pre-fix it
        # shipped the unused ts through the ns-casting deserializer —
        # the same crash class as e06, caught by the same corpus.
        "f04_apply_in_pandas",
        # e08/e12: epoch-adjacent rows are born late against the
        # initial epoch-0 watermark (pre-gate: silently dropped pairs,
        # spark=47 vs oracle=75 on the sweep corpus); the validity
        # gate excludes them identically on both engines.
        "e08_stream_stream_join",
        "e12_stream_outer_join",
    ],
)
def test_hostile_parity(name, spark, hostile_sf_dir, hostile_duck):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, hostile_sf_dir), hostile_duck, rq.oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"


def test_b18_strict_inequality_on_ties(spark, hostile_sf_dir):
    """Oracle-independent pin of the strict `>`: the tied purchase
    (1202) matches the singleton (1200), not its tied sibling (1201);
    the tie-only purchase (1401) is dropped entirely."""
    out = {
        r["purchase_id"]: r["prev_id"]
        for r in _REG["b18_join_asof"].fn(spark, hostile_sf_dir).collect()
    }
    assert out[1202] == 1200, out
    assert 1401 not in out, out
    # NULL key = join semantics (matches nothing), not window-grouping
    assert 901 not in out, out


def test_session_window_exact_gap_merges(spark, hostile_sf_dir):
    """Direct empirical pin of Spark session_window boundary semantics
    (referenced from e03's docstring): exact-gap chains merge into one
    session; gap+1s chains split per event."""
    e = spark.read.parquet(os.path.join(hostile_sf_dir, "events.parquet"))
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    per_user = {r["user_id"]: r["count"] for r in sessions}
    assert per_user[13] == 1, per_user  # exact 1800 s gaps: ONE session
    assert per_user[11] == 6, per_user  # 1801 s gaps: six sessions


def test_gapfill_multi_century_span(spark, tmp_path):
    """c07's grid must COMPUTE on a multi-century span (the pre-fix
    single-task sequence + 40M-row grid broadcast hung the sweep).
    Two events 150 years apart -> hours(1900..2050) x 2 types cells,
    asserted by exact count without collecting the grid."""
    d = str(tmp_path / "span_sf")
    rows = [
        (1, dt.datetime(1900, 1, 1), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2050, 1, 1), 2, "purchase", 2.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    n_hours = (
        int((dt.datetime(2050, 1, 1) - dt.datetime(1900, 1, 1)).total_seconds())
        // 3600
        + 1
    )
    out = _REG["c07_gapfill"].fn(spark, d)
    assert out.count() == n_hours * 2
    nonzero = out.filter(F.col("n") > 0)
    assert nonzero.count() == 2


def test_forward_fill_two_phase_wide_span(spark, tmp_path):
    """c08's round-10 two-phase decomposition: a few-types,
    multi-century grid must NOT serialize each type's whole dense
    series through one window task (the round-9 residual — measured
    2.6M cells through 2 tasks).  Three checks on a 150-year span:

    1. the heavy running-fill window partitions on (event_type, year
       block), so its max task is one type-year (≤ 8 784 rows) — read
       off the physical plan's window partition spec;
    2. the computation COMPLETES and fills correctly: every cell from
       the first observation onward carries the right value ACROSS
       year boundaries (the carry phase), cells before it stay NULL;
    3. result equals the naive single-window global fill, row for row.
    """
    d = str(tmp_path / "ffill_span_sf")
    rows = [
        # type 'click': observations in 1900 and 1980 — the 1980 cell
        # must override the 1900 carry; everything between carries 1.5.
        (1, dt.datetime(1900, 6, 1, 0, 30), 1, "click", 1.5, "{}"),
        (2, dt.datetime(1980, 3, 1, 12, 30), 1, "click", 2.25, "{}"),
        # type 'purchase': single observation near the END of the span
        # — its earlier cells stay NULL for 149 years of blocks.
        (3, dt.datetime(2049, 12, 31, 10, 30), 2, "purchase", 7.0, "{}"),
        # span framer
        (4, dt.datetime(2050, 1, 1), 2, "purchase", 9.0, "{}"),
        (5, dt.datetime(1900, 1, 1), 1, "click", 0.25, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    out = _REG["c08_win_forward_fill"].fn(spark, d)

    # (1) plan shape: the row-level running fill partitions on the
    # year block, not on event_type alone — and the heavy grid-window
    # subtree is planned exactly once (the carry branch reads the
    # small observations agg, not a second copy of the grid).
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    assert re.search(
        r"windowspecdefinition\(event_type#\d+, _blk#\d+, h#\d+", plan
    ), f"no (type, year-block) running-fill window in plan:\n{plan}"
    hour_fills = re.findall(
        r"last\(hour_sum#\d+, true\) windowspecdefinition", plan
    )
    assert len(hour_fills) == 1, (len(hour_fills), plan)

    # (2) spot values across year boundaries.
    sample = {
        (r.h, r.event_type): (r.hour_sum, r.filled_sum)
        for r in out.filter(
            F.col("h").isin(
                dt.datetime(1950, 1, 1, 0, 0),   # click mid-carry
                dt.datetime(1980, 3, 1, 12, 0),  # click new observation
                dt.datetime(2049, 1, 1, 0, 0),   # purchase still NULL
                dt.datetime(2049, 12, 31, 12, 0),  # purchase post-obs
            )
        ).collect()
    }
    assert sample[(dt.datetime(1950, 1, 1), "click")] == (None, 1.5)
    assert sample[(dt.datetime(1980, 3, 1, 12), "click")] == (2.25, 2.25)
    assert sample[(dt.datetime(2049, 1, 1), "purchase")] == (None, None)
    assert sample[(dt.datetime(2049, 12, 31, 12), "purchase")] == (None, 7.0)

    # (3) full equivalence with the naive global single-window fill.
    from pyspark.sql import Window

    naive_base = out.select("h", "event_type", "hour_sum")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = naive_base.select(
        "h",
        "event_type",
        "hour_sum",
        F.last("hour_sum", ignorenulls=True).over(w).alias("filled_sum"),
    )
    assert out.exceptAll(naive).count() == 0
    assert naive.exceptAll(out).count() == 0
