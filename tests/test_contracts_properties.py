"""Property-based checks for the round-10/11 contract surfaces:
validate_ingest's algebra and the portable digest fold.

The example-based suites (test_contracts.py, test_contracts_pipeline_e2e
.py) pin specific corpora; these pin the INVARIANTS any batch must
satisfy — the disjoint-cover algebra, checkpoint idempotence, and the
cross-engine determinism of the ASCII-only fold — over
hypothesis-generated inputs.
"""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from data_lake_staging_engine_spark.contracts import validate_ingest

import pytest
# Slow tier (pytest.ini): property-based contract fuzzing.
pytestmark = pytest.mark.slow


_SCHEMA = "event_id long, ts timestamp, user_id long, value double"

_BASE_TS = dt.datetime(2024, 3, 1, 12, 0, 0)

# Rows drawn to hit every disposition: sane, non-finite measure,
# out-of-window / NULL clock, NULL key, and duplicate ids.
_row = st.tuples(
    st.integers(min_value=0, max_value=7),  # small id space => dup ids
    st.one_of(
        st.none(),
        st.just(_BASE_TS),
        st.just(dt.datetime(1969, 12, 31, 23, 59, 59)),
        st.just(dt.datetime(2260, 1, 1)),
        st.datetimes(
            min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 1, 1)
        ),
    ),
    st.one_of(st.none(), st.integers(min_value=1, max_value=3)),
    st.one_of(
        st.none(),
        st.just(float("nan")),
        st.just(float("inf")),
        st.just(float("-inf")),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
)
_batches = st.lists(_row, min_size=0, max_size=25)

_CONTRACTS = dict(
    finite_measures=("value",),
    event_time_col="ts",
    join_keys=("user_id",),
    identity_keys=("event_id",),
    identity_order=("ts", "event_id"),
)


def _mk(spark, rows):
    # Unique-ify the (id, ts) tiebreaker so keep-latest is total: the
    # contract REQUIRES a total recency rank (identity_order docstring);
    # feed it one by perturbing ts microseconds by row position.
    fixed = []
    for i, (eid, ts, uid, val) in enumerate(rows):
        if ts is not None:
            ts = ts + dt.timedelta(microseconds=i)
        fixed.append((eid, ts, uid, val))
    return spark.createDataFrame(fixed, _SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example([])  # empty batch: every frame empty, nothing throws
@example([(1, _BASE_TS, 1, 1.0), (1, _BASE_TS, 1, 2.0)])  # pure dup
@given(_batches)
def test_validate_ingest_disjoint_cover_and_idempotence(spark, rows):
    """For ANY batch: (1) the five output frames are pairwise disjoint
    and their union is the input (no row invented, lost, or double-
    assigned); (2) the checkpoint is idempotent — validating the clean
    frame again rejects nothing."""
    df = _mk(spark, rows)
    rep = validate_ingest(df, **_CONTRACTS)

    frames = dict(rep.rejects())
    frames["clean"] = rep.clean
    # Disjoint cover over the row multiset (unique (event_id, _row) not
    # available — use full-row multisets).
    def multiset(f):
        out = {}
        for r in f.collect():
            # repr floats: NaN keys never compare equal to themselves,
            # which would break dict equality on the nonfinite frame.
            k = tuple(repr(v) if isinstance(v, float) else v for v in r)
            out[k] = out.get(k, 0) + 1
        return out

    total: dict = {}
    for f in frames.values():
        for k, n in multiset(f).items():
            total[k] = total.get(k, 0) + n
    assert total == multiset(df)

    # Idempotence: clean input passes untouched.
    rep2 = validate_ingest(rep.clean, **_CONTRACTS)
    assert rep2.reject_counts() == {
        "nonfinite": 0,
        "out_of_time": 0,
        "null_keys": 0,
        "superseded": 0,
    }
    assert rep2.clean.count() == rep.clean.count()


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("aAzZ09 _-") + ["İ", "ı", "ß", "Σ", "σ", "ς", "é", "É", "中"]
        ),
        max_size=12,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@example(["İstanbul", "istanbul", "ISTANBUL"])  # the divergence class
@example(["straße", "STRASSE"])  # one-to-many upper
@given(_texts)
def test_portable_fold_matches_duckdb_on_any_text(spark, texts):
    """portable_casefold is the SAME function on both engines for any
    input — including the one-to-many Unicode classes where lower()
    provably diverges (pinned in test_text_hostile). This is the
    property that makes the portable digest portable."""
    from pyspark.sql import functions as F

    from data_lake_staging_engine_spark.operators.llmops import (
        PORTABLE_CASEFOLD_SQL,
        portable_casefold,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: r.f
        for r in df.select("i", portable_casefold(F.col("t")).alias("f")).collect()
    }
    con = duckdb.connect()
    # Bind each text as a parameter — a repr() literal in SQL text
    # would re-escape quotes/backslashes and test the escaping, not
    # the fold.
    expected = {
        i: con.execute(
            f"SELECT {PORTABLE_CASEFOLD_SQL.format(col='?')}", [t]
        ).fetchone()[0]
        for i, t in enumerate(texts)
    }
    con.close()
    assert got == expected
