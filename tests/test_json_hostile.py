"""JSON-hostile props pins (round 10) — the sixth hostile surface.

The adversarial corpus (round 9) attacked props with MALFORMED and
empty JSON; this probe attacks WELL-FORMED payloads whose $.k holds
hostile VALUES — the shapes an open-ended event stream actually
carries. Two fixture-latent crashes found and fixed:

1. **d07**: ``get_json_object(...).cast("long")`` THROWS under ANSI
   the moment $.k is an object/array/float (CAST_INVALID_INPUT on the
   extracted text).  Fixed with ``try_cast``; the oracle now mirrors
   each idiom's exact leniency (regexp-guarded integral text for
   k_get, json_type-guarded unquoted integers for k_map).
2. **d09**: ``variant_get(v, "$.k", "bigint")`` THROWS
   INVALID_VARIANT_CAST on a non-castable variant (nested object).
   Fixed with ``try_variant_get``.

Plus three cross-engine/idiom semantics worth pinning so drift fails
loudly:

- VARIANT rejects DUPLICATE KEYS outright (try_parse_json shreds the
  whole payload to NULL) where get_json_object / from_json / DuckDB
  all take the FIRST binding.
- Spark's string->long try_cast is integral-only (rejects '1.9',
  '1e3') where DuckDB's TRY_CAST rounds ('1.9' -> 2) — the reason
  d07's oracle carries the regexp guard.
- try_variant_get("bigint") COERCES: quoted integral strings parse,
  doubles TRUNCATE toward zero (1.9 -> 1), booleans map to 1/0.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare

_REG = registry()

# (tag, props) — every class a well-formed-but-hostile payload except
# the malformed/NULL controls at the end.
CASES = [
    ("dupkey", '{"k": 1, "k": 2}'),
    ("i64max", '{"k": 9223372036854775807}'),
    ("i64over", '{"k": 9223372036854775808}'),
    ("nested", '{"k": {"a": 1}}'),
    ("strnum", '{"k": "12"}'),
    ("strnum_pad", '{"k": " 12 "}'),
    ("strnum_plus", '{"k": "+5"}'),
    ("strfloat", '{"k": "1.0"}'),
    ("floatval", '{"k": 1.9}'),
    ("scinot", '{"k": 1e3}'),
    ("nullval", '{"k": null}'),
    ("deep", '{"k": ' + "[" * 80 + "1" + "]" * 80 + "}"),
    ("unicode_key", '{"\\u006b": 5}'),
    ("ws", '{\n  "k" : 7\n}'),
    ("arrval", '{"k": [1,2,3]}'),
    ("boolval", '{"k": true}'),
    ("negzero", '{"k": -0}'),
    ("negint", '{"k": -42}'),
    ("empty_obj", "{}"),
    ("malformed", "not json"),
    ("empty_str", ""),
    ("null_props", None),
]


@pytest.fixture(scope="module")
def json_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("json_hostile"))
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "click", 1.0, p) for i, (_tag, p) in enumerate(CASES)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def json_duck(json_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{json_sf_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


def test_d07_hash_parity_on_hostile_values(spark, json_sf_dir, json_duck):
    """The registered d07 vs its oracle over EVERY hostile class —
    the oracle's regexp/json_type guards mirror Spark's two idioms
    exactly, so this corpus is hash-green, not just crash-free."""
    rq = _REG["d07_fn_json"]
    res = compare("d07_fn_json", rq.fn(spark, json_sf_dir), json_duck, rq.oracle)
    assert res.ok, res.detail


def test_d09_crash_free_and_coercions(spark, json_sf_dir):
    """d09 completes on every class (was INVALID_VARIANT_CAST on
    'nested' before try_variant_get) and the coercion table is pinned:
    strings parse, doubles truncate, booleans map, containers NULL."""
    out = {
        r.event_id: (r.k_variant, r.k_string)
        for r in _REG["d09_fn_variant"].fn(spark, json_sf_dir).collect()
    }
    tag = {i: t for i, (t, _p) in enumerate(CASES)}
    by = {tag[i]: v for i, v in out.items()}
    assert by["i64max"] == (9223372036854775807, "9223372036854775807")
    assert by["i64over"] == (None, "9223372036854775808")
    assert by["nested"] == (None, '{"a":1}')
    assert by["strnum"] == (12, "12")
    assert by["floatval"] == (1, "1.9")  # double->long TRUNCATES
    assert by["scinot"] == (1000, "1000.0")
    assert by["boolval"] == (1, "true")
    assert by["arrval"] == (None, "[1,2,3]")
    assert by["negint"] == (-42, "-42")
    assert by["nullval"] == (None, None)
    assert by["malformed"] == (None, None)
    assert by["null_props"] == (None, None)


def test_variant_rejects_duplicate_keys_others_take_first(
    spark, json_sf_dir, json_duck
):
    """The dupkey payload: try_parse_json shreds the WHOLE payload to a
    NULL variant, while get_json_object, typed from_json, and DuckDB's
    json_extract_string all take the FIRST binding.  Pinned on all
    three surfaces so an engine upgrade that changes either side fails
    here first."""
    i = [t for t, _p in CASES].index("dupkey")
    d09 = {
        r.event_id: (r.k_variant, r.k_string)
        for r in _REG["d09_fn_variant"].fn(spark, json_sf_dir).collect()
    }
    assert d09[i] == (None, None)
    d07 = {
        r.event_id: (r.k_get, r.k_map)
        for r in _REG["d07_fn_json"].fn(spark, json_sf_dir).collect()
    }
    assert d07[i] == (1, 1)
    duck = json_duck.execute(
        """SELECT json_extract_string('{"k": 1, "k": 2}', '$.k')"""
    ).fetchone()[0]
    assert duck == "1"


def test_string_to_long_leniency_divergence_pin(spark, json_duck):
    """Why d07's oracle carries the regexp guard: Spark's
    string->long try_cast is integral-only, DuckDB's TRY_CAST rounds.
    Pin both engines' raw behavior."""
    row = (
        spark.range(1)
        .select(
            F.lit("1.9").try_cast("long").alias("a"),
            F.lit("1e3").try_cast("long").alias("b"),
            F.lit(" 12 ").try_cast("long").alias("c"),
        )
        .collect()[0]
    )
    assert (row.a, row.b, row.c) == (None, None, 12)
    duck = json_duck.execute(
        "SELECT TRY_CAST('1.9' AS BIGINT), TRY_CAST('1e3' AS BIGINT), "
        "TRY_CAST(' 12 ' AS BIGINT)"
    ).fetchone()
    assert duck == (2, 1000, 12)
