"""Local replica of the driver's oracle-parity check (SURVEY.md §5.3 #1).

Runs a registered Spark query and its DuckDB oracle side by side and
compares row count, column names/order-insensitive schema shape, and the
order-insensitive multiset of rows — strictly (exact equality after the
queries' own rounding), because the driver hashes values.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
from dataclasses import dataclass, field

import duckdb

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize a cell for multiset comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))  # exact — rounding discipline must hold
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, _dt.timedelta):
        return ("td", v.total_seconds())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon_value(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon_value(x)) for k, x in v.items())))
    if isinstance(v, _decimal.Decimal):
        # Tagged DISTINCTLY from float on purpose: the driver's pandas
        # paths canonicalize DECIMAL differently per engine (DuckDB
        # fetchdf -> float64, Spark toPandas -> decimal.Decimal), so a
        # query emitting Decimal on one side and float on the other is a
        # guaranteed driver hash-fail.  Folding Decimal into float here
        # masked exactly that for d10 in round 3 (VERDICT r03 item 3) —
        # now it fails the local replica too.
        return ("decimal", str(v))
    return (type(v).__name__, str(v))


def hash_unsafe_columns(df) -> list[str]:
    """Columns whose type (nested included) can't hash-match cross-engine.

    Two Spark output types are known to canonicalize differently across
    the driver's pandas paths and therefore must never appear in a
    hash-tier query's emitted schema (SURVEY §5.4 items 9 and 11):

    - ``DateType``: DuckDB ``fetchdf`` -> datetime64, Spark ``toPandas``
      -> ``datetime.date`` objects.  Emit a midnight TIMESTAMP instead.
    - ``DecimalType``: DuckDB ``fetchdf`` -> float64, Spark ``toPandas``
      -> ``decimal.Decimal`` objects (the r03 d10 driver hash-fail).
      Keep decimal arithmetic internal; cast to DOUBLE at the emit
      boundary.
    """
    from pyspark.sql import types as T

    def unsafe(dt) -> bool:
        if isinstance(dt, (T.DateType, T.DecimalType)):
            return True
        if isinstance(dt, T.ArrayType):
            return unsafe(dt.elementType)
        if isinstance(dt, T.MapType):
            return unsafe(dt.keyType) or unsafe(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(unsafe(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in df.schema.fields if unsafe(f.dataType)]


def _contains_nan(canon) -> bool:
    """True if a canonicalized cell/row contains the NaN tag anywhere
    (nested lists/maps included)."""
    if canon == ("float", "nan"):
        return True
    if isinstance(canon, tuple):
        return any(_contains_nan(x) for x in canon)
    return False


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)
    spark_has_nan: bool = False


def compare(name, spark_df, con, oracle_sql) -> ParityResult:
    """Strict driver-replica comparison.

    Rows are fetched natively (Spark ``collect``, DuckDB ``fetchall``),
    NOT via pandas: float64 pandas frames represent SQL NULL as NaN, so
    a toPandas-based compare silently conflates the two (VERDICT r02
    "What's wrong" #3). Native rows keep None and float('nan')
    distinct, and ``_canon_value`` tags them distinctly — a query that
    emits NaN where the oracle emits NULL now FAILS here, matching what
    an un-truncated driver hash sweep would do. ``spark_has_nan``
    additionally reports whether the Spark side emitted any NaN at all
    (H-tier queries must not — tests/test_oracle_parity.py asserts)."""
    s_schema = list(spark_df.columns)
    s_data = spark_df.collect()
    cur = con.execute(oracle_sql)
    o_schema = [d[0] for d in cur.description]
    o_data = cur.fetchall()
    s_cols = sorted(s_schema)
    o_cols = sorted(o_schema)
    if s_cols != o_cols:
        return ParityResult(
            name, False, f"column mismatch: spark={s_cols} oracle={o_cols}"
        )
    sr, orr = len(s_data), len(o_data)
    if sr != orr:
        return ParityResult(
            name, False, f"row count: spark={sr} oracle={orr}", sr, orr
        )
    s_idx = [s_schema.index(c) for c in s_cols]
    o_idx = [o_schema.index(c) for c in o_cols]

    def rows(data, idx):
        return sorted(
            (tuple(_canon_value(r[i]) for i in idx) for r in data), key=repr
        )

    s_rows = rows(s_data, s_idx)
    o_rows = rows(o_data, o_idx)
    has_nan = any(_contains_nan(r) for r in s_rows)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        return ParityResult(
            name,
            False,
            f"value mismatch ({len(diffs)}+ shown)",
            sr,
            orr,
            diffs,
            has_nan,
        )
    return ParityResult(name, True, "", sr, orr, spark_has_nan=has_nan)
