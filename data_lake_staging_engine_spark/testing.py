"""Local replica of the driver's oracle-parity check (SURVEY.md §5.3 #1).

Runs a registered Spark query and its DuckDB oracle side by side and
compares row count, column names/order-insensitive schema shape, and the
order-insensitive multiset of rows — strictly (exact equality after the
queries' own rounding), because the driver hashes values.
"""

from __future__ import annotations

import datetime as _dt
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
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("float", repr(float(v)))
    except Exception:
        pass
    return (type(v).__name__, str(v))


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)


def compare(name, spark_df, con, oracle_sql) -> ParityResult:
    sdf = spark_df.toPandas()
    odf = con.execute(oracle_sql).fetchdf()
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    if s_cols != o_cols:
        return ParityResult(
            name, False, f"column mismatch: spark={s_cols} oracle={o_cols}"
        )
    sr, orr = len(sdf), len(odf)
    if sr != orr:
        return ParityResult(
            name, False, f"row count: spark={sr} oracle={orr}", sr, orr
        )
    import numpy as np
    import pandas as pd

    def norm_cell(x):
        if x is None or x is pd.NaT:
            return None
        if isinstance(x, np.generic):
            x = x.item()
        if isinstance(x, float) and math.isnan(x):
            return None  # NaN/NULL conflated identically on both sides
        if isinstance(x, np.ndarray):
            x = x.tolist()
        return x

    def rows(df):
        out = []
        for tup in df[s_cols].itertuples(index=False, name=None):
            out.append(tuple(_canon_value(norm_cell(x)) for x in tup))
        return sorted(out, key=repr)

    s_rows = rows(sdf)
    o_rows = rows(odf)
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
        )
    return ParityResult(name, True, "", sr, orr)
