"""The d10-class regression guard (VERDICT r03 item 3).

Round 3's only driver hash-fail was a DecimalType output column: the
driver compares via pandas, where DuckDB renders DECIMAL as float64 but
Spark keeps ``decimal.Decimal`` — equal values, different hash.  The
local replica masked it because ``_canon_value`` folded Decimal into
float.  These tests prove the hardened replica goes RED on a deliberate
decimal/date-emitting probe, so the class can't ride to the driver again.
"""

import decimal

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.testing import (
    _canon_value,
    compare,
    duck_connection,
    hash_unsafe_columns,
)

SF_DIR = "/root/testdata/sf0.01"


def test_canon_tags_decimal_distinct_from_float():
    assert _canon_value(decimal.Decimal("1.50")) != _canon_value(1.5)
    assert _canon_value(decimal.Decimal("1.50")) == _canon_value(
        decimal.Decimal("1.50")
    )


def test_hash_unsafe_detects_decimal_and_date(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.col("id").cast("decimal(18,2)").alias("dec_col"),
        F.current_date().alias("date_col"),
        F.array(F.col("id").cast("decimal(10,0)")).alias("nested_dec"),
        F.struct(F.current_date().alias("d")).alias("nested_date"),
    )
    assert hash_unsafe_columns(df) == [
        "dec_col",
        "date_col",
        "nested_dec",
        "nested_date",
    ]
    safe = spark.range(3).select(
        "id", F.col("id").cast("double").alias("dbl")
    )
    assert hash_unsafe_columns(safe) == []


def test_probe_decimal_query_fails_parity(spark):
    """A value-equal decimal-vs-float pairing must FAIL the replica now.

    Spark emits DECIMAL(18,2); the oracle emits the float64 the driver's
    DuckDB pandas path would produce.  Pre-hardening this compared equal
    (Decimal folded to float) — the exact masking that let d10 reach the
    driver red.
    """
    probe = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where(F.col("o_orderkey") < 400)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    assert hash_unsafe_columns(probe) == ["price"]
    con = duck_connection(SF_DIR)
    try:
        res = compare(
            "decimal_probe",
            probe,
            con,
            """
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                     AS price
            FROM orders WHERE o_orderkey < 400
            """,
        )
        assert not res.ok, "decimal-vs-float probe must fail parity"
        assert "value mismatch" in res.detail
    finally:
        con.close()
