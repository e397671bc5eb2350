"""a23 non-additive schema evolution: the explicit widening policy.

VERDICT r02 item 8: a21 covers additive merge only; type widening
(int->long, float->double) and the REFUSAL of lossy/impossible changes
need first-class coverage.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_lake_staging_engine_spark.operators.staging import (
    read_widened,
    widen_schemas,
    widen_type,
)


def test_widen_integrals():
    assert widen_type(IntegerType(), LongType()) == LongType()
    assert widen_type(LongType(), IntegerType()) == LongType()
    assert widen_type(ByteType(), ShortType()) == ShortType()
    assert widen_type(IntegerType(), IntegerType()) == IntegerType()


def test_widen_floats_and_cross_kind():
    assert widen_type(FloatType(), DoubleType()) == DoubleType()
    # int32 meets floating at double (exact embedding)
    assert widen_type(IntegerType(), FloatType()) == DoubleType()
    assert widen_type(DoubleType(), ShortType()) == DoubleType()


def test_widen_refuses_lossy_and_incompatible():
    # long -> double silently loses precision past 2^53: refused
    with pytest.raises(TypeError, match="incompatible schema evolution"):
        widen_type(LongType(), DoubleType())
    with pytest.raises(TypeError, match="incompatible schema evolution"):
        widen_type(StringType(), LongType())
    with pytest.raises(TypeError, match="incompatible schema evolution"):
        widen_type(TimestampType(), LongType())


def test_widen_schemas_union_and_order():
    s1 = StructType(
        [StructField("a", IntegerType()), StructField("b", FloatType())]
    )
    s2 = StructType(
        [StructField("b", DoubleType()), StructField("c", StringType())]
    )
    out = widen_schemas([s1, s2])
    assert [f.name for f in out.fields] == ["a", "b", "c"]  # first-seen order
    assert [f.dataType for f in out.fields] == [
        IntegerType(),
        DoubleType(),
        StringType(),
    ]
    assert all(f.nullable for f in out.fields)


def test_read_widened_rejects_incompatible_batches(spark, tmp_path):
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.range(5).select(
        F.col("id"), F.col("id").cast("string").alias("v")
    ).write.parquet(old)
    spark.range(5).select(
        F.col("id"), (F.col("id") * 1.5).alias("v")
    ).write.parquet(new)
    with pytest.raises(TypeError, match="incompatible schema evolution"):
        read_widened(spark, [old, new])


def test_read_widened_end_to_end(spark, tmp_path):
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.range(3).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("float").alias("v"),
    ).write.parquet(old)
    spark.range(3, 6).select(
        F.col("id").alias("k"),
        (F.col("id") + F.lit(0.25)).alias("v"),
        F.lit("new").alias("tag"),
    ).write.parquet(new)
    out = read_widened(spark, [old, new])
    assert dict((f.name, f.dataType) for f in out.schema.fields) == {
        "k": LongType(),
        "v": DoubleType(),
        "tag": StringType(),
    }
    rows = {(r.k, r.v, r.tag) for r in out.collect()}
    assert rows == {
        (0, 0.0, None),
        (1, 1.0, None),
        (2, 2.0, None),
        (3, 3.25, "new"),
        (4, 4.25, "new"),
        (5, 5.25, "new"),
    }
