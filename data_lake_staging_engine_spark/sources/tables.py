"""Fixture-table access layer.

The ten driver-generated tables (TESTDATA.md) live as single parquet
files per scale-factor dir. ``load`` is the one scan entry point every
operator uses, so scan-level concerns (vectorized reader, pushdown,
future bucketing) are centralized here.

Scale posture: ``spark.read.parquet`` is the DataSource V1/V2 vectorized
path — predicate pushdown + column pruning reach the parquet row groups
automatically when callers filter/select on the returned DataFrame
(verify with ``df.explain``: ``PushedFilters``/``ReadSchema``). At 100 TB
the same call reads a multi-file partitioned prefix; nothing here assumes
a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table from ``sf_dir``.

    ``events.ts`` is NANOS-precision parquet, which Spark reads as int64
    under ``spark.sql.legacy.parquet.nanosAsLong`` (session.py) — the
    loader converts it to a microsecond timestamp by integer division,
    bit-matching DuckDB's ns->us truncation (verified on fixtures).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for SQL-entry queries
    (grouping sets, correlated subqueries — SURVEY.md §3.2 EP3)."""
    for name in names or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
