"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_lake_staging_engine_spark`` — every
operator is registered there with its oracle SQL colocated
(registry.py). Callables are wrapped with ``tune_session`` because the
driver owns the SparkSession: the engine needs UTC + the
nanos-as-long parquet read settings applied at runtime (session.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lake_staging_engine_spark.registry import registry as _registry  # noqa: E402
from data_lake_staging_engine_spark.session import tune_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (b20, TPC-H-Q1-shape agg) on sf0.001; rows>0."""
    tune_session(spark)
    return _registry()["b20_agg_groupby"].fn(spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(rq.fn) for name, rq in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys => rows-only tier."""
    return {
        name: rq.oracle for name, rq in _registry().items() if rq.oracle is not None
    }
