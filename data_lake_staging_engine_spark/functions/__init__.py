"""Scalar/aggregate expression helpers + the §2.D scalar function packs."""

from data_lake_staging_engine_spark.functions.determinism import (  # noqa: F401
    dec_sum,
    dec_sum_expr,
    as_long,
    rounded,
)
