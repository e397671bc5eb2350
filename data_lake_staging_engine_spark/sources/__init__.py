"""Source connectors: fixture parquet tables, CSV/JSON ingest, landing dirs."""

from data_lake_staging_engine_spark.sources.tables import (  # noqa: F401
    TABLES,
    load,
    register_views,
)
