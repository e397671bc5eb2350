"""Catalog-sync layer (§2.A a11) — the reference's Glue-sync re-expressed.

The reference registers every staged Parquet prefix in the AWS Glue Data
Catalog so it is immediately queryable (SURVEY.md §0 [PK] profile). The
engine abstracts that behind ``CatalogSync``:

- ``SessionCatalogSync`` — the tested implementation: Spark session
  catalog / warehouse (``saveAsTable`` + ``spark.table``). On a real
  deployment with ``spark.sql.catalogImplementation=hive`` and the Glue
  Data Catalog client factory configured, the exact same code path
  lands tables in Glue — that is the idiomatic Spark-on-AWS wiring.
- ``GlueBoto3CatalogSync`` — thin, clearly-marked untested shim for
  environments that sync Glue out-of-band via boto3 (no AWS access in
  this environment; SURVEY.md §7 hard-list #5).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class CatalogSync:
    """Register a staged DataFrame/location as a queryable table."""

    def sync_table(self, df: DataFrame, table: str, partition_cols: list[str] | None = None) -> None:
        raise NotImplementedError

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        raise NotImplementedError


class SessionCatalogSync(CatalogSync):
    """Session-catalog (local warehouse / Hive metastore / Glue-via-Hive)
    implementation — the tested code path."""

    def sync_table(self, df, table, partition_cols=None):
        spark = df.sparkSession
        # A fresh (in-memory) metastore doesn't know about tables from a
        # previous process, but their warehouse directories survive and
        # block CREATE — drop both, like the reference's idempotent
        # create-or-update Glue sync.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        path = os.path.join(warehouse.removeprefix("file:"), table)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.saveAsTable(table)

    def read_table(self, spark, table):
        return spark.table(table)

    def drop_table(self, spark: SparkSession, table: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


class GlueBoto3CatalogSync(CatalogSync):
    """UNTESTED SHIM — direct Glue API sync for non-Hive deployments.

    Requires boto3 + AWS credentials, neither available here; raises
    with a clear message instead of pretending."""

    def __init__(self, database: str, s3_location_root: str):
        self.database = database
        self.s3_location_root = s3_location_root

    def sync_table(self, df, table, partition_cols=None):
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover - offline environment
            raise NotImplementedError(
                "GlueBoto3CatalogSync requires boto3/AWS access (offline env); "
                "use SessionCatalogSync, or Hive+Glue catalog wiring"
            ) from e
        raise NotImplementedError("Glue sync shim: wire glue.create_table here")

    def read_table(self, spark, table):
        return spark.table(f"{self.database}.{table}")
