"""Offline contract test for the Glue adapter (VERDICT r01 #8): a fake
Glue client records the boto3-shaped API calls, so the adapter's real
logic — schema mapping, partition-key split, parquet serde descriptor,
idempotent create-or-update — is exercised without AWS. Only the wire
client is faked; the TableInput documents asserted here are exactly
what a real ``boto3.client('glue')`` would receive."""

import pytest
from pyspark.sql import functions as F

from data_lake_staging_engine_spark.catalog import GlueBoto3CatalogSync
from data_lake_staging_engine_spark.sources import load


class _EntityNotFound(Exception):
    pass


class _FakeExceptions:
    EntityNotFoundException = _EntityNotFound


class FakeGlueClient:
    """Records calls; get_table raises EntityNotFound until a table is
    created — the same visible behavior as the real API."""

    exceptions = _FakeExceptions

    def __init__(self):
        self.tables = {}
        self.calls = []

    def get_table(self, DatabaseName, Name):
        self.calls.append(("get_table", DatabaseName, Name))
        if (DatabaseName, Name) not in self.tables:
            raise _EntityNotFound(Name)
        return {"Table": self.tables[(DatabaseName, Name)]}

    def create_table(self, DatabaseName, TableInput):
        self.calls.append(("create_table", DatabaseName, TableInput))
        self.tables[(DatabaseName, TableInput["Name"])] = TableInput

    def update_table(self, DatabaseName, TableInput):
        self.calls.append(("update_table", DatabaseName, TableInput))
        self.tables[(DatabaseName, TableInput["Name"])] = TableInput


def test_glue_sync_create_then_update(spark, sf_dir):
    fake = FakeGlueClient()
    sync = GlueBoto3CatalogSync("lake", "s3://bucket/stage/", client=fake)
    df = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )

    sync.sync_table(df, "events_staged", partition_cols=["event_date"])
    ops = [c[0] for c in fake.calls]
    assert ops == ["get_table", "create_table"]

    ti = fake.tables[("lake", "events_staged")]
    assert ti["TableType"] == "EXTERNAL_TABLE"
    assert ti["StorageDescriptor"]["Location"] == "s3://bucket/stage/events_staged"
    assert (
        ti["StorageDescriptor"]["SerdeInfo"]["SerializationLibrary"]
        == "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"
    )
    # partition key moved out of the data columns, type preserved
    assert ti["PartitionKeys"] == [{"Name": "event_date", "Type": "date"}]
    col_names = [c["Name"] for c in ti["StorageDescriptor"]["Columns"]]
    assert "event_date" not in col_names
    cols = {c["Name"]: c["Type"] for c in ti["StorageDescriptor"]["Columns"]}
    assert cols["event_id"] == "bigint"
    assert cols["value"] == "double"
    assert cols["event_type"] == "string"
    assert cols["ts"] == "timestamp"

    # second sync of an existing table is an update, not a duplicate create
    sync.sync_table(df, "events_staged", partition_cols=["event_date"])
    ops = [c[0] for c in fake.calls]
    assert ops == ["get_table", "create_table", "get_table", "update_table"]


def test_glue_sync_rejects_unknown_partition_col(spark, sf_dir):
    sync = GlueBoto3CatalogSync("lake", "s3://bucket/stage", client=FakeGlueClient())
    df = load(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="partition columns not in schema"):
        sync.sync_table(df, "events_staged", partition_cols=["nope"])


def test_glue_nested_types_map_to_hive_strings(spark, sf_dir):
    """Array/struct columns map via simpleString — the Hive/Glue type
    grammar — so multimodal/embedding tables register cleanly."""
    fake = FakeGlueClient()
    sync = GlueBoto3CatalogSync("lake", "s3://bucket/stage", client=fake)
    df = load(spark, sf_dir, "embeddings").withColumn(
        "meta", F.struct(F.col("label").alias("l"))
    )
    sync.sync_table(df, "embeddings_staged")
    cols = {
        c["Name"]: c["Type"]
        for c in fake.tables[("lake", "embeddings_staged")]["StorageDescriptor"][
            "Columns"
        ]
    }
    assert cols["embedding"].startswith("array<")
    assert cols["meta"].startswith("struct<")
