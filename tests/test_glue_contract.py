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


class _ThrottlingError(Exception):
    """Stands in for botocore ClientError (throttle / access denied)."""


class FlakyGlueClient(FakeGlueClient):
    """Real Glue failure mode: the data write succeeded but the catalog
    API call throws (throttling, IAM, transient 5xx). Fails the first
    ``fail_n`` mutating calls, then behaves normally — the retry path a
    production sync loop takes."""

    def __init__(self, fail_n=1):
        super().__init__()
        self.fail_n = fail_n

    def _maybe_fail(self):
        if self.fail_n > 0:
            self.fail_n -= 1
            raise _ThrottlingError("ThrottlingException: Rate exceeded")

    def create_table(self, DatabaseName, TableInput):
        self._maybe_fail()
        super().create_table(DatabaseName, TableInput)

    def update_table(self, DatabaseName, TableInput):
        self._maybe_fail()
        super().update_table(DatabaseName, TableInput)


def test_glue_sync_failure_after_write_leaves_consistent_state(spark, sf_dir, tmp_path):
    """VERDICT r03 #6 — the reference's Glue-sync-fails-after-write
    hazard, end-to-end through the staging pipeline: the parquet commit
    and the catalog call are separate systems, so the sync can throw
    AFTER data landed. The contract pinned here:

    1. the sync error propagates (no swallowed failure),
    2. the staged parquet is complete and readable despite it,
    3. the catalog holds NO partial entry (failed create registers
       nothing),
    4. a plain retry of ``sync()`` converges — same idempotent
       create-or-update, table input consistent with the staged data —
       with no duplicate table and no re-write of the data.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    from data_lake_staging_engine_spark.pipeline import StagingPipeline
    from data_lake_staging_engine_spark.streaming.runner import landing_copy

    fake = FlakyGlueClient(fail_n=1)

    class LocalGlueSync(GlueBoto3CatalogSync):
        # read-back via the staged path: spark.table("db.t") needs a
        # metastore database; the Glue TableInput's Location IS the
        # staged dir, so reading it is the same external-table contract.
        def read_table(self, spark_, table):
            loc = self.tables_dir
            return spark_.read.parquet(loc)

    staged_dir = str(tmp_path / "staged")
    sync = LocalGlueSync("lake", "s3://bucket/stage", client=fake)
    sync.tables_dir = staged_dir

    landing, schema = landing_copy(spark, sf_dir, "events", n_files=2)
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=staged_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        table="events_glue_fail",
        schema=schema,
        catalog=sync,
    )

    # 1. the drain itself succeeds; the catalog call throws
    with pytest.raises(_ThrottlingError):
        pipe.run_available_now(timeout_s=120)

    # 2. data landed completely despite the sync failure
    expected = load(spark, sf_dir, "events").count()
    staged = spark.read.parquet(staged_dir)
    assert staged.count() == expected

    # 3. no partial catalog entry (the throttled create registered
    # nothing; only the successful get_table probe is on record)
    assert ("lake", "events_glue_fail") not in fake.tables
    assert [c[0] for c in fake.calls] == ["get_table"]

    # 4. retry converges: create succeeds, entry matches the staged data.
    # Partition keys are BIGINT, not int: since the round-9 empty-input
    # hardening, sync() reads the staged dir with the transform's
    # DECLARED schema (derive_date_partitions casts year/month/day via
    # as_long) instead of directory-name inference, so the catalog
    # entry is inference-independent and stable on zero-row drains.
    back = pipe.sync()
    ti = fake.tables[("lake", "events_glue_fail")]
    assert ti["PartitionKeys"] == [
        {"Name": "year", "Type": "bigint"},
        {"Name": "month", "Type": "bigint"},
        {"Name": "day", "Type": "bigint"},
    ]
    assert back.count() == expected
    # a second healthy sync is an update, never a duplicate create
    pipe.sync()
    mutations = [c[0] for c in fake.calls if c[0] != "get_table"]
    assert mutations == ["create_table", "update_table"]
