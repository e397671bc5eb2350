"""The public Engine/StagingPipeline facade — what a user of the
reference project actually calls after switching."""

import os
import tempfile

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.pipeline import Engine, StagingPipeline
from data_lake_staging_engine_spark.streaming.runner import landing_copy


def test_engine_sql_and_named_queries(spark, sf_dir):
    eng = Engine(spark=spark, data_dir=sf_dir)
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    n_df = eng.table("lineitem").count()
    assert n_sql == n_df > 0
    flagship = eng.query("b20_agg_groupby")
    assert flagship.count() > 0
    assert "b20_agg_groupby" in Engine.query_names()


def test_staging_pipeline_availablenow_equals_batch(spark, sf_dir):
    """The pipeline's streamed+staged output must equal the batch
    transform of the same landing data (the Structured Streaming
    correctness property), including the derived partition columns."""
    landing, schema = landing_copy(spark, sf_dir, "events", n_files=3)
    base = tempfile.mkdtemp(prefix="pipe_test_")
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=os.path.join(base, "staged"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        table="pipe_test_events",
        schema=schema,
    )
    staged = pipe.run_available_now(timeout_s=120)
    batch = (
        spark.read.schema(schema)
        .parquet(landing)
        .withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("day", F.dayofmonth("ts"))
    )
    assert staged.count() == batch.count()
    got = {
        tuple(r)
        for r in staged.select("event_id", "year", "month", "day").collect()
    }
    want = {
        tuple(r)
        for r in batch.select("event_id", "year", "month", "day").collect()
    }
    assert got == want


def test_staging_pipeline_is_incremental(spark, sf_dir):
    """A second AvailableNow run with no new landing files appends
    nothing — the checkpoint makes ingestion exactly-once per file."""
    landing, schema = landing_copy(spark, sf_dir, "events", n_files=2)
    base = tempfile.mkdtemp(prefix="pipe_incr_")
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=os.path.join(base, "staged"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        table="pipe_incr_events",
        schema=schema,
    )
    n1 = pipe.run_available_now(timeout_s=120).count()
    n2 = pipe.run_available_now(timeout_s=120).count()
    assert n1 == n2


def test_staging_pipeline_resumes_for_new_files_only(spark, sf_dir):
    """Files that land AFTER the first drain are picked up by the next
    drain exactly once — the checkpoint carries per-file progress
    across runs (the S3-notification replacement semantics)."""
    import shutil

    from data_lake_staging_engine_spark.sources import load

    base = tempfile.mkdtemp(prefix="pipe_resume_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    e = load(spark, sf_dir, "events")
    first = e.filter(F.col("event_id") % 2 == 0)
    second = e.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(landing)
    for crc in [f for f in os.listdir(landing) if f.endswith(".crc")]:
        os.remove(os.path.join(landing, crc))
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=os.path.join(base, "staged"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        table="pipe_resume_events",
        schema=e.schema,
    )
    n1 = pipe.run_available_now(timeout_s=120).count()
    assert n1 == first.count()
    # new files land; stale Hadoop CRC sidecars from coalesce removed
    second.coalesce(1).write.mode("append").parquet(landing)
    for crc in [f for f in os.listdir(landing) if f.endswith(".crc")]:
        os.remove(os.path.join(landing, crc))
    n2 = pipe.run_available_now(timeout_s=120).count()
    assert n2 == e.count(), f"expected exactly-once union, got {n2}"
    shutil.rmtree(base, ignore_errors=True)


def test_engine_incremental_dedup_api(spark):
    """The facade exposes batch-vs-corpus dedup on caller frames —
    the library API shape (not tied to the fixture dir)."""
    from data_lake_staging_engine_spark.pipeline import Engine

    eng = Engine(spark=spark, data_dir="/root/testdata/sf0.001")
    new = spark.createDataFrame(
        [(100, "aa bb cc"), (101, "zz yy xx")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "unrelated words here")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.verdict, r.match_id)
        for r in eng.incremental_dedup(new, corpus).collect()
    }
    assert got == {100: ("exact", 1), 101: ("unique", None)}


def test_engine_band_index_and_versioned_table(spark, tmp_path):
    """The round-14 surfaces reachable from the facade: a persisted
    band-signature index built and probed through Engine, and the
    versioned-table handle with the same lifecycle a22 proves."""
    from data_lake_staging_engine_spark.pipeline import Engine

    eng = Engine(spark=spark, data_dir="/root/testdata/sf0.001")
    corpus = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "totally different words")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "aa bb cc dd"), (101, "nothing shared at all")],
        "doc_id long, text string",
    )
    idx = eng.band_index(str(tmp_path / "idx"))
    assert idx.build(corpus) == 1
    got = {r.doc_id: r.verdict for r in idx.probe(new, corpus).collect()}
    assert got[100] == "near" and got[101] == "unique"

    vt = eng.versioned_table(str(tmp_path / "vt"))
    assert vt.publish(corpus) == 1
    assert vt.read(spark).count() == 2
