"""Round-12 pipeline misuse guards (ADVICE r11).

compact_staged and its crash recovery are LOCAL-filesystem maintenance
helpers around local-POSIX rename/listdir; the round-11 advisory found
three ways to misuse them silently (URI paths no-op-folding, compacting
under an active ingest stream, a stale ``.precompact`` resurrecting an
obsolete table after a deliberate reset) plus two contract-surface
silent no-ops (a domain bound without its column list; the round-11
reject-sink layout break going unnoticed on an old-layout directory).
Every one of those must now fail LOUDLY — these tests pin each refusal
and the matching happy path.
"""

import os
import shutil
import tempfile
import time
import warnings

import pytest
from pyspark.sql import functions as F

from data_lake_staging_engine_spark.contracts import validate_ingest
from data_lake_staging_engine_spark.pipeline import StagingPipeline
from data_lake_staging_engine_spark.streaming.runner import landing_copy


def _events_pipe(spark, sf_dir, tmp, **kw):
    landing, schema = landing_copy(spark, sf_dir, "events", n_files=4)
    staged = os.path.join(tmp, "staged")
    ckpt = os.path.join(tmp, "ckpt")
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=staged,
        checkpoint_dir=ckpt,
        table="staged_events_guards",
        schema=schema,
        **kw,
    )
    return pipe, landing, schema


def test_compact_runs_on_uri_paths(spark, sf_dir, tmp_path):
    """Round 13 (VERDICT r12 #9): compact_staged used to REFUSE URI
    staged/checkpoint dirs; the maintenance ops now run through the
    Hadoop FileSystem gateway.  file:// exercises the exact HadoopFS
    code path hdfs:///s3a:// take on a cluster (same FileSystem API,
    the scheme's own implementation underneath): ingest drains to a
    file:// staged dir with a file:// checkpoint, compaction folds the
    committed leaves under the -1 epoch, rows preserved exactly."""
    landing, schema = landing_copy(spark, sf_dir, "events", n_files=3)
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=f"file://{tmp_path}/staged",
        checkpoint_dir=f"file://{tmp_path}/ckpt",
        table="t_uri_compact",
        schema=schema,
        reader_options={"maxFilesPerTrigger": 1},
    )
    before = pipe.run_available_now(timeout_s=180)
    n_before = before.count()
    assert n_before > 0
    compacted = pipe.compact_staged()
    assert compacted.count() == n_before
    epochs = {
        r["_ingest_batch"]
        for r in spark.read.schema(pipe.staged_schema())
        .parquet(pipe.staged_dir)
        .select("_ingest_batch")
        .distinct()
        .collect()
    }
    assert epochs == {-1}
    # the recovery hook walks the same gateway without tripping
    pipe._restore_precompact()


def test_restore_precompact_heals_uri_staged(spark, sf_dir, tmp_path):
    """The crash window (kill between compact's two renames: table
    parked at <staged>.precompact, no staged dir) heals through the
    Hadoop gateway exactly as it does locally."""
    import os

    landing, schema = landing_copy(spark, sf_dir, "events", n_files=1)
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=f"file://{tmp_path}/staged2",
        checkpoint_dir=f"file://{tmp_path}/ckpt2",
        table="t_uri_heal",
        schema=schema,
    )
    n = pipe.run_available_now(timeout_s=180).count()
    # simulate the mid-swap kill on the underlying local dirs
    os.rename(f"{tmp_path}/staged2", f"{tmp_path}/staged2.precompact")
    pipe._restore_precompact()
    assert (
        spark.read.schema(pipe.staged_schema())
        .parquet(pipe.staged_dir)
        .count()
        == n
    )


def test_compact_refuses_active_ingest_stream(spark, sf_dir, tmp_path):
    """Compacting while the ingest stream drains this checkpoint would
    silently discard any micro-batch landing between the compaction
    read and the rename swap; the pipeline now matches the checkpoint
    metadata query id against spark.streams.active and refuses."""
    pipe, landing, schema = _events_pipe(
        spark, sf_dir, str(tmp_path), reader_options={"maxFilesPerTrigger": 1}
    )
    q = pipe.start(processing_time="2 seconds")
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None and p.get("numInputRows", 0) > 0:
                break
            time.sleep(0.05)
        with pytest.raises(RuntimeError, match="ACTIVE"):
            pipe.compact_staged()
    finally:
        q.stop()
        q.awaitTermination(60)
    # Stopped stream: compaction proceeds and folds committed leaves.
    compacted = pipe.compact_staged()
    epochs = [
        r["_ingest_batch"]
        for r in spark.read.schema(pipe.staged_schema())
        .parquet(pipe.staged_dir)
        .select("_ingest_batch")
        .distinct()
        .collect()
    ]
    assert -1 in epochs
    assert compacted.count() > 0


def test_stale_precompact_alongside_staged_is_discarded(spark, sf_dir, tmp_path):
    """Post-swap crash leftover: a .precompact ALONGSIDE a live staged
    dir is discarded (with a warning) at the next entry point, so a
    later deliberate table reset cannot resurrect the obsolete
    snapshot as the live table."""
    pipe, landing, schema = _events_pipe(spark, sf_dir, str(tmp_path))
    pipe.run_available_now(timeout_s=180)
    live_rows = spark.read.schema(pipe.staged_schema()).parquet(pipe.staged_dir).count()
    assert live_rows > 0

    # Fabricate the post-swap crash shape: an OBSOLETE copy parked at
    # .precompact while staged_dir holds the real table.
    stale = pipe.staged_dir + ".precompact"
    shutil.copytree(pipe.staged_dir, stale)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pipe.sync()
    assert not os.path.exists(stale), "stale .precompact not discarded"
    assert any("post-swap" in str(w.message) for w in caught)

    # The resurrection scenario from the advisory: delete staged_dir to
    # reset the table — nothing must bring the old snapshot back.
    shutil.rmtree(pipe.staged_dir)
    pipe._restore_precompact()
    assert not os.path.exists(pipe.staged_dir)


def test_bound_without_columns_raises(spark):
    """measure_max_abs / vector_max_abs without the matching column
    list previously validated NOTHING (silent no-op); now ValueError."""
    df = spark.range(3).select(
        F.col("id").cast("double").alias("value"),
        F.array(F.lit(1.0)).alias("vec"),
    )
    with pytest.raises(ValueError, match="finite_measures"):
        validate_ingest(df, measure_max_abs=1e12)
    with pytest.raises(ValueError, match="finite_vectors"):
        validate_ingest(df, vector_max_abs=100.0)
    # With the lists present the bounds apply as before.
    rep = validate_ingest(
        df, finite_measures=("value",), measure_max_abs=1e12,
        finite_vectors=("vec",), vector_max_abs=100.0,
    )
    assert rep.clean.count() == 3


def test_rejects_sink_refuses_pre_r11_append_layout(spark, sf_dir, tmp_path):
    """An old append-layout rejects dir (part-* files directly under
    <rejects_dir>/<reason>, _batch_id as a DATA column) must not be
    silently mixed with the partitioned layout."""
    landing, schema = landing_copy(spark, sf_dir, "events", n_files=2)
    rejects = str(tmp_path / "rejects")
    contracts = {"join_keys": ("user_id",)}

    # Fabricate the pre-round-11 layout for the null_keys reason.
    old = spark.range(2).select(
        F.lit(None).cast("long").alias("user_id"),
        F.lit(0).cast("long").alias("_batch_id"),
    )
    old.coalesce(1).write.parquet(f"{rejects}/null_keys")
    assert any(
        n.startswith("part-") for n in os.listdir(f"{rejects}/null_keys")
    )

    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=str(tmp_path / "staged"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        table="t_rejects_layout",
        schema=schema,
        contracts=contracts,
        rejects_dir=rejects,
    )
    batch = spark.read.schema(schema).parquet(landing).limit(100)
    with pytest.raises(RuntimeError, match="APPEND-layout"):
        pipe._stage_batch(batch, 0)

    # A fresh rejects_dir passes and writes the partitioned layout.
    pipe2 = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=str(tmp_path / "staged2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        table="t_rejects_layout2",
        schema=schema,
        contracts=contracts,
        rejects_dir=str(tmp_path / "rejects2"),
    )
    pipe2._stage_batch(batch, 0)
