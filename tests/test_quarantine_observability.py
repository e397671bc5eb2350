"""Quarantine-rate observability (VERDICT r13 #5): the safe-decode
path carries an observe() so a corrupt landing surfaces as a measured
per-batch RATE in the pipeline's metrics log — no second scan, no
silently shrinking corpus.

Three layers proven:

- the registered f08b frame emits the named observation as a
  CollectMetrics node and the plan gains NO exchange or extra scan;
- an Observation object attached to the same stage via
  ``quarantine_observation()`` reads back exactly the oracle-known
  counts for the dirty landing (doc_id % 7 == 0 containers corrupt);
- ``StagingPipeline(observe_metrics=...)`` records those counts per
  micro-batch in ``batch_observations``, riding the staging write.
"""

from pyspark.sql import Observation

from data_lake_staging_engine_spark.operators.udfs import (
    make_quarantine_stage,
    quarantine_observation,
)
from data_lake_staging_engine_spark.pipeline import StagingPipeline
from data_lake_staging_engine_spark.plans.inspect import physical_plan
from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.sources import load
from data_lake_staging_engine_spark.streaming.runner import landing_copy

_SF = "/root/testdata/sf0.001"
_REG = registry()


def _expected(spark):
    """Oracle-known counts: every doc yields one row; containers
    (doc_id % 3 in (0, 1): image/audio) with doc_id % 7 == 0 have
    their magic corrupted and must quarantine."""
    docs = [r.doc_id for r in load(spark, _SF, "documents").select("doc_id").collect()]
    n_quarantined = sum(1 for i in docs if i % 7 == 0 and i % 3 in (0, 1))
    return len(docs), n_quarantined


def test_f08b_emits_collect_metrics_without_plan_cost(spark):
    plan = physical_plan(_REG["f08b_multimodal_quarantine"].fn(spark, _SF))
    assert "CollectMetrics" in plan
    # observe is free: the two narrow Arrow stages stay the whole
    # plan — no shuffle appears to pay for the metrics.
    assert "Exchange" not in plan


def test_observation_counts_match_oracle(spark):
    n_rows, n_quarantined = _expected(spark)
    d = load(spark, _SF, "documents").select("doc_id", "text")
    ob = Observation("quarantine_test")
    observed = make_quarantine_stage()(d).observe(
        ob, *quarantine_observation()
    )
    assert observed.count() == n_rows
    got = dict(ob.get)
    assert got["n_rows"] == n_rows
    assert got["n_quarantined"] == n_quarantined
    assert n_quarantined > 0  # the dirty landing is not vacuous


def test_pipeline_records_quarantine_rate_per_batch(spark, tmp_path):
    """The wiring: a StagingPipeline draining a dirty multimodal
    landing logs (n_rows, n_quarantined) for every micro-batch."""
    landing, schema = landing_copy(spark, _SF, "documents", n_files=2)
    stage = make_quarantine_stage()
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=str(tmp_path / "staged"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        table="quarantine_staged",
        schema=schema,
        partition_cols=("modality",),
        transform=stage,
        reader_options={"maxFilesPerTrigger": 1},
        observe_metrics={"quarantine": quarantine_observation()},
    )
    back = pipe.run_available_now(timeout_s=120)
    n_rows, n_quarantined = _expected(spark)
    assert back.count() == n_rows
    obs = pipe.batch_observations
    assert len(obs) >= 2  # maxFilesPerTrigger=1 over 2 files
    assert sum(b["quarantine"]["n_rows"] for b in obs.values()) == n_rows
    assert (
        sum(b["quarantine"]["n_quarantined"] for b in obs.values())
        == n_quarantined
    )
