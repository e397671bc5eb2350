"""The packaged ingest checkpoint: contracts.validate_ingest (VERDICT r09 #3).

Round 9 proved each input contract separately with a dedicated hostile
corpus; round 10 packages the four checks as one togglable staging
helper.  This suite drives ONE corpus that violates all four contracts
at once through ``validate_ingest`` and proves:

1. the splits are exact, disjoint, and cover the input;
2. each check is individually togglable;
3. the operators each hostile mode previously broke (b18 on NULL keys,
   e05 on duplicate identities, f03's pandas fold on NaN, e08's
   validity gate on epoch-adjacent/far-future clocks) run HASH-GREEN
   against the DuckDB oracle on the checkpoint's clean output;
4. the event-time gate's observe() metrics make streaming drops
   measurable per micro-batch instead of silent (ADVICE r09).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.contracts import (
    EVENT_TIME_VALID_HI,
    EVENT_TIME_VALID_LO,
    event_time_validity_sql,
    gate_event_time,
    validate_ingest,
)
from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import compare

_REG = registry()

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_T = dt.datetime(2024, 3, 1, 12, 0, 0)


def _rows():
    """One batch violating all four contracts, plus sane rows.

    event_id encodes the expected disposition: 1xx clean, 2xx
    nonfinite, 3xx out-of-time, 4xx NULL join key, 5xx duplicate
    identity (the lower event-ordinal copy is superseded)."""
    m = dt.timedelta(minutes=1)
    rows = [
        # clean
        (100, _T + 0 * m, 1, "click", 1.25, "{}"),
        (101, _T + 1 * m, 1, "purchase", 2.50, "{}"),
        (102, _T + 2 * m, 2, "click", None, "{}"),  # NULL measure is CLEAN
        (103, _T + 3 * m, 2, "purchase", 0.75, "{}"),
        # contract 1: non-finite measures
        (200, _T + 4 * m, 1, "click", float("nan"), "{}"),
        (201, _T + 5 * m, 2, "click", float("inf"), "{}"),
        (202, _T + 6 * m, 3, "click", float("-inf"), "{}"),
        # contract 2: event-time validity
        (300, dt.datetime(1969, 12, 31, 23, 59, 59, 999999), 1, "click", 1.0, "{}"),
        (301, dt.datetime(1970, 1, 1, 0, 0, 0), 2, "click", 1.0, "{}"),
        (302, dt.datetime(2260, 1, 1), 3, "purchase", 1.0, "{}"),
        (303, None, 3, "click", 1.0, "{}"),  # NULL event time is rejected
        # contract 3: NULL join key
        (400, _T + 7 * m, None, "click", 1.0, "{}"),
        (401, _T + 8 * m, None, "purchase", 2.0, "{}"),
        # contract 4: duplicate identity — same event_id, different
        # payload; keep-latest by (ts, event_id) keeps the later ts.
        (500, _T + 9 * m, 4, "click", 1.0, "{}"),
        (500, _T + 10 * m, 4, "click", 9.0, "{}"),
        (501, _T + 11 * m, 4, "purchase", 3.0, "{}"),
    ]
    return rows


@pytest.fixture(scope="module")
def hostile_df(spark):
    return spark.createDataFrame(_rows(), _SCHEMA)


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


def test_validate_ingest_splits_exactly(hostile_df):
    rep = validate_ingest(
        hostile_df,
        finite_measures=("value",),
        event_time_col="ts",
        join_keys=("user_id",),
        identity_keys=("event_id",),
        identity_order=("ts", "event_id"),
    )
    assert rep.enabled == ("nonfinite", "out_of_time", "null_keys", "superseded")
    assert _ids(rep.nonfinite) == [200, 201, 202]
    assert _ids(rep.out_of_time) == [300, 301, 302, 303]
    assert _ids(rep.null_keys) == [400, 401]
    assert _ids(rep.superseded) == [500]  # the EARLIER (ts) copy loses
    assert _ids(rep.clean) == [100, 101, 102, 103, 500, 501]
    # keep-latest kept the later payload
    kept = {r.event_id: r.value for r in rep.clean.collect()}
    assert kept[500] == 9.0
    # disjoint cover: every input row lands in exactly one frame
    total = sum(len(_ids(f)) for f in rep.rejects().values()) + len(
        _ids(rep.clean)
    )
    assert total == hostile_df.count()
    assert rep.reject_counts() == {
        "nonfinite": 3,
        "out_of_time": 4,
        "null_keys": 2,
        "superseded": 1,
    }


def test_each_check_individually_togglable(hostile_df):
    rep = validate_ingest(hostile_df, finite_measures=("value",))
    assert rep.enabled == ("nonfinite",)
    assert rep.out_of_time is None and rep.null_keys is None
    assert rep.superseded is None
    # only the nonfinite rows are removed
    assert len(_ids(rep.clean)) == hostile_df.count() - 3

    rep = validate_ingest(hostile_df, event_time_col="ts")
    assert rep.enabled == ("out_of_time",)
    assert _ids(rep.out_of_time) == [300, 301, 302, 303]

    rep = validate_ingest(hostile_df, join_keys=("user_id",))
    assert rep.enabled == ("null_keys",)
    assert _ids(rep.null_keys) == [400, 401]

    rep = validate_ingest(
        hostile_df, identity_keys=("event_id",), identity_order=("ts", "event_id")
    )
    assert rep.enabled == ("superseded",)
    assert _ids(rep.superseded) == [500]

    # no params => pass-through
    rep = validate_ingest(hostile_df)
    assert rep.enabled == ()
    assert rep.clean.count() == hostile_df.count()


def test_identity_requires_order(hostile_df):
    with pytest.raises(ValueError, match="identity_order"):
        validate_ingest(hostile_df, identity_keys=("event_id",))


def test_validity_bounds_overridable(hostile_df, spark):
    """ADVICE r09: the window is configuration, not a magic constant."""
    rep = validate_ingest(
        hostile_df,
        event_time_col="ts",
        valid_lo="2024-01-01 00:00:00",
        valid_hi="2024-03-01 12:05:00",
    )
    # the narrow window also rejects sane-but-late fixture rows
    # (201 sits exactly at the exclusive hi bound, 2024-03-01 12:05)
    rejected = _ids(rep.out_of_time)
    assert 300 in rejected and 201 in rejected
    assert 100 in _ids(rep.clean) and 103 in _ids(rep.clean)
    # the SQL mirror derives from the same constants
    sql = event_time_validity_sql("ts")
    assert EVENT_TIME_VALID_LO in sql and EVENT_TIME_VALID_HI in sql


@pytest.fixture(scope="module")
def cleaned_sf_dir(spark, hostile_df, tmp_path_factory):
    """The checkpoint's clean output written as a landing dir, so the
    REGISTERED operators (and their DuckDB oracles) can run downstream
    exactly as they do over the driver fixtures."""
    d = str(tmp_path_factory.mktemp("contract_clean"))
    rep = validate_ingest(
        hostile_df,
        finite_measures=("value",),
        event_time_col="ts",
        join_keys=("user_id",),
        identity_keys=("event_id",),
        identity_order=("ts", "event_id"),
    )
    rep.clean.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def cleaned_duck(cleaned_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{cleaned_sf_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        # each previously failed one hostile mode before its in-operator
        # fix; on contract-clean input they are green BY CONSTRUCTION
        # whatever the raw batch contained.
        "b18_join_asof",  # null-key corpus: 200 vs 182
        "e05_stream_dedup",  # duplicate-identity: arrival-order payload
        "f03_pandas_udf_grouped_agg",  # NaN conflated with NULL in pandas
        "e08_stream_stream_join",  # epoch-adjacent rows born late
        "a07_dedup_keep_latest",  # the identity normalizer itself
    ],
)
def test_downstream_hash_green_on_clean(name, spark, cleaned_sf_dir, cleaned_duck):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, cleaned_sf_dir), cleaned_duck, rq.oracle)
    assert res.ok, f"{name} on contract-clean corpus: {res.detail}"


def test_staging_pipeline_applies_contracts(spark, hostile_df, tmp_path):
    """The consumer-facing wiring: StagingPipeline(contracts=...) runs
    the checkpoint per micro-batch, stages only clean rows, and appends
    every rejected row to the per-reason audit sink tagged with its
    batch id — contract violations are preserved, never dropped."""
    from data_lake_staging_engine_spark.pipeline import StagingPipeline

    landing = str(tmp_path / "landing")
    hostile_df.coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema

    with pytest.raises(ValueError, match="rejects_dir"):
        StagingPipeline(
            spark,
            landing,
            str(tmp_path / "nostage"),
            str(tmp_path / "nockpt"),
            "events_nosink",
            schema,
            contracts={"join_keys": ("user_id",)},
        )

    rejects = str(tmp_path / "rejects")
    pipe = StagingPipeline(
        spark,
        landing,
        str(tmp_path / "staged"),
        str(tmp_path / "ckpt"),
        "events_contract_staged",
        schema,
        contracts={
            "finite_measures": ("value",),
            "event_time_col": "ts",
            "join_keys": ("user_id",),
            "identity_keys": ("event_id",),
            "identity_order": ("ts", "event_id"),
        },
        rejects_dir=rejects,
    )
    staged = pipe.run_available_now()
    assert sorted(r.event_id for r in staged.select("event_id").collect()) == [
        100, 101, 102, 103, 500, 501,
    ]
    audited = {
        reason: sorted(
            r.event_id
            for r in spark.read.parquet(f"{rejects}/{reason}").collect()
        )
        for reason in ("nonfinite", "out_of_time", "null_keys", "superseded")
    }
    assert audited == {
        "nonfinite": [200, 201, 202],
        "out_of_time": [300, 301, 302, 303],
        "null_keys": [400, 401],
        "superseded": [500],
    }
    batch_ids = {
        r._batch_id
        for r in spark.read.parquet(f"{rejects}/nonfinite").collect()
    }
    assert batch_ids == {0}


def test_finite_vector_contract(spark, tmp_path):
    """Round-10 extension: the finite-measure contract for ARRAY
    columns.  A NaN/Inf embedding COMPONENT crashes g13 (k-means) with
    ARITHMETIC_OVERFLOW — the non-finite inertia hits the cents
    rounding's double->long conversion under ANSI — and silently
    poisons similarity rankings elsewhere.  Pin the motivating crash
    and that the quarantined corpus runs clean."""
    import pyspark.errors

    from data_lake_staging_engine_spark.contracts import (
        quarantine_nonfinite_vectors,
        validate_ingest,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(src.first().embedding)
    poisoned = src.union(
        spark.createDataFrame(
            [
                (9001, [float("nan")] + [0.1] * (dim - 1), 1),
                (9002, [float("inf")] + [0.2] * (dim - 1), 2),
                (9003, None, 3),  # NULL vector = missing = CLEAN
            ],
            src.schema,
        )
    )

    clean, bad = quarantine_nonfinite_vectors(poisoned, "embedding")
    assert sorted(r.vec_id for r in bad.select("vec_id").collect()) == [
        9001,
        9002,
    ]
    assert clean.count() == poisoned.count() - 2

    # validate_ingest wiring: togglable, disjoint reject frame
    rep = validate_ingest(poisoned, finite_vectors=("embedding",))
    assert rep.enabled == ("nonfinite_vector",)
    assert rep.reject_counts() == {"nonfinite_vector": 2}

    # the motivating crash: g13 on the poisoned corpus throws; on the
    # quarantined corpus it runs.
    d_bad = str(tmp_path / "nan_vec")
    poisoned.coalesce(1).write.parquet(os.path.join(d_bad, "embeddings.parquet"))
    with pytest.raises(pyspark.errors.PySparkException):
        _REG["g13_kmeans_iterations"].fn(spark, d_bad).count()
    d_ok = str(tmp_path / "clean_vec")
    rep.clean.coalesce(1).write.parquet(os.path.join(d_ok, "embeddings.parquet"))
    assert _REG["g13_kmeans_iterations"].fn(spark, d_ok).count() > 0


def test_gate_observe_metrics_streaming(spark, hostile_df, tmp_path_factory):
    """The gate's CollectMetrics node surfaces per-micro-batch drop
    counts in StreamingQueryProgress.observedMetrics — drops are
    measurable, not silent (ADVICE r09)."""
    d = str(tmp_path_factory.mktemp("gate_obs"))
    landing = os.path.join(d, "events.parquet")
    hostile_df.coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    gated = gate_event_time(stream, "ts", observe_name="gate")
    q = (
        gated.groupBy("event_type")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("gate_obs_sink")
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = [
        p["observedMetrics"]["gate"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("gate")
    ]
    spark.catalog.dropTempView("gate_obs_sink")
    spark.streams.resetTerminated()
    assert metrics, "gate metrics never observed"
    seen = sum(m["rows_seen"] for m in metrics)
    gated_n = sum(m["rows_gated"] for m in metrics)
    assert seen == hostile_df.count()
    assert gated_n == 4  # 300, 301, 302, and the NULL ts row


def test_g13_matches_seeded_numpy_lloyd(spark):
    """VERDICT r14 #7: g13 is rows-only (float assignment boundaries
    have no DuckDB twin), so pin its VALUES against an independent
    NumPy Lloyd reference at sf0.001 — same deterministic init (per-
    label mean vectors), same 2 iterations, same lowest-cluster-id
    tie-break (np.argmin takes the first minimum; the query orders by
    (d2, cluster)).  Exact agreement on cluster membership counts
    (assignments are integral, so any iteration-1 divergence would
    surface here) and fp-tolerance agreement on every centroid
    coordinate: the emitted values are duck_round(x, 4), so the bound
    is half-ulp-of-4dp plus float slack."""
    import numpy as np

    pdf = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .toPandas()
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    labels = pdf["label"].to_numpy()
    clusters = np.sort(np.unique(labels)).astype(np.int64)
    C = np.stack([X[labels == c].mean(axis=0) for c in clusters])
    assign = None
    for _ in range(2):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        assert all((assign == j).any() for j in range(len(clusters))), (
            "reference lost a cluster — fixture drifted; rework the test"
        )
        C = np.stack([X[assign == j].mean(axis=0) for j in range(len(clusters))])
    ref_counts = {
        int(clusters[j]): int((assign == j).sum()) for j in range(len(clusters))
    }

    rows = _REG["g13_kmeans_iterations"].fn(spark, "/root/testdata/sf0.001").collect()
    got_counts = {int(r.cluster): int(r.n_members) for r in rows}
    assert got_counts == ref_counts
    j_of = {int(c): j for j, c in enumerate(clusters)}
    for r in rows:
        ref_val = C[j_of[int(r.cluster)]][int(r.pos)]
        assert abs(float(r.centroid_val) - ref_val) <= 6e-5, (
            r.cluster,
            r.pos,
            float(r.centroid_val),
            ref_val,
        )
