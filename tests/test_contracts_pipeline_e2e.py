"""validate_ingest driven END-TO-END through StagingPipeline, once per
hostile corpus mode (VERDICT r10 #6).

tests/test_contracts.py proves the checkpoint's splits on a synthetic
16-row batch; this module proves the DEPLOYMENT-shaped loop on the real
hostile corpora: each of the four round-9 attack axes (measures,
clocks, keys, identities) flows through ``StagingPipeline`` WITH the
contract checkpoint on, across MULTIPLE micro-batches
(``maxFilesPerTrigger=1``), and asserts

1. the per-contract reject counts come from the pipeline's observe()
   metrics (``pipe.reject_metrics``, one entry per micro-batch — no
   recount of the audit sinks) and match an INDEPENDENT DuckDB count
   over the raw corpus;
2. the staged table holds exactly corpus − rejects rows;
3. the sentinel query that the un-gated corpus breaks (or broke in
   round 9) runs HASH-GREEN against its DuckDB oracle over the gated
   output.
"""

from __future__ import annotations

import os

import duckdb
import pytest
# Slow tier (pytest.ini): end-to-end pipeline drives.
pytestmark = pytest.mark.slow


from pyspark.sql import functions as F

from data_lake_staging_engine_spark.contracts import (
    EVENT_TIME_VALID_HI,
    EVENT_TIME_VALID_LO,
)
from data_lake_staging_engine_spark.pipeline import StagingPipeline
from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import TESTDATA_TABLES, compare
from scripts.make_adversarial_corpus import build

_REG = registry()
_SRC = "/root/testdata/sf0.001"
_RAW_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def _drive(spark, events_df, tmp, contracts, landing_key=None):
    """Land ``events_df`` as 2 files, drain through StagingPipeline with
    the checkpoint on and maxFilesPerTrigger=1 (>= 2 micro-batches),
    return (pipe, staged_df).

    ``landing_key``: identity normalization is PER MICRO-BATCH (the
    checkpoint sees one batch at a time), so the identities test
    co-partitions the landing by the identity key — the deployment
    contract is the same: route redeliveries of a key to the same
    landing partition, or compose with the a19-style cross-batch
    upsert."""
    landing = str(tmp / "landing")
    part = (
        events_df.repartition(2, landing_key)
        if landing_key
        else events_df.repartition(2)
    )
    part.write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=str(tmp / "staged"),
        checkpoint_dir=str(tmp / "ckpt"),
        table=f"e2e_{tmp.name[:24]}",
        schema=schema,
        contracts=contracts,
        rejects_dir=str(tmp / "rejects"),
        reader_options={"maxFilesPerTrigger": 1},
    )
    staged = pipe.run_available_now(timeout_s=180)
    assert len(pipe.reject_metrics) >= 2, "expected >= 2 micro-batches"
    return pipe, staged


def _metric_totals(pipe):
    totals: dict[str, int] = {}
    for counts in pipe.reject_metrics.values():
        for reason, n in counts.items():
            totals[reason] = totals.get(reason, 0) + n
    return totals


def _downstream_dir(spark, staged, tmp, corpus_dir=None):
    """Write the gated events back in fixture layout (plus the other
    tables, copied) so registered queries and their oracles run over
    the clean corpus."""
    d = str(tmp / "gated_sf")
    os.makedirs(d)
    staged.select(*_RAW_COLS).coalesce(1).write.parquet(
        os.path.join(d, "events.parquet")
    )
    src = corpus_dir or _SRC
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        if t == "events":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{d}/{t}.parquet' (FORMAT parquet)"
        )
    con.close()
    return d


def _duck_for(d):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        glob = "/*.parquet" if t == "events" else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet{glob}')"
        )
    return con


def _compare_downstream(spark, d, names):
    con = _duck_for(d)
    try:
        for name in names:
            rq = _REG[name]
            res = compare(name, rq.fn(spark, d), con, rq.oracle)
            assert res.ok, f"{name} on gated corpus: {res.detail}"
    finally:
        con.close()


def test_measures_mode_through_pipeline(spark, tmp_path):
    """Finite-measure contract: NaN/±Inf poisoned values are counted by
    the observe() metrics, quarantined to the audit sink, and the
    pandas-fold sentinel (round-9 failure class: pandas conflates NaN
    with NULL) is hash-green downstream."""
    e = spark.read.parquet(f"{_SRC}/events.parquet")
    poisoned = e.withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 5, float("nan"))
        .when(F.col("event_id") % 97 == 11, float("inf"))
        .when(F.col("event_id") % 97 == 17, float("-inf"))
        .otherwise(F.col("value")),
    )
    n_bad = poisoned.filter(
        F.coalesce(
            F.isnan("value")
            | F.col("value").isin(float("inf"), float("-inf")),
            F.lit(False),
        )
    ).count()
    assert n_bad > 0

    pipe, staged = _drive(
        spark, poisoned, tmp_path, {"finite_measures": ("value",)}
    )
    assert _metric_totals(pipe) == {"nonfinite": n_bad}
    assert staged.count() == poisoned.count() - n_bad
    d = _downstream_dir(spark, staged, tmp_path)
    _compare_downstream(
        spark, d, ["f03_pandas_udf_grouped_agg", "c03_win_running_sum"]
    )


def test_clocks_mode_through_pipeline(spark, tmp_path):
    """Event-time validity contract on the time-hostile corpus:
    epoch-adjacent, 16th-century, and far-future clocks are counted and
    gated, and the watermark consumer (round-9 failure: one 2260 clock
    drags the watermark centuries ahead) is hash-green downstream."""
    corpus = str(tmp_path / "corpus")
    build(corpus, _SRC, time_hostile=True)
    e = spark.read.parquet(f"{corpus}/events.parquet")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    expected = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}/events.parquet') "
        f"WHERE ts IS NULL OR NOT (ts >= TIMESTAMP '{EVENT_TIME_VALID_LO}' "
        f"AND ts < TIMESTAMP '{EVENT_TIME_VALID_HI}')"
    ).fetchone()[0]
    con.close()
    assert expected > 0

    pipe, staged = _drive(spark, e, tmp_path, {"event_time_col": "ts"})
    assert _metric_totals(pipe) == {"out_of_time": expected}
    assert staged.count() == e.count() - expected
    d = _downstream_dir(spark, staged, tmp_path, corpus_dir=corpus)
    _compare_downstream(
        spark, d, ["e08_stream_stream_join", "e01_stream_tumbling"]
    )


def test_keys_mode_through_pipeline(spark, tmp_path):
    """Non-NULL join-key contract on the null-keys corpus: the 10%
    NULLed user_ids are counted and rejected, and the window-emulated
    as-of join (round-9 failure: NULL keys match each other under
    PARTITION BY but nothing under JOIN equality) is hash-green
    downstream."""
    corpus = str(tmp_path / "corpus")
    build(corpus, _SRC, null_keys=True)
    e = spark.read.parquet(f"{corpus}/events.parquet")

    con = duckdb.connect()
    expected = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}/events.parquet') "
        f"WHERE user_id IS NULL"
    ).fetchone()[0]
    con.close()
    assert expected > 0

    pipe, staged = _drive(spark, e, tmp_path, {"join_keys": ("user_id",)})
    assert _metric_totals(pipe) == {"null_keys": expected}
    assert staged.count() == e.count() - expected
    d = _downstream_dir(spark, staged, tmp_path, corpus_dir=corpus)
    _compare_downstream(spark, d, ["b18_join_asof", "g11_events_user_join"])


def test_identities_mode_through_pipeline(spark, tmp_path):
    """Unique-identity contract: duplicate event_ids with DIFFERING
    payloads (the e05/e11 killer — survivor is arrival-order-dependent
    on any engine) are keep-latest-normalized at ingest; the superseded
    copies are counted and audited, and keyed streaming dedup is
    hash-green downstream because every id is unique again."""
    e = spark.read.parquet(f"{_SRC}/events.parquet")
    dupes = (
        e.filter(F.col("event_id") % 7 == 3)
        .withColumn("value", F.col("value") * 2 + 1)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    n_dupes = dupes.count()
    assert n_dupes > 0
    poisoned = e.unionByName(dupes)

    pipe, staged = _drive(
        spark,
        poisoned,
        tmp_path,
        {"identity_keys": ("event_id",), "identity_order": ("ts", "event_id")},
        landing_key="event_id",
    )
    assert _metric_totals(pipe) == {"superseded": n_dupes}
    assert staged.count() == e.count()
    # keep-latest kept the LATER (+5 min) copy for every duplicated id
    kept = staged.filter(F.col("event_id") % 7 == 3)
    orig = {r.event_id: r.value for r in e.filter(F.col("event_id") % 7 == 3).collect()}
    for r in kept.select("event_id", "value").collect():
        assert r.value == orig[r.event_id] * 2 + 1
    d = _downstream_dir(spark, staged, tmp_path)
    _compare_downstream(spark, d, ["e05_stream_dedup", "a07_dedup_keep_latest"])


def test_magnitudes_mode_through_pipeline(spark, tmp_path):
    """Measure-DOMAIN contract (the round-11 numeric-hostile finding)
    on the numeric-hostile corpus: huge-but-finite measures are
    counted by the observe() metrics and quarantined, and the decimal
    money sentinel that crashes on the raw corpus (b20-class ANSI
    overflow) runs hash-green downstream.  Only events flows through
    the pipeline here (it is the staging surface); the
    lineitem/orders halves of the finding are gated and pinned in
    tests/test_numeric_hostile.py."""
    corpus = str(tmp_path / "corpus")
    build(corpus, _SRC, numeric_hostile=True)
    e = spark.read.parquet(f"{corpus}/events.parquet")

    con = duckdb.connect()
    expected = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}/events.parquet') "
        f"WHERE isnan(value) OR abs(value) > 1e12"
    ).fetchone()[0]
    con.close()
    assert expected > 0

    pipe, staged = _drive(
        spark,
        e,
        tmp_path,
        {"finite_measures": ("value",), "measure_max_abs": 1e12},
    )
    assert _metric_totals(pipe) == {"nonfinite": expected}
    assert staged.count() == e.count() - expected
    d = _downstream_dir(spark, staged, tmp_path, corpus_dir=corpus)
    # c03/f03/e10 are the pipeline-relevant members of the 29-query
    # crash class (decimal window sum, pandas fold, streaming cents
    # fold) — all events-driven.
    _compare_downstream(
        spark,
        d,
        ["c03_win_running_sum", "f03_pandas_udf_grouped_agg", "e10_batch_twin"],
    )


def test_default_domain_policy_through_pipeline(spark, tmp_path):
    """The measure-domain contract reachable from the DEFAULT pipeline
    config (VERDICT r11 #5): ``contracts=default_contracts("events")``
    — no hand-assembled kwargs — drives the numeric-hostile corpus
    through the a13 pipeline shape.  Asserts the rejected rows LAND in
    the audit sink under their reason directories (not just that the
    observe() metrics counted them), that the sink rows carry the
    poisoned values, and that the money sentinel runs hash-green on
    the gated output."""
    from data_lake_staging_engine_spark.contracts import default_contracts

    corpus = str(tmp_path / "corpus")
    build(corpus, _SRC, numeric_hostile=True)
    e = spark.read.parquet(f"{corpus}/events.parquet")

    # Independent expected counts, mirroring the check order (each
    # check sees the previous check's clean rows).  The numeric mode
    # rewrites only measure VALUES, so the time/key contracts should
    # reject nothing — asserted, not assumed.
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    nf, oot, nk = con.execute(
        f"""
        WITH src AS (FROM read_parquet('{corpus}/events.parquet')),
        m AS (SELECT *, coalesce(isnan(value) OR abs(value) > 1e12, FALSE)
                        AS bad_m FROM src),
        t AS (SELECT *, NOT coalesce(
                  ts >= TIMESTAMP '2000-01-01' AND ts < TIMESTAMP '2100-01-01',
                  FALSE) AS bad_t FROM m WHERE NOT bad_m)
        SELECT (SELECT count(*) FROM m WHERE bad_m),
               (SELECT count(*) FROM t WHERE bad_t),
               (SELECT count(*) FROM t WHERE NOT bad_t AND user_id IS NULL)
        """
    ).fetchone()
    con.close()
    assert nf > 0 and oot == 0 and nk == 0

    policy = default_contracts("events")
    assert policy["measure_max_abs"] == 1e12
    pipe, staged = _drive(spark, e, tmp_path, policy)
    assert _metric_totals(pipe) == {
        "nonfinite": nf, "out_of_time": 0, "null_keys": 0
    }
    assert staged.count() == e.count() - nf

    # The audit sink itself: rejected rows land under <reason>/ with
    # the _batch_id partition, values are the poisoned ones, and
    # rejects + staged partition the corpus exactly.
    sunk = spark.read.parquet(str(tmp_path / "rejects" / "nonfinite"))
    assert sunk.count() == nf
    assert "_batch_id" in sunk.columns
    assert (
        sunk.filter(
            F.isnan("value") | (F.abs("value") > 1e12)
        ).count()
        == nf
    )
    assert (
        staged.select("event_id")
        .intersect(sunk.select("event_id"))
        .count()
        == 0
    )

    d = _downstream_dir(spark, staged, tmp_path, corpus_dir=corpus)
    _compare_downstream(spark, d, ["c03_win_running_sum"])


def test_default_policies_are_clean_on_vanilla_fixtures(spark):
    """The default domain policies must be usable as defaults: on the
    un-poisoned fixtures they reject NOTHING (events, orders,
    embeddings), and an unlisted table raises instead of silently
    meaning 'no contract'."""
    from data_lake_staging_engine_spark.contracts import (
        default_contracts,
        validate_ingest,
    )

    for table in ("events", "orders", "embeddings"):
        df = spark.read.parquet(f"{_SRC}/{table}.parquet")
        rep = validate_ingest(df, **default_contracts(table))
        rejects = {k: v.count() for k, v in rep.rejects().items()}
        assert rep.clean.count() == df.count(), (table, rejects)
        assert all(v == 0 for v in rejects.values()), (table, rejects)
    with pytest.raises(KeyError, match="documents"):
        default_contracts("documents")


def test_vectors_mode_through_pipeline(spark, tmp_path):
    """Finite-VECTOR contract (the round-10 extension) through the
    pipeline: NaN/Inf embedding components are counted and quarantined
    per micro-batch, and the k-means sentinel (round-10 crash:
    ARITHMETIC_OVERFLOW on non-finite inertia) plus the exact knn
    hash-check run clean downstream."""
    src = spark.read.parquet(f"{_SRC}/embeddings.parquet")
    dim = len(src.first().embedding)
    bad = spark.createDataFrame(
        [
            (9001, [float("nan")] + [0.1] * (dim - 1), 1),
            (9002, [float("inf")] + [0.2] * (dim - 1), 2),
        ],
        src.schema,
    )
    poisoned = src.unionByName(bad)

    landing = str(tmp_path / "landing")
    poisoned.repartition(2).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=str(tmp_path / "staged"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        table="e2e_vectors",
        schema=schema,
        # embeddings carry no event time; partition the staged table by
        # the label column instead of derived dates.
        transform=lambda df: df,
        partition_cols=("label",),
        contracts={"finite_vectors": ("embedding",)},
        rejects_dir=str(tmp_path / "rejects"),
        reader_options={"maxFilesPerTrigger": 1},
    )
    staged = pipe.run_available_now(timeout_s=180)
    assert _metric_totals(pipe) == {"nonfinite_vector": 2}
    assert staged.count() == src.count()

    d = str(tmp_path / "gated_sf")
    os.makedirs(d)
    staged.select("vec_id", "embedding", "label").coalesce(1).write.parquet(
        os.path.join(d, "embeddings.parquet")
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        if t == "embeddings":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{_SRC}/{t}.parquet')) "
            f"TO '{d}/{t}.parquet' (FORMAT parquet)"
        )
    con.close()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        glob = "/*.parquet" if t == "embeddings" else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet{glob}')"
        )
    try:
        rq = _REG["g03b_simsearch_knn"]
        res = compare("g03b_simsearch_knn", rq.fn(spark, d), con, rq.oracle)
        assert res.ok, f"g03b on gated corpus: {res.detail}"
    finally:
        con.close()
    # the round-10 crash class: k-means completes on the gated corpus
    assert _REG["g13_kmeans_iterations"].fn(spark, d).count() > 0


def test_schema_drift_landing_through_pipeline(spark, tmp_path):
    """Schema-DRIFT landing files (the production reality a pinned
    reader schema must absorb): one file with the full schema, one
    MISSING the measure column (upstream dropped it), one with an
    EXTRA column (upstream added one).  The parquet file source with a
    pinned schema must read all three — missing column as NULL, extra
    column ignored — and the contract checkpoint then treats the
    drift-born NULLs as the portable missing-value form (clean), so
    nothing is silently dropped OR silently invented."""
    e = spark.read.parquet(f"{_SRC}/events.parquet")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    full = e.filter(F.col("event_id") % 3 == 0)
    missing = e.filter(F.col("event_id") % 3 == 1).drop("value")
    extra = e.filter(F.col("event_id") % 3 == 2).withColumn(
        "surprise", F.lit("new-upstream-field")
    )
    full.coalesce(1).write.parquet(os.path.join(landing, "f1"))
    missing.coalesce(1).write.parquet(os.path.join(landing, "f2"))
    extra.coalesce(1).write.parquet(os.path.join(landing, "f3"))

    pipe = StagingPipeline(
        spark,
        landing_dir=landing,
        staged_dir=str(tmp_path / "staged"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        table="e2e_schema_drift",
        schema=e.schema,
        contracts={"finite_measures": ("value",)},
        rejects_dir=str(tmp_path / "rejects"),
        reader_options={
            "maxFilesPerTrigger": 1,
            "recursiveFileLookup": "true",
        },
    )
    staged = pipe.run_available_now(timeout_s=180)
    # every row from every drifted file staged exactly once
    assert staged.count() == e.count()
    assert "surprise" not in staged.columns
    # the dropped column reads as NULL (missing-value form => CLEAN,
    # not quarantined: the finite-measure contract rejected nothing)
    n_missing = missing.count()
    assert (
        staged.filter(F.col("value").isNull()).count()
        >= n_missing
    )
    assert _metric_totals(pipe) == {"nonfinite": 0}
    drifted_ids = {r.event_id for r in missing.select("event_id").collect()}
    got_null_ids = {
        r.event_id
        for r in staged.filter(F.col("value").isNull())
        .select("event_id")
        .collect()
    }
    assert drifted_ids <= got_null_ids


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
