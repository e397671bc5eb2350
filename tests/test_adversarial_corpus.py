"""Adversarial-corpus robustness + parity (round-9 audit #2 — the
skew/duplicate/degenerate sibling of tests/test_empty_input.py).

A 100 TB corpus contains hot keys, duplicated boilerplate, zero-norm
embeddings from failed encoder batches, NULL/empty/whitespace-only
documents, NULL-valued measures, and malformed JSON payloads.
``scripts/make_adversarial_corpus.py`` derives exactly that shape from
sf0.001 by deterministic key-driven rewrites; the full-registry sweep
over it (``scripts/parity_sweep.py /tmp/adversarial_sf``) found 17
failures in six classes, all fixed:

1. zero-norm embedding => ANSI DIVIDE_BY_ZERO in cosine
   (g03/g03b/g03c/g03d/g21: try_divide => NULL cosine, matching the
   DuckDB oracle's x/0 NULL; g03e/g28: zero-norm vectors excluded as
   unindexable before unit normalization; g03b additionally excludes
   NULL-cos pairs from ranking on BOTH engines — a zero-norm query
   has no neighbors).
2. NULL event values => int(NaN) crashes in the pandas/state cents
   and moment folds (e06, e10_batch_twin, f03, f10; f04's z-score
   moments) — now SQL-aggregate semantics: NULLs skipped, an all-NULL
   group/user emits NULL, NULL rows keep NULL derived values.
3. NULL document text => None.split()/None.encode() crashes (f06's
   UDTF yields nothing — the lateral join drops the row like the
   oracle's unnest over NULL; f08 encodes a NULL payload with NULL
   payload_bytes, matching strlen(NULL)).
4. malformed JSON props => d09's strict parse_json threw
   MALFORMED_RECORD_IN_PARSING — now try_parse_json (NULL variant).
5. malformed JSON props => d07/d09's DuckDB ORACLES threw where Spark
   yields NULL — oracles now guard with json_valid.
6. NULL n_chars => d08's oracle used DuckDB concat(), which SKIPS
   NULL arguments where Spark's concat propagates — oracle now uses
   the ||-chain; divergence pinned in
   tests/test_fuzz_parity.py::test_concat_null_divergence_pin.

This module rebuilds the corpus (deterministic, DuckDB-only, ~1 s)
and pins every fixed query through the driver-shaped compare, so the
classes cannot regress silently.  The FULL registry over the
adversarial corpus is re-proven by the per-round sweep recorded in
BASELINE.md (159/159); the module pins the 17 once-broken queries to
keep suite runtime bounded.
"""

import duckdb
import pytest
# Slow tier (pytest.ini): adversarial-corpus parity drive.
pytestmark = pytest.mark.slow


from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import (
    TESTDATA_TABLES,
    compare,
)
from scripts.make_adversarial_corpus import build

_REG = registry()

# hash-tier queries the audit broke (oracle compare over the corpus)
H_FIXED = [
    "d07_fn_json",
    "d08_fn_struct",
    "d09_fn_variant",
    "e06_stream_stateful",
    "e10_batch_twin",
    "f03_pandas_udf_grouped_agg",
    "f04_apply_in_pandas",
    "f06_udtf",
    "f08_multimodal_decode",
    "f10_cogroup_in_pandas",
    "g03_simsearch_topk",
    "g03b_simsearch_knn",
    "g03d_embed_neardup",
    "g21_dedup_agreement",
]
# rows-only-tier queries the audit broke (must run clean)
R_FIXED = ["g03c_simsearch_lsh", "g03e_simsearch_ivf", "g28_semantic_dedup"]


@pytest.fixture(scope="module")
def adv_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adversarial_sf"))
    build(d, "/root/testdata/sf0.001")
    return d


@pytest.fixture(scope="module")
def adv_duck(adv_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{adv_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_corpus_is_adversarial(adv_duck):
    """Non-vacuousness: the corpus really contains the audit shapes —
    zero-norm and duplicated embeddings, NULL/empty/whitespace texts,
    a giant near-dup text cluster, NULL values, one all-NULL-valued
    user, malformed JSON, and the hot keys."""
    q = adv_duck.execute

    def one(sql):
        return q(sql).fetchone()[0]

    assert one(
        "SELECT count(*) FROM embeddings "
        "WHERE list_inner_product(embedding, embedding) = 0"
    ) == 20
    assert one(
        "SELECT max(cnt) FROM (SELECT embedding::VARCHAR e, count(*) cnt "
        "FROM embeddings GROUP BY 1)"
    ) >= 100  # the constant-vector dup storm
    assert one("SELECT count(*) FROM documents WHERE text IS NULL") == 10
    # non-ASCII class: chars != bytes on these rows, so byte-counting
    # or ASCII-only assumptions in any text op (or oracle) mismatch
    assert one(
        "SELECT count(*) FROM documents WHERE length(text) <> strlen(text)"
    ) == 10
    assert one("SELECT count(*) FROM documents WHERE text = ''") > 0
    assert one("SELECT count(*) FROM documents WHERE trim(text) = '' AND text <> ''") > 0
    assert one(
        "SELECT max(cnt) FROM (SELECT text, count(*) cnt FROM documents "
        "WHERE text IS NOT NULL GROUP BY 1)"
    ) >= 250  # the giant duplicate-text cluster
    assert one("SELECT count(*) FROM events WHERE value IS NULL") >= 150
    assert one(
        "SELECT count(*) FROM (SELECT user_id FROM events GROUP BY user_id "
        "HAVING count(value) = 0 AND count(*) > 0)"
    ) >= 1  # the all-NULL-valued user (SQL SUM => NULL)
    assert one("SELECT count(*) FROM events WHERE NOT json_valid(props)") > 0
    assert one(
        "SELECT max(cnt) * 1.0 / sum(cnt) FROM "
        "(SELECT user_id, count(*) cnt FROM events GROUP BY 1)"
    ) >= 0.5  # hot-key skew


@pytest.mark.parametrize("name", H_FIXED)
def test_adversarial_parity(name, spark, adv_sf_dir, adv_duck):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, adv_sf_dir), adv_duck, rq.oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"
    assert not res.spark_has_nan, f"{name}: H-tier query emitted NaN"


@pytest.mark.parametrize("name", R_FIXED)
def test_adversarial_rows_only_runs(name, spark, adv_sf_dir):
    assert _REG[name].fn(spark, adv_sf_dir).count() >= 0


def test_zero_norm_semantics(spark, adv_sf_dir):
    """The zero-norm contract, explicitly: a zero-norm query vector has
    NO neighbors in g03b (NULL cosine is not a similarity), and the
    zero-norm vec_ids never appear in g28's cluster output (they are
    unindexable, hence never semantic duplicates)."""
    knn = _REG["g03b_simsearch_knn"].fn(spark, adv_sf_dir)
    # vec_id 0 is zero-norm (vec_id % 25 == 0) and inside the qid < 10
    # query set: it must return no rows at all.
    assert knn.filter("qid = 0").count() == 0
    assert knn.filter("cos_sim IS NULL").count() == 0
    g28 = _REG["g28_semantic_dedup"].fn(spark, adv_sf_dir)
    id_cols = [c for c in g28.columns if c.endswith("id")]
    assert id_cols, g28.columns
    for c in id_cols:
        assert g28.filter(f"{c} % 25 = 0").count() == 0


@pytest.fixture(scope="module")
def nonfinite_dirs(adv_sf_dir, tmp_path_factory):
    """(dirty_dir, clean_dir): the adversarial corpus with NaN/+Inf/-Inf
    injected into events.value, and the same corpus after
    quarantine_nonfinite — built here so the fixture also exercises
    the guard's Spark-side filter through a real write/read cycle."""
    dirty = str(tmp_path_factory.mktemp("nonfinite_dirty"))
    clean = str(tmp_path_factory.mktemp("nonfinite_clean"))
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        for d in (dirty, clean):
            if t != "events":
                con.execute(
                    f"COPY (SELECT * FROM read_parquet("
                    f"'{adv_sf_dir}/{t}.parquet')) TO '{d}/{t}.parquet' "
                    f"(FORMAT parquet)"
                )
    con.execute(
        f"""COPY (
          SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 97 = 5 THEN 'NaN'::DOUBLE
                 WHEN event_id % 97 = 11 THEN 'Infinity'::DOUBLE
                 WHEN event_id % 97 = 17 THEN '-Infinity'::DOUBLE
                 ELSE value END AS value,
            props
          FROM read_parquet('{adv_sf_dir}/events.parquet'))
          TO '{dirty}/events.parquet' (FORMAT parquet)"""
    )
    con.close()
    return dirty, clean


def test_quarantine_nonfinite_restores_the_contract(
    spark, nonfinite_dirs, adv_duck
):
    """The FINITE-MEASURE input contract, end to end (round-9
    non-finite probe: 22/159 queries fail on NaN/Inf measures — both
    engines throw on CAST(Inf AS DECIMAL), pandas conflates NaN with
    NULL, NaN comparisons diverge pandas-vs-SQL). The documented
    posture is quarantine at ingest: after
    ``quarantine_nonfinite(events, "value")``, representative members
    of every failure class hash-match their oracles again."""
    import pyspark.sql.functions as F

    from data_lake_staging_engine_spark.operators.staging import (
        quarantine_nonfinite,
    )

    dirty, clean = nonfinite_dirs
    e = spark.read.parquet(f"{dirty}/events.parquet")
    ok, bad = quarantine_nonfinite(e, "value")
    n_bad = bad.count()
    assert n_bad > 0 and n_bad == 1000 - ok.count()
    assert ok.filter(F.isnan("value")).count() == 0
    assert ok.filter(F.col("value").isin(float("inf"), float("-inf"))).count() == 0
    # NULLs are the contract's missing-value form — they stay CLEAN
    assert ok.filter(F.col("value").isNull()).count() > 0
    ok.coalesce(1).write.parquet(f"{clean}/events.parquet")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{clean}/{t}.parquet{'/*.parquet' if t == 'events' else ''}')"
        )
    # one member per probe failure class: decimal-cents state fold
    # (cast-throw class), running-sum window (oracle decimal cast),
    # pandas trimmed mean (NaN/NULL conflation class)
    for name in (
        "e10_batch_twin",
        "c03_win_running_sum",
        "f03_pandas_udf_grouped_agg",
    ):
        rq = _REG[name]
        res = compare(name, rq.fn(spark, clean), con, rq.oracle)
        assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"
    con.close()
