"""Empty-input robustness: every registered query must run over a
ZERO-ROW corpus (round-9 audit).

An empty partition — a day with no events, a source with no documents
yet, a backfill window that matched nothing — is routine at 100 TB.
The round-9 audit ran all 159 queries over a corpus of 0-row tables
with the real fixture schemas and found 12 crashes in two classes,
both now fixed:

- **write-then-reread staging** (a09 a13 a16 a17 + StagingPipeline):
  a zero-row partitioned write leaves no parquet files, so the
  read-back's schema INFERENCE threw UNABLE_TO_INFER_SCHEMA; all
  read-backs now pass the known schema explicitly.
- **bitmap dedup family** (g02 g02b g02d g02e g12 g21 g26 g30): an
  empty corpus has vocab_n == 0, which built zero bitmap columns and
  hit Spark's "exprs should not be empty" assert inside agg();
  ``_doc_bitmaps`` now floors the word count at one all-zero column,
  inert for every non-empty input (the vocab join yields no rows, so
  every downstream stage no-ops).

The test drives ALL registered queries so a future operator cannot
regress the property silently.  A few queries legitimately emit
summary/synthetic rows on empty input (a08's nullcount row, a14's
bad-record counter, a20's observed-metrics row, e07's late-data
ledger, a18's Python datasource which GENERATES its rows) — pinned in
EXPECTED_NONZERO so a new nonzero emitter is a conscious decision.
"""

import os

import pytest
# Slow tier (pytest.ini): full-registry empty-corpus survival drive (171 tests).
pytestmark = pytest.mark.slow


from data_lake_staging_engine_spark.registry import registry

_REG = registry()

EXPECTED_NONZERO = {
    "a08_quality_nullcounts": 1,   # one summary row of zero counts
    "a14_bad_records": 1,          # bad-record counter row (0 bad)
    "a20_observed_metrics": 1,     # observed-metrics summary row
    "a18_python_datasource": 10,   # source generates its own rows
    "e07_stream_late_data": 1,     # late-vs-ontime ledger row
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    src = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.limit(0).coalesce(1).write.parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_survives_empty_corpus(name, spark, empty_sf_dir):
    n = _REG[name].fn(spark, empty_sf_dir).count()
    assert n == EXPECTED_NONZERO.get(name, 0), (name, n)
