"""BandSignatureIndex: the persisted band-signature store behind g32
(VERDICT r13 #1 — "turn the 100 TB incremental story from 'designed'
to 'runs the way the docstring claims'").

The contract proven here:

- build-dispose-probe: a SEPARATE SparkSession (subprocess, vanilla,
  cwd=/tmp — the driver's shape) builds the index and exits; this
  suite's session then probes the stored signatures and gets exactly
  the rows the self-contained in-session probe computes.  The store
  outlives its builder.
- no re-banding on probe: the probed plan scans the index parquet
  (the version dir is in the plan) and contains ONE minhash banding
  aggregate (the batch's own), where the in-session fallback carries
  two (batch + corpus).
- the index is versioned: publishing a grown corpus makes a v2;
  probing version=1 still answers from the old signatures.
"""

import os
import subprocess
import sys

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.operators.llmops import (
    BandSignatureIndex,
    _probe_candidates,
    _tokens,
    incremental_band_probe,
)
from data_lake_staging_engine_spark.plans.inspect import physical_plan
from data_lake_staging_engine_spark.sources import load

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF = "/root/testdata/sf0.001"

_BUILD = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = SparkSession.builder.master("local[4]").getOrCreate()
from data_lake_staging_engine_spark.operators.llmops import BandSignatureIndex
from data_lake_staging_engine_spark.plans.inspect import physical_plan
from data_lake_staging_engine_spark.sources import load

import pytest
# Slow tier (pytest.ini): 10x-replica / persisted-store studies: racing-republish contention, corpus-size-flat probe cost, multi-batch daily loop, cross-session build/dispose.
pytestmark = pytest.mark.slow

d = load(spark, {sf!r}, "documents").select("doc_id", "text")
corpus = d.filter(F.col("doc_id") % 7 != 0)
v = BandSignatureIndex({root!r}).build(corpus)
print("BUILT_VERSION", v)
spark.stop()
"""


def _split(spark):
    d = load(spark, _SF, "documents").select("doc_id", "text")
    return (
        d.filter(F.col("doc_id") % 7 == 0),
        d.filter(F.col("doc_id") % 7 != 0),
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["verdict"], r["match_id"]) for r in df.collect()
    )


def test_build_dispose_probe_across_sessions(spark, tmp_path):
    """The index built by a now-dead SparkSession answers this
    session's probe with the exact in-session result."""
    root = str(tmp_path / "bandidx")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", _BUILD.format(repo=_REPO, sf=_SF, root=root)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BUILT_VERSION 1" in proc.stdout, proc.stdout[-2000:]

    newdocs, corpus = _split(spark)
    probed = incremental_band_probe(newdocs, corpus, index_path=root)
    in_session = incremental_band_probe(newdocs, corpus)
    assert _rows(probed) == _rows(in_session)

    # No re-banding: the candidate generation (the only stage that
    # touches the index; the probe checkpoints its output, truncating
    # the final plan's lineage) reads the stored signatures — the
    # index root appears as a parquet scan — and carries exactly ONE
    # minhash banding aggregate: the 16 per-hash mins of the BATCH.
    # The corpus contributes no aggregate because it is never banded.
    idx = BandSignatureIndex(root)
    cands = _probe_candidates(_tokens(newdocs), idx.signatures(spark))
    logical = cands._jdf.queryExecution().optimizedPlan().toString()
    assert root in physical_plan(cands)  # index version dir is a scan
    assert logical.count("min(xxhash64") == 16


def test_probe_method_matches_function(spark, tmp_path):
    root = str(tmp_path / "idx")
    newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(root)
    assert idx.build(corpus) == 1
    assert _rows(idx.probe(newdocs, corpus)) == _rows(
        incremental_band_probe(newdocs, corpus)
    )


def test_index_versions_are_stable(spark, tmp_path):
    """Re-publishing signatures for a GROWN corpus does not disturb a
    probe pinned to the old version — the immutability a daily loop
    relies on when a probe job races a rebuild."""
    root = str(tmp_path / "idx")
    newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(root)
    assert idx.build(corpus) == 1
    v1 = _rows(idx.probe(newdocs, corpus, version=1))
    # grown corpus: the batch itself is folded in, as g30's loop does
    grown = corpus.unionByName(newdocs)
    assert idx.build(grown) == 2
    assert _rows(idx.probe(newdocs, corpus, version=1)) == v1
    # latest now bands the grown corpus: every batch doc matches
    # itself in the index, so no verdict can be weaker than v1's
    latest = dict(
        (d, v) for d, v, _m in _rows(idx.probe(newdocs, grown))
    )
    for d, v, _m in v1:
        if v == "near":
            assert latest[d] == "near"


def test_index_path_and_frame_are_exclusive(spark, tmp_path):
    newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(str(tmp_path / "idx"))
    idx.build(corpus)
    sigs = idx.signatures(spark)
    try:
        incremental_band_probe(
            newdocs, corpus, index=sigs, index_path=str(tmp_path / "idx")
        )
    except ValueError as e:
        assert "not both" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_vacuumed_index_version_fails_loudly(spark, tmp_path):
    """The retention contract a daily loop must size for: a probe
    PINNED to a version that vacuum has since pruned fails with the
    explicit not-in-manifest error, never a silent empty result —
    and the latest version keeps answering."""
    import pytest as _pytest

    root = str(tmp_path / "idx")
    newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(root)
    assert idx.build(corpus) == 1
    assert idx.build(corpus.unionByName(newdocs)) == 2
    idx.table.vacuum(keep_last=1)
    with _pytest.raises(ValueError, match="vacuumed"):
        idx.probe(newdocs, corpus, version=1)
    assert idx.probe(newdocs, corpus, version=2).count() == newdocs.count()


def test_multi_batch_daily_loop(spark, tmp_path):
    """The daily-ingest cadence composed end to end: probe batch N
    against index version N, fold the batch into the corpus,
    re-publish as version N+1, repeat.  Per batch: the probe's near
    set is a SUBSET of the exact incremental verdicts over the same
    evolving corpus (precision 1), and each re-publish only ever adds
    a version (prior probes' pins stay resolvable)."""
    from data_lake_staging_engine_spark.operators.llmops import (
        incremental_dedup,
    )

    d = load(spark, _SF, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 == 0)
    idx = BandSignatureIndex(str(tmp_path / "daily"))
    assert idx.build(corpus) == 1
    for k, version in ((1, 1), (2, 2), (3, 3)):
        batch = d.filter(F.col("doc_id") % 5 == k)
        probed = {
            r.doc_id: r.verdict
            for r in idx.probe(batch, corpus, version=version).collect()
        }
        exact = {
            r.doc_id: r.verdict
            for r in incremental_dedup(batch, corpus).collect()
        }
        assert set(probed) == set(exact)  # one row per batch doc
        probe_near = {i for i, v in probed.items() if v == "near"}
        exact_near = {i for i, v in exact.items() if v in ("near", "exact")}
        assert probe_near <= exact_near  # precision 1, every batch
        # fold the batch in and re-publish — the next day's index
        corpus = corpus.unionByName(batch)
        assert idx.build(corpus) == version + 1
    assert idx.table.versions() == [1, 2, 3, 4]


def test_nondefault_params_recorded_and_probed(spark, tmp_path):
    """ADVICE r14 (medium): an index built with non-default
    n_hashes/bands used to be probed with the DEFAULT parameters —
    band hashes never collide across parameterizations, so every doc
    silently read 'unique'.  Now build records (n_hashes, bands) on
    the manifest entry and every probe route bands the batch with the
    stored values."""
    root = str(tmp_path / "idx32x8")
    newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(root)
    assert idx.build(corpus, n_hashes=32, bands=8) == 1
    assert idx.params() == (32, 8)

    # Both probe routes (method + index_path) agree with the
    # in-session probe at the SAME parameterization.
    expected = _rows(
        incremental_band_probe(newdocs, corpus, n_hashes=32, bands=8)
    )
    assert _rows(idx.probe(newdocs, corpus)) == expected
    assert _rows(
        incremental_band_probe(newdocs, corpus, index_path=root)
    ) == expected

    # The bug this fix kills: banding the batch with the defaults
    # against the 32x8 index yields (near-)zero candidates — the
    # fixture's known near-dup mass vanishes.  Recovering a non-empty
    # candidate set at the stored parameters proves the plumbing is
    # what restored recall, not luck.
    good = _probe_candidates(
        _tokens(newdocs), idx.signatures(spark), n_hashes=32, bands=8
    ).count()
    bad = _probe_candidates(
        _tokens(newdocs), idx.signatures(spark), n_hashes=16, bands=4
    ).count()
    assert good > 0
    assert bad < good


def test_params_default_for_legacy_manifest_entries(spark, tmp_path):
    """Versions published before the parameters were recorded (round
    14) carry no n_hashes/bands keys; params() must fall back to the
    build defaults — the only parameterization that could have
    produced them."""
    from data_lake_staging_engine_spark.operators.llmops import (
        _band_signatures,
    )

    root = str(tmp_path / "legacy")
    _newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(root)
    # simulate a round-14 publish: signatures without extra metadata
    idx.table.publish(_band_signatures(_tokens(corpus)))
    assert idx.params() == (16, 4)


def test_probe_pinned_version_stable_under_racing_republish(spark, tmp_path):
    """VERDICT r14 #1: the production daily loop — many probes pinned
    to version N while a concurrent rebuild publishes N+1.  The store
    guarantees old versions stay readable (vacuum contract), so every
    pinned probe must return byte-identical rows before, during, and
    after the racing republish, and the republished index must be
    probeable the moment build() returns."""
    import threading

    root = str(tmp_path / "race")
    newdocs, corpus = _split(spark)
    idx = BandSignatureIndex(root)
    assert idx.build(corpus) == 1
    baseline = _rows(idx.probe(newdocs, corpus, version=1))

    grown = corpus.unionByName(newdocs)
    errs: list[Exception] = []
    published = threading.Event()

    def republish():
        try:
            # two racing rebuilds back-to-back widens the window the
            # pinned probes run under
            idx.build(grown)
            idx.build(grown.unionByName(newdocs))
        except Exception as e:  # pragma: no cover - failure capture
            errs.append(e)
        finally:
            published.set()

    t = threading.Thread(target=republish)
    t.start()
    probes = []
    # keep probing the pinned version while the republisher runs;
    # at least one probe is guaranteed to overlap the build window
    # (the loop runs until the publisher finishes, minimum twice)
    while True:
        probes.append(_rows(idx.probe(newdocs, corpus, version=1)))
        if published.is_set() and len(probes) >= 2:
            break
    t.join(timeout=600)
    assert not errs, errs
    assert all(p == baseline for p in probes)
    # the republished versions answer immediately, params intact
    assert idx.table.versions() == [1, 2, 3]
    assert idx.params(3) == (16, 4)
    latest = dict((d, v) for d, v, _m in _rows(idx.probe(newdocs, grown)))
    # every batch doc is IN the v3 corpus => all near
    assert set(latest.values()) == {"near"}


def test_probe_cost_is_corpus_size_flat(spark, tmp_path):
    """VERDICT r15 #6: the O(batch) probe claim, pinned as a CURVE
    property rather than a single point.  A fixed batch probes two
    prebuilt indexes whose corpora differ 16x in size; the probe's
    wall-clock must stay within a generous band (4x) of the small-
    corpus probe.  Runs are interleaved and the MIN per corpus is
    compared, so a host load storm (which inflates both corpora's
    readings together) cannot produce a false failure — only a
    genuinely corpus-proportional probe term can.

    The measured curve this pins (round 16, fixed 715-doc batch at
    sf0.1 scale): 1x/4.3k-doc corpus ~6.6 s, 10x/49k ~6.1 s,
    30x/149k ~6.2 s — flat across 30x (BASELINE.md round 16)."""
    import time

    d = load(spark, _SF, "documents").select("doc_id", "text")
    batch = d.filter(F.col("doc_id") % 7 == 0).localCheckpoint(eager=True)
    small_corpus = d.filter(F.col("doc_id") % 7 != 0).localCheckpoint(
        eager=True
    )
    # 16x corpus of the same shape: per-copy id offset + per-copy
    # letter rotation, so no artificial cross-copy near-dups densify
    # the buckets (the make_replicated_copy discipline, in-memory).
    copies = [small_corpus]
    for i in range(1, 16):
        rot = "".join(
            chr((ord(c) - 97 + i) % 26 + 97) for c in map(chr, range(97, 123))
        )
        copies.append(
            small_corpus.select(
                (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
                F.translate(
                    F.translate("text", "abcdefghijklmnopqrstuvwxyz", rot),
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                    rot.upper(),
                ).alias("text"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big_corpus = big.localCheckpoint(eager=True)
    assert big_corpus.count() == 16 * small_corpus.count()

    stores = {}
    for name, corpus in (("small", small_corpus), ("big", big_corpus)):
        idx = BandSignatureIndex(str(tmp_path / name), spark)
        idx.build(corpus)
        stores[name] = (idx, corpus)

    def probe_once(name):
        idx, corpus = stores[name]
        t0 = time.perf_counter()
        incremental_band_probe(
            batch, corpus, threshold=0.8, index_path=str(tmp_path / name)
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    probe_once("small")  # JVM/codegen warm-up, untimed
    times = {"small": [], "big": []}
    for _ in range(3):  # interleaved: storms hit both corpora alike
        times["small"].append(probe_once("small"))
        times["big"].append(probe_once("big"))
    t_small, t_big = min(times["small"]), min(times["big"])
    assert t_big <= 4 * t_small, (
        f"probe cost grew with corpus size: small={times['small']} "
        f"big={times['big']} — the O(batch) posture is broken"
    )
