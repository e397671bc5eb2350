"""Object-store semantics double (SURVEY r14-entry candidate, built
round 14): an fs backend that mimics what s3a-class stores actually do
— `replace` decomposed into delete-dst + rename, `rename` decomposed
into copy + delete-src — with injectable kills at EVERY intermediate
point.  The real HadoopFS gateway cannot be crash-tested in this
container; this double exercises the exact caller-visible states its
docstring warns about, against the real VersionedTable protocol.

The invariant under test: after a kill at ANY point of a manifest
flip, a fresh reader's `_meta()` returns a COMPLETE manifest — either
the old or the new content, never an empty/missing/truncated state —
and a retried flip converges to the new content.  No Spark session is
needed: the manifest protocol is pure fs + JSON.
"""

import json
import os

import pytest
# Slow tier (pytest.ini): republish kill-point suite.
pytestmark = pytest.mark.slow


from data_lake_staging_engine_spark.fs import LocalFS, write_json_replace
from data_lake_staging_engine_spark.versioning import VersionedTable


class Kill(Exception):
    pass


class ObjectStoreFS(LocalFS):
    """LocalFS with s3a-shaped mutation primitives and kill injection.

    ``kill_at`` names the step to die at:
      replace: 'after_tmp_write' (in write_json_replace, before any
               replace step), 'after_dst_delete' (dst gone, src=.tmp
               intact), 'mid_rename' (copy landed at dst, src not yet
               deleted — the s3a rename window)
    """

    def __init__(self):
        self.kill_at = None

    def _maybe_kill(self, point):
        if self.kill_at == point:
            self.kill_at = None
            raise Kill(point)

    def write_text(self, path, text):
        super().write_text(path, text)
        if path.endswith(".tmp"):
            self._maybe_kill("after_tmp_write")

    def rename(self, src, dst):
        # s3a rename = copy + delete-source (non-atomic)
        with open(src, "rb") as f:
            data = f.read()
        with open(dst, "wb") as f:
            f.write(data)
        self._maybe_kill("mid_rename")
        os.remove(src)

    def replace(self, src, dst):
        # the HadoopFS.replace protocol: delete destination, rename
        if os.path.exists(dst):
            os.remove(dst)
            self._maybe_kill("after_dst_delete")
        self.rename(src, dst)


def _table(tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t._fs = ObjectStoreFS()
    os.makedirs(t.root, exist_ok=True)
    return t


def _flip(t, version):
    write_json_replace(
        t._fs,
        t.manifest,
        {"latest": version,
         "versions": [{"version": version, "path": f"v{version}"}]},
    )


KILL_POINTS = ["after_tmp_write", "after_dst_delete", "mid_rename"]


@pytest.mark.parametrize("point", KILL_POINTS)
def test_flip_kill_points_never_lose_the_manifest(tmp_path, point):
    """Kill a v1->v2 flip at each intermediate state: a fresh reader
    sees complete v1 OR complete v2; a retried flip converges on v2."""
    t = _table(tmp_path)
    _flip(t, 1)  # clean v1 baseline
    assert t.latest() == 1

    t._fs.kill_at = point
    with pytest.raises(Kill):
        _flip(t, 2)

    # fresh reader (separate table handle, same store state)
    reader = VersionedTable(t.root)
    reader._fs = ObjectStoreFS()
    got = reader._meta()
    assert got["latest"] in (1, 2), got
    assert got["versions"], got  # complete content, never empty

    # the retried writer converges
    t._fs.kill_at = None
    _flip(t, 2)
    assert reader._meta()["latest"] == 2


@pytest.mark.parametrize("point", KILL_POINTS)
def test_first_publish_kill_points(tmp_path, point):
    """Same sweep with NO prior manifest (the first publish): the
    reader must see either the empty table or complete v1."""
    t = _table(tmp_path)
    t._fs.kill_at = point
    if point == "after_dst_delete":
        pytest.skip("no destination exists on a first publish")
    with pytest.raises(Kill):
        _flip(t, 1)
    reader = VersionedTable(t.root)
    reader._fs = ObjectStoreFS()
    got = reader._meta()
    assert got == {"latest": None, "versions": []} or got["latest"] == 1
    t._fs.kill_at = None
    _flip(t, 1)
    assert reader._meta()["latest"] == 1


def test_mid_rename_leaves_both_files_and_reads_new(tmp_path):
    """The s3a rename window (copy landed, source not deleted) leaves
    BOTH manifest and .tmp — the reader must take the manifest (new
    content) and the stale .tmp must not poison a later flip."""
    t = _table(tmp_path)
    _flip(t, 1)
    t._fs.kill_at = "mid_rename"
    with pytest.raises(Kill):
        _flip(t, 2)
    assert os.path.exists(t.manifest)
    assert os.path.exists(t.manifest + ".tmp")
    reader = VersionedTable(t.root)
    reader._fs = ObjectStoreFS()
    assert reader._meta()["latest"] == 2  # copy landed = new content
    _flip(t, 3)  # stale tmp is overwritten by the next protocol round
    assert reader._meta()["latest"] == 3
    assert json.loads(open(t.manifest).read())["latest"] == 3


# ---------------------------------------------------------------------------
# Composed lifecycle: BandSignatureIndex publish/vacuum/probe on the
# object-store double (VERDICT r14 #3).  The manifest sweeps above
# prove the flip protocol in isolation; these prove the INDEX STORE a
# daily dedup loop depends on — build, republish (killed at every flip
# window), vacuum under delayed-delete visibility, probe — never loses
# a version, never double-reads, and never serves a half-published
# index.
# ---------------------------------------------------------------------------


class DelayedDeleteFS(ObjectStoreFS):
    """Object-store delete visibility: ``rmtree`` queues the delete and
    the tree STAYS LISTED until ``settle()`` — the eventual-consistency
    shape where a pruned prefix remains visible to list operations for
    a while after the DELETE call returned."""

    def __init__(self):
        super().__init__()
        self.pending: list[str] = []

    def rmtree(self, path):
        if os.path.exists(path):
            self.pending.append(path)

    def settle(self):
        import shutil

        for p in self.pending:
            shutil.rmtree(p, ignore_errors=True)
        self.pending = []


def _docs(spark):
    from pyspark.sql import functions as F

    from data_lake_staging_engine_spark.sources import load

    d = (
        load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 400)
    )
    return (
        d.filter(F.col("doc_id") % 7 == 0),
        d.filter(F.col("doc_id") % 7 != 0),
    )


def _verdicts(df):
    return sorted((r["doc_id"], r["verdict"], r["match_id"]) for r in df.collect())


@pytest.mark.parametrize("point", KILL_POINTS)
def test_index_republish_kill_points_probe_reads_whole_versions(
    spark, tmp_path, point
):
    """Kill a v1->v2 index republish at each flip window: a fresh
    probe must answer from COMPLETE v1 or COMPLETE v2 signatures
    (both datasets are fully written before any flip step — the probe
    can never see a half-published version), a version-PINNED probe
    still answers v1 exactly, and the retried republish converges."""
    from data_lake_staging_engine_spark.operators.llmops import (
        BandSignatureIndex,
    )

    newdocs, corpus = _docs(spark)
    root = str(tmp_path / "idx")
    idx = BandSignatureIndex(root)
    idx.table._fs = ObjectStoreFS()
    assert idx.build(corpus) == 1
    v1_rows = _verdicts(idx.probe(newdocs, corpus, version=1))

    grown = corpus.unionByName(newdocs)
    idx.table._fs.kill_at = point
    with pytest.raises(Kill):
        idx.build(grown)

    # fresh handle = fresh reader; whatever manifest state the kill
    # left, the probe resolves a COMPLETE version
    reader = BandSignatureIndex(root)
    reader.table._fs = ObjectStoreFS()
    latest = reader.table.latest()
    assert latest in (1, 2)
    probed = _verdicts(reader.probe(newdocs, corpus))
    if latest == 1:
        assert probed == v1_rows
    else:
        # v2 banded the grown corpus (batch included): every batch doc
        # matches itself — a half-written v2 could not produce this
        assert all(v == "near" for _d, v, _m in probed)
    # the pin is immune to the crash state
    assert _verdicts(reader.probe(newdocs, corpus, version=1)) == v1_rows

    # retried republish converges on a NEW latest with the same
    # all-near property, and v1 stays readable
    idx.table._fs.kill_at = None
    idx2 = BandSignatureIndex(root)
    idx2.table._fs = ObjectStoreFS()
    idx2.build(grown)
    final = _verdicts(idx2.probe(newdocs, corpus))
    assert all(v == "near" for _d, v, _m in final)
    assert _verdicts(idx2.probe(newdocs, corpus, version=1)) == v1_rows


def test_index_vacuum_under_delayed_delete_visibility(spark, tmp_path):
    """Vacuum on a store where deletes are VISIBLE-LATER: the pruned
    version's dir stays listed after vacuum returns.  The manifest is
    the source of truth — a pinned probe of the pruned version fails
    loudly (never silently reads the still-visible stale files), the
    latest keeps answering, a publish during the pending-delete window
    lands cleanly, and settling the deletes changes nothing a reader
    can observe."""
    from data_lake_staging_engine_spark.operators.llmops import (
        BandSignatureIndex,
    )

    newdocs, corpus = _docs(spark)
    root = str(tmp_path / "idx")
    fs = DelayedDeleteFS()
    idx = BandSignatureIndex(root)
    idx.table._fs = fs
    assert idx.build(corpus) == 1
    grown = corpus.unionByName(newdocs)
    assert idx.build(grown) == 2
    v2_rows = _verdicts(idx.probe(newdocs, corpus, version=2))

    v1_dir = idx.table.entry(1)["path"]
    assert idx.table.vacuum(keep_last=1) == [1]
    # the delete has NOT landed: v1's dir is still visible on disk
    assert fs.pending and os.path.isdir(v1_dir)
    with pytest.raises(ValueError, match="vacuumed"):
        idx.probe(newdocs, corpus, version=1)
    assert _verdicts(idx.probe(newdocs, corpus, version=2)) == v2_rows

    # a republish during the pending-delete window: version numbers
    # never collide with the pruned-but-visible v1 (they only grow)
    assert idx.build(grown) == 3
    assert idx.table.versions() == [2, 3]

    fs.settle()
    assert not os.path.exists(v1_dir)
    assert _verdicts(idx.probe(newdocs, corpus, version=2)) == v2_rows
    assert idx.table.latest() == 3
