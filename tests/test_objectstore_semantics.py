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
