"""VersionedTable retention lifecycle (VERDICT r11 #6).

a22's immutable version dirs accumulated unboundedly — the one
lifecycle gap left in the staging story.  ``versioning.VersionedTable``
adds ``vacuum(keep_last=N)`` with the same crash discipline as
``compact_staged``: the manifest flips FIRST (atomic ``os.replace``),
so a crash mid-vacuum leaves only unreferenced orphan dirs, never a
manifest entry whose data is gone.
"""

import os

import pytest
from pyspark.sql import functions as F

from data_lake_staging_engine_spark.versioning import VersionedTable


def _pub(spark, table, n):
    return table.publish(spark.range(n).select(F.col("id").alias("k")))


def test_publish_read_vacuum_lifecycle(spark, tmp_path):
    """publish x3 -> vacuum keep 2 -> oldest gone, current + previous
    intact, a reader resolved pre-vacuum on a RETAINED version is
    unaffected."""
    table = VersionedTable(str(tmp_path / "vt"))
    assert table.latest() is None
    assert _pub(spark, table, 10) == 1
    assert _pub(spark, table, 20) == 2
    assert _pub(spark, table, 30) == 3
    assert table.versions() == [1, 2, 3]

    pre_vacuum_reader = table.read(spark, 2)  # resolved before vacuum
    v1_dir = table.entry(1)["path"]  # resolve before the entry is pruned
    assert table.vacuum(keep_last=2) == [1]

    assert table.versions() == [2, 3]
    assert not os.path.exists(v1_dir)
    assert table.read(spark, 3).count() == 30
    assert table.read(spark).count() == 30  # latest pointer intact
    assert pre_vacuum_reader.count() == 20  # retained version: no race
    with pytest.raises(ValueError, match="vacuumed"):
        table.read(spark, 1)


def test_vacuum_keep_floor_and_idempotence(spark, tmp_path):
    """keep_last is floored at 1 (latest is always retained); repeated
    vacuum is a no-op."""
    table = VersionedTable(str(tmp_path / "vt"))
    _pub(spark, table, 5)
    _pub(spark, table, 6)
    assert table.vacuum(keep_last=0) == [1]
    assert table.versions() == [2]
    assert table.vacuum(keep_last=0) == []
    assert table.read(spark).count() == 6


def test_interrupted_vacuum_orphans_are_swept(spark, tmp_path):
    """Crash between the manifest flip and the directory deletes leaves
    orphan dirs no manifest entry references — invisible to readers,
    re-collected (with a warning) by the next vacuum."""
    import json
    import warnings

    table = VersionedTable(str(tmp_path / "vt"))
    _pub(spark, table, 5)
    _pub(spark, table, 6)
    # Simulate the crash window: flip the pruned manifest by hand but
    # leave v1's directory on disk.
    meta = table._meta()
    v1_dir = meta["versions"][0]["path"]
    table._flip({"latest": 2, "versions": meta["versions"][-1:]})
    assert os.path.exists(v1_dir)
    assert table.versions() == [2]  # readers already can't reach v1

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert table.vacuum(keep_last=5) == []  # nothing newly pruned
    assert not os.path.exists(v1_dir)
    assert any("orphan" in str(w.message) for w in caught)


def test_crashed_publish_orphan_is_invisible_then_swept(spark, tmp_path):
    """A publish killed after its data write but before the manifest
    flip leaves an unreferenced v<N>-<token> dir: readers never see
    it, the next publish reuses its NUMBER but writes a disjoint dir
    (ADVICE r15 — never an overwrite of another writer's bytes), and
    vacuum sweeps the orphan with a warning."""
    import warnings

    table = VersionedTable(str(tmp_path / "vt"))
    _pub(spark, table, 5)
    # Simulate: v2 data written (legacy un-suffixed name — the sweep
    # accepts both shapes), manifest never flipped.
    orphan = str(tmp_path / "vt" / "v2")
    spark.range(3).write.mode("overwrite").parquet(orphan)
    assert table.versions() == [1]
    assert table.latest() == 1
    # Next publish takes version 2 in its own collision-free dir; the
    # reader sees only the new publish, never the crashed bytes.
    assert _pub(spark, table, 7) == 2
    assert table.read(spark, 2).count() == 7
    assert os.path.exists(orphan)  # untouched, just unreferenced
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert table.vacuum(keep_last=5) == []  # nothing newly pruned
    assert not os.path.exists(orphan)
    assert any("orphan" in str(w.message) for w in caught)
    assert table.read(spark, 2).count() == 7  # live version untouched


def test_vacuum_spares_inflight_publish_above_latest(spark, tmp_path):
    """ADVICE r12: a concurrent publish mid-write at v{latest+1} looks
    exactly like a crashed-publish orphan, but deleting it would flip a
    manifest entry whose data is gone.  vacuum must only sweep version
    numbers <= the latest it observed; the in-flight dir survives and
    its manifest flip lands on intact data."""
    import warnings

    table = VersionedTable(str(tmp_path / "vt"))
    _pub(spark, table, 5)
    _pub(spark, table, 6)
    _pub(spark, table, 7)
    # Simulate a concurrent publish that has written v4's data but not
    # yet flipped the manifest.
    spark.range(9).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "vt" / "v4"))

    v1_dir = table.entry(1)["path"]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert table.vacuum(keep_last=2) == [1]
    assert os.path.exists(str(tmp_path / "vt" / "v4"))  # spared
    assert not os.path.exists(v1_dir)  # pruned
    assert not any("v4" in str(w.message) for w in caught)
    # The in-flight publisher's own flip lands on data that is still
    # there (its dir survived the sweep untouched).
    assert _pub(spark, table, 9) == 4
    assert table.read(spark, 4).count() == 9


def test_uri_root_full_lifecycle(spark, tmp_path):
    """Round 13 (VERDICT r12 #9): URI roots used to be REFUSED; they
    now run through the Hadoop FileSystem gateway.  file:// exercises
    the exact HadoopFS code path a cluster's hdfs:// takes: publish x3,
    read current + time-travel, vacuum prunes + sweeps, and the
    Hadoop-backend crash window (manifest deleted, .tmp holding the
    new content) is ADOPTED by the next read."""
    import json

    root = f"file://{tmp_path}/vt_uri"
    table = VersionedTable(root, spark=spark)
    assert _pub(spark, table, 5) == 1
    assert _pub(spark, table, 6) == 2
    assert _pub(spark, table, 7) == 3
    assert table.read(spark).count() == 7
    assert table.read(spark, 2).count() == 6
    v1_dir = table.entry(1)["path"]
    assert table.vacuum(keep_last=2) == [1]
    assert table.versions() == [2, 3]
    assert not os.path.exists(v1_dir.removeprefix("file://"))

    # the .tmp-adoption crash shape: flip's delete landed, rename did
    # not — the local dir mirrors what HadoopFS.replace leaves behind
    meta = json.load(open(str(tmp_path / "vt_uri" / "manifest.json")))
    os.rename(
        str(tmp_path / "vt_uri" / "manifest.json"),
        str(tmp_path / "vt_uri" / "manifest.json.tmp"),
    )
    assert table.latest() == meta["latest"]  # adopted, not empty
    assert os.path.exists(str(tmp_path / "vt_uri" / "manifest.json"))


def test_uri_root_without_session_is_rejected():
    with pytest.raises(ValueError, match="SparkSession"):
        VersionedTable("s3a://bucket/table")


def _crash_window(root: str) -> dict:
    """Put a manifest-less VersionedTable root into the HadoopFS crash
    shape (manifest deleted, .tmp holding the complete new content)
    and return that content."""
    import json

    os.makedirs(root, exist_ok=True)
    meta = {"latest": 1, "versions": [{"version": 1, "path": os.path.join(root, "v1")}]}
    with open(os.path.join(root, "manifest.json.tmp"), "w") as f:
        json.dump(meta, f)
    return meta


def test_concurrent_readers_race_the_tmp_adoption(tmp_path):
    """ADVICE r13: two readers hitting the crash window concurrently —
    the loser's adoption rename fails once the winner consumed the
    .tmp.  Every reader must still return the manifest content; none
    may raise.  Pure-local VersionedTable (no session needed), many
    threads, repeated rounds to make the race likely."""
    import threading

    for round_no in range(8):
        root = str(tmp_path / f"race{round_no}")
        meta = _crash_window(root)
        table = VersionedTable(root)
        results: list = [None] * 8
        errors: list = []

        def read(i):
            try:
                results[i] = table._meta()
            except Exception as e:  # noqa: BLE001 - the assertion target
                errors.append(e)

        threads = [threading.Thread(target=read, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, f"reader raised during adoption race: {errors!r}"
        assert all(r == meta for r in results), results
        # and the adoption landed: the manifest file exists again
        assert os.path.exists(os.path.join(root, "manifest.json"))


def test_read_only_reader_falls_back_to_tmp_content(tmp_path, monkeypatch):
    """ADVICE r13: a reader without write permission on the root (the
    rename raises) must still READ the crash-window content — the
    single-writer contract covers writers, not readers."""
    from data_lake_staging_engine_spark import fs as fsmod

    root = str(tmp_path / "ro")
    meta = _crash_window(root)
    table = VersionedTable(root)

    def denied(self, src, dst):
        raise PermissionError("read-only reader")

    monkeypatch.setattr(fsmod.LocalFS, "rename", denied)
    assert table._meta() == meta  # read the .tmp directly, no mutation
    # nothing was repaired (no write permission), nothing was lost
    assert not os.path.exists(os.path.join(root, "manifest.json"))
    assert os.path.exists(os.path.join(root, "manifest.json.tmp"))


def test_concurrent_publish_loser_raises_and_store_stays_consistent(
    spark, tmp_path
):
    """VERDICT r14 #4: two publishers racing the same store — the one
    whose manifest snapshot went stale must raise
    ConcurrentPublishError at flip time (never silently clobber the
    winner), the store must keep serving the winner's version, and a
    RETRY of the loser publishes cleanly on top.

    The interleave is made deterministic by pinning the loser's first
    _meta() read to the pre-race snapshot — exactly the state a real
    publisher holds when a competitor flips between its snapshot and
    its own flip."""
    from data_lake_staging_engine_spark.versioning import (
        ConcurrentPublishError,
    )

    root = str(tmp_path / "vt")
    winner = VersionedTable(root)
    loser = VersionedTable(root)
    base = spark.range(10).withColumn("x", F.col("id") * 2)
    assert winner.publish(base) == 1

    real_meta = loser._meta
    stale = real_meta()
    calls = {"n": 0}

    def pinned_first_read():
        calls["n"] += 1
        return stale if calls["n"] == 1 else real_meta()

    loser._meta = pinned_first_read
    # the winner flips v2 after the loser snapshotted (latest=1)
    assert winner.publish(base.withColumn("x", F.col("x") + 1)) == 2

    with pytest.raises(ConcurrentPublishError, match="manifest moved"):
        loser.publish(base.withColumn("x", F.col("x") + 7))

    # store consistent: winner's v2 is latest, both versions readable,
    # the loser's orphan dir is unreferenced — and the loser's data
    # write did NOT touch the winner's already-published bytes (ADVICE
    # r15: both racers computed version 2, but they wrote DISJOINT
    # v2-<token> dirs): v2 still holds the winner's x = 2*id + 1.
    assert winner.latest() == 2
    assert winner.versions() == [1, 2]
    assert winner.read(spark, 2).count() == 10
    assert winner.read(spark, 2).agg(F.sum("x")).collect()[0][0] == sum(
        i * 2 + 1 for i in range(10)
    )
    # retry (fresh snapshot) lands as v3 in its own dir
    loser._meta = real_meta
    assert loser.publish(base.withColumn("x", F.col("x") + 7)) == 3
    assert winner.read(spark, 3).agg(F.sum("x")).collect()[0][0] == sum(
        i * 2 + 7 for i in range(10)
    )


def test_sequential_publishes_unaffected_by_cas(spark, tmp_path):
    """The CAS must be invisible to the documented single-writer
    paths: back-to-back publishes and the publish-inside-compaction
    flow carry no contention and never raise."""
    t = VersionedTable(str(tmp_path / "vt"))
    df = spark.range(5)
    for expect in (1, 2, 3):
        assert t.publish(df) == expect
    assert t.versions() == [1, 2, 3]


def test_publish_detects_concurrent_vacuum(spark, tmp_path):
    """A vacuum does not move ``latest``, so a latest-only CAS would
    let a publish flip a PRE-VACUUM snapshot back in — resurrecting
    manifest entries whose data dirs the vacuum deleted.  The CAS
    compares the retained version numbers too: the publish refuses."""
    from data_lake_staging_engine_spark.versioning import (
        ConcurrentPublishError,
    )

    root = str(tmp_path / "vt")
    writer = VersionedTable(root)
    df = spark.range(8)
    assert writer.publish(df) == 1
    assert writer.publish(df) == 2

    loser = VersionedTable(root)
    real_meta = loser._meta
    stale = real_meta()
    calls = {"n": 0}
    loser._meta = lambda: (
        stale if (calls.__setitem__("n", calls["n"] + 1) or calls["n"]) == 1
        else real_meta()
    )
    assert writer.vacuum(keep_last=1) == [1]  # latest stays 2

    with pytest.raises(ConcurrentPublishError, match="manifest moved"):
        loser.publish(df)
    # the vacuumed state is intact: v1 pruned, v2 the latest
    assert writer.versions() == [2]
    assert writer.latest() == 2


def test_vacuum_detects_concurrent_publish(spark, tmp_path):
    """The mirror race: a publish flips v3 between a vacuum's snapshot
    and its flip.  A blind vacuum flip would erase v3's manifest entry
    (its data dir, above the observed latest, survives the sweep — a
    manifest/data split).  The vacuum re-reads and refuses; nothing is
    deleted; the retry prunes against the current manifest."""
    from data_lake_staging_engine_spark.versioning import (
        ConcurrentWriterError,
    )

    root = str(tmp_path / "vt")
    writer = VersionedTable(root)
    df = spark.range(8)
    assert writer.publish(df) == 1
    assert writer.publish(df) == 2

    vac = VersionedTable(root)
    real_meta = vac._meta
    stale = real_meta()
    calls = {"n": 0}
    vac._meta = lambda: (
        stale if (calls.__setitem__("n", calls["n"] + 1) or calls["n"]) == 1
        else real_meta()
    )
    assert writer.publish(df) == 3  # lands between snapshot and flip

    with pytest.raises(ConcurrentWriterError, match="manifest moved"):
        vac.vacuum(keep_last=1)
    # nothing was deleted: all three versions readable
    assert writer.versions() == [1, 2, 3]
    assert writer.read(spark, 1).count() == 8
    # the retry (fresh snapshot) prunes correctly
    vac._meta = real_meta
    assert vac.vacuum(keep_last=1) == [1, 2]
    assert writer.versions() == [3]
