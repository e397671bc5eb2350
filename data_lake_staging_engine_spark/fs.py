"""Filesystem abstraction for the maintenance ops (VERDICT r12 #9).

``compact_staged`` and ``VersionedTable`` need a handful of metadata
primitives (list, rename, recursive delete, small-file read/write)
that the DataFrame API does not expose.  Until round 13 they were
local-POSIX only and REFUSED URI paths; this module lifts that through
the Hadoop FileSystem API (``spark._jvm.org.apache.hadoop.fs``), which
is how Spark itself reaches hdfs://, s3a://, abfs://, gs://, and
file:// — so the maintenance ops now run where the data actually
lives, with the local path keeping its exact pre-round-13 primitives.

Semantics by backend (stated, not hidden):

- ``LocalFS`` — POSIX.  ``replace`` is ``os.replace``: ATOMIC.
- ``HadoopFS`` — whatever the scheme's FileSystem provides.
  ``rename`` (to a non-existent destination) is atomic on HDFS and
  on local ``file://``; on object stores (s3a://) it is a copy+delete
  — correct but neither atomic nor O(1).  ``replace`` is implemented
  as create-tmp + delete-dst + rename-tmp (the FileSystem API has no
  portable overwrite-rename), which opens a crash window where the
  destination is MISSING and the ``.tmp`` holds the new content;
  callers that need crash safety must implement tmp-adoption recovery
  on read (``VersionedTable._meta`` does).  Single-writer discipline
  (already the documented contract for every maintenance op here) is
  assumed throughout.

``filesystem_for(path, spark)`` picks the backend: URI-schemed paths
get ``HadoopFS`` (a live SparkSession is required for the JVM
gateway), bare paths get ``LocalFS``.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import SparkSession

#: URI-schemed path (s3a://, hdfs://, file://, ...).
URI_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


class LocalFS:
    """POSIX primitives — byte-for-byte the pre-round-13 behavior."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)  # atomic

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)


class HadoopFS:
    """Hadoop FileSystem primitives resolved from a base URI.

    One JVM ``FileSystem`` per instance (Hadoop caches them per
    (scheme, authority, ugi) anyway); every path passed to the methods
    must live on the same filesystem as ``base_uri``."""

    def __init__(self, spark: SparkSession, base_uri: str) -> None:
        jvm = spark._jvm
        self._jvm = jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI(base_uri), self._conf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def listdir(self, path: str) -> list[str]:
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
        ]

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"hadoop rename failed: {src!r} -> {dst!r}")

    def replace(self, src: str, dst: str) -> None:
        """delete-then-rename — NOT atomic (see module docstring);
        callers needing crash safety must adopt the ``.tmp`` on read."""
        dstp = self._p(dst)
        if self._fs.exists(dstp):
            self._fs.delete(dstp, False)
        if not self._fs.rename(self._p(src), dstp):
            raise OSError(f"hadoop rename failed: {src!r} -> {dst!r}")

    def rmtree(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path)).getLen())

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            # IOUtils ships with Hadoop on every Spark classpath; it
            # drains the stream fully without py4j byte juggling.
            return str(
                self._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            )
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()


def filesystem_for(path: str, spark: SparkSession | None = None):
    """Backend pick: URI-schemed paths need the JVM gateway; bare
    paths keep the POSIX primitives (and need no session)."""
    if URI_SCHEME.match(path):
        if spark is None:
            raise ValueError(
                f"URI path {path!r} needs a live SparkSession for the "
                "Hadoop FileSystem gateway; pass spark="
            )
        return HadoopFS(spark, path)
    return LocalFS()


def read_json(fs, path: str) -> dict:
    return json.loads(fs.read_text(path))


def write_json_replace(fs, path: str, obj: dict) -> None:
    """Write ``obj`` to ``path`` via the ``.tmp`` + replace protocol:
    atomic on LocalFS; on HadoopFS the crash window leaves ``.tmp``
    holding the NEW content and possibly no ``path`` — readers adopt
    the tmp (see VersionedTable._meta)."""
    tmp = path + ".tmp"
    fs.write_text(tmp, json.dumps(obj))
    fs.replace(tmp, path)
