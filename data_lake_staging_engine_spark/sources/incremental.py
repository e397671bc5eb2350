"""Manifest-based incremental file ingestion (§2.A a12).

The reference's unit of work is "a new object landed in S3"
(BASELINE.json:6). Batch-side, the engine reproduces those semantics
with a processed-files manifest: each ``process_new`` call lists the
landing prefix, reads only files not yet in the manifest, and records
them. This is the same contract as Structured Streaming's file-source
checkpoint (streaming/, a13) in a batch-pull shape.

Scale: listing is driver-side metadata only (same as any file index);
data reads are fully parallel parquet scans of just the new files. At
100 TB the manifest would live in a transactional store, and listing
would use S3 inventory/notifications — the interface is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class IncrementalLoader:
    def __init__(self, landing_dir: str, manifest_path: str):
        self.landing_dir = landing_dir
        self.manifest_path = manifest_path

    def _seen(self) -> set[str]:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return set(json.load(f))
        return set()

    def _record(self, files: set[str]) -> None:
        with open(self.manifest_path, "w") as f:
            json.dump(sorted(files), f)

    def list_new_files(self) -> list[str]:
        seen = self._seen()
        current = {
            os.path.join(self.landing_dir, f)
            for f in os.listdir(self.landing_dir)
            if f.endswith(".parquet")
        }
        return sorted(current - seen)

    def process_new(self, spark: SparkSession) -> DataFrame | None:
        """Read only files that arrived since the last call; returns None
        when there is nothing new."""
        new = self.list_new_files()
        if not new:
            return None
        df = spark.read.parquet(*new)
        self._record(self._seen() | set(new))
        return df
