#!/usr/bin/env python
"""Materialize a row-permuted, multi-file copy of a fixture SF dir.

Row order and file layout are things no query result may depend on:
every LIMIT must be totally tie-broken, every first/last anchored to an
explicit ordering, every collect sorted. This script produces the
adversarial input for that axis — same multiset as the source, rows
permuted with a fixed seed and split across 7 files per table — via
pyarrow (NOT Spark), which preserves the exact parquet schema including
events.ts's NANOS timestamps that a Spark rewrite would downcast.

Usage:
    python scripts/make_shuffled_copy.py [src_sf_dir] [dst_dir]
    python scripts/parity_sweep.py <dst_dir> --oracle-sf-dir <src_sf_dir>

(The oracle keeps reading the ORIGINAL single-file layout — DuckDB's
view creation expects one file per table — while Spark reads the
shuffled directory form; both see the same multiset. Round-7 evidence:
0 failures / 159, BASELINE.md.)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

N_FILES = 7
SEED = 12345


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_shuffled"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        perm = np.random.default_rng(SEED).permutation(tab.num_rows)
        shuf = tab.take(pa.array(perm))
        tdir = f"{dst}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        bounds = np.linspace(0, tab.num_rows, N_FILES + 1).astype(int)
        for i in range(N_FILES):
            pq.write_table(
                shuf.slice(bounds[i], bounds[i + 1] - bounds[i]),
                f"{tdir}/part-{i}.parquet",
            )
        print(f"{t}: {tab.num_rows} rows -> {N_FILES} files", flush=True)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
