#!/usr/bin/env python
"""Materialize an N-fold replicated copy of a fixture SF dir (the
sf1-scale input for the scaling study).

Every scaling_study ratio at the shipped SFs (sf0.001/0.01/0.1) sits in
the fixed-overhead band, so the sf-sweep proves overhead, not scaling —
the data term only becomes visible ~10x past sf0.1.  This script builds
that input via pyarrow (NOT Spark: pyarrow round-trips the exact
parquet schema, including whatever timestamp unit events.ts carries,
where a Spark rewrite would re-type).

Replication is NOT verbatim concatenation — that would create an
artifactual corpus where every key exists N times (join fan-out N^2,
exact-dedup collapses N:1, near-dup buckets go quadratic in N).  Each
copy is remapped to look like NEW data of the same shape:

- region/nation stay single-copy (fixed dims — matches how TPC-H dims
  scale, and keeps FK validity for the *_nationkey columns);
- every integer entity key gets a per-copy offset (copy i adds
  i*1e8), and FK columns get the SAME offset so each copy joins
  against its own copy (join selectivity preserved, output scales
  linearly like real growth);
- documents.text gets a per-copy Caesar rotation over ASCII letters:
  token/shingle STRUCTURE and n_chars are preserved exactly, but the
  vocabulary is disjoint across copies, so within-copy dup/near-dup
  structure replicates while no artificial cross-copy near-dups
  appear (10 near-identical siblings per doc would otherwise make
  every LSH bucket quadratically denser);
- embeddings.embedding gets a per-copy component permutation: norms
  (and hence all within-copy cosines) are exactly preserved, while
  cross-copy cosines decorrelate, so ANN bucket occupancy scales the
  way genuinely new vectors would.

Copy 0 is byte-identical to the source.

Usage:
    python scripts/make_replicated_copy.py [src] [dst] [--copies 10]
    python scripts/scaling_study.py --sf-dirs sf0.1=/root/testdata/sf0.1,sf1=/tmp/sf1_replica
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# one copy only — fixed dimensions (their keys are FK targets of the
# *_nationkey columns, which are NOT remapped)
DIM_TABLES = ("region", "nation")

# per-table integer columns that take the per-copy offset; entity keys
# and the FKs that must follow them into the copy
KEY_COLUMNS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

KEY_OFFSET = 100_000_000  # far above any fixture key, far below 2^53


def _caesar_table(shift: int) -> bytes:
    """bytes.translate table rotating a-z and A-Z by ``shift``."""
    t = bytearray(range(256))
    for base in (ord("a"), ord("A")):
        for k in range(26):
            t[base + k] = base + (k + shift) % 26
    return bytes(t)


def _replicate_documents(tab: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tab
    table = _caesar_table(i % 25 + 1)  # shift 1..25, never identity
    texts = [
        None if v is None else v.encode("utf-8", "surrogatepass")
        .translate(table)
        .decode("utf-8", "surrogatepass")
        for v in tab.column("text").to_pylist()
    ]
    idx = tab.schema.get_field_index("text")
    return tab.set_column(idx, "text", pa.array(texts, type=pa.string()))


def _replicate_embeddings(tab: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tab
    col = tab.column("embedding").combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if widths.min() != widths.max():
        raise ValueError("ragged embedding column — permutation needs a "
                         "fixed dimension")
    dim = int(widths[0])
    mat = vals.reshape(-1, dim)
    perm = np.random.default_rng(1000 + i).permutation(dim)
    permuted = np.ascontiguousarray(mat[:, perm]).reshape(-1)
    arr = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(permuted, type=col.values.type)
    )
    idx = tab.schema.get_field_index("embedding")
    return tab.set_column(idx, "embedding", arr.cast(tab.field(idx).type))


def replicate(tab: pa.Table, name: str, i: int) -> pa.Table:
    out = tab
    if i > 0:
        for keycol in KEY_COLUMNS.get(name, ()):
            idx = out.schema.get_field_index(keycol)
            field = out.field(idx)
            shifted = pc.add(out.column(keycol), i * KEY_OFFSET).cast(
                field.type
            )
            out = out.set_column(idx, keycol, shifted)
    if name == "documents":
        out = _replicate_documents(out, i)
    elif name == "embeddings":
        out = _replicate_embeddings(out, i)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("dst", nargs="?", default="/tmp/sf1_replica")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    for t in DIM_TABLES:
        tab = pq.read_table(f"{args.src}/{t}.parquet")
        tdir = f"{args.dst}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(tab, f"{tdir}/part-0.parquet")
        print(f"{t}: {tab.num_rows} rows (dim, 1 copy)", flush=True)

    for t in KEY_COLUMNS:
        tab = pq.read_table(f"{args.src}/{t}.parquet")
        tdir = f"{args.dst}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        for i in range(args.copies):
            pq.write_table(replicate(tab, t, i), f"{tdir}/part-{i}.parquet")
        print(
            f"{t}: {tab.num_rows} rows x {args.copies} copies",
            flush=True,
        )
    print(f"wrote {args.dst}", flush=True)


if __name__ == "__main__":
    main()
