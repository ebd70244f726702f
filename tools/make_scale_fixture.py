"""Build an N× key-remapped copy of a testdata dir for scale probes.

Construction (the SCALE.md round-10 "v2 remap", generalized): the
fixture is N concatenated copies of the source, with every ENTITY key
offset per copy (copy k adds ``k * KOFF`` to each key column) so
per-key join fan-out is PRESERVED — naive row duplication would square
join outputs (copy-k orders would join copy-j lineitems for all j).
Dimension grids that are part of the data's meaning (nation/region,
brands, priorities, event types) are NOT remapped: groups keep their
cardinality and receive N× rows per group, which is what real growth
looks like.

This tool targets TIMING probes (the 32×/64× headline curve — VERDICT
r10 #7): text/embedding payloads are copied verbatim per copy, which is
fine for relational headline queries but NOT for dedup/LSH correctness
probes — 8-way exact text duplication probes the dupkeys regime and
squares LSH block density (the r10 probe's v1 negative control). For
correctness at scale use the r10 v2 construction (per-copy token
mutation); documents/embeddings are therefore EXCLUDED here by default.

Usage:
    python tools/make_scale_fixture.py /tmp/sf_scale64 --factor=64 \
        [--src=/root/testdata/sf0.1]

Writes one parquet file per table, streaming copy-by-copy through a
ParquetWriter so peak memory is one copy of one table.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: Per-copy key offset — far above any real key at the probe SFs.
KOFF = 100_000_000

#: Entity-key columns remapped per copy (join-identity keys). Grid/
#: dimension columns (brand, priority, event_type, mktsegment, dates)
#: stay untouched so group cardinality is preserved.
KEY_COLS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
}

#: Fixed dimension tables: copied once, never multiplied (their keys
#: are referenced un-offset, matching the un-remapped FK columns).
SINGLE_COPY = ("nation", "region")


def scale_table(src_path: str, out_path: str, table: str, factor: int) -> int:
    tbl = pq.read_table(src_path)
    keys = KEY_COLS.get(table, ())
    # ADVICE r11: with a larger --src (sf100 l_orderkey reaches ~600M)
    # a fixed offset silently collides copy k's high keys with copy
    # k+1's low keys, corrupting the preserved-fan-out property this
    # tool exists to guarantee. Validate every remapped column against
    # KOFF before writing, and use checked addition so int overflow at
    # high factors fails loudly instead of wrapping.
    for col in keys:
        mx = pc.max(tbl.column(col)).as_py()
        if mx is not None and mx >= KOFF:
            raise SystemExit(
                f"{table}.{col}: max key {mx} >= KOFF {KOFF}; per-copy "
                "offsets would collide across copies — raise KOFF above "
                "the max source key"
            )
    writer = pq.ParquetWriter(out_path, tbl.schema)
    total = 0
    try:
        for k in range(factor):
            copy = tbl
            for col in keys:
                i = copy.schema.get_field_index(col)
                shifted = pc.add_checked(
                    copy.column(i),
                    pa.scalar(k * KOFF, type=copy.column(i).type),
                )
                copy = copy.set_column(i, copy.schema.field(i), shifted)
            writer.write_table(copy)
            total += copy.num_rows
    finally:
        writer.close()
    return total


def scale_documents(src_path: str, out_path: str, factor: int) -> int:
    """N× text corpus for dedup/retrieval TIMING probes (the r10 "v2"
    construction, VERDICT r11 #5): copy k>0 prefixes every token with
    ``k{k}x`` so cross-copy shingle similarity is ~0 (every n-gram
    changes) while WITHIN-copy near-dup structure is preserved (both
    sides of a near-dup pair mutate identically). Doc ids remap densely
    — copy k adds ``k * (max(doc_id) + 1)`` — so the scaled corpus
    stays below the dedup fixtures' 500k plant floor, enforced loudly
    below."""
    tbl = pq.read_table(src_path)
    id_stride = pc.max(tbl.column("doc_id")).as_py() + 1
    if factor * id_stride >= 500_000:
        raise SystemExit(
            f"documents x{factor}: max remapped id {factor * id_stride} "
            "would cross the 500k dedup plant floor"
        )
    writer = pq.ParquetWriter(out_path, tbl.schema)
    total = 0
    try:
        for k in range(factor):
            copy = tbl
            i = copy.schema.get_field_index("doc_id")
            shifted = pc.add_checked(
                copy.column(i), pa.scalar(k * id_stride, type=copy.column(i).type)
            )
            copy = copy.set_column(i, copy.schema.field(i), shifted)
            if k > 0:
                j = copy.schema.get_field_index("text")
                pfx = f"k{k}x"
                mutated = pa.array(
                    [
                        None
                        if t is None
                        else " ".join(pfx + w for w in t.split())
                        for t in copy.column(j).to_pylist()
                    ],
                    type=copy.column(j).type,
                )
                copy = copy.set_column(j, copy.schema.field(j), mutated)
            writer.write_table(copy)
            total += copy.num_rows
    finally:
        writer.close()
    return total


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scale64"
    factor, src = 64, "/root/testdata/sf0.1"
    documents = False
    for a in sys.argv[2:]:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        elif a.startswith("--src="):
            src = a.split("=", 1)[1]
        elif a == "--documents":
            documents = True
    os.makedirs(out_root, exist_ok=True)
    if documents:
        n = scale_documents(
            f"{src}/documents.parquet", f"{out_root}/documents.parquet", factor
        )
        print(f"documents: {n} rows ({factor}x, per-copy token mutation)")
        return
    for t in SINGLE_COPY:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{out_root}/{t}.parquet")
        print(f"{t}: 1 copy")
    for t in KEY_COLS:
        n = scale_table(f"{src}/{t}.parquet", f"{out_root}/{t}.parquet", t, factor)
        print(f"{t}: {n} rows ({factor}x)")


if __name__ == "__main__":
    main()
