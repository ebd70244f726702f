"""Build a HOT-KEY variant of a scale fixture (VERDICT r12 #4: compose
hotkey × scale — skew was proven correct at sf0.01 via the hotkey/
hotmany variants, and scale at 64× on uniform keys, but AQE's skew-join
split had never been observed actually firing at size).

Remap, in-place semantics preserved:

- ``orders.o_custkey``: ~50% of rows (even ``o_orderkey``) point at ONE
  existing hot customer — skews the master join's orders⋈customer leg
  (the probe side of the 64× sort-merge join) and every per-customer
  aggregate;
- ``lineitem.l_partkey``: ~50% of rows (even ``l_orderkey``) point at
  ONE existing hot part — skews the product-KPI joins and the
  (orderkey, partkey) pre-agg grain.

Join-identity keys (``o_orderkey``/``l_orderkey``) are untouched, so
orders⋈lineitem fan-out is exactly the source fixture's; referential
integrity holds because the hot keys are chosen FROM the fixture
(min customer / min part key). Every other table is copied by hardlink.

Usage:
    python tools/make_hotkey_fixture.py /tmp/sf_scale64_hot \
        [--src=/tmp/sf_scale64]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main() -> None:
    out_dir = sys.argv[1]
    src = "/tmp/sf_scale64"
    for a in sys.argv[2:]:
        if a.startswith("--src="):
            src = a.split("=", 1)[1]
    os.makedirs(out_dir, exist_ok=True)

    hot_cust = pc.min(
        pq.read_table(f"{src}/customer.parquet", columns=["c_custkey"])
        .column("c_custkey")
    ).as_py()
    hot_part = pc.min(
        pq.read_table(f"{src}/part.parquet", columns=["p_partkey"])
        .column("p_partkey")
    ).as_py()
    print(f"hot customer key: {hot_cust}; hot part key: {hot_part}")

    def remap(table: str, sel_key: str, col: str, hot_val) -> None:
        tbl = pq.read_table(f"{src}/{table}.parquet")
        even = pc.equal(pc.bit_wise_and(tbl.column(sel_key), 1), 0)
        field = tbl.schema.field(col)
        newcol = pc.if_else(
            even, pa.scalar(hot_val, type=field.type), tbl.column(col)
        )
        tbl = tbl.set_column(tbl.schema.get_field_index(col), field, newcol)
        pq.write_table(tbl, f"{out_dir}/{table}.parquet")
        n_hot = pc.sum(pc.cast(even, "int64")).as_py()
        print(f"{table}: {n_hot:,}/{tbl.num_rows:,} rows -> {col}={hot_val}")

    remap("orders", "o_orderkey", "o_custkey", hot_cust)
    remap("lineitem", "l_orderkey", "l_partkey", hot_part)

    for f in os.listdir(src):
        if f in ("orders.parquet", "lineitem.parquet"):
            continue
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            os.link(os.path.join(src, f), dst)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
