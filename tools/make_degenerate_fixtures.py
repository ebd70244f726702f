"""Generate degenerate testdata variants for robustness sweeps.

The property-test program (Spark op vs pure-Python reference over
hypothesis corpora) catches per-op edge cases; this tool attacks the
complementary whole-registry class: run EVERY registered query against
a corpus the fixtures never produce, with the DuckDB oracle as the
semantics arbiter, by generating variant table sets that
``tools/driver_sim.py`` can consume via ``SIM_SF=<dir>``.

Variants:
  empty  — every table schema-identical to sf0.001 but ZERO rows.
           Exercises empty-aggregate semantics (SUM over nothing,
           row_number over empty windows, seeding logic that does
           .first()/.head() and assumes a row exists).
  nulltext — sf0.001 rows, but documents.text/lang and part.p_name
           are NULL on every 3rd row (deterministic by position).
           Exercises NULL propagation through regexp/split/shingle
           pipelines under ANSI where the fixtures are all non-NULL.

Usage:  python tools/make_degenerate_fixtures.py /tmp/degenerate
        SIM_SF=/tmp/degenerate/empty python tools/driver_sim.py
"""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: (table, column) pairs blanked in the nulltext variant. Text-bearing
#: columns only — join/grouping keys stay intact so the sweep probes
#: NULL *propagation*, not NULL-key semantics (engine NULL-ordering in
#: windows is a separate, deliberate non-goal here).
NULL_COLS = {
    ("documents", "text"),
    ("documents", "lang"),
    ("part", "p_name"),
}


#: (table, column) pairs blanked in the nullkeys variant (every 5th
#: row): join keys, grouping keys, and window partition/order keys of
#: the relational surface. The divergence classes this hunts are NOT
#: NULL propagation (nulltext covers that) but engine DEFAULTS around
#: NULL ordering — Spark orders ASC NULLS FIRST, DuckDB NULLS LAST —
#: plus all-NULL groups under min/max/ntile and NULL routing keys.
NULLKEY_COLS = {
    ("customer", "c_nationkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_returnflag"),
    ("part", "p_brand"),
    ("events", "user_id"),
    ("events", "event_type"),
}


def _nan_values(tbl: pa.Table) -> pa.Table:
    """events.value → NaN on every 7th row (nanvalues variant)."""
    i = tbl.schema.get_field_index("value")
    mask = pa.array([r % 7 == 0 for r in range(tbl.num_rows)])
    nan = pa.array([float("nan")] * tbl.num_rows, type=tbl.column(i).type)
    blanked = pc.if_else(mask, nan, tbl.column(i))
    return tbl.set_column(i, tbl.schema.field(i), blanked)


def _nan_embedding_component(tbl: pa.Table) -> pa.Table:
    """embeddings.embedding[0] → NaN on every 7th row."""
    import numpy as np

    i = tbl.schema.get_field_index("embedding")
    col = tbl.column(i).to_pylist()
    for r in range(0, len(col), 7):
        if col[r]:
            col[r] = [float("nan")] + [np.float32(x) for x in col[r][1:]]
    arr = pa.array(col, type=tbl.column(i).type)
    return tbl.set_column(i, tbl.schema.field(i), arr)


def _extreme_events(tbl: pa.Table) -> pa.Table:
    """extremes variant: every 11th ts moved to 1901 / every 17th to
    2099 (epoch-boundary and far-future timestamp arithmetic), every
    13th value negated (sign assumptions in measures)."""
    import datetime as dt

    ts_i = tbl.schema.get_field_index("ts")
    v_i = tbl.schema.get_field_index("value")
    ts = tbl.column(ts_i).to_pylist()
    vals = tbl.column(v_i).to_pylist()
    for r in range(len(ts)):
        if r % 11 == 0 and ts[r] is not None:
            ts[r] = dt.datetime(1901, 3, 7, 4, 5, 6)
        elif r % 17 == 0 and ts[r] is not None:
            ts[r] = dt.datetime(2099, 11, 23, 21, 22, 23)
        if r % 13 == 0 and vals[r] is not None:
            vals[r] = -vals[r]
    tbl = tbl.set_column(ts_i, tbl.schema.field(ts_i), pa.array(ts, type=tbl.column(ts_i).type))
    return tbl.set_column(v_i, tbl.schema.field(v_i), pa.array(vals, type=tbl.column(v_i).type))


def _null_every_nth(tbl: pa.Table, col: str, n: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    mask = pa.array([r % n == 0 for r in range(tbl.num_rows)])
    blanked = pc.if_else(mask, pa.nulls(tbl.num_rows, tbl.column(i).type), tbl.column(i))
    return tbl.set_column(i, tbl.schema.field(i), blanked)


def main(out_root: str) -> None:
    for variant in ("empty", "nulltext", "nullkeys", "nanvalues", "extremes"):
        d = os.path.join(out_root, variant)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            tbl = pq.read_table(f"{SRC}/{t}.parquet")
            if variant == "empty":
                tbl = tbl.slice(0, 0)
            elif variant == "nulltext":
                for tt, col in NULL_COLS:
                    if tt == t:
                        tbl = _null_every_nth(tbl, col, 3)
            elif variant == "nullkeys":
                for tt, col in NULLKEY_COLS:
                    if tt == t:
                        tbl = _null_every_nth(tbl, col, 5)
            elif variant == "nanvalues":  # IEEE NaN in measure/embedding
                if t == "events":
                    tbl = _nan_values(tbl)
                elif t == "embeddings":
                    tbl = _nan_embedding_component(tbl)
            else:  # extremes: 1901/2099 timestamps + negated measures
                if t == "events":
                    tbl = _extreme_events(tbl)
            pq.write_table(tbl, f"{d}/{t}.parquet")
        print(f"{variant}: {d} ({len(TABLES)} tables)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate")
