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
import shutil
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


#: Deterministic unicode palette for the `unicode` variant — each entry
#: exercises a distinct normalization/token boundary: NFKC compat folds
#: (ligatures, full-width, enclosed numerics, unit squares), combining
#: marks (NFC-vs-NFD and Zalgo stacks), ZWJ emoji + surrogate pairs,
#: exotic whitespace (NBSP, ideographic space), and RTL scripts.
_UNI_PALETTE = [
    "ﬁle ﬂow oﬀice",
    "Ｈｅｌｌｏ　ｗｏｒｌｄ",
    "café résumé naïve",
    "fam 👨‍👩‍👧‍👦 lab 🧪 snow ☃ rocket 🚀",
    "nbsp joined narrow space",
    "العربية mixed עברית rtl",
    "①②③ ㎞ ㎡ ½ ¾",
    "zalgo źàl̂g̃ō end",
]


def _unicode_text(tbl: pa.Table) -> pa.Table:
    """documents.text → prepend a unicode palette entry on every 4th
    row (deterministic by position); n_chars recomputed so the derived
    column stays honest (stale-metadata probing is a separate
    variant's job, not this one's)."""
    t_i = tbl.schema.get_field_index("text")
    n_i = tbl.schema.get_field_index("n_chars")
    texts = tbl.column(t_i).to_pylist()
    for r in range(0, len(texts), 4):
        if texts[r] is not None:
            texts[r] = f"{_UNI_PALETTE[(r // 4) % len(_UNI_PALETTE)]} {texts[r]}"
    n_chars = [len(t) if t is not None else None for t in texts]
    tbl = tbl.set_column(t_i, tbl.schema.field(t_i), pa.array(texts, type=pa.string()))
    return tbl.set_column(n_i, tbl.schema.field(n_i), pa.array(n_chars, type=tbl.column(n_i).type))


def _dup_rows(tbl: pa.Table, n: int = 10) -> pa.Table:
    """`dupkeys` variant: append an EXACT copy of every nth row at the
    END of the table. Deliberate semantics decision (VERDICT r8 #5):
    the duplicated thing is the FULL ROW, not just the id — two rows
    sharing an id but differing in payload have NO total order either
    engine could deterministically agree on (any tiebreak on (ts, id)
    or (id) is exhausted), so that shape is out of scope BY DESIGN; the
    engine's documented contract is that ids order-tiebreak uniquely.
    Exact duplicate rows, by contrast, are the real-world batch-layer
    redelivery artifact: they probe every op that ASSUMES id uniqueness
    — counts vs distinct counts, 2×2 join fan-out, first()/any_value,
    rank ties, dedup collapse — where both engines must agree exactly.
    Appending at the end also breaks any sorted-by-id file assumption."""
    idx = list(range(0, tbl.num_rows, n))
    return pa.concat_tables([tbl, tbl.take(pa.array(idx, pa.int64()))])


def _null_every_nth(tbl: pa.Table, col: str, n: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    mask = pa.array([r % n == 0 for r in range(tbl.num_rows)])
    blanked = pc.if_else(mask, pa.nulls(tbl.num_rows, tbl.column(i).type), tbl.column(i))
    return tbl.set_column(i, tbl.schema.field(i), blanked)


#: tables whose rows the dupkeys variant duplicates: the fact/corpus
#: tables plus the two dims the business joins hit (fan-out probing)
_DUP_TABLES = {"events", "orders", "lineitem", "documents", "embeddings",
               "customer", "part"}

#: control/escape characters for the `controls` variant — each entry a
#: distinct serialization boundary: JSON escapes (quote, backslash,
#: newline, tab), CSV-hostile bytes (comma, CR, quote), C0 controls
#: (NUL excluded: parquet strings carry it but pandas/Arrow round-trips
#: disagree — probing NUL is a different variant's job), DEL, and an
#: ANSI escape sequence.
_CTRL_PALETTE = [
    'quote " and \\\\ backslash',
    "newline\nsplit line",
    "tab\tseparated\tfields",
    "comma, semi; pipe| csv traps",
    "cr\rcarriage",
    "bell\x07 esc\x1b[31m ansi",
    "del\x7fchar",
    "quote'single and `backtick`",
]


def _control_text(tbl: pa.Table) -> pa.Table:
    """documents.text → prepend a control-char palette entry on every
    4th row; n_chars recomputed (same policy as the unicode variant)."""
    t_i = tbl.schema.get_field_index("text")
    n_i = tbl.schema.get_field_index("n_chars")
    texts = tbl.column(t_i).to_pylist()
    for r in range(0, len(texts), 4):
        if texts[r] is not None:
            texts[r] = f"{_CTRL_PALETTE[(r // 4) % len(_CTRL_PALETTE)]} {texts[r]}"
    n_chars = [len(t) if t is not None else None for t in texts]
    tbl = tbl.set_column(t_i, tbl.schema.field(t_i), pa.array(texts, type=pa.string()))
    return tbl.set_column(n_i, tbl.schema.field(n_i), pa.array(n_chars, type=tbl.column(n_i).type))


def _huge_text(tbl: pa.Table) -> pa.Table:
    """documents.text → every 100th doc amplified ~60× (≈30 KB of
    REPEATED content — a hot row for every per-doc pipeline: shingles,
    n-grams, regex counts, packing; repetition keeps the distinct-
    shingle set small, so pair ops see a normal-sized signature from an
    abnormal-sized document). n_chars recomputed."""
    t_i = tbl.schema.get_field_index("text")
    n_i = tbl.schema.get_field_index("n_chars")
    texts = tbl.column(t_i).to_pylist()
    for r in range(0, len(texts), 100):
        if texts[r]:
            texts[r] = " ".join([texts[r]] * 60)
    n_chars = [len(t) if t is not None else None for t in texts]
    tbl = tbl.set_column(t_i, tbl.schema.field(t_i), pa.array(texts, type=pa.string()))
    return tbl.set_column(n_i, tbl.schema.field(n_i), pa.array(n_chars, type=tbl.column(n_i).type))


def _hot_key(tbl: pa.Table, col: str, n: int = 2) -> pa.Table:
    """`hotkey` variant: overwrite ``col`` on every nth row with the
    value of the FIRST non-null row, so one key holds ~1/n of the
    table. The 100×-scale hazard no other variant probes (VERDICT r9
    #5): a single dominant key — one country/user/lang with half the
    rows, exactly the reference repo's own single-country generator
    trap — stresses AQE skew-join splitting, groupBy partial-agg
    effectiveness, window/sessionization state on one partition, and
    join fan-out through a hot dimension key. Semantics stay fully
    defined (the oracle recomputes on the same skewed rows); what the
    sweep hunts is engine behavior that silently ASSUMED balance —
    tie-breaks that unique keys used to hide, per-group state that
    only ever saw small groups, plans that die or crawl on a hot
    partition."""
    i = tbl.schema.get_field_index(col)
    vals = tbl.column(i).to_pylist()
    hot = next((v for v in vals if v is not None), None)
    if hot is None:
        return tbl
    for r in range(0, len(vals), n):
        if vals[r] is not None:
            vals[r] = hot
    return tbl.set_column(
        i, tbl.schema.field(i), pa.array(vals, type=tbl.column(i).type)
    )


#: (table, column) pairs skewed in the hotkey variant: the stream/
#: session key, the single-country dimension trap, the orders→customer
#: join fan-out key, and the corpus grouping key.
HOTKEY_COLS = {
    ("events", "user_id"),
    ("customer", "c_nationkey"),
    ("orders", "o_custkey"),
    ("documents", "lang"),
}


def _dst_events(tbl: pa.Table) -> pa.Table:
    """`dst` variant: every 19th ts moved INTO America/New_York's
    spring-forward hole (2024-03-10 02:30 — a wall-clock instant that
    does not exist in that zone) and every 23rd into the fall-back
    overlap (2024-11-03 01:30 — an instant that exists twice). The
    fixtures store NAIVE micros and the engine reads TIMESTAMP_NTZ, so
    these are perfectly ordinary values UNLESS some code path round-
    trips through a zoned timestamp — exactly the class this probe
    hunts, swept under TZ=America/New_York where any such round-trip
    shifts/collapses the hour and diverges from the DuckDB twin (also
    naive). Second-level offsets keep each planted row unique-ish so
    window tie-breaks stay exercised rather than degenerate."""
    import datetime as dt

    ts_i = tbl.schema.get_field_index("ts")
    ts = tbl.column(ts_i).to_pylist()
    for r in range(len(ts)):
        if ts[r] is None:
            continue
        if r % 19 == 0:
            ts[r] = dt.datetime(2024, 3, 10, 2, 30, r % 60)
        elif r % 23 == 0:
            ts[r] = dt.datetime(2024, 11, 3, 1, 30, r % 60)
    return tbl.set_column(
        ts_i, tbl.schema.field(ts_i), pa.array(ts, type=tbl.column(ts_i).type)
    )


#: blanktext palette — cycled over every 6th documents row. Empty and
#: whitespace-only strings are NOT NULL (nulltext covers NULL): they
#: flow through normalize/split/shingle/regex pipelines as values, and
#: the repo's "shingle array is provably non-empty" guarantee plus
#: every `split()`-based tokenizer must hold on them. The single-token
#: and trailing/leading-space entries probe the n<k gram boundary and
#: trim-vs-split disagreements between engines.
_BLANK_PALETTE = ["", "   \t\n  ", "x", "  word  ", "\n\n\n"]


def _blank_text(tbl: pa.Table, col: str, every: int = 6) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    vals = tbl.column(i).to_pylist()
    for r in range(0, len(vals), every):
        if vals[r] is not None:
            vals[r] = _BLANK_PALETTE[(r // every) % len(_BLANK_PALETTE)]
    out = tbl.set_column(i, tbl.schema.field(i), pa.array(vals, type=pa.string()))
    if col == "text" and "n_chars" in tbl.schema.names:
        n_i = tbl.schema.get_field_index("n_chars")
        n_chars = [len(t) if t is not None else None for t in vals]
        out = out.set_column(
            n_i, out.schema.field(n_i), pa.array(n_chars, type=tbl.column(n_i).type)
        )
    return out


def _neg_zero(tbl: pa.Table, col: str, every: int = 11) -> pa.Table:
    """`negzero` variant: IEEE -0.0 planted in a measure column. -0.0
    compares equal to 0.0 but `repr` distinguishes them — the gate's
    float canonicalization would expose any engine that normalizes the
    sign where the other preserves it (Spark normalizes -0.0 in
    groupBy/join KEYS; as a VALUE it must survive min/max/first and
    arithmetic identically in both engines — note -0.0 + 0.0 = +0.0
    but SUM over an all-negative-zero group is sign-sensitive)."""
    i = tbl.schema.get_field_index(col)
    vals = tbl.column(i).to_pylist()
    for r in range(0, len(vals), every):
        if vals[r] is not None:
            vals[r] = -0.0
    return tbl.set_column(
        i, tbl.schema.field(i), pa.array(vals, type=tbl.column(i).type)
    )


def _neg_zero_embedding(tbl: pa.Table, every: int = 11) -> pa.Table:
    """embeddings.embedding[0] → -0.0 on every nth row (dot products
    and norms must treat it as 0; cosine against it must not flip
    sign in either engine)."""
    i = tbl.schema.get_field_index("embedding")
    col = tbl.column(i).to_pylist()
    for r in range(0, len(col), every):
        if col[r]:
            col[r] = [-0.0] + col[r][1:]
    return tbl.set_column(
        i, tbl.schema.field(i), pa.array(col, type=tbl.column(i).type)
    )


def _nul_text(tbl: pa.Table, every: int = 8) -> pa.Table:
    """`nulbyte` variant: documents.text gets an embedded NUL (plus a
    NUL-adjacent palette: leading NUL, NUL-only-separator) on every nth
    row. The `controls` variant deliberately excluded NUL ("a different
    variant's job") — this is that variant. NUL is a VALID character in
    parquet/Arrow/DuckDB/Spark strings; what this hunts is any code
    path that treats strings as C strings (truncation at NUL), plus
    regex/split/length/md5 agreement on it. Text formats are OUT of
    scope by contract: landing_format.py documents that NUL-bearing
    payloads belong in typed formats (univocity's parser truncates at
    NUL), so documents.text (parquet-carried) is the only column
    planted. n_chars recomputed."""
    t_i = tbl.schema.get_field_index("text")
    n_i = tbl.schema.get_field_index("n_chars")
    palette = ["mid\x00dle ", "\x00leading ", "a\x00b\x00c "]
    texts = tbl.column(t_i).to_pylist()
    for r in range(0, len(texts), every):
        if texts[r] is not None:
            texts[r] = palette[(r // every) % len(palette)] + texts[r]
    n_chars = [len(t) if t is not None else None for t in texts]
    tbl = tbl.set_column(
        t_i, tbl.schema.field(t_i), pa.array(texts, type=pa.string())
    )
    return tbl.set_column(
        n_i, tbl.schema.field(n_i), pa.array(n_chars, type=tbl.column(n_i).type)
    )


def _write_manyfiles(tbl: pa.Table, table_dir: str, n_parts: int = 16) -> None:
    """`manyfiles` variant: the table becomes a DIRECTORY of ``n_parts``
    tiny part files plus one 0-ROW part — the small-files layout every
    100 TB lake degenerates into. Rows are dealt round-robin
    (``r % n_parts``), so no part is a sorted prefix of the table:
    any code that assumed "one input file = one sorted split" (``.first()``
    seeding, as-of ordering, window frames, file-landing streams) now
    sees interleaved splits, and every aggregate faces a different
    float-combine order than the single-file layout. The 0-row part
    probes empty-split handling in both engines (Spark scan tasks and
    the DuckDB glob must both tolerate a schema-only file)."""
    # Clear any previous layout first (ADVICE r10): a single-file
    # {t}.parquet from an earlier run raises FileExistsError on
    # makedirs, and stale part files from a larger prior n_parts would
    # silently remain in the dataset.
    if os.path.isdir(table_dir):
        shutil.rmtree(table_dir)
    elif os.path.exists(table_dir):
        os.remove(table_dir)
    os.makedirs(table_dir)
    for k in range(n_parts):
        idx = [r for r in range(tbl.num_rows) if r % n_parts == k]
        pq.write_table(
            tbl.take(pa.array(idx, pa.int64())),
            os.path.join(table_dir, f"part-{k:05d}.parquet"),
        )
    pq.write_table(tbl.slice(0, 0), os.path.join(table_dir, "part-empty.parquet"))


def _unique_key(tbl: pa.Table, col: str, prefix: str | None = None,
                offset: int = 10_000_000) -> pa.Table:
    """`unikeys` variant: EVERY row gets a DISTINCT value in ``col`` —
    the opposite pole from hotkey, and the one group-count shape no
    prior variant probes (VERDICT r10 #5): millions of distinct keys
    at scale (unique user per event, unique lang per doc), which
    stresses partial-aggregation hash tables (no map-side combine
    wins), sessionizer/first-seen state-store ROW counts (one state
    row per key — the opposite end from the per-key cap), category
    collects that assumed metadata cardinality, and window/pivot
    rollups that assumed grouping collapses the data. String keys get
    ``{prefix}{row}``, integer keys ``offset + row`` (disjoint from
    every real id so accidental collisions with planted fixtures are
    impossible). NULLs stay NULL — null-key semantics are nullkeys'
    job."""
    i = tbl.schema.get_field_index(col)
    typ = tbl.column(i).type
    vals = tbl.column(i).to_pylist()
    for r in range(len(vals)):
        if vals[r] is None:
            continue
        vals[r] = f"{prefix}{r}" if prefix is not None else offset + r
    return tbl.set_column(i, tbl.schema.field(i), pa.array(vals, type=typ))


#: (table, column, string-prefix-or-None) tuples made all-distinct in
#: the unikeys variant: the stream/session/state key, the event
#: category, the corpus grouping key, and two relational grouping keys
#: (priority drift's month×priority rollup, q1's returnflag groups).
#: FK JOIN keys are deliberately excluded — breaking referential
#: integrity just empties joins, and the `empty` variant owns that.
UNIKEY_COLS = (
    ("events", "user_id", None),
    ("events", "event_type", "et"),
    ("documents", "lang", "lg"),
    ("orders", "o_orderpriority", "pr"),
    ("lineitem", "l_returnflag", "rf"),
)


VARIANTS = (
    "empty", "nulltext", "nullkeys", "nanvalues", "extremes",
    "dupkeys", "unicode", "controls", "hugedoc", "hotkey",
    "nulldup", "dst", "manyfiles", "blanktext", "negzero", "nulbyte",
    "unikeys", "hotmany",
)


def main(out_root: str) -> None:
    for variant in VARIANTS:
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
            elif variant == "extremes":  # 1901/2099 ts + negated measures
                if t == "events":
                    tbl = _extreme_events(tbl)
            elif variant == "dupkeys":  # exact-duplicate rows appended
                if t in _DUP_TABLES:
                    tbl = _dup_rows(tbl)
            elif variant == "unicode":  # NFKC/emoji/RTL text prepends
                if t == "documents":
                    tbl = _unicode_text(tbl)
            elif variant == "controls":  # JSON/CSV-hostile chars
                if t == "documents":
                    tbl = _control_text(tbl)
            elif variant == "hotkey":  # one dominant key per surface
                for tt, col in HOTKEY_COLS:
                    if tt == t:
                        tbl = _hot_key(tbl, col)
            elif variant == "nulldup":  # COMPOSED: nulltext × dupkeys.
                # Boundaries interacting (VERDICT r9 #8): NULL-text
                # rows that are ALSO exact storage duplicates — the
                # null-propagation rule and the duplicate-collapse rule
                # must compose identically in both engines (a NULL-text
                # duplicate must collapse to ONE null-text row, not
                # leak through either rule's blind spot). NULL first,
                # then duplicate, so the appended copies carry NULLs.
                for tt, col in NULL_COLS:
                    if tt == t:
                        tbl = _null_every_nth(tbl, col, 3)
                if t in _DUP_TABLES:
                    tbl = _dup_rows(tbl)
            elif variant == "dst":  # DST-transition wall-clock instants
                if t == "events":
                    tbl = _dst_events(tbl)
            elif variant == "hugedoc":  # amplified hot documents
                if t == "documents":
                    tbl = _huge_text(tbl)
            elif variant == "manyfiles":  # small-files layout (rows untouched)
                _write_manyfiles(tbl, f"{d}/{t}.parquet")
                continue
            elif variant == "unikeys":  # every key distinct (group explosion)
                for tt, col, prefix in UNIKEY_COLS:
                    if tt == t:
                        tbl = _unique_key(tbl, col, prefix)
            elif variant == "hotmany":  # COMPOSED: hotkey × manyfiles.
                # Skew over a fragmented lake (VERDICT r10 #8): the
                # dominant key's rows are SPREAD across every tiny part
                # file (round-robin dealing), so per-split partial aggs
                # each meet the hot key, streams list many small files
                # whose rows all hit one state partition, and
                # float-combine order differs from both parents — the
                # two parent variants passed 180/180 separately; this
                # probes their interaction.
                for tt, col in HOTKEY_COLS:
                    if tt == t:
                        tbl = _hot_key(tbl, col)
                _write_manyfiles(tbl, f"{d}/{t}.parquet")
                continue
            elif variant == "blanktext":  # empty/whitespace-only strings
                if t == "documents":
                    tbl = _blank_text(tbl, "text")
                    tbl = _blank_text(tbl, "lang", every=9)
                elif t == "part":
                    tbl = _blank_text(tbl, "p_name", every=7)
                elif t == "events":
                    tbl = _blank_text(tbl, "event_type", every=9)
            elif variant == "nulbyte":  # embedded NUL in parquet text
                if t == "documents":
                    tbl = _nul_text(tbl)
            elif variant == "negzero":  # IEEE -0.0 measures/components
                if t == "events":
                    tbl = _neg_zero(tbl, "value")
                elif t == "lineitem":
                    tbl = _neg_zero(tbl, "l_discount")
                elif t == "embeddings":
                    tbl = _neg_zero_embedding(tbl)
            pq.write_table(tbl, f"{d}/{t}.parquet")
        print(f"{variant}: {d} ({len(TABLES)} tables)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate")
