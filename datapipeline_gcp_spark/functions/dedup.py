"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The standard corpus-dedup ladder for training-data pipelines:

- **exact**: group on a normalized-content fingerprint, keep the lowest
  id — one shuffle on the fingerprint.
- **MinHash+LSH**: 3-word shingles → k-permutation MinHash signature →
  banded LSH buckets → candidate pairs via a bucket self-join. The
  classic near-dup design (Broder; used by most large corpus pipelines):
  no O(n²) comparison — cost is one explode (bands) + one shuffle on
  (band, key), so it scales linearly with corpus size at fixed bucket
  occupancy.
- **SimHash**: 60-bit sign-of-sum signature; candidates share at least
  one of four 15-bit blocks (any pair within Hamming distance 3 must —
  pigeonhole); verify by popcount(xor). 15-bit blocks keep buckets
  small on clustered corpora (8-bit blocks collapsed ~4k similar docs
  into one bucket → tens of millions of candidate pairs).
- **n-gram Jaccard**: exact Jaccard over distinct shingle sets inside
  cheap blocks (here (lang, source)) — the verify step for candidates,
  or standalone blocked dedup.

Everything is built-in column/array expressions (md5-derived integer
hashing, higher-order array functions) — no Python UDFs, so signatures
compute at scan speed and are identical across engines; every operator
is oracle-checked against DuckDB running the same algorithm.

The ``documents`` fixture has no duplicates, so the registered queries
run over a deterministic fixture-adaptation: documents ∪ exact copies
(every 7th doc) ∪ near copies with a 4-token suffix (every 10th doc).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import qround, sql_qround
from datapipeline_gcp_spark.schemas import load_testdata

P = 1_000_000_007  # hash field modulus (fits 64-bit intermediate math)
NUM_HASHES = 32
BANDS, ROWS = 8, 4  # 8 bands × 4 rows = 32 signature positions
SIMHASH_BITS = 60  # full md5-60 bits; 4 x 15-bit blocks


# ---------------------------------------------------------------------------
# Column builders (Spark side)
# ---------------------------------------------------------------------------


def normalized(text: Column) -> Column:
    """Whitespace-collapsed lower-cased text, with NULL ≡ the empty
    document. The ``coalesce`` is the r8 NULL-text boundary fix
    (VERIFY_DEGENERATE.md): without it ``split(normalized(NULL))`` is a
    NULL *array*, ``explode_outer`` leaks a NULL token, and
    ``element_at(map, NULL)`` throws under ANSI — while the DuckDB
    oracles' ``unnest(NULL)`` yields nothing. Defining NULL ≡ '' at
    this single boundary (and in :data:`_D_NORM`, the oracle-side twin)
    makes both engines agree on every downstream token/shingle op."""
    return F.lower(F.regexp_replace(F.trim(F.coalesce(text, F.lit(""))), r"\s+", " "))


def grams_of(tokens: Column, n: int = 3) -> Column:
    """Positional (non-distinct) word n-grams from a materialized token
    array — the multiset :func:`shingles_of` deduplicates.

    Documents shorter than ``n`` tokens yield ONE shorter gram:
    ``try_element_at`` (not ``element_at``) for the tail positions,
    because under ANSI mode (Spark 4 default — and the external
    driver's vanilla session) a plain out-of-bounds ``element_at``
    THROWS instead of returning the NULL that ``concat_ws`` skips.
    The shipped testdata has no sub-``n``-token documents, so every
    sweep passed while real short documents would have killed the job
    — caught by the hypothesis property test
    (``tests/test_properties.py::test_containment_matches_python_reference``
    shrinking to single-token docs)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            *[F.try_element_at(tokens, (i + j).cast("int")) for j in range(n)],
        ),
    )


def shingles_of(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams (joined with spaces) from an ALREADY
    MATERIALIZED token-array column. Documents shorter than n tokens
    yield one shorter shingle (concat_ws skips the missing positions —
    mirrored behavior in the oracle).

    ``tokens`` must be a plain column reference, not an inline
    ``split(...)`` expression: Catalyst substitutes a non-trivial
    expression into every ``element_at`` inside the lambda, so the
    regex-split would re-run ~n×tokens times per row (measured 5-6×
    slowdown end-to-end at sf0.1). Project the split once, then call
    this on the projected column — :func:`with_shingles` does exactly
    that."""
    return F.array_distinct(grams_of(tokens, n))


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "sh"
) -> DataFrame:
    """df + a distinct-shingle array column, with the token split
    materialized in its own projection (see :func:`shingles_of`)."""
    return df.withColumn(
        "_toks", F.split(normalized(F.col(text_col)), " ")
    ).withColumn(out_col, shingles_of(F.col("_toks"), n)).drop("_toks")


def shingles(text: Column, n: int = 3) -> Column:
    """Inline-expression form of :func:`shingles_of` — correct but
    re-evaluates the split per element; prefer :func:`with_shingles`
    anywhere the text is document-sized."""
    return shingles_of(F.split(normalized(text), " "), n)


def base_hash(c: Column) -> Column:
    """String → integer in [0, P): first 60 bits of md5, reduced mod P.
    md5 is identical everywhere, which is what makes signatures
    engine-independent (Spark's hash()/xxhash64 have no DuckDB twin)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % P


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = NUM_HASHES,
) -> DataFrame:
    """(id, minhash): k-permutation MinHash —
    h_i(s) = ((2i+1)·bh(s) + 7919i + 1) mod P, signature[i] = min over
    shingles. (2i+1)·bh < 2^36 — no overflow.

    Shaped for whole-stage codegen: explode the per-shingle hashes to
    rows, then ONE hash aggregation with k ``min`` expressions (the i
    constants are Python literals, so every permutation is compiled).
    The higher-order-array formulation (transform × array_min inside a
    lambda) computes identical values but runs interpreted per element —
    measured ~10× slower at sf0.1. Map-side partial mins keep the
    shuffle tiny (one row per (doc, partition))."""
    # explode_outer, NOT explode: the shingle array is provably
    # non-empty (greatest(...,1) yields ≥1 gram even for short/empty
    # text), so the two are row-identical — but plain explode carries an
    # implicit `size(arr) > 0` filter that Catalyst pushes BELOW the
    # repartition exchange, re-evaluating the whole inline shingle
    # expression on the unspread input (measured 17.8 s → 0.7 s for the
    # train side of contamination at sf0.1). Null text would produce a
    # null row here — filter nulls upstream if the corpus has them.
    exploded = with_shingles(df, text_col).select(
        F.col(id_col),
        F.explode_outer(F.transform(F.col("sh"), base_hash)).alias("h"),
    )
    mins = [
        F.min((F.col("h") * (2 * i + 1) + (7919 * i + 1)) % P).alias(f"m{i}")
        for i in range(k)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*mins)
        .select(F.col(id_col), F.array(*[F.col(f"m{i}") for i in range(k)]).alias("minhash"))
    )


def within_block_pairs(
    df: DataFrame,
    block_cols: list[str],
    item_cols: list[str],
    max_block_size: int | None = None,
) -> DataFrame:
    """All unordered pairs of rows sharing a block: groupBy the block
    key, collect the (sorted) member structs, expand i<j combinations
    in-array. Output columns ``a``/``b`` are the member structs.

    This is the scale-shape for candidate generation: ONE shuffle keyed
    by block, each expensive per-row column (signature, norm, shingle
    set) computed exactly once — a self-join would re-evaluate the whole
    upstream plan per side. Quadratic cost stays block-local by
    construction; ``max_block_size`` filters out degenerate blocks (a
    hot bucket at 100 TB). Capping is opt-in and NOT silent by default:
    when a cap is set, callers should log ``dropped_block_count`` (the
    companion helper below) alongside the run — nothing in this function
    hides the drop, it simply excludes over-cap blocks from the output.

    Pair expansion is a two-step explode (posexplode the members, then
    explode a ``slice`` of the tail) — both steps are built-in generator
    expressions that stay in whole-stage codegen. Building the full
    quadratic combination array with nested ``transform`` lambdas
    produces identical pairs but runs interpreted per element and
    materializes O(n²) structs in a single array value — measured ~2×
    slower on hot blocks.
    """
    # item_cols[0] must be the unique id → deterministic member order
    grouped = df.groupBy(*block_cols).agg(
        F.array_sort(F.collect_list(F.struct(*item_cols))).alias("members")
    )
    grouped = grouped.withColumn("block_n", F.size("members"))
    if max_block_size is not None:
        grouped = grouped.filter(F.col("block_n") <= max_block_size)
    grouped = grouped.filter(F.col("block_n") >= 2)
    first = grouped.select(F.posexplode("members").alias("i", "a"), "members")
    return first.select(
        "a",
        F.explode(
            F.slice(F.col("members"), F.col("i") + 2, F.size("members"))
        ).alias("b"),
    )


# (r14 negative result: a keys-only twin — collect/expand only the id,
# re-attach vd/vnorm payloads by two joins, distinct the id pairs before
# attaching — was implemented and interleave-A/B'd on
# embedding_cosine_neardup's shape at sf0.1 AND at a 16× sign-flip-
# isometric embeddings fixture where payload bytes dominate: SLOWER at
# both scales (0.60× / 0.69×, 0/6 pairs; outputs identical). The
# payload-carrying expansion stays inside one whole-stage-codegen span
# with zero extra exchanges, while keys-only pays two shuffle joins of
# the payload table per consumer. The §8 "shuffle keys, attach once"
# pattern needs payloads orders of magnitude heavier than 64 doubles
# to invert the trade — revisit only with profile evidence.)


def dropped_block_count(
    df: DataFrame, block_cols: list[str], max_block_size: int
) -> int:
    """How many blocks ``within_block_pairs`` would drop at this cap —
    the no-silent-caps companion (log it when using a cap)."""
    return (
        df.groupBy(*block_cols)
        .count()
        .filter(F.col("count") > max_block_size)
        .count()
    )


def capped_block_pairs(
    df: DataFrame,
    block_cols: list[str],
    item_cols: list[str],
    max_block_size: int,
) -> tuple[DataFrame, int]:
    """``within_block_pairs`` with a cap that reports what it drops:
    returns ``(pairs, n_dropped_blocks)`` and WARN-logs when the cap
    bit (no-silent-caps policy, VERDICT r2 #8). The count is one
    metadata-scale aggregate over the block keys — cheap next to the
    pair expansion it guards — and callers get the number back so they
    can record it in run manifests, not just logs."""
    dropped = dropped_block_count(df, block_cols, max_block_size)
    if dropped:
        logging.getLogger(__name__).warning(
            "capped_block_pairs: dropping %d block(s) larger than %d rows "
            "(keys=%s) — raise max_block_size or pre-split hot keys if "
            "these blocks matter",
            dropped,
            max_block_size,
            block_cols,
        )
    return (
        within_block_pairs(df, block_cols, item_cols, max_block_size),
        dropped,
    )


def banded_signatures(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = BANDS, rows: int = ROWS
) -> DataFrame:
    """Explode MinHash signatures into one row per band:
    (id, minhash, band_idx, band_key). This IS the LSH index relation —
    at production scale the existing corpus's banded table is persisted
    (partitioned by ``band_idx``, bucketed by ``band_key``) and each new
    batch joins against it instead of re-banding the corpus."""
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.array_join(F.slice(F.col("minhash"), b * rows + 1, rows), ","),
    )
    return sigs.select(
        F.col(id_col), F.col("minhash"), F.posexplode(band_arr).alias("band_idx", "band_key")
    )


def _sig_match_frac(a: str, b: str) -> Column:
    return F.size(
        F.filter(F.zip_with(F.col(a), F.col(b), lambda x, y: x == y), lambda v: v)
    ) / F.lit(float(NUM_HASHES))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = BANDS, rows: int = ROWS
) -> DataFrame:
    """Banded LSH: documents sharing any band of their signature become a
    candidate pair. Returns (doc_a, doc_b, sig_match_frac) with
    doc_a < doc_b; sig_match_frac estimates Jaccard (fraction of equal
    signature positions). Signatures are computed once (block-collect
    pair expansion, not a self-join); the cross-band DISTINCT runs on
    the compact (ids, frac) projection, not on signature arrays."""
    exploded = banded_signatures(sigs, id_col, bands, rows)
    pairs = within_block_pairs(
        exploded, ["band_idx", "band_key"], [id_col, "minhash"]
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            _sig_match_frac("a.minhash", "b.minhash").alias("sig_match_frac"),
        )
        .distinct()
    )


def incremental_neardup_pairs(
    existing: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = BANDS,
    rows: int = ROWS,
) -> DataFrame:
    """Index-vs-batch near-dup detection: match a NEW batch of documents
    against an EXISTING corpus without ever pairing the corpus against
    itself. Returns (new_doc, corpus_doc, sig_match_frac) — one row per
    candidate pair sharing at least one LSH band.

    This is the daily-ingest shape at 100 TB: the existing side's banded
    signature table (:func:`banded_signatures`) is the persistable LSH
    index — built once, appended as batches commit — and each incoming
    batch only pays (a) its own signatures and (b) one equi-join keyed
    on (band_idx, band_key) against the index. Corpus-side work is
    O(corpus) once, not O(corpus) per batch, and the batch side is
    small enough that AQE turns the probe into a broadcast join. The
    cross-band DISTINCT runs on the compact (ids, frac) projection."""
    e = banded_signatures(
        minhash_signatures(existing, id_col, text_col), id_col, bands, rows
    ).select(
        F.col(id_col).alias("corpus_doc"),
        F.col("minhash").alias("sig_e"),
        "band_idx",
        "band_key",
    )
    n = banded_signatures(
        minhash_signatures(new, id_col, text_col), id_col, bands, rows
    ).select(
        F.col(id_col).alias("new_doc"),
        F.col("minhash").alias("sig_n"),
        "band_idx",
        "band_key",
    )
    return (
        n.join(e, ["band_idx", "band_key"])
        .select(
            "new_doc",
            "corpus_doc",
            _sig_match_frac("sig_n", "sig_e").alias("sig_match_frac"),
        )
        .distinct()
    )


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct normalized content — the kept
    (minimum) id and the duplicate count. Single hash aggregation."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("fp_exact"))
        .groupBy("fp_exact")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(id_col).alias("n_copies"),
        )
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, simhash): sign-of-sums SimHash over distinct tokens — bit j
    is set when the sum over tokens of ±1 (by bit j of the token hash)
    is positive. Token hashes use the raw 60 md5 bits (no mod-P
    reduction — a reduced hash would zero the high bits).

    Aggregation is SWAR-packed for codegen: the 60 per-bit token
    counters ride in 15 longs × 4 lanes (16-bit lane stride), so the
    hash aggregate is 15 branch-free SUMs + one COUNT instead of 60
    conditional sums — same values (bit j set ⇔ Σ±1 > 0 ⇔
    2·cnt_j > n_tokens), ~15× less aggregation-buffer traffic. Lane
    counters hold 16 bits: documents with > 65535 distinct tokens
    (far beyond any real document) would overflow a lane — enforce an
    upstream token cap before raising that bound."""
    # explode_outer: token array provably non-empty — avoids the
    # pushed-down size() filter re-evaluating the expression below the
    # exchange (see minhash_signatures)
    exploded = df.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(
                F.array_distinct(F.split(normalized(F.col(text_col)), " ")),
                lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            )
        ).alias("h"),
    )
    lanes = (bits + 14) // 15  # 4 lanes for the standard 60-bit signature
    packs = [
        F.sum(
            sum(
                F.shiftleft(
                    F.shiftright(F.col("h"), 15 * m + k).bitwiseAND(F.lit(1)),
                    16 * m,
                )
                for m in range(lanes)
            )
        ).alias(f"s{k}")
        for k in range(15)
    ]
    agged = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"), *packs)
    bit_terms = []
    for j in range(bits):
        m, k = divmod(j, 15)
        cnt = F.shiftrightunsigned(F.col(f"s{k}"), 16 * m).bitwiseAND(F.lit(0xFFFF))
        bit_terms.append(F.shiftleft((2 * cnt > F.col("n_tok")).cast("long"), j))
    total = bit_terms[0]
    for bt in bit_terms[1:]:
        total = total + bt
    return agged.select(F.col(id_col), total.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Candidates share one of four 15-bit blocks (pigeonhole guarantees
    every pair within Hamming distance 3 shares a block); verified by
    popcount(xor) ≤ max_hamming."""
    # shiftright, not division: `/` on longs goes through DOUBLE, which
    # is lossy beyond 2^53 — silently wrong block values for 60-bit
    # signatures (the oracle's integer `//` caught this)
    blocks = F.array(
        *[F.shiftright(F.col("simhash"), b * 15) % 32768 for b in range(4)]
    )
    exploded = df.select(
        F.col(id_col), F.col("simhash"), F.posexplode(blocks).alias("block_idx", "block_val")
    )
    pairs = within_block_pairs(exploded, ["block_idx", "block_val"], [id_col, "simhash"])
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("bigint")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact Jaccard over distinct 3-gram shingle sets, restricted to
    cheap blocks — blocked-quadratic, never corpus-quadratic."""
    # intersect integer hash sets, not string arrays — same Jaccard
    # (md5-60 collisions are negligible), much cheaper comparisons
    with_sh = with_shingles(df, text_col, out_col="_sh").select(
        *(F.col(c) for c in block_cols),
        F.col(id_col),
        F.array_distinct(F.transform(F.col("_sh"), base_hash)).alias("sh"),
    )
    pairs = within_block_pairs(with_sh, block_cols, [id_col, "sh"])
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union.cast("double")
    return pairs.select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# Fixture adaptation: documents ∪ exact copies ∪ near copies
# ---------------------------------------------------------------------------

_NEAR_SUFFIX = "near duplicate suffix tokens"


#: (applicationId, sf_dir) pairs whose planting-floor check already ran
#: (same session-cache pattern as clusters.assert_below_id_floor).
_PLANT_FLOOR_CHECKED: set[tuple[str, str]] = set()


def _assert_fixture_ids_below_plant_floor(
    spark: SparkSession, sf_dir: str, docs: DataFrame
) -> None:
    """The fixture's +500k/+1M plantings assume base doc_id < 500_000
    (true of all driver testdata, max 49_999 at sf0.1). A larger corpus
    must fail LOUDLY here: a base id at or above the exact-plant offset
    COLLIDES with a planted id, and the id-keyed signature aggregation
    then silently merges two different documents into one signature —
    exactly the divergence the r10 8×-remap scale probe produced
    (engine merged the colliding pair per id; the oracle's row-level
    CTE did not).

    The check is an eager max+collect during query construction — one
    blocking driver action per (appId, sf_dir), acceptable at fixture
    scale (ADVICE r10). If fixture corpora ever grow, fold it into the
    planted-id generation lazily (plant at ``max_id + offset`` instead
    of asserting a constant floor)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PLANT_FLOOR_CHECKED:
        return
    max_id = docs.agg(F.max("doc_id").alias("m")).collect()[0][0] or 0
    if max_id >= 500_000:
        raise AssertionError(
            f"documents doc_id max {max_id} reaches the +500k exact-"
            "plant offset — planted ids would collide with real ids "
            "and id-keyed signatures would merge distinct documents; "
            "raise the planting offsets for this corpus"
        )
    _PLANT_FLOOR_CHECKED.add(key)


def neardup_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    _assert_fixture_ids_below_plant_floor(spark, sf_dir, docs)
    exact = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
    )
    near = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("text", F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" " + _NEAR_SUFFIX)))
    )
    # Signature computation is expression-heavy per row; a small corpus
    # parquet arrives as ONE input split, which would serialize all that
    # work on a single core. Spread rows across the cluster first — at
    # real scale the source is already many splits and this is ~free.
    return (
        docs.unionAll(exact)
        .unionAll(near)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


_FIXTURE_SQL = f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 500000, text, lang, source, n_chars
FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 1000000, concat(text, ' {_NEAR_SUFFIX}'), lang, source, n_chars
FROM documents WHERE doc_id % 10 = 0
"""

# ---------------------------------------------------------------------------
# DuckDB oracles — the same algorithms in DuckDB's dialect
# ---------------------------------------------------------------------------

# NULL ≡ '' — the oracle-side twin of ``normalized()``'s coalesce
# (r8 NULL-text boundary; VERIFY_DEGENERATE.md)
_D_NORM = "lower(regexp_replace(trim(coalesce(text, '')), '\\s+', ' ', 'g'))"
_D_BH = "(CAST(concat('0x', substr(md5({s}),1,15)) AS BIGINT) % 1000000007)"

def d_shingles_sql(n: int, distinct: bool = True) -> str:
    """DuckDB expression for word ``n``-grams of ``text`` — the oracle
    twin of :func:`shingles` / :func:`grams_of` (same short-document
    rule: fewer than ``n`` tokens yields one shorter shingle).
    ``distinct=False`` keeps positional multiplicity (repetition
    analysis needs the multiset)."""
    terms = ", ".join(f"string_split({_D_NORM}, ' ')[i+{j}]" for j in range(n))
    body = f"""list_transform(
  generate_series(1, greatest(len(string_split({_D_NORM}, ' ')) - {n - 1}, 1)),
  i -> concat_ws(' ', {terms})
)"""
    return f"list_distinct({body})" if distinct else body


_D_SHINGLES = d_shingles_sql(3)

_D_MINHASH = f"""
list_transform(generate_series(0, {NUM_HASHES - 1}),
  i -> list_min(list_transform(sh,
        s -> ((2*i+1) * {_D_BH.format(s='s')} + (7919*i+1)) % 1000000007)))
"""

_EXACT_ORACLE = f"""
WITH fixture AS ({_FIXTURE_SQL})
SELECT md5({_D_NORM}) AS fp_exact,
       MIN(doc_id) AS keep_doc_id,
       COUNT(doc_id) AS n_copies
FROM fixture
GROUP BY 1
"""

_IMPACT_ORACLE = f"""
WITH fixture AS ({_FIXTURE_SQL}),
flagged AS (
  SELECT lang, source,
         CASE WHEN ROW_NUMBER() OVER (
           PARTITION BY md5({_D_NORM}) ORDER BY doc_id) = 1
         THEN 1 ELSE 0 END AS kept
  FROM fixture
),
agg AS (
  SELECT lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(kept) AS BIGINT) AS n_kept
  FROM flagged GROUP BY lang, source
)
SELECT lang, source, n_docs, n_kept,
       n_docs - n_kept AS n_dropped,
       CAST(n_docs - n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE) AS drop_frac
FROM agg
"""

# CTE list (no WITH keyword) so downstream oracles — e.g. the
# connected-components clustering in clusters.py, which needs a
# WITH RECURSIVE prefix — can compose the same pair pipeline verbatim.
MINHASH_PAIR_CTES = f"""
fixture AS ({_FIXTURE_SQL}),
sh AS (SELECT doc_id, {_D_SHINGLES} AS sh FROM fixture),
sigs AS (SELECT doc_id, {_D_MINHASH} AS minhash FROM sh),
exploded AS (
  SELECT doc_id, minhash, u.band AS band_idx,
         array_to_string(minhash[u.band*{ROWS}+1 : u.band*{ROWS}+{ROWS}], ',')
           AS band_key
  FROM sigs, (SELECT unnest(generate_series(0, {BANDS - 1})) AS band) u
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.minhash AS sig_a, b.minhash AS sig_b
  FROM exploded a JOIN exploded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
scored AS (
  SELECT doc_a, doc_b,
    list_sum(list_transform(generate_series(1, {NUM_HASHES}),
      i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) / {float(NUM_HASHES)}
      AS sig_match_frac
  FROM pairs
)"""

_MINHASH_ORACLE = f"""
WITH {MINHASH_PAIR_CTES}
SELECT doc_a, doc_b, sig_match_frac FROM scored
"""

_D_SIMHASH = f"""
list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}), j ->
  CASE WHEN list_sum(list_transform(hashes, h ->
         CASE WHEN (h & CAST(power(2, j) AS BIGINT)) > 0 THEN 1 ELSE -1 END)) > 0
       THEN CAST(power(2, j) AS BIGINT) ELSE 0 END))
"""  # power(2, j) is a power of two — exact in double up to 2^59

_SIMHASH_ORACLE = f"""
WITH fixture AS ({_FIXTURE_SQL}),
tok AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split({_D_NORM}, ' ')),
                        t -> CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT))
           AS hashes
  FROM fixture
),
sigs AS (SELECT doc_id, CAST({_D_SIMHASH} AS BIGINT) AS simhash FROM tok),
exploded AS (
  SELECT doc_id, simhash, u.b AS block_idx,
         (simhash // CAST(power(2, u.b*15) AS BIGINT)) % 32768 AS block_val
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b) u
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM exploded a JOIN exploded b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
"""

_JACCARD_ORACLE = f"""
WITH fixture AS (SELECT DISTINCT * FROM ({_FIXTURE_SQL})),
sh AS (SELECT lang, source, doc_id,
       list_distinct(list_transform({_D_SHINGLES},
                     s -> {_D_BH.format(s='s')})) AS sh
FROM fixture)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    AS jaccard
FROM sh a JOIN sh b
  -- IS NOT DISTINCT FROM: the engine blocks via groupBy, where a NULL
  -- lang is a block VALUE (all unknown-language docs block together);
  -- a plain `=` join silently drops the NULL block (r8 nulltext sweep)
  ON a.lang IS NOT DISTINCT FROM b.lang
  AND a.source IS NOT DISTINCT FROM b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    >= 0.2
"""

# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(neardup_fixture(spark, sf_dir))


def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) survivorship rollup for corpus-global exact
    dedup — the governance report a data team reads BEFORE deleting
    anything: which slices lose how much. Duplicates are attributed to
    the slice of the LOSING document (keep-first by doc_id on the
    normalized-content fingerprint), so a mirror site shows up in its
    own source's drop count, not the original's.

    Shape: fingerprint projection → ONE window over the fingerprint
    (keep-first needs the corpus-global rule, not per-slice) → one
    (lang, source) rollup. Same two-shuffle cost as exact dedup itself;
    the report is group-cardinality. Returns (lang, source, n_docs,
    n_kept, n_dropped, drop_frac)."""
    df = neardup_fixture(spark, sf_dir)
    fp = df.select(
        "lang",
        "source",
        "doc_id",
        F.md5(normalized(F.col("text"))).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = fp.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("long")
    )
    agg = flagged.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept").alias("n_kept"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
        (
            (F.col("n_docs") - F.col("n_kept")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("drop_frac"),
    )


def dedup_crosslingual_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language duplicate leakage: identical normalized content
    filed under DIFFERENT language labels — the curation smell that
    breaks per-language dedup, per-language mixing weights, AND
    train/eval splits stratified by lang (the same text can land on
    both sides). Fixture plants it deterministically: every 9th
    document re-enters with a rotated lang label.

    One fingerprint aggregation: per content group, the distinct
    ordered label set, its size, and the keep-first id; only leaking
    groups (≥2 labels) are reported. Same single-shuffle cost as exact
    dedup."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    rotated = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        "text",
        F.concat(F.lit("x-"), F.col("lang")).alias("lang"),
        "source",
        "n_chars",
    )
    allv = docs.unionAll(rotated)
    groups = (
        allv.select(
            "doc_id", "lang", F.md5(normalized(F.col("text"))).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.array_sort(F.collect_set("lang")).alias("_langs"),
        )
    )
    return (
        groups.withColumn("n_langs", F.size("_langs").cast("bigint"))
        .filter(F.col("n_langs") >= 2)
        .select(
            "fp",
            "n_docs",
            "n_langs",
            F.array_join(F.col("_langs"), ",").alias("langs"),
            "keep_doc_id",
        )
    )


_CROSSLINGUAL_ORACLE = f"""
WITH allv AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text, 'x-' || lang
  FROM documents WHERE doc_id % 9 = 0
),
groups AS (
  SELECT md5({_D_NORM}) AS fp,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(doc_id) AS keep_doc_id,
         list_sort(list_distinct(list(lang))) AS langs_l
  FROM allv GROUP BY 1
)
SELECT fp, n_docs,
       CAST(len(langs_l) AS BIGINT) AS n_langs,
       array_to_string(langs_l, ',') AS langs,
       keep_doc_id
FROM groups WHERE len(langs_l) >= 2
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(neardup_fixture(spark, sf_dir))
    return lsh_candidate_pairs(sigs)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(simhash_signatures(neardup_fixture(spark, sf_dir)))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pairs are over LOGICAL documents: exact duplicate storage rows
    # (r9 dupkeys) would otherwise create a positional self-pair
    # (jaccard 1.0 with doc_a == doc_b) plus double-counted cross-pairs
    # in within_block_pairs' i<j expansion; oracle twin dedups the
    # fixture identically. (dedup_exact is the op whose JOB is counting
    # those duplicate rows — it stays undeduped by design.)
    return ngram_jaccard_pairs(
        neardup_fixture(spark, sf_dir).distinct(), block_cols=["lang", "source"]
    )


def verified_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """The production two-stage dedup: MinHash-LSH generates candidate
    pairs (corpus-linear), then exact Jaccard over shingle hash sets
    verifies ONLY those candidates — never all pairs, never all blocks.
    Returns (doc_a, doc_b, sig_match_frac, jaccard) for verified pairs.

    Scale shape: candidates ≪ corpus², and the verify step is two
    shuffle joins of the candidate list against the per-doc shingle-set
    table (each join keyed on a doc id — AQE turns them into broadcast
    joins whenever the candidate list is small, which it is by
    construction at healthy thresholds)."""
    cand = lsh_candidate_pairs(minhash_signatures(df, id_col, text_col))
    # (r13 audit: checkpointing this two-consumer shingle table A/B'd a
    # tie — Spark already reuses the exchange across the a/b sides —
    # so it stays a lazy plan.)
    shs = with_shingles(df, text_col, out_col="_sh").select(
        F.col(id_col),
        F.array_distinct(F.transform(F.col("_sh"), base_hash)).alias("shs"),
    )
    a = shs.select(F.col(id_col).alias("doc_a"), F.col("shs").alias("sh_a"))
    b = shs.select(F.col(id_col).alias("doc_b"), F.col("shs").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "sig_match_frac",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return verified_neardup_pairs(neardup_fixture(spark, sf_dir))


def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: bucket every LSH candidate pair
    by its signature match fraction (the cheap estimate) and roll up
    the EXACT Jaccard inside each bucket — the curve that tells you
    what signature threshold to set for a target true-similarity
    floor, and whether NUM_HASHES is large enough (wide buckets with
    flat exact means ⇒ too few hashes). This is how the two-stage
    dedup's knobs get tuned from the pipeline's own output instead of
    folklore.

    Shape: `verified_neardup_pairs` at threshold 0 (all candidates,
    still candidate-bounded — never all pairs), then one 10-row
    aggregation. Jaccard values are qround'd to 9 dp and summed through
    exact decimals so the per-bucket means are order- and
    partitioning-independent."""
    pairs = verified_neardup_pairs(neardup_fixture(spark, sf_dir), threshold=0.0)
    b = F.least(
        F.floor(F.col("sig_match_frac") * 10).cast("int"), F.lit(9)
    )
    jq = qround(F.col("jaccard"), 9).cast("decimal(18,9)")
    sq = qround(F.col("sig_match_frac"), 9).cast("decimal(18,9)")
    agg = (
        pairs.withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.sum(sq).cast("double") / F.count("*")).alias("avg_sig"),
            (F.sum(jq).cast("double") / F.count("*")).alias("avg_jaccard"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
    return agg.select(
        "bin", "n_pairs", "avg_sig", "avg_jaccard", "min_jaccard", "max_jaccard"
    )


_FRESH_PREFIX = "fresh document "
_FRESH_SUFFIX = " entirely novel content alpha beta gamma"


def incremental_fixture(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(existing corpus, new batch) for the incremental-dedup query:
    the new batch plants near copies (``%5``, suffixed), exact copies
    (``%13``), and genuinely fresh documents (``%11=3``, novel text that
    shares no shingles with the corpus) — so the query must both find
    the planted matches and NOT match the fresh docs."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    par = spark.sparkContext.defaultParallelism
    existing = docs.repartition(par, "doc_id")
    near = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" " + _NEAR_SUFFIX)))
    )
    exact = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + 3_000_000
    )
    fresh = docs.filter(F.col("doc_id") % 11 == 3).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        F.concat(
            F.lit(_FRESH_PREFIX),
            F.col("doc_id").cast("string"),
            F.lit(_FRESH_SUFFIX),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    new = near.unionAll(exact).unionAll(fresh).repartition(par, "doc_id")
    return existing, new


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing, new = incremental_fixture(spark, sf_dir)
    return incremental_neardup_pairs(existing, new)


def build_lsh_index(
    corpus: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus's banded MinHash signatures as a catalog
    table bucketed on ``band_key`` — the persistent LSH index for
    :func:`probe_lsh_index`. Built once per corpus (append new batches
    with ``mode="append"`` after they clear dedup), it amortizes the
    corpus-side signature + banding work across every future batch:
    daily ingest pays O(batch), never O(corpus). Bucketing by band_key
    pre-clusters the probe join's key so a large probe side co-partitions
    cheaply; a small one broadcasts regardless."""
    from datapipeline_gcp_spark import sinks

    banded = banded_signatures(minhash_signatures(corpus, id_col, text_col), id_col)
    sinks.write_bucketed(
        banded, table, ["band_key"], n_buckets, mode=mode
    )


def probe_lsh_index(
    spark: SparkSession,
    table: str,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match a new batch against a persisted LSH index (the table
    written by :func:`build_lsh_index`): returns (new_doc, corpus_doc,
    sig_match_frac) — identical semantics to
    :func:`incremental_neardup_pairs`, with the corpus side read from
    the index table instead of recomputed."""
    e = spark.table(table).select(
        F.col(id_col).alias("corpus_doc"),
        F.col("minhash").alias("sig_e"),
        "band_idx",
        "band_key",
    )
    n = banded_signatures(minhash_signatures(new, id_col, text_col), id_col).select(
        F.col(id_col).alias("new_doc"),
        F.col("minhash").alias("sig_n"),
        "band_idx",
        "band_key",
    )
    return (
        n.join(e, ["band_idx", "band_key"])
        .select(
            "new_doc",
            "corpus_doc",
            _sig_match_frac("sig_n", "sig_e").alias("sig_match_frac"),
        )
        .distinct()
    )


SUBSTR_WINDOW = 8


def substring_dup_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SUBSTR_WINDOW,
) -> DataFrame:
    """Cross-document exact-substring duplication scoring: hash every
    ``window``-token sliding window, call a window *duplicated* when its
    hash occurs in ≥2 distinct documents, and score each document by
    the fraction of its windows that are duplicated. Returns
    (doc_id, n_windows, n_dup_windows, dup_frac).

    This is the exact-substring companion to shingle-Jaccard near-dup:
    Jaccard finds mostly-similar document PAIRS; this finds documents
    carrying verbatim repeated passages (boilerplate, licenses, mirrored
    paragraphs) even when the documents as a whole are unrelated — the
    signal used to surgically remove repeated spans from LLM training
    corpora rather than drop whole documents.

    Scale shape: windows explode to one row per (doc, position) — the
    corpus's token count, the same cardinality every tokenizing op here
    handles. ONE pass over the exploded windows (tokenize + md5 run
    once — the r2 shape recomputed them 3×, once per consumer of the
    exploded plan), then three key-local steps with no big-big join:
    partial-aggregated count per (window-hash, doc), a window count
    over the hash partition for the distinct-doc cardinality, and a
    per-doc roll-up where a window counts as duplicated iff its hash
    occurs in ≥2 docs. Window hashing is md5-based integer math
    (engine-identical); short documents (< window tokens) yield one
    shorter window, mirroring the shingle rule. Null hashes (empty
    token arrays via explode_outer) count toward ``n_windows`` but are
    never "duplicated", matching the r2 inner-join-on-hash semantics."""
    toks = df.withColumn("_toks", F.split(normalized(F.col(text_col)), " "))
    exploded = toks.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(grams_of(F.col("_toks"), window), base_hash)
        ).alias("wh"),
    )
    # (wh, doc) multiplicity — rows after this are ≤ one per distinct
    # (window-hash, doc), with map-side partial aggregation upstream
    per_pair = exploded.groupBy("wh", id_col).agg(F.count("*").alias("c"))
    # distinct-doc count per hash == row count of the (wh, *) partition
    nd = F.count("*").over(Window.partitionBy("wh"))
    scored = per_pair.withColumn("nd", nd)
    agg = scored.groupBy(id_col).agg(
        F.sum("c").alias("n_windows"),
        F.sum(
            F.when(
                F.col("wh").isNotNull() & (F.col("nd") >= 2), F.col("c")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("n_dup_windows"),
    )
    return agg.select(
        F.col(id_col),
        "n_windows",
        "n_dup_windows",
        (
            F.col("n_dup_windows").cast("double")
            / F.col("n_windows").cast("double")
        ).alias("dup_frac"),
    )


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return substring_dup_scores(neardup_fixture(spark, sf_dir))


_VERIFIED_ORACLE = f"""
WITH {MINHASH_PAIR_CTES},
shs AS (
  SELECT doc_id,
         list_distinct(list_transform({_D_SHINGLES},
                       s -> {_D_BH.format(s='s')})) AS shs
  FROM fixture
)
SELECT scored.doc_a, scored.doc_b, scored.sig_match_frac,
  CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
    / CAST(len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)) AS DOUBLE)
    AS jaccard
FROM scored
JOIN shs a ON scored.doc_a = a.doc_id
JOIN shs b ON scored.doc_b = b.doc_id
WHERE CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
    / CAST(len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)) AS DOUBLE)
    >= 0.5
"""

_CALIB_ORACLE = f"""
WITH {MINHASH_PAIR_CTES},
shs AS (
  SELECT doc_id,
         list_distinct(list_transform({_D_SHINGLES},
                       s -> {_D_BH.format(s='s')})) AS shs
  FROM fixture
),
pj AS (
  SELECT scored.sig_match_frac,
    CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
      / CAST(len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))
             AS DOUBLE) AS jaccard
  FROM scored
  JOIN shs a ON scored.doc_a = a.doc_id
  JOIN shs b ON scored.doc_b = b.doc_id
),
binned AS (
  SELECT LEAST(CAST(floor(sig_match_frac * 10) AS INT), 9) AS bin,
         sig_match_frac, jaccard
  FROM pj
)
SELECT bin,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(CAST({sql_qround("sig_match_frac", 9)} AS DECIMAL(18,9)))
       AS DOUBLE) / COUNT(*) AS avg_sig,
  CAST(SUM(CAST({sql_qround("jaccard", 9)} AS DECIMAL(18,9)))
       AS DOUBLE) / COUNT(*) AS avg_jaccard,
  MIN(jaccard) AS min_jaccard,
  MAX(jaccard) AS max_jaccard
FROM binned GROUP BY bin
"""

_INCREMENTAL_ORACLE = f"""
WITH existing AS (SELECT doc_id, text FROM documents),
newb AS (
  SELECT doc_id + 2000000 AS doc_id, concat(text, ' {_NEAR_SUFFIX}') AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT doc_id + 4000000,
         concat('{_FRESH_PREFIX}', CAST(doc_id AS VARCHAR), '{_FRESH_SUFFIX}')
  FROM documents WHERE doc_id % 11 = 3
),
she AS (SELECT doc_id, {_D_SHINGLES} AS sh FROM existing),
sige AS (SELECT doc_id, {_D_MINHASH} AS minhash FROM she),
shn AS (SELECT doc_id, {_D_SHINGLES} AS sh FROM newb),
sign AS (SELECT doc_id, {_D_MINHASH} AS minhash FROM shn),
xe AS (
  SELECT doc_id, minhash, u.band AS band_idx,
         array_to_string(minhash[u.band*{ROWS}+1 : u.band*{ROWS}+{ROWS}], ',')
           AS band_key
  FROM sige, (SELECT unnest(generate_series(0, {BANDS - 1})) AS band) u
),
xn AS (
  SELECT doc_id, minhash, u.band AS band_idx,
         array_to_string(minhash[u.band*{ROWS}+1 : u.band*{ROWS}+{ROWS}], ',')
           AS band_key
  FROM sign, (SELECT unnest(generate_series(0, {BANDS - 1})) AS band) u
)
SELECT DISTINCT n.doc_id AS new_doc, e.doc_id AS corpus_doc,
  list_sum(list_transform(generate_series(1, {NUM_HASHES}),
    i -> CASE WHEN n.minhash[i] = e.minhash[i] THEN 1 ELSE 0 END))
    / {float(NUM_HASHES)} AS sig_match_frac
FROM xn n JOIN xe e
  ON n.band_idx = e.band_idx AND n.band_key = e.band_key
"""

_SUBSTR_ORACLE = f"""
WITH fixture AS ({_FIXTURE_SQL}),
w AS (
  SELECT doc_id,
         list_transform({d_shingles_sql(SUBSTR_WINDOW, distinct=False)},
                        s -> {_D_BH.format(s='s')}) AS ws
  FROM fixture
),
x AS (SELECT doc_id, unnest(ws) AS wh FROM w),
dup AS (SELECT wh FROM x GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows FROM x GROUP BY doc_id),
dd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
  FROM x JOIN dup USING (wh) GROUP BY doc_id
)
SELECT t.doc_id, t.n_windows,
       COALESCE(d.n_dup_windows, 0) AS n_dup_windows,
       CAST(COALESCE(d.n_dup_windows, 0) AS DOUBLE)
         / CAST(t.n_windows AS DOUBLE) AS dup_frac
FROM tot t LEFT JOIN dd d ON t.doc_id = d.doc_id
"""

# ---------------------------------------------------------------------------
# Passage-level exact dedup (RefinedWeb-style, keep-first + reassembly)
# ---------------------------------------------------------------------------

#: fixed passage width in tokens — the fixture corpus has no newlines,
#: so fixed token windows stand in for paragraph boundaries; production
#: corpora would chunk on '\n\n' with the same downstream plan.
PASSAGE_W = 16
#: exactly PASSAGE_W tokens, so a planted PREFIX aligns with chunk 0
_PLANT_PASSAGE = (
    "cookie notice this site uses tracking pixels accept to continue "
    "reading the full article text here"
)
assert len(_PLANT_PASSAGE.split()) == PASSAGE_W


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = PASSAGE_W,
) -> DataFrame:
    """Corpus-level exact passage dedup with keep-FIRST semantics and
    document reassembly — the RefinedWeb recipe: chunk every document
    into passages, drop any passage whose exact content already
    appeared earlier in the corpus (earlier = smaller (doc_id,
    chunk_idx)), and rebuild each document from its surviving passages.
    Differs from boilerplate removal (frequency threshold, keeps no
    copy) — here exactly ONE copy of every passage survives.

    Returns (doc_id, n_chunks, n_kept, clean_text, dup_frac).

    Scale shape: explode to one row per passage (token-count
    cardinality), ONE shuffle keyed on the passage md5 for the
    keep-first window (row_number with a unique (doc_id, chunk_idx)
    tie-break — deterministic under any partitioning), then one doc-keyed
    aggregate to reassemble. ``collect_list`` there is per-document
    bounded (a document's own passages), never corpus-scale."""
    # NULL ≡ '' (r8 text boundary): a NULL document is one empty chunk
    # in both engines, not zero rows here vs NULL-array explosion there
    tokens = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_chunks = F.ceil(F.size(tokens) / F.lit(float(width))).cast("int")
    chunks = df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        tokens.alias("t"),
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("t"), F.col("chunk_idx") * width + 1, F.lit(width)), " "
        ).alias("passage"),
    )
    w = Window.partitionBy("h").orderBy(id_col, "chunk_idx")
    ranked = (
        chunks.withColumn("h", F.md5("passage"))
        .withColumn("kept", F.row_number().over(w) == 1)
    )
    agg = ranked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct("chunk_idx", "passage")
                            )
                        )
                    ),
                    lambda s: s["passage"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
    )
    return agg.select(
        id_col,
        "n_chunks",
        "n_kept",
        "clean_text",
        (
            (F.col("n_chunks") - F.col("n_kept")).cast("double")
            / F.col("n_chunks").cast("double")
        ).alias("dup_frac"),
    )


def dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture plants a shared 16-token PREFIX on every 4th document
    (prefix, not suffix, so the planted passage aligns with chunk 0 in
    every planted doc); keep-first must retain it once (lowest doc_id)
    and strip it everywhere else."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            # coalesce: Spark's concat NULL-poisons where DuckDB's skips
            # NULL args, so the planted prefix must land on '' not NULL
            F.concat(F.lit(_PLANT_PASSAGE + " "), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    return passage_dedup(planted)


_PASSAGE_ORACLE = f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN concat('{_PLANT_PASSAGE} ', coalesce(text, ''))
              ELSE coalesce(text, '') END AS text
  FROM documents
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(list_slice(t, i*{PASSAGE_W}+1, i*{PASSAGE_W}+{PASSAGE_W}), ' ')
           AS passage
  FROM toks,
       UNNEST(range(0, CAST(ceil(len(t) / {float(PASSAGE_W)}) AS BIGINT))) AS u(i)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(passage)
                               ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END, ' '
                             ORDER BY chunk_idx), '') AS clean_text
  FROM ranked GROUP BY doc_id
)
SELECT doc_id, n_chunks, n_kept, clean_text,
       CAST(n_chunks - n_kept AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS dup_frac
FROM agg
"""


# ---------------------------------------------------------------------------
# Containment (asymmetric-Jaccard) dedup: excerpt/quote/concatenation
# detection
# ---------------------------------------------------------------------------

#: shingle blocks larger than this are dropped from CANDIDATE generation
#: (hot boilerplate phrases — the within_block_pairs hot-block guard);
#: containment SCORING still counts every shared shingle of a candidate
CONTAIN_BLOCK_CAP = 8
CONTAIN_THRESHOLD = 0.9


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = CONTAIN_BLOCK_CAP,
    threshold: float = CONTAIN_THRESHOLD,
) -> DataFrame:
    """Directional containment — ``|sh(A) ∩ sh(B)| / |sh(A)|`` over
    DISCRIMINATIVE shingles (those occurring in ≤ ``cap`` documents).
    Symmetric Jaccard misses the excerpt case entirely (a half-length
    excerpt of a long document has J ≈ 0.5 but containment 1.0), yet
    excerpts/quotes/concatenations are exactly what leaks eval text
    into training corpora; this is the containment-search companion to
    the MinHash family.

    Blocking is the SHARED-SHINGLE relation itself rather than MinHash
    bands: banded MinHash is tuned for symmetric Jaccard and misses
    low-J containment pairs with high probability, while an excerpt
    shares *every* one of its shingles with its source. Restricting
    both the numerator AND the denominator to discriminative shingles
    does two jobs at once: boilerplate phrases (shared by > ``cap``
    docs) cannot inflate containment, and pair expansion stays
    block-local with ≤ cap·(cap−1)/2 id-only rows per block — the
    ``within_block_pairs`` hot-block discipline, here load-bearing for
    the semantics, not just the cost. A planted excerpt still scores
    exactly 1.0: a shingle hot enough to be excluded is excluded from
    both sides of its ratio.

    ONE corpus-token-scale shuffle (group occurrences by shingle),
    checkpointed because two consumers read it: per-doc discriminative
    counts, and the pair expansion whose groupBy-count IS the exact
    intersection size (one row per shared discriminative shingle — no
    re-join recount). Shingles ride as ``base_hash`` longs (in-array
    distinct before the explode — no extra shuffle), so the block
    shuffle moves 8 bytes per occurrence instead of the phrase text;
    a mod-P hash collision merges two shingles IDENTICALLY in both
    engines (the oracle hashes the same way), so determinism is
    unaffected. Containments are single integer divisions:
    engine-exact. Returns (doc_a, doc_b, n_common, n_a, n_b, cont_a,
    cont_b) for pairs where either direction clears ``threshold``."""
    occ = with_shingles(docs, text_col).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.transform(F.col("sh"), base_hash))
        ).alias("s"),
    )
    grouped = (
        occ.groupBy("s")
        .agg(F.array_sort(F.collect_list(id_col)).alias("members"))
        .withColumn("m", F.size("members"))
        .filter(F.col("m") <= cap)
        .localCheckpoint()
    )
    counts = (
        grouped.select(F.explode("members").alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_sh"))
    )
    # two-step explode pair expansion (the within_block_pairs shape —
    # both steps are built-in generators, whole-stage codegen); members
    # are sorted, so doc_a < doc_b by construction
    first = grouped.filter(F.col("m") >= 2).select(
        F.posexplode("members").alias("i", "doc_a"), "members"
    )
    pair_rows = first.select(
        "doc_a",
        F.explode(
            F.slice(F.col("members"), F.col("i") + 2, F.size("members"))
        ).alias("doc_b"),
    )
    common = pair_rows.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("n_common")
    )
    cont_a = F.col("n_common").cast("double") / F.col("n_a")
    cont_b = F.col("n_common").cast("double") / F.col("n_b")
    return (
        common.join(
            counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            cont_a.alias("cont_a"),
            cont_b.alias("cont_b"),
        )
        .filter(F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold)
    )


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment over documents ∪ planted excerpts: every ``%9 == 1``
    document contributes a half-length prefix excerpt at +1,000,000
    whose shingles are a strict subset of its source's (containment
    1.0 in the excerpt→source direction) — the planted ground truth the
    threshold must recover; naturally-overlapping documents may also
    clear it, identically in both engines."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    toks = docs.withColumn("_toks", F.split(normalized(F.col("text")), " "))
    k = F.greatest(
        F.floor(F.size("_toks") / F.lit(2)).cast("int"), F.lit(1)
    )
    excerpts = toks.filter(F.col("doc_id") % 9 == 1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(F.col("_toks"), 1, k), " ").alias("text"),
    )
    fixture = docs.select("doc_id", "text").unionAll(excerpts)
    par = spark.sparkContext.defaultParallelism
    return containment_pairs(fixture.repartition(par, "doc_id"))


_CONTAIN_ORACLE = f"""
WITH fixture AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(t[1:GREATEST(CAST(len(t) // 2 AS INT), 1)], ' ')
  FROM (SELECT doc_id, string_split({_D_NORM}, ' ') AS t
        FROM documents WHERE doc_id % 9 = 1)
),
occ AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform({_D_SHINGLES},
                s -> {_D_BH.format(s='s')}))) AS s
  FROM fixture
),
blockn AS (
  SELECT s, COUNT(*) AS m FROM occ GROUP BY s
),
disc AS (
  SELECT o.doc_id, o.s FROM occ o JOIN blockn USING (s)
  WHERE m <= {CONTAIN_BLOCK_CAP}
),
counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM disc GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM disc a JOIN disc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b, c.n_common, ca.n_sh AS n_a, cb.n_sh AS n_b,
       CAST(c.n_common AS DOUBLE) / ca.n_sh AS cont_a,
       CAST(c.n_common AS DOUBLE) / cb.n_sh AS cont_b
FROM common c
JOIN counts ca ON ca.doc_id = c.doc_a
JOIN counts cb ON cb.doc_id = c.doc_b
WHERE GREATEST(CAST(c.n_common AS DOUBLE) / ca.n_sh,
               CAST(c.n_common AS DOUBLE) / cb.n_sh) >= {CONTAIN_THRESHOLD}
"""


QUERIES = {
    "dedup_passages": dedup_passages,
    "dedup_exact": dedup_exact,
    "dedup_containment": dedup_containment,
    "dedup_impact_report": dedup_impact_report,
    "dedup_minhash_calibration": dedup_minhash_calibration,
    "dedup_crosslingual_leakage": dedup_crosslingual_leakage,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_verified": dedup_verified,
    "dedup_incremental": dedup_incremental,
    "dedup_substring": dedup_substring,
}

ORACLES = {
    "dedup_passages": _PASSAGE_ORACLE,
    "dedup_exact": _EXACT_ORACLE,
    "dedup_impact_report": _IMPACT_ORACLE,
    "dedup_minhash_calibration": _CALIB_ORACLE,
    "dedup_crosslingual_leakage": _CROSSLINGUAL_ORACLE,
    "dedup_minhash_lsh": _MINHASH_ORACLE,
    "dedup_simhash": _SIMHASH_ORACLE,
    "dedup_ngram_jaccard": _JACCARD_ORACLE,
    "dedup_verified": _VERIFIED_ORACLE,
    "dedup_incremental": _INCREMENTAL_ORACLE,
    "dedup_substring": _SUBSTR_ORACLE,
    "dedup_containment": _CONTAIN_ORACLE,
}
