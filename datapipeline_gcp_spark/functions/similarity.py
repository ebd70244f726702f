"""Embedding similarity search: brute-force cosine top-k, LSH-bucketed
approximate NN, and embedding-cosine near-duplicate pairs.

Design for scale:

- **Brute force** is the correctness baseline: broadcast the (small)
  query set against the candidate corpus — one pass, no shuffle of the
  big side. O(Q·N) but embarrassingly parallel; right answer, bounded
  by scan speed.
- **LSH buckets** are the scale path: 16 pseudorandom ±1 hyperplanes →
  a 16-bit signature per vector, split into 2 bands of 8 bits
  (OR-of-ANDs, the classic LSH amplification): vectors sharing *any*
  band become candidates. Band occupancy is E[N/256] per band value, so
  candidate generation is linear at fixed occupancy; both the band
  count and width are constants to retune per corpus (and
  ``within_block_pairs``'s ``max_block_size`` caps hot buckets).
  Hyperplane entries come from a mixed multiplicative hash of the
  dimension index — ``xor(m, m >> 13)`` of ``(d+1)·2654435761`` — NOT a
  linear parity like ``(p·a + d·b) % 2``, whose sign patterns collapse
  to two distinct planes (every even/odd plane identical ⇒ 2 effective
  buckets ⇒ quadratic candidate blow-up; caught by plan audit in
  round 1).
- **Integer-quantized determinism**: hyperplane dot products AND the
  norm accumulate over ``floor(v·2^20)`` longs, so bucket assignment
  and norms are bit-exact across engines and partitionings — exact
  integer sums are reorder-safe, which is what lets the heavy per-row
  work run as one exploded whole-stage-codegen hash aggregation
  (posexplode dims → 17 integer SUMs with literal plane constants —
  the ``minhash_signatures`` shape) instead of interpreted per-element
  array lambdas (~16×dims lambda evals per row; the round-1 hot loop).
  Quantization shifts norms by ~1e-6 relative — immaterial for
  similarity ranking and mirrored exactly in the oracle.
- Exact pair cosines accumulate in array order with double math
  (sequential fold in both engines) and are rounded to 9 decimals
  before ranking, with vec_id tie-breaks — fully deterministic top-k.
  Per-pair scoring touches only bounded candidate sets, so the
  interpreted fold there is not a hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import qround, sql_qround
from datapipeline_gcp_spark.functions.dedup import within_block_pairs
from datapipeline_gcp_spark.schemas import load_testdata

N_PLANES = 16
BANDS = 2  # 2 bands × 8 bits: P[miss | cos≈0.999 pair] ≈ 1e-2
BAND_BITS = N_PLANES // BANDS
QUANT = 1 << 20  # integer quantization for bucket/norm determinism
MIX = 2654435761  # Knuth multiplicative constant; (d+1)*MIX fits int64
N_QUERIES = 10  # registered queries use vec_id < N_QUERIES as the query set
TOP_K = 10


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def finite_vectors(
    df: DataFrame, col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Drop rows whose vector has ANY non-finite component (r8
    nanvalues sweep): a NaN/Inf component is corrupt input to every
    similarity op — the shared fixed-point quantization
    ``CAST(floor(x·Q) AS BIGINT)`` cannot cast it in either engine
    (Spark ANSI throws, DuckDB raises a Conversion Error), and no
    distance involving it is meaningful. One designed boundary, the
    vector twin of ``dedup.normalized()``'s NULL-text rule; the oracle
    twin is :data:`_D_FIN`. A pushed-down per-row predicate — no
    shuffle, no extra pass.

    NULL vectors and NULL components are EXPLICITLY part of the rule
    (ADVICE r8): both count as absent and drop the row in BOTH engines
    — previously Spark dropped them via three-valued NULL fallout
    while DuckDB's bool_or skipped NULL elements and kept the row, a
    latent parity break no fixture planted. The ``isNull`` arms keep
    the predicate two-valued, so the filter is deterministic rather
    than an accident of NULL propagation.

    Exact storage duplicates collapse to ONE logical vector (r9
    dupkeys sweep): a redelivered/double-landed corpus row must not
    double-weight centroids, shift IVF training, or occupy two top-k
    slots. The dedup rides ONE hash repartition on ``vec_id`` — the
    same spread-the-rows exchange every consumer needed anyway (the
    per-row signature/norm arithmetic must not serialize on a single
    small-corpus input split), so deduplication is free: the
    partitioning satisfies ``dropDuplicates(["vec_id"])``'s clustering
    and no second exchange appears. Keying the dedup by id (a long)
    instead of a full-row ``distinct()`` keeps the 64-float array out
    of the aggregation keys — measured ~0.5 s/op cheaper at sf0.1 and
    the gap widens with dimension count. Under the documented contract
    (duplicate ids carry identical payloads — enforce upstream with
    `dedup_exact`/the exactly-once ingest otherwise) the survivor is
    unique, so the result is deterministic; a contract violation
    diverges from the oracle twin ``_D_EMB`` (SELECT DISTINCT *) and
    fails the gate rather than passing silently (pinned by
    ``tests/test_finite_vectors_boundary.py`` — the oracle keeps both
    differing rows, the engine keeps one, so the row counts diverge
    deterministically regardless of which survivor is chosen)."""
    if id_col not in df.columns:
        # ADVICE r9: the identity-dedup contract is part of this
        # boundary's signature — fail with the contract named, not an
        # AnalysisException deep inside dropDuplicates
        raise ValueError(
            f"finite_vectors dedups storage duplicates by {id_col!r}, "
            f"which is not a column of the input ({df.columns}); pass "
            "id_col= for frames keyed differently"
        )
    c = F.col(col)
    bad = c.isNull() | F.exists(
        c,
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )
    out = df.filter(~bad)
    return out.repartition(
        out.sparkSession.sparkContext.defaultParallelism, id_col
    ).dropDuplicates([id_col])


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (order-stable across engines).

    r13 optimization audit: an unrolled 64-term codegen chain
    (``((0.0 + a[0]·b[0]) + a[1]·b[1]) + …`` via ``F.get``) was
    prototyped on the hypothesis that the higher-order fold's
    CodegenFallback was the pair-scoring bottleneck — it is bit-equal
    but measured SLOWER (interleaved A/B on dedup_semantic: fold min
    4.28 s, unrolled min 6.38 s at sf0.1; per-element GetArrayItem
    null-checks and the 128-node expression tree beat JIT worse than
    the fold's lambda frames). The fold stays.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    # nullif: a zero-magnitude vector (padding rows in real corpora) has
    # no defined cosine — NULL, exactly DuckDB's division-by-zero result;
    # a bare division THROWS under ANSI (Spark 4 default) instead
    return dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def _with_stats(df: DataFrame, with_bucket: bool) -> DataFrame:
    """Attach ``vnorm`` (and ``bucket``) to a (vec_id, label, vd) frame.

    One posexplode over dimensions, ``qx``/``m`` materialized once per
    row, then a single hash aggregation: 1 norm sum + 16 plane-dot sums,
    all exact long arithmetic (qx ≤ 2^21, qx² ≤ 2^42, ×dims ≪ 2^63).
    Plane p's ±1 entry for dimension d is ``1 - 2·bit_p(mix(d))`` —
    branch-free, literal p. Narrow stats join back on vec_id.
    """
    ex = (
        df.select("vec_id", F.posexplode("vd").alias("d", "x"))
        .withColumn("qx", F.floor(F.col("x") * QUANT).cast("long"))
    )
    aggs = [F.sum(F.col("qx") * F.col("qx")).alias("qn2")]
    if with_bucket:
        m0 = (F.col("d").cast("long") + 1) * F.lit(MIX)
        ex = ex.withColumn("m", m0.bitwiseXOR(F.shiftright(m0, 13)))
        aggs += [
            F.sum(
                F.col("qx")
                * (1 - 2 * F.shiftright(F.col("m"), p).bitwiseAND(F.lit(1)))
            ).alias(f"p{p}")
            for p in range(N_PLANES)
        ]
    stats = ex.groupBy("vec_id").agg(*aggs)
    out = [F.col("vec_id"), (F.sqrt(F.col("qn2")) / QUANT).alias("vnorm")]
    if with_bucket:
        bucket = F.shiftleft((F.col("p0") > 0).cast("long"), 0)
        for p in range(1, N_PLANES):
            bucket = bucket + F.shiftleft((F.col(f"p{p}") > 0).cast("long"), p)
        out.append(bucket.alias("bucket"))
    return df.join(stats.select(*out), "vec_id")


def banded(df: DataFrame) -> DataFrame:
    """Explode the 16-bit bucket into (band_idx, band_val) rows —
    candidates share ANY band (OR-amplification for recall)."""
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("bucket"), b * BAND_BITS).bitwiseAND(
                F.lit((1 << BAND_BITS) - 1)
            )
            for b in range(BANDS)
        ]
    )
    return df.select(
        "*", F.posexplode(bands).alias("band_idx", "band_val")
    )


def _prep(spark: SparkSession, sf_dir: str, with_bucket: bool) -> DataFrame:
    emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
    base = (
        # finite_vectors already spread the rows across cores with its
        # vec_id repartition (the dedup rides that same exchange)
        finite_vectors(emb)
        .select("vec_id", "label", as_double(F.col("embedding")).alias("vd"))
    )
    return _with_stats(base, with_bucket)


def _scored_pairs(queries: DataFrame, cands: DataFrame) -> DataFrame:
    """(query_id, vec_id, score): rounded cosine for every (query,
    candidate) pair; the query side is broadcast."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("vd").alias("qv"),
        F.col("vnorm").alias("qn"),
    )
    c = cands.select(F.col("vec_id"), F.col("vd").alias("cv"), F.col("vnorm").alias("cn"))
    return c.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        qround(
            cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 9
        ).alias("score"),
    )


def _topk(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


def _bruteforce_topk_from(vecs: DataFrame) -> DataFrame:
    """Exact top-k from a prepped corpus (builder shared with
    :func:`ann_recall_eval`, which feeds both arms one checkpointed
    prep instead of re-deriving the corpus per arm)."""
    return _topk(_scored_pairs(vecs.filter(F.col("vec_id") < N_QUERIES), vecs))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bruteforce_topk_from(_prep(spark, sf_dir, with_bucket=False))


def _lsh_topk_from(vecs_with_bucket: DataFrame) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing any
    LSH band with the query. Recall < 1 by design; determinism is exact.

    Shaped as block-collect pair expansion (both orientations, then
    keep the query side) so norms and buckets are computed once — a
    band self-join would evaluate the whole prep plan per side. The
    cross-band DISTINCT runs on the slim scored projection.
    """
    vecs = banded(vecs_with_bucket)
    pairs = within_block_pairs(vecs, ["band_idx", "band_val"], ["vec_id", "vd", "vnorm"])
    # Query-relevance filter BEFORE the both-orientation explode: only
    # ~N_QUERIES/corpus of block-local pairs touch a query vector, so
    # filtering the pair list first shrinks the explode+distinct input
    # by orders of magnitude (at 100× corpus the unfiltered explode's
    # candidate volume grows with corpus pairs, not query pairs).
    pairs = pairs.filter(
        (F.col("a.vec_id") < N_QUERIES) | (F.col("b.vec_id") < N_QUERIES)
    )
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("q"), F.col("b").alias("c")),
                F.struct(F.col("b").alias("q"), F.col("a").alias("c")),
            )
        ).alias("p")
    ).select("p.q", "p.c")
    scored = both.filter(F.col("q.vec_id") < N_QUERIES).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("vec_id"),
        qround(
            cosine(F.col("q.vd"), F.col("c.vd"), F.col("q.vnorm"), F.col("c.vnorm")), 9
        ).alias("score"),
    )
    return _topk(scored.distinct())


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_topk_from(_prep(spark, sf_dir, with_bucket=True))


N_CENTROIDS = 32
N_PROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic
    coarse-quantize → probe → rerank ANN layout:

    1. **Coarse quantizer**: ``N_CENTROIDS`` centroids. Stand-in here:
       the first ``N_CENTROIDS`` corpus vectors by vec_id (deterministic,
       engine-independent); production swaps in offline k-means — the
       IVF plumbing below (assignment, inverted lists, probing, rerank)
       is the part this engine owns and is identical either way.
    2. **Assignment** (builds the inverted lists): every vector goes to
       its max-cosine centroid. Dots run as exploded integer sums —
       (vec_id, d, qx) rows joined to the broadcast (d, cent_id, qc)
       table, one hash aggregation on (vec_id, cent_id); exact long
       arithmetic, map-side partials, whole-stage codegen. Ranking uses
       qdot/cnorm (the vector's own norm is constant within its
       ranking), cent_id tie-break.
    3. **Probe**: each query searches its ``N_PROBE`` nearest cells —
       the recall/cost dial (expected corpus fraction probed:
       N_PROBE/N_CENTROIDS at balanced cells).
    4. **Rerank**: exact rounded cosine over the probed cells' members,
       deterministic top-k. A vector lives in exactly one cell, so
       (query, candidate) pairs are already unique.

    At scale: assignment is the standard O(N·C·D) IVF build cost;
    inverted lists are co-partitioned by cell so the probe join
    shuffles only the (tiny) probe table.

    The prepped corpus is ``localCheckpoint``-ed before its
    five-consumer fan-out (cents, ex_v, lists, qside — same audit/fix
    as ``ann_ivf_cell_stats``/``dedup_semantic``: without it every
    consumer replays the scan+finite-filter+norm subtree and the plan
    balloons), and ``ranked`` before its two consumers (assign and
    probes both filter the same window output — checkpointing computes
    the O(N·C) assignment scoring once).
    """
    vecs = _prep(spark, sf_dir, with_bucket=False).localCheckpoint()
    cents = vecs.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("vd").alias("cd"),
        F.col("vnorm").alias("cnorm"),
    )
    ex_v = (
        vecs.select("vec_id", F.posexplode("vd").alias("d", "x"))
        .withColumn("qx", F.floor(F.col("x") * QUANT).cast("long"))
        .drop("x")
    )
    ex_c = (
        cents.select("cent_id", F.posexplode("cd").alias("d", "y"))
        .withColumn("qc", F.floor(F.col("y") * QUANT).cast("long"))
        .drop("y")
    )
    qdots = (
        ex_v.join(F.broadcast(ex_c), "d")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(F.col("qx") * F.col("qc")).alias("qdot"))
        .join(F.broadcast(cents.select("cent_id", "cnorm")), "cent_id")
    )
    w = Window.partitionBy("vec_id").orderBy(
        # nullif: a zero (padding) vector among the centroid seeds has
        # cnorm = 0 and the ranking division THROWS under ANSI; NULL
        # (DuckDB's double/0, ordered last by DESC in both engines) is
        # the oracle's semantics
        (
            F.col("qdot").cast("double")
            / F.nullif(F.col("cnorm"), F.lit(0.0))
        ).desc(),
        F.col("cent_id")
    )
    ranked = qdots.withColumn("crank", F.row_number().over(w)).localCheckpoint()
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "cent_id")
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= N_PROBE)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")
    # inverted lists: cell members with their payloads
    lists = assign.join(vecs, "vec_id").select(
        "cent_id", "vec_id", F.col("vd").alias("cv"), F.col("vnorm").alias("cn")
    )
    qside = probes.join(
        vecs.select(
            F.col("vec_id").alias("query_id"),
            F.col("vd").alias("qv"),
            F.col("vnorm").alias("qn"),
        ),
        "query_id",
    )
    scored = lists.join(F.broadcast(qside), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        qround(
            cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 9
        ).alias("score"),
    )
    return _topk(scored)


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise mean vector (long format: label, d,
    centroid) — the vector-aggregation primitive behind k-means updates,
    class prototypes, and cluster summaries.

    Shape: posexplode dims → ONE hash aggregation on (label, d) over
    quantized longs — exact reorder-safe sums, map-side partials, no
    array rebuild (long format also keeps the driver gate happy: no
    array column in the output). Means are two fixed-order divisions of
    exact integers, so doubles agree across engines bit-for-bit.
    """
    emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
    ex = (
        finite_vectors(emb)
        .select("label", F.posexplode(as_double(F.col("embedding"))).alias("d", "x"))
        .withColumn("qx", F.floor(F.col("x") * QUANT).cast("long"))
    )
    return (
        ex.groupBy("label", "d")
        .agg(F.sum("qx").alias("qsum"), F.count(F.lit(1)).alias("n_vectors"))
        .select(
            "label",
            F.col("d").cast("bigint").alias("d"),
            qround(
                F.col("qsum").cast("double") / F.col("n_vectors") / QUANT, 9
            ).alias("centroid"),
            "n_vectors",
        )
    )


def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (cosine ≥ 0.9) among vectors sharing an LSH band.

    The embeddings fixture has no natural near-dups (max pair cosine
    ≈ 0.51), so every 10th vector gets a deterministically perturbed
    copy (±4 % element-wise ramp) at vec_id + 100000. A planted pair at
    cosine ≈ 0.999 lands in the same 8-bit band with p ≈ 0.89 per band;
    missing both bands ≈ 1.1% — the documented approximate-recall
    trade, mirrored exactly by the oracle.
    """
    vecs = _prep(spark, sf_dir, with_bucket=False)
    perturbed = vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.col("label"),
        F.transform(
            F.col("vd"),
            lambda x, i: x * (1.0 + 0.02 * (((i * 7) % 5) - 2)),
        ).alias("vd"),
    )
    allv = _with_stats(
        vecs.select("vec_id", "label", "vd").unionAll(perturbed), with_bucket=True
    )
    pairs = within_block_pairs(
        banded(allv), ["band_idx", "band_val"], ["vec_id", "vd", "vnorm"]
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            qround(
                cosine(F.col("a.vd"), F.col("b.vd"), F.col("a.vnorm"), F.col("b.vnorm")), 9
            ).alias("score"),
        )
        .filter(F.col("score") >= 0.9)
        .distinct()
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — identical algorithm, DuckDB dialect
# ---------------------------------------------------------------------------

_D_VD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
#: oracle twin of the finite_vectors DISTINCT boundary: exact storage
#: duplicates are one logical vector (r9 dupkeys sweep)
_D_EMB = "(SELECT DISTINCT * FROM embeddings)"
#: oracle twin of ``finite_vectors`` — TRUE iff the vector exists and
#: every component is non-NULL and finite (empty vectors count finite:
#: bool_or over [] is NULL → coalesce FALSE). The explicit IS NOT NULL
#: arms mirror the engine's rule exactly (ADVICE r8): without them
#: bool_or SKIPS NULL elements and a NULL embedding slips through the
#: coalesce, keeping rows the engine drops.
_D_FIN = (
    "embedding IS NOT NULL AND "
    "NOT coalesce(list_aggregate(list_transform(embedding, "
    "x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) OR "
    "isinf(CAST(x AS DOUBLE))), "
    "'bool_or'), FALSE)"
)
_D_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)
_D_QX = f"CAST(floor(vd[i] * {QUANT}) AS BIGINT)"
_D_NORM = (
    f"sqrt(CAST(list_reduce(list_transform(generate_series(1, len(vd)), "
    f"i -> {_D_QX} * {_D_QX}), (x, y) -> x + y) AS DOUBLE)) / {QUANT}"
)
# plane p entry for 1-based dim i: 1 - 2*bit_p(xor(m, m >> 13)), m = i*MIX
_D_MIX = f"xor(i * {MIX}, (i * {MIX}) >> 13)"

_D_BUCKET = f"""
list_reduce(list_transform(generate_series(0, {N_PLANES - 1}), p ->
  CASE WHEN list_reduce(list_transform(generate_series(1, len(vd)), i ->
         {_D_QX} * (1 - 2 * (({_D_MIX} >> p) & 1))),
         (x, y) -> x + y) > 0
       THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END),
  (x, y) -> x + y)
"""

_D_PREP = f"""
SELECT vec_id, label, vd, {_D_NORM} AS vnorm
FROM (SELECT vec_id, label, {_D_VD} AS vd FROM {_D_EMB} WHERE {_D_FIN})
"""

_D_SCORE = (
    "round(" + _D_DOT.format(a="q.vd", b="c.vd") + " / (q.vnorm * c.vnorm), 9)"
)

_D_BAND_JOIN = (
    f"((a.bucket >> (u.b * {BAND_BITS})) & {(1 << BAND_BITS) - 1}) = "
    f"((b.bucket >> (u.b * {BAND_BITS})) & {(1 << BAND_BITS) - 1})"
)

_BRUTE_ORACLE = f"""
WITH vecs AS ({_D_PREP}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_D_SCORE} AS score
  FROM vecs q JOIN vecs c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
"""

_LSH_ORACLE = f"""
WITH vecs AS (
  SELECT *, {_D_BUCKET} AS bucket FROM ({_D_PREP})
),
scored AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS vec_id,
    (floor(({_D_DOT.format(a='a.vd', b='b.vd')} / (a.vnorm * b.vnorm)) * 1e9 + 0.5) / 1e9) AS score
  FROM vecs a JOIN vecs b ON b.vec_id != a.vec_id,
       (SELECT unnest(generate_series(0, {BANDS - 1})) AS b) u
  WHERE a.vec_id < {N_QUERIES} AND {_D_BAND_JOIN}
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
"""

_D_QDOT_VC = (
    f"list_reduce(list_transform(generate_series(1, len(v.vd)), i -> "
    f"CAST(floor(v.vd[i] * {QUANT}) AS BIGINT) * "
    f"CAST(floor(c.cd[i] * {QUANT}) AS BIGINT)), (x, y) -> x + y)"
)

_IVF_ORACLE = f"""
WITH vecs AS ({_D_PREP}),
cents AS (
  SELECT vec_id AS cent_id, vd AS cd, vnorm AS cnorm
  FROM vecs WHERE vec_id < {N_CENTROIDS}
),
qdots AS (
  SELECT v.vec_id, c.cent_id, {_D_QDOT_VC} AS qdot, c.cnorm
  FROM vecs v, cents c
),
ranked_cells AS (
  SELECT vec_id, cent_id,
    ROW_NUMBER() OVER (PARTITION BY vec_id
      ORDER BY CAST(qdot AS DOUBLE) / cnorm DESC, cent_id) AS crank
  FROM qdots
),
assign AS (SELECT vec_id, cent_id FROM ranked_cells WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id FROM ranked_cells
  WHERE vec_id < {N_QUERIES} AND crank <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id,
    (floor(({_D_DOT.format(a='q.vd', b='c.vd')} / (q.vnorm * c.vnorm)) * 1e9 + 0.5) / 1e9) AS score
  FROM probes p
  JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id != p.query_id
  JOIN vecs q ON q.vec_id = p.query_id
  JOIN vecs c ON c.vec_id = a.vec_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
"""

_CENTROIDS_ORACLE = f"""
WITH ex AS (
  SELECT label, u.i AS i, u.x AS x FROM (
    SELECT label, unnest(list_transform(generate_series(1, len(embedding)),
      i -> struct_pack(i := i, x := CAST(embedding[i] AS DOUBLE)))) AS u
    FROM {_D_EMB} WHERE {_D_FIN}
  )
)
SELECT label,
  CAST(i - 1 AS BIGINT) AS d,
  (floor((CAST(sum(CAST(floor(x * {QUANT}) AS BIGINT)) AS DOUBLE)
        / count(*) / {QUANT}) * 1e9 + 0.5) / 1e9) AS centroid,
  count(*) AS n_vectors
FROM ex
GROUP BY label, i
"""

_NEARDUP_ORACLE = f"""
WITH base AS (SELECT vec_id, label, {_D_VD} AS vd FROM {_D_EMB} WHERE {_D_FIN}),
perturbed AS (
  SELECT vec_id + 100000 AS vec_id, label,
    list_transform(generate_series(1, len(vd)),
      i -> vd[i] * (1.0 + 0.02 * ((((i-1)*7) % 5) - 2))) AS vd
  FROM base WHERE vec_id % 10 = 0
),
allv AS (
  SELECT *, {_D_NORM} AS vnorm, {_D_BUCKET} AS bucket
  FROM (SELECT * FROM base UNION ALL SELECT * FROM perturbed)
),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
    (floor(({_D_DOT.format(a='a.vd', b='b.vd')} / (a.vnorm * b.vnorm)) * 1e9 + 0.5) / 1e9) AS score
  FROM allv a JOIN allv b ON a.vec_id < b.vec_id,
       (SELECT unnest(generate_series(0, {BANDS - 1})) AS b) u
  WHERE {_D_BAND_JOIN}
)
SELECT vec_a, vec_b, score FROM pairs WHERE score >= 0.9
"""

def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization — the standard compression
    for embedding storage/serving: scale = max|x|/127, q_i =
    round(x_i/scale) ∈ [-127, 127], zero vectors quantize to zeros.

    Engine-deterministic without integer tricks: float→double is exact,
    IEEE multiply/divide are correctly rounded in both engines, and
    rounding is ``floor(v + 0.5)`` (ties toward +inf) — plain ``round``
    is NOT an equalizer across engines (see ``determinism.qround``). Each derived value (vd, amax, scale, q) is materialized in its
    own projection so lambdas never re-evaluate an upstream expression
    per element (see SCALE.md round-2 planner traps). Returns (vec_id,
    scale, q_csv, recon_rmse) with the floats rounded to 9 dp for the
    cross-engine gate."""
    vd = df.select(
        "vec_id",
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    )
    # NB the exact scale keeps its own name end-to-end; aliasing the
    # 9-dp-rounded output column back to "scale" in the final select
    # made CollapseProject rebind the error term to the ROUNDED scale
    # (observed in the physical plan) — a silent 3e-9 rmse corruption.
    st = vd.withColumn(
        "amax", F.array_max(F.transform(F.col("vd"), F.abs))
    ).withColumn("scale_exact", F.col("amax") / 127.0)
    q = st.withColumn(
        "q",
        F.when(
            F.col("amax") == 0.0,
            F.transform(F.col("vd"), lambda x: F.lit(0)),
        ).otherwise(
            F.transform(
                F.col("vd"),
                lambda x: F.floor(x * 127.0 / F.col("amax") + 0.5).cast("int"),
            )
        ),
    )
    sq_err = F.aggregate(
        F.zip_with(
            F.col("vd"),
            F.col("q"),
            lambda x, qq: F.pow(
                x - qq.cast("double") * F.col("scale_exact"), F.lit(2.0)
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return q.select(
        "vec_id",
        qround(F.col("scale_exact"), 9).alias("scale"),
        F.concat_ws(",", F.transform(F.col("q"), lambda v: v.cast("string"))).alias(
            "q_csv"
        ),
        qround(F.sqrt(sq_err / F.size(F.col("vd"))), 9).alias("recon_rmse"),
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
    return quantize_int8(finite_vectors(emb))


_QUANT_ORACLE = f"""
WITH vd AS (SELECT vec_id, {_D_VD} AS vd FROM {_D_EMB} WHERE {_D_FIN}),
st AS (
  SELECT vec_id, vd, list_max(list_transform(vd, x -> abs(x))) AS amax
  FROM vd
),
sc AS (SELECT *, amax / 127.0 AS scale FROM st),
q AS (
  SELECT vec_id, vd, scale,
         CASE WHEN amax = 0.0
              THEN list_transform(vd, x -> 0)
              ELSE list_transform(vd, x -> CAST(floor(x * 127.0 / amax + 0.5) AS INT))
         END AS q
  FROM sc
)
SELECT vec_id,
       (floor(scale * 1e9 + 0.5) / 1e9) AS scale,
       array_to_string(q, ',') AS q_csv,
       (floor(sqrt(list_reduce(
         list_transform(generate_series(1, len(vd)),
                        i -> pow(vd[i] - q[i] * scale, 2)),
         (x, y) -> x + y) / len(vd)) * 1e9 + 0.5) / 1e9) AS recon_rmse
FROM q
"""


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH index against the exact brute-force ground
    truth, per query — the quality gauge every ANN deployment needs
    next to its speedup claim (tune BANDS/band width against THIS
    number). Left-join the exact top-k to the approximate top-k on
    (query, neighbor) and count hits: k and n_hit are exact integers,
    recall is one final division.

    Scale shape: ground truth is the already-bounded O(Q·N) broadcast
    scan; the join is per-(query, neighbor) — Q·k rows, metadata-scale.
    At 100 TB you'd compute ground truth on a SAMPLE of queries — the
    eval is O(sample), never O(corpus²).

    Both arms are fed ONE checkpointed prep (the bucketed variant — the
    extra bucket column is inert for the brute-force arm): previously
    each arm re-derived the corpus scan + finite filter + norms, so the
    eval paid the prep subtree twice and the plan carried both copies."""
    vecs = _prep(spark, sf_dir, with_bucket=True).localCheckpoint()
    bf = _bruteforce_topk_from(vecs).select("query_id", "vec_id")
    approx = (
        _lsh_topk_from(vecs)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.count("*").alias("k"), F.count("hit").alias("n_hit"))
        .select(
            "query_id",
            "k",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("k").cast("double")).alias(
                "recall"
            ),
        )
    )


def ann_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health report: per-cell occupancy and mean
    member→centroid cosine — the numbers that drive nprobe tuning and
    the re-cluster decision (hot cells make probes quadratic-ish;
    low-coherence cells mean the quantizer no longer fits the data
    drift). Every production ANN service watches exactly this table.

    ``hot`` flags cells above 2× ideal occupancy using exact integer
    arithmetic (``n·C > 2·total``); the mean cosine divides the exact
    integer dot by the two quantized norms, qround'd then
    decimal-summed — partitioning-independent. Same broadcast
    assignment shape as :func:`ann_ivf_topk`; the report adds one
    cell-keyed aggregation. The prepped corpus is checkpointed before
    its four-consumer fan-out (same audit/fix as `dedup_semantic`)."""
    vecs = _prep(spark, sf_dir, with_bucket=False).localCheckpoint()
    cents = vecs.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("vd").alias("cd"),
        F.col("vnorm").alias("cnorm"),
    )
    ex_v = (
        vecs.select("vec_id", F.posexplode("vd").alias("d", "x"))
        .withColumn("qx", F.floor(F.col("x") * QUANT).cast("long"))
        .drop("x")
    )
    ex_c = (
        cents.select("cent_id", F.posexplode("cd").alias("d", "y"))
        .withColumn("qc", F.floor(F.col("y") * QUANT).cast("long"))
        .drop("y")
    )
    qdots = (
        ex_v.join(F.broadcast(ex_c), "d")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(F.col("qx") * F.col("qc")).alias("qdot"))
        .join(F.broadcast(cents.select("cent_id", "cnorm")), "cent_id")
    )
    w = Window.partitionBy("vec_id").orderBy(
        # nullif: a zero (padding) vector among the centroid seeds has
        # cnorm = 0 and the ranking division THROWS under ANSI; NULL
        # (DuckDB's double/0, ordered last by DESC in both engines) is
        # the oracle's semantics
        (
            F.col("qdot").cast("double")
            / F.nullif(F.col("cnorm"), F.lit(0.0))
        ).desc(),
        F.col("cent_id")
    )
    members = (
        qdots.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .join(vecs.select("vec_id", "vnorm"), "vec_id")
    )
    quant2 = float(QUANT) ** 2
    # nullif: the zero padding vector is a corpus MEMBER too (vnorm = 0)
    # and its own cosine division would throw under ANSI; NULL matches
    # DuckDB's double/0, and SUM skips NULLs identically in both engines
    cos = qround(
        F.col("qdot").cast("double")
        / F.nullif(
            F.col("vnorm") * F.col("cnorm") * F.lit(quant2), F.lit(0.0)
        ),
        9,
    )
    per_cell = members.groupBy("cent_id").agg(
        F.count("*").alias("n_members"),
        F.sum(cos.cast("decimal(18,9)")).alias("_cos_sum"),
    )
    total = per_cell.agg(F.sum("n_members").alias("total"))
    return (
        per_cell.crossJoin(F.broadcast(total))
        .select(
            "cent_id",
            "n_members",
            (
                F.col("n_members").cast("double") / F.col("total").cast("double")
            ).alias("frac_corpus"),
            (F.col("_cos_sum").cast("double") / F.col("n_members")).alias(
                "avg_cos"
            ),
            (
                F.col("n_members") * N_CENTROIDS > F.lit(2) * F.col("total")
            ).alias("hot"),
        )
    )


SEMDEDUP_TAU = 0.9


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public method): cluster the embedding space,
    then WITHIN each cluster drop every vector whose cosine to a
    lower-id cluster-mate is ≥ τ. Clustering bounds the quadratic step
    to cluster-local pairs — the same "never corpus × corpus" rule as
    the LSH dedup family, but driven by semantic cells instead of hash
    buckets, so it removes *meaning-level* duplicates pairwise hashing
    misses.

    Pipeline: assignment reuses the IVF coarse-quantizer shape
    (exploded-integer dots against ``N_CENTROIDS`` broadcast seed
    centroids — deterministic stand-in for offline k-means, see
    :func:`ann_ivf_topk`); candidate pairs come from
    ``within_block_pairs`` on the cell id (ONE shuffle, vectors and
    norms computed once); the keep rule is "dropped iff similar to any
    lower-id cluster-mate" — deterministic, no iteration, and the rule
    SemDeDup's reference implementation uses. Same planted-perturbation
    fixture as :func:`embedding_cosine_neardup` (the natural corpus has
    no near-dups; every 10th vector gets a ±4 % ramp copy, which lands
    in its source's cell and scores ≈ 0.999).

    Recall is cell-bounded BY DESIGN: a near-dup pair split across two
    cells is never compared (measured 48/50 planted copies dropped at
    sf0.01 — the 2 misses flipped argmax cells under perturbation).
    That is SemDeDup's documented trade; raising N_CENTROIDS lowers
    cost and recall together, and the LSH family covers the
    hash-similarity side of the same spectrum.

    Returns (vec_id, cent_id, keep) for the whole (planted) corpus.

    The prepped corpus (norms attached) is ``localCheckpoint``-ed
    before fan-out: it feeds FOUR consumers (centroid slice, exploded
    assignment, member payload join, final projection), and the lazy
    form re-ran the whole prep+stats pipeline per consumer — audited
    at 80 exchanges / 30 broadcast joins in one plan; checkpointing is
    the same materialize-the-loop-state policy as PageRank.
    """
    vecs = _prep(spark, sf_dir, with_bucket=False)
    perturbed = vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.col("label"),
        F.transform(
            F.col("vd"),
            lambda x, i: x * (1.0 + 0.02 * (((i * 7) % 5) - 2)),
        ).alias("vd"),
    )
    allv = _with_stats(
        vecs.select("vec_id", "label", "vd").unionAll(perturbed),
        with_bucket=False,
    ).localCheckpoint()
    # centroids come from the checkpointed corpus (base ids < 32 are in
    # allv with identical vd/vnorm — planted ids start at 100000)
    cents = allv.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("vd").alias("cd"),
        F.col("vnorm").alias("cnorm"),
    )
    ex_v = (
        allv.select("vec_id", F.posexplode("vd").alias("d", "x"))
        .withColumn("qx", F.floor(F.col("x") * QUANT).cast("long"))
        .drop("x")
    )
    ex_c = (
        cents.select("cent_id", F.posexplode("cd").alias("d", "y"))
        .withColumn("qc", F.floor(F.col("y") * QUANT).cast("long"))
        .drop("y")
    )
    qdots = (
        ex_v.join(F.broadcast(ex_c), "d")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(F.col("qx") * F.col("qc")).alias("qdot"))
        .join(F.broadcast(cents.select("cent_id", "cnorm")), "cent_id")
    )
    w = Window.partitionBy("vec_id").orderBy(
        # nullif: a zero (padding) vector among the centroid seeds has
        # cnorm = 0 and the ranking division THROWS under ANSI; NULL
        # (DuckDB's double/0, ordered last by DESC in both engines) is
        # the oracle's semantics
        (
            F.col("qdot").cast("double")
            / F.nullif(F.col("cnorm"), F.lit(0.0))
        ).desc(),
        F.col("cent_id")
    )
    assign = (
        qdots.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vec_id", "cent_id")
    )
    members = assign.join(allv.select("vec_id", "vd", "vnorm"), "vec_id")
    pairs = within_block_pairs(
        members.select("cent_id", "vec_id", "vd", "vnorm"),
        ["cent_id"],
        ["vec_id", "vd", "vnorm"],
    )
    dropped = (
        pairs.select(
            F.col("b.vec_id").alias("vec_id"),
            qround(
                cosine(
                    F.col("a.vd"), F.col("b.vd"), F.col("a.vnorm"), F.col("b.vnorm")
                ),
                9,
            ).alias("score"),
        )
        .filter(F.col("score") >= SEMDEDUP_TAU)
        .select("vec_id")
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        members.select("cent_id", "vec_id")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cent_id",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def mining_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar vectors with a DIFFERENT label —
    near misses that teach an embedding model the decision boundary
    (easy negatives — random different-label vectors — carry almost no
    gradient signal; the standard recipe mines the highest-scoring
    wrong-label neighbors instead).

    Same broadcast-scan shape as :func:`ann_bruteforce_topk` with a
    label-inequality predicate fused into the scan filter, so the
    wrong-label constraint prunes pairs BEFORE the cosine is computed.
    At 100 TB the production path swaps the scan for the LSH/IVF
    candidate generators (identical downstream ranking); the label
    filter composes with either.
    """
    vecs = _prep(spark, sf_dir, with_bucket=False)
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("vd").alias("qv"),
        F.col("vnorm").alias("qn"),
    )
    scored = (
        vecs.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            qround(
                cosine(F.col("qv"), F.col("vd"), F.col("qn"), F.col("vnorm")),
                9,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "query_label", "vec_id", "neg_label", "score", "rank"
        )
    )


_IVF_STATS_ORACLE = f"""
WITH vecs AS ({_D_PREP}),
cents AS (
  SELECT vec_id AS cent_id, vd AS cd, vnorm AS cnorm
  FROM vecs WHERE vec_id < {N_CENTROIDS}
),
qdots AS (
  SELECT v.vec_id, c.cent_id, {_D_QDOT_VC} AS qdot, c.cnorm, v.vnorm
  FROM vecs v, cents c
),
members AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      ORDER BY CAST(qdot AS DOUBLE) / cnorm DESC, cent_id) AS crank
    FROM qdots
  ) WHERE crank = 1
),
per_cell AS (
  SELECT cent_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         SUM(CAST({sql_qround(
             f"CAST(qdot AS DOUBLE) / (vnorm * cnorm * {float(QUANT) ** 2})", 9
         )} AS DECIMAL(18,9))) AS cos_sum
  FROM members GROUP BY cent_id
),
tot AS (SELECT CAST(SUM(n_members) AS BIGINT) AS total FROM per_cell)
SELECT cent_id, n_members,
       CAST(n_members AS DOUBLE) / CAST(total AS DOUBLE) AS frac_corpus,
       CAST(cos_sum AS DOUBLE) / n_members AS avg_cos,
       n_members * {N_CENTROIDS} > 2 * total AS hot
FROM per_cell, tot
"""


_SEMDEDUP_ORACLE = f"""
WITH base AS (SELECT vec_id, label, {_D_VD} AS vd FROM {_D_EMB} WHERE {_D_FIN}),
perturbed AS (
  SELECT vec_id + 100000 AS vec_id, label,
    list_transform(generate_series(1, len(vd)),
      i -> vd[i] * (1.0 + 0.02 * ((((i-1)*7) % 5) - 2))) AS vd
  FROM base WHERE vec_id % 10 = 0
),
allv AS (
  SELECT vec_id, label, vd, {_D_NORM} AS vnorm
  FROM (SELECT * FROM base UNION ALL SELECT * FROM perturbed)
),
cents AS (
  SELECT vec_id AS cent_id, vd AS cd, vnorm AS cnorm
  FROM allv WHERE vec_id < {N_CENTROIDS}
),
qdots AS (
  SELECT v.vec_id, c.cent_id, {_D_QDOT_VC} AS qdot, c.cnorm
  FROM allv v, cents c
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT vec_id, cent_id,
      ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY CAST(qdot AS DOUBLE) / cnorm DESC, cent_id) AS crank
    FROM qdots
  ) WHERE crank = 1
),
members AS (
  SELECT a.cent_id, v.vec_id, v.vd, v.vnorm
  FROM assign a JOIN allv v USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM members a JOIN members b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE (floor(({_D_DOT.format(a='a.vd', b='b.vd')} / (a.vnorm * b.vnorm))
               * 1e9 + 0.5) / 1e9) >= {SEMDEDUP_TAU}
)
SELECT m.vec_id, m.cent_id, (d.vec_id IS NULL) AS keep
FROM members m LEFT JOIN dropped d ON m.vec_id = d.vec_id
"""


_HARDNEG_ORACLE = f"""
WITH vecs AS ({_D_PREP}),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS vec_id, c.label AS neg_label, {_D_SCORE} AS score
  FROM vecs q JOIN vecs c ON c.label != q.label
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, query_label, vec_id, neg_label, score, rank
FROM ranked WHERE rank <= {TOP_K}
"""


_RECALL_ORACLE = f"""
SELECT bf.query_id,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit,
       CAST(COUNT(l.vec_id) AS DOUBLE) / COUNT(*) AS recall
FROM ({_BRUTE_ORACLE}) bf
LEFT JOIN ({_LSH_ORACLE}) l
  ON bf.query_id = l.query_id AND bf.vec_id = l.vec_id
GROUP BY bf.query_id
"""


QUERIES = {
    "dedup_semantic": dedup_semantic,
    "ann_ivf_cell_stats": ann_ivf_cell_stats,
    "mining_hard_negatives": mining_hard_negatives,
    "ann_recall_eval": ann_recall_eval,
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_label_centroids": embedding_label_centroids,
    "embedding_cosine_neardup": embedding_cosine_neardup,
    "embedding_quantize_int8": embedding_quantize_int8,
}

ORACLES = {
    "dedup_semantic": _SEMDEDUP_ORACLE,
    "ann_ivf_cell_stats": _IVF_STATS_ORACLE,
    "mining_hard_negatives": _HARDNEG_ORACLE,
    "ann_recall_eval": _RECALL_ORACLE,
    "embedding_label_centroids": _CENTROIDS_ORACLE,
    "ann_bruteforce_topk": _BRUTE_ORACLE,
    "ann_lsh_topk": _LSH_ORACLE,
    "ann_ivf_topk": _IVF_ORACLE,
    "embedding_cosine_neardup": _NEARDUP_ORACLE,
    "embedding_quantize_int8": _QUANT_ORACLE,
}
