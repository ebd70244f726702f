"""Embedding similarity search: brute-force cosine top-k, LSH-bucketed
approximate NN, and embedding-cosine near-duplicate pairs.

Design for scale:

- **Brute force** is the correctness baseline: broadcast the (small)
  query set against the candidate corpus — one pass, no shuffle of the
  big side. O(Q·N) but embarrassingly parallel; right answer, bounded
  by scan speed.
- **LSH buckets** are the scale path: 16 deterministic ±1 hyperplanes →
  16-bit bucket per vector; queries only compare within their bucket
  (expected N/65536 of the corpus). The hyperplane dot products are
  computed over ``floor(v·2^20)`` integer quantization so bucket
  assignment is bit-exact across engines and partitionings — a sign
  bit must never depend on float summation order.
- All exact cosines accumulate in array order with double math
  (sequential fold in both engines), and are rounded to 9 decimals
  before ranking, with vec_id tie-breaks — fully deterministic top-k.

No UDFs anywhere: zip_with/aggregate/transform are JVM-side higher-order
functions, so scoring runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import within_block_pairs
from datapipeline_gcp_spark.schemas import load_testdata

N_PLANES = 16
QUANT = 1 << 20  # integer quantization for bucket sign bits
N_QUERIES = 10  # registered queries use vec_id < N_QUERIES as the query set
TOP_K = 10


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (order-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def _plane_sign(p, d) -> Column:
    """Deterministic ±1 hyperplane entries (p: plane, d: 0-based dim)."""
    return F.when(((p * 131 + d * 37) % 2) == 0, F.lit(1)).otherwise(F.lit(-1))


def lsh_bucket(vec: Column) -> Column:
    """16-bit random-hyperplane bucket over integer-quantized values."""
    qvec = F.transform(vec, lambda x: F.floor(x * QUANT).cast("long"))

    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.size(qvec) - 1),
            F.lit(0).cast("long"),
            lambda s, d: s
            + F.element_at(qvec, (d + 1).cast("int")) * _plane_sign(p, d).cast("long"),
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(N_PLANES - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(plane_dot(p) > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


def _scored_pairs(queries: DataFrame, cands: DataFrame, join_on=None) -> DataFrame:
    """(query_id, vec_id, score): rounded cosine for every (query,
    candidate) pair; the query side is broadcast."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("vd").alias("qv"),
        F.col("vnorm").alias("qn"),
    )
    c = cands.select(
        F.col("vec_id"), F.col("vd").alias("cv"), F.col("vnorm").alias("cn"),
        *([F.col("bucket")] if join_on == "bucket" else []),
    )
    if join_on == "bucket":
        q = q.join(
            queries.select(F.col("vec_id").alias("query_id"), "bucket"), "query_id"
        )
        joined = c.join(F.broadcast(q), on="bucket")
    else:
        joined = c.crossJoin(F.broadcast(q))
    return joined.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(
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


def _prep(spark: SparkSession, sf_dir: str, with_bucket: bool) -> DataFrame:
    emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
    out = (
        # small corpus parquet = one input split; spread the per-row
        # norm/bucket arithmetic across cores (free at real scale)
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", "label", as_double(F.col("embedding")).alias("vd"))
        .withColumn("vnorm", norm(F.col("vd")))
    )
    if with_bucket:
        out = out.withColumn("bucket", lsh_bucket(F.col("vd")))
    return out


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _prep(spark, sf_dir, with_bucket=False)
    return _topk(_scored_pairs(vecs.filter(F.col("vec_id") < N_QUERIES), vecs))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Recall < 1 by design; determinism is exact.

    Shaped as block-collect pair expansion (both orientations, then
    keep the query side) so norms and buckets are computed once — a
    bucket self-join would evaluate the whole prep plan per side.
    """
    vecs = _prep(spark, sf_dir, with_bucket=True)
    pairs = within_block_pairs(vecs, ["bucket"], ["vec_id", "vd", "vnorm"])
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
        F.round(
            cosine(F.col("q.vd"), F.col("c.vd"), F.col("q.vnorm"), F.col("c.vnorm")), 9
        ).alias("score"),
    )
    return _topk(scored)


def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (cosine ≥ 0.9) among vectors sharing an LSH bucket.

    The embeddings fixture has no natural near-dups (max pair cosine
    ≈ 0.51), so every 10th vector gets a deterministically perturbed
    copy (±4 % element-wise ramp) at vec_id + 100000.
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
    allv = (
        vecs.select("vec_id", "label", "vd")
        .unionAll(perturbed)
        .withColumn("vnorm", norm(F.col("vd")))
        .withColumn("bucket", lsh_bucket(F.col("vd")))
    )
    pairs = within_block_pairs(allv, ["bucket"], ["vec_id", "vd", "vnorm"])
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            cosine(F.col("a.vd"), F.col("b.vd"), F.col("a.vnorm"), F.col("b.vnorm")), 9
        ).alias("score"),
    ).filter(F.col("score") >= 0.9)


# ---------------------------------------------------------------------------
# DuckDB oracles — identical algorithm, DuckDB dialect
# ---------------------------------------------------------------------------

_D_VD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_D_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)
_D_NORM = f"sqrt({_D_DOT.format(a='vd', b='vd')})"

_D_BUCKET = f"""
list_reduce(list_transform(generate_series(0, {N_PLANES - 1}), p ->
  CASE WHEN list_reduce(list_transform(generate_series(1, len(vd)), d ->
         CAST(floor(vd[d] * {QUANT}) AS BIGINT)
           * (CASE WHEN (p*131 + (d-1)*37) % 2 = 0 THEN 1 ELSE -1 END)),
         (x, y) -> x + y) > 0
       THEN CAST(power(2, p) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
  (x, y) -> x + y)
"""

_D_PREP = f"""
SELECT vec_id, label, vd, {_D_NORM} AS vnorm
FROM (SELECT vec_id, label, {_D_VD} AS vd FROM embeddings)
"""

_D_SCORE = (
    "round(" + _D_DOT.format(a="q.vd", b="c.vd") + " / (q.vnorm * c.vnorm), 9)"
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
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_D_SCORE} AS score
  FROM vecs q JOIN vecs c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
"""

_NEARDUP_ORACLE = f"""
WITH base AS (SELECT vec_id, label, {_D_VD} AS vd FROM embeddings),
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
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    round({_D_DOT.format(a='a.vd', b='b.vd')} / (a.vnorm * b.vnorm), 9) AS score
  FROM allv a JOIN allv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, score FROM pairs WHERE score >= 0.9
"""

QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_cosine_neardup": embedding_cosine_neardup,
}

ORACLES = {
    "ann_bruteforce_topk": _BRUTE_ORACLE,
    "ann_lsh_topk": _LSH_ORACLE,
    "embedding_cosine_neardup": _NEARDUP_ORACLE,
}
