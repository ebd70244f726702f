"""Hashed-n-gram linear quality classifier over the documents table —
the fastText-style "cheap model" tier of corpus filtering (weights would
come from training; here they are a deterministic hash-derived stand-in
so the full scoring path is oracle-checkable without shipping a model).

Pipeline position (mirrors the reference's layered filtering intent,
`ronnygang/datapipeline_gcp` modeling_tables/business_layer/*.sql being
its "derive signal columns then filter" idiom): rule-based signals
(functions/text.py) → this hashed linear model → (production upgrade) a
real learned classifier via a pandas_udf scoring a broadcast weight
vector.

Scale shape: tokenize → explode features (unigrams + bigrams) → hash to
a fixed bucket space → per-doc hash aggregate. One shuffle keyed on
doc_id, everything else codegen column expressions; feature-row
cardinality is the same as every tokenizing op in the repo. The weight
"table" is a closed-form function of the bucket id, so there is no
weight join at all — at 100 TB that beats broadcasting a real weight
vector (which would still be fine: 2^18 floats is KB-scale).

Determinism: feature hashing uses the engine-shared md5 idiom
(`conv(substr(md5(x),1,15),16,10)` ≡ DuckDB `CAST('0x'||substr(md5(x),
1,15) AS BIGINT)`); weights are integer-derived; the per-doc score sums
BIGINTs (order-free) and performs exactly one double division at the
end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata

#: Feature-hash bucket count (power of two, like hashing-trick models).
N_BUCKETS = 1024
#: Pseudo-weight parameters: w(b) = ((b·KNUTH) mod MOD) − (MOD−1)/2,
#: an integer in [−1001, 1001] that looks random per bucket but is pure
#: closed-form arithmetic in both engines.
_KNUTH = 2654435761
_W_MOD = 2003
_W_SHIFT = (_W_MOD - 1) // 2
#: keep-threshold on the normalized score
QUALITY_THRESHOLD = 0.0


def _md5int(c: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hashed_quality_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Score every document with the hashed linear model.

    Returns (id, *carry, n_feat, score_q, score, keep) where ``score``
    ∈ [−1, 1] is the bucket-weight mean normalized by the max weight
    and ``keep`` applies the threshold.
    """
    # materialize the token split in its own projection FIRST (r14): the
    # bigram lambda's element_at(tokens, i+2) otherwise re-evaluates the
    # whole split(lower(text)) expression once PER BIGRAM ELEMENT —
    # O(len²) tokenization per document (the same inline-expression trap
    # dedup.shingles documents; interleaved A/B at sf0.1: 1.8× on mins).
    tokens = F.col("_toks")
    # bigram i joins token i with token i+1 (0-based transform index,
    # 1-based element_at)
    bigrams = F.transform(
        F.slice(tokens, 1, F.greatest(F.size(tokens) - 1, F.lit(0))),
        lambda x, i: F.concat(x, F.lit("_"), F.element_at(tokens, i + 2)),
    )
    feats = df.withColumn(
        "_toks", F.split(F.lower(F.col(text_col)), " ")
    ).select(
        id_col, *carry_cols, F.explode(F.concat(tokens, bigrams)).alias("f")
    )
    bucket = _md5int(F.col("f")) % N_BUCKETS
    weight = (bucket * F.lit(_KNUTH)) % _W_MOD - F.lit(_W_SHIFT)
    scored = (
        feats.withColumn("w", weight)
        .groupBy(id_col, *carry_cols)
        .agg(
            F.count("*").alias("n_feat"),
            F.sum("w").alias("score_q"),
        )
    )
    score = F.col("score_q").cast("double") / (
        F.col("n_feat").cast("double") * F.lit(float(_W_SHIFT))
    )
    return scored.select(
        id_col,
        *carry_cols,
        "n_feat",
        "score_q",
        score.alias("score"),
        (score > F.lit(QUALITY_THRESHOLD)).alias("keep"),
    )


def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    # small parquet = ONE input split; spread the per-feature md5 work
    # across cores before the explode (free at real scale — the source
    # is already many splits; see contamination_check's measured 27→3 s)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return hashed_quality_scores(docs)


_QUALITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, string_split(lower(text), ' ') AS t
  FROM documents
),
uni AS (
  SELECT doc_id, lang, source, unnest(t) AS f FROM toks
),
bi AS (
  SELECT doc_id, lang, source, t[i] || '_' || t[i + 1] AS f
  FROM toks, UNNEST(CASE WHEN len(t) > 1
                         THEN range(1, len(t)) ELSE [] END) AS u(i)
),
feat AS (
  SELECT * FROM uni UNION ALL SELECT * FROM bi
),
w AS (
  SELECT doc_id, lang, source,
         ((CAST(concat('0x', substr(md5(f),1,15)) AS BIGINT) % {N_BUCKETS})
          * {_KNUTH}) % {_W_MOD} - {_W_SHIFT} AS w
  FROM feat
),
agg AS (
  SELECT doc_id, lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_feat,
         CAST(SUM(w) AS BIGINT) AS score_q
  FROM w GROUP BY doc_id, lang, source
)
SELECT doc_id, lang, source, n_feat, score_q,
       CAST(score_q AS DOUBLE) / (CAST(n_feat AS DOUBLE) * {float(_W_SHIFT)}) AS score,
       CAST(score_q AS DOUBLE) / (CAST(n_feat AS DOUBLE) * {float(_W_SHIFT)})
         > {QUALITY_THRESHOLD} AS keep
FROM agg
"""


def quantile_normalized_scores(scored: DataFrame) -> DataFrame:
    """Per-source quantile calibration of quality scores.

    Raw classifier scores are not comparable ACROSS sources (a 0.2 from
    a books crawl and a 0.2 from a forum dump mean different things —
    each source has its own score distribution), so corpus-mixing
    recipes filter on each document's quantile WITHIN its source, not
    on the raw score. ``pct`` is the percent_rank of the score inside
    its source (ties broken on doc_id for a total order, so the rank —
    and therefore the output — is engine- and partitioning-exact);
    ``decile`` is the coarse bucket mixing recipes actually threshold
    on.

    Scale shape: one window over (source), i.e. one shuffle keyed on
    the source column. Skew note: sources are few and large, so at
    100 TB this is the textbook skewed-window case — the production
    variant two-passes it (per-source count + broadcast, then a
    partition-local rank over pre-sorted buckets) or lets AQE split;
    semantics are unchanged, which is why the declarative form here is
    the right spec.
    """
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    pct = F.percent_rank().over(w)
    return scored.select(
        "doc_id",
        "source",
        "score",
        pct.alias("pct"),
        F.least(F.floor(pct * 10).cast("int"), F.lit(9)).alias("decile"),
    )


def quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return quantile_normalized_scores(hashed_quality_scores(docs))


_QUANTILE_ORACLE = f"""
WITH scored AS ({_QUALITY_ORACLE}),
ranked AS (
  SELECT doc_id, source, score,
         percent_rank() OVER (
           PARTITION BY source ORDER BY score, doc_id) AS pct
  FROM scored
)
SELECT doc_id, source, score, pct,
       CAST(least(floor(pct * 10), 9) AS INT) AS decile
FROM ranked
"""


QUERIES = {
    "quality_linear_score": quality_linear_score,
    "quality_quantile_norm": quality_quantile_norm,
}

ORACLES = {
    "quality_linear_score": _QUALITY_ORACLE,
    "quality_quantile_norm": _QUANTILE_ORACLE,
}
