"""Corpus indexing & partitioning operators: inverted index (postings
lists), hash-based train/valid/test split, and a KMV distinct-count
sketch. These are the index-building / dataset-splitting steps of a
training-data pipeline, downstream of the cleaning and dedup stages in
``functions/cleaning.py`` / ``functions/dedup.py`` (reference scope:
the reference's pipelines stop at relational KPIs —
``cloud_composer/datapipeline_gcp.py:95-154`` — so these extend the
engine along SURVEY.md §6's training-data axis, like the rest of this
package's corpus operators).

Scale notes (the part that matters at 100 TB):

- **inverted_index** never materializes a full posting list per token.
  Stopword-grade tokens appear in nearly every document — collecting
  their doc ids into one array is the classic skew OOM. Instead doc ids
  are ranked per token with a window (distributed sort, one shuffle on
  token) and only the first ``POSTINGS_CAP`` survive into the collected
  array; the document frequency is counted over ALL rows in the same
  aggregation, so the cap bounds memory without corrupting df. The
  window and the groupBy share the token partitioning, so Catalyst
  plans ONE exchange for both.
- **split_assign** is a pure map: split = range of an md5-derived
  bucket (``base_hash``, engine-shared) — deterministic, reproducible
  from the data alone, no state, no shuffle before the count rollup.
- **distinct_kmv** is the mergeable-sketch alternative to
  COUNT(DISTINCT): keep the K smallest distinct hash values per group;
  the K-th smallest h_K estimates distinct ≈ (K-1)·P/h_K. Partial mins
  merge associatively (min-k of a union = min-k of merged min-k sets),
  so at scale this is one partial+final aggregation with K values per
  group of state — COUNT(DISTINCT) by contrast shuffles every distinct
  value. Implemented with md5-derived hashes (``base_hash``) so Spark
  and DuckDB compute bit-identical sketches; the estimate itself is a
  single IEEE division of exact integers, hence also bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import _D_NORM, P, base_hash, normalized
from datapipeline_gcp_spark.schemas import load_testdata

POSTINGS_CAP = 20
MIN_DF = 2
SPLIT_BUCKETS = 100
TRAIN_UPTO, VALID_UPTO = 80, 90  # train [0,80), valid [80,90), test [90,100)
KMV_K = 64

_SQL_HASH = (
    "(CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT) % 1000000007)"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, ("documents",))["documents"]


def _token_doc_pairs(docs: DataFrame) -> DataFrame:
    """Distinct (token, doc_id) pairs. ``array_distinct`` dedups within
    the document, so no extra distinct shuffle is needed."""
    return docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(F.split(normalized(F.col("text")), " "))
        ).alias("token"),
    )


def inverted_index(
    docs: DataFrame, cap: int = POSTINGS_CAP, min_df: int = MIN_DF
) -> DataFrame:
    """(token, df, postings): document frequency over all documents and
    the first ``cap`` doc ids (ascending) as a comma-joined string —
    a string, not an array, so results stay hashable for the driver's
    canonicalizer (the lesson of multimodal_feature_extract, round 1).
    """
    pairs = _token_doc_pairs(docs)
    w = Window.partitionBy("token").orderBy("doc_id")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("rn") <= cap, F.col("doc_id"))
                    )
                ),
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(_docs(spark, sf_dir))


_INVERTED_ORACLE = f"""
WITH pairs AS (
  SELECT doc_id,
         unnest(list_distinct(string_split({_D_NORM}, ' '))) AS token
  FROM documents
), ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM pairs
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(
         list(doc_id ORDER BY doc_id) FILTER (WHERE rn <= {POSTINGS_CAP}),
         ','
       ) AS postings
FROM ranked
GROUP BY token
HAVING COUNT(*) >= {MIN_DF}
"""


def split_assign(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic hash split: bucket = md5-hash(id) mod 100, split by
    bucket range. Reproducible from the data alone — re-running on a
    grown corpus keeps every old document in its old split (the
    property shuffling + slicing does not have)."""
    bucket = base_hash(F.col(id_col).cast("string")) % SPLIT_BUCKETS
    return docs.withColumn(
        "split",
        F.when(bucket < TRAIN_UPTO, F.lit("train"))
        .when(bucket < VALID_UPTO, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (split, lang, source) document counts and char volume — the
    rollup a dataset card reports for each split."""
    assigned = split_assign(_docs(spark, sf_dir))
    return assigned.groupBy("split", "lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_SPLIT_SQL_BUCKET = (
    _SQL_HASH.format(expr="CAST(doc_id AS VARCHAR)") + f" % {SPLIT_BUCKETS}"
)

_SPLIT_ORACLE = f"""
SELECT CASE WHEN {_SPLIT_SQL_BUCKET} < {TRAIN_UPTO} THEN 'train'
            WHEN {_SPLIT_SQL_BUCKET} < {VALID_UPTO} THEN 'valid'
            ELSE 'test' END AS split,
       lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2, 3
"""


def distinct_kmv(
    tokens: DataFrame, group_col: str = "lang", k: int = KMV_K
) -> DataFrame:
    """K-minimum-values distinct sketch per group over a (group, token)
    frame: n_hashes (exact distinct hash count, for accuracy
    comparison), h_k (the K-th smallest hash), and est_distinct =
    (K-1)·P/h_k (groups with fewer than K values fall back to the exact
    count — the sketch is only an estimate beyond K)."""
    hashed = tokens.select(
        group_col, base_hash(F.col("token")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy(group_col).agg(
        F.count("*").alias("n_hashes"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    )
    # (K-1)·P is an exact double (< 2^53); the single division is
    # IEEE-correctly-rounded in both engines → bit-identical estimates.
    est = F.when(
        F.col("h_k").isNotNull(),
        F.lit(float((k - 1) * P)) / F.col("h_k").cast("double"),
    ).otherwise(F.col("n_hashes").cast("double"))
    return agg.select(
        group_col, "n_hashes", "h_k", est.alias("est_distinct")
    )


def corpus_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "lang",
        F.explode_outer(
            F.array_distinct(F.split(normalized(F.col("text")), " "))
        ).alias("token"),
    )
    return distinct_kmv(toks)


_KMV_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT lang, {_SQL_HASH.format(expr='token')} AS h
  FROM (
    SELECT lang,
           unnest(list_distinct(string_split({_D_NORM}, ' '))) AS token
    FROM documents
  )
), ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM hashed
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_hashes,
       MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h_k,
       CASE WHEN MAX(CASE WHEN rn = {KMV_K} THEN h END) IS NOT NULL
            THEN CAST({(KMV_K - 1) * P} AS DOUBLE)
                 / CAST(MAX(CASE WHEN rn = {KMV_K} THEN h END) AS DOUBLE)
            ELSE CAST(COUNT(*) AS DOUBLE) END AS est_distinct
FROM ranked
GROUP BY lang
"""


QUERIES = {
    "corpus_inverted_index": corpus_inverted_index,
    "corpus_split_assign": corpus_split_assign,
    "corpus_distinct_kmv": corpus_distinct_kmv,
}

ORACLES = {
    "corpus_inverted_index": _INVERTED_ORACLE,
    "corpus_split_assign": _SPLIT_ORACLE,
    "corpus_distinct_kmv": _KMV_ORACLE,
}
