"""BM25 full-text retrieval over the documents table — the lexical
retrieval tier a training-data pipeline uses for contamination probes,
RAG-corpus construction, and "more-like-this" document expansion.

The reference (`ronnygang/datapipeline_gcp`) expresses every lookup as a
BigQuery SQL query; its closest analogue to retrieval is the layered
SELECT-with-derived-columns idiom (modeling_tables/business_layer/*.sql).
This module keeps that declarative shape — BM25 is four aggregations and
two joins, no UDFs — while adding the ranking semantics BigQuery gets
from its SEARCH()/vector extensions.

Query model: "more-like-this" — each of the first ``N_QUERIES``
documents (by ``doc_id``) acts as a query whose term set is its own
distinct vocabulary. That keeps the whole operator self-contained on
driver-provided testdata (TESTDATA.md forbids synthesizing inputs) and
mirrors dedup/contamination probes, where the query corpus IS a slice of
the document corpus.

Scoring: classic Okapi BM25,

    idf(t)      = ln(1 + (N - df + 0.5)/(df + 0.5))
    score(q, d) = Σ_{t ∈ q ∩ d} idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale shape (the part that must survive 100 TB):

- One tokenize+explode pass feeds BOTH the per-(doc, term) tf
  aggregation and (via a second, vocabulary-keyed aggregation over tf —
  already ≪ token rows) the df table. Document lengths come from
  ``size(tokens)`` with NO explode.
- The postings table is pruned FIRST by an inner join against the query
  term set (tiny — N_QUERIES documents' vocabularies — and broadcast),
  so the expensive joins (df, dl, corpus stats) only ever see postings
  for queried terms: cost is driven by query-term document frequency,
  not corpus size, exactly like an inverted-index probe.
- Corpus-level scalars (N, avgdl) ride in via a 1-row cross join —
  computed once, broadcast by AQE.
- Per-term scores are summed per (query, doc) with exact decimal
  arithmetic (`determinism.py`), so the ranking is independent of
  partial-aggregation order; the one libm `ln` is qround'd (repo
  standard, see tfidf_topk) before the sum, and ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import qround, sql_qround
from datapipeline_gcp_spark.functions.dedup import _D_NORM, normalized
from datapipeline_gcp_spark.schemas import load_testdata

K1 = 1.2
B = 0.75
N_QUERIES = 5  # doc_id < N_QUERIES are the "more-like-this" queries
TOP_K = 10
#: per-term scores are exact-decimal-summed at this scale (values are
#: ≤ ~20, so DECIMAL(18,6) holds any realistic per-(query,doc) sum)
_SCORE_DECIMAL = "DECIMAL(18,6)"


def bm25_topk(
    docs: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-``k`` BM25 matches for each of the first ``n_queries`` docs.

    Returns (query_id, rank, doc_id, n_terms, bm25) — ``n_terms`` is the
    count of query terms matched in the document (the join fan-in), a
    useful debugging/quality column the score alone hides.
    """
    toks = docs.select(
        "doc_id", F.split(normalized(F.col("text")), " ").alias("t")
    )
    dl = toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode_outer("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        # integer sum / count: one exact division, engine-identical
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qterms = (
        tf.filter(F.col("doc_id") < n_queries)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    # Prune postings to query terms BEFORE the df/dl/stats joins: the
    # broadcast inner join is the inverted-index probe.
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl_norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    per_term = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qterms.select("term").distinct()), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            qround(idf * tf_d * F.lit(k1 + 1.0) / (tf_d + dl_norm), 6).alias(
                "s"
            ),
        )
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_terms"),
        F.sum(F.col("s").cast(_SCORE_DECIMAL)).cast("double").alias("bm25"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "n_terms", "bm25")
    )


def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    # one input split at fixture scale → spread tokenize+explode work
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return bm25_topk(docs)


_PER_TERM_SCORE = sql_qround(
    f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    f" * CAST(tf AS DOUBLE) * {K1 + 1.0}"
    f" / (CAST(tf AS DOUBLE)"
    f"    + {K1} * ({1.0 - B} + {B} * CAST(dl AS DOUBLE) / avgdl))",
    6,
)

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_D_NORM}, ' ') AS t FROM documents
),
dl AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
),
tf AS (
  SELECT doc_id, unnest(t) AS term FROM toks
),
tfagg AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tf GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfagg GROUP BY term
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, term
  FROM tfagg WHERE doc_id < {N_QUERIES}
),
per_term AS (
  SELECT q.query_id, p.doc_id, {_PER_TERM_SCORE} AS s
  FROM tfagg p
  JOIN qterms q USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  WHERE p.doc_id <> q.query_id
),
scored AS (
  SELECT query_id, doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(CAST(s AS {_SCORE_DECIMAL})) AS DOUBLE) AS bm25
  FROM per_term GROUP BY query_id, doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY bm25 DESC, doc_id
  ) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, n_terms, bm25
FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# dense (embedding-cosine) tiers
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF smoothing constant (Cormack et al.)
#: fuse over the first 5 query docs — the intersection of the BM25 tier's
#: query set (doc_id < 5) and the ANN tier's (vec_id < 10)
RRF_N_QUERIES = N_QUERIES


def rrf_fuse(
    lex: DataFrame, dense: DataFrame, k0: int = RRF_K, k: int = TOP_K
) -> DataFrame:
    """Reciprocal-rank fusion: ``score(d) = Σ_lists 1/(k0 + rank_list(d))``
    over the lexical and dense top-k lists; documents missing from a
    list contribute nothing for it. Returns (query_id, rank, doc_id,
    rrf, lex_rank, den_rank) — the per-list ranks kept for attribution.

    Rank fusion is the production RAG/hybrid-search combiner precisely
    because it needs no score calibration across tiers — only ranks —
    and here that also makes it trivially deterministic: ranks are
    integers, each reciprocal is one correctly-rounded IEEE division,
    and the fused score is ONE addition of two such terms in fixed
    (lexical + dense) order — bit-identical in any engine.

    Scale: both inputs are top-k lists (query-cardinality × k rows —
    metadata scale even at 100 TB corpus, since the expensive work
    happened inside the inverted-index probe and the ANN index); the
    FULL OUTER fusion join and the per-query ranking window run on that
    tiny relation."""
    lex_r = lex.select(
        "query_id",
        F.col("doc_id").alias("id"),
        F.col("rank").alias("lex_rank"),
    )
    den_r = dense.select(
        "query_id",
        F.col("vec_id").alias("id"),
        F.col("rank").alias("den_rank"),
    )
    fused = lex_r.join(den_r, ["query_id", "id"], "full_outer").select(
        "query_id",
        "id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("den_rank")), F.lit(0.0)
            )
        ).alias("rrf"),
        "lex_rank",
        "den_rank",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("id").alias("doc_id"),
            "rrf",
            "lex_rank",
            "den_rank",
        )
    )


def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid more-like-this retrieval: BM25 over ``documents`` fused
    with brute-force cosine over ``embeddings`` (the two tiers the repo
    already gates separately — ``retrieval_bm25_topk`` and
    ``ann_bruteforce_topk``) via reciprocal-rank fusion on the shared
    id space."""
    from datapipeline_gcp_spark.functions import similarity

    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    lex = bm25_topk(docs, n_queries=RRF_N_QUERIES)
    vecs = similarity._prep(spark, sf_dir, with_bucket=False)
    dense = similarity._topk(
        similarity._scored_pairs(
            vecs.filter(F.col("vec_id") < RRF_N_QUERIES), vecs
        )
    )
    return rrf_fuse(lex, dense)


def _rrf_oracle() -> str:
    from datapipeline_gcp_spark.functions import similarity

    return f"""
WITH lex AS (
  SELECT query_id, doc_id AS id, rank AS lex_rank FROM ({_BM25_ORACLE})
),
den AS (
  SELECT query_id, vec_id AS id, rank AS den_rank
  FROM ({similarity._BRUTE_ORACLE})
  WHERE query_id < {RRF_N_QUERIES}
),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.id, d.id) AS id,
         COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
           + COALESCE(1.0 / ({RRF_K} + d.den_rank), 0.0) AS rrf,
         l.lex_rank,
         d.den_rank
  FROM lex l FULL OUTER JOIN den d ON l.query_id = d.query_id AND l.id = d.id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rrf DESC, id) AS BIGINT) AS rank
  FROM fused
)
SELECT query_id, rank, id AS doc_id, rrf, lex_rank, den_rank
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "retrieval_bm25_topk": retrieval_bm25_topk,
    "retrieval_rrf_hybrid": retrieval_rrf_hybrid,
}

ORACLES = {
    "retrieval_bm25_topk": _BM25_ORACLE,
    "retrieval_rrf_hybrid": _rrf_oracle(),
}
