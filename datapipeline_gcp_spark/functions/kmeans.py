"""Distributed k-means (Lloyd's algorithm) over the embeddings table —
the iterative clustering step a training-data pipeline runs to build IVF
coarse quantizers (`similarity.ann_ivf_topk` consumes exactly such
centroids), balance corpus mixtures, and drive semantic dedup beyond
pairwise cosine.

The reference engine (`ronnygang/datapipeline_gcp`) has no iterative
operator — its closest shape is the re-aggregation-after-union CTE
(`modeling_tables/load_campaigns_csv.py:7-88`), a fixed two-level plan.
This module is the genuinely-new capability the Spark port adds: a
fixed-iteration Lloyd loop expressed as a chain of declarative
aggregations (the driver loop only *builds* the plan; no data ever hits
the driver).

Determinism (the whole design problem — float k-means diverges across
engines/partitionings in one iteration):

- Coordinates quantize once to integers, ``qx = floor(x · 2^20)`` —
  exact long arithmetic from then on.
- Assignment distance is the exact integer squared-L2
  ``Σ_d (qx−qc)²`` (≤ 2^42 per dim × 64 dims ≪ 2^63); argmin breaks
  ties on centroid id.
- Centroid update is ``floor(sum(qx)/n)`` — one IEEE double division on
  exact operands (sum ≤ 2^21·n ≪ 2^53), identical in every engine.
- Inertia (the only float output) divides each member's integer
  distance by 2^40 back to data units, qrounds, and sums through exact
  decimals — order- and partitioning-independent.

Scale shape: per iteration, assignment is the standard O(N·D·K)
exploded-integer join — (vec, d, qx) rows against a BROADCAST (d,
cent, qc) table (K·D rows — KB-scale), one codegen hash aggregation on
(vec, cent), one window argmin per vec; the update is one (cluster, d)
aggregation. Nothing shuffles the raw vectors; per-iteration cost is
linear scans. The exploded (vec, d, qx) relation and each iteration's
assign/update state are ``localCheckpoint``-ed (same lineage-truncation
policy as ``clusters.pagerank``/``connected_components``): without the
checkpoints the final plan re-derives every earlier iteration once per
consumer — the subtree DOUBLES per iteration (assign_i feeds both the
cluster roll-up and cents_i) — so a 2-iteration run scanned the
embeddings five times and planning cost grew with 2^iters.

Seeding: the first K corpus vectors by vec_id — deterministic and
engine-independent (k-means++ needs sequential sampling; at 100 TB the
standard practice is k-means|| over a sample, which reduces to this
same assign/update plan over candidate sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.similarity import QUANT, as_double
from datapipeline_gcp_spark.schemas import load_testdata

K = 8
N_ITER = 2
_INERTIA_DECIMAL = "DECIMAL(18,9)"


def _exploded_q(emb: DataFrame) -> DataFrame:
    """(vec_id, d, qx): integer-quantized coordinates, one row per
    dimension."""
    return emb.select(
        "vec_id", F.posexplode(as_double(F.col("embedding"))).alias("d", "x")
    ).select(
        "vec_id", "d", F.floor(F.col("x") * QUANT).cast("long").alias("qx")
    )


def _assign(ex: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cluster, dist): exact-integer argmin assignment of every
    vector to its nearest centroid (squared L2, centroid-id
    tie-break)."""
    diff = F.col("qx") - F.col("qc")
    dists = (
        ex.join(F.broadcast(cents), "d")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cent_id")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cluster"), "dist")
    )


def _update(ex: DataFrame, assign: DataFrame) -> DataFrame:
    """(d, cent_id, qc): mean centroid per cluster, floored back to the
    integer grid (exact double division, see module docstring)."""
    return (
        ex.join(assign.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "d")
        .agg(
            F.floor(
                F.sum("qx").cast("double") / F.count("*").cast("double")
            )
            .cast("long")
            .alias("qc")
        )
        .select(F.col("cluster").alias("cent_id"), "d", "qc")
    )


def kmeans_clusters(
    emb: DataFrame, k: int = K, n_iter: int = N_ITER
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from the first-``k``-vectors
    seed; return per-cluster (cluster, n_members, inertia, coord_sum).

    ``inertia`` is the cluster's summed squared distance in data units
    (the quantity Lloyd monotonically decreases); ``coord_sum`` is an
    integer checksum of the post-iteration centroid, making the whole
    centroid state oracle-comparable without 64 columns.
    """
    ex = _exploded_q(emb).localCheckpoint()
    # seed "qc" is just the quantized coordinate
    cents = ex.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), "d", F.col("qx").alias("qc")
    )
    assign = None
    for _ in range(n_iter):
        assign = _assign(ex, cents).localCheckpoint()
        cents = _update(ex, assign).localCheckpoint()
    inertia_term = F.floor(
        (F.col("dist").cast("double") / F.lit(float(QUANT) ** 2)) * 1e9
        + F.lit(0.5)
    ) / F.lit(1e9)
    per_cluster = assign.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum(inertia_term.cast(_INERTIA_DECIMAL))
        .cast("double")
        .alias("inertia"),
    )
    coord = cents.groupBy(F.col("cent_id").alias("cluster")).agg(
        F.sum("qc").alias("coord_sum")
    )
    return per_cluster.join(coord, "cluster").select(
        "cluster", "n_members", "inertia", "coord_sum"
    )


def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_gcp_spark.functions.similarity import finite_vectors

    emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
    return kmeans_clusters(finite_vectors(emb))


from datapipeline_gcp_spark.functions.similarity import _D_FIN as _FIN  # noqa: E402

_EX = f"""
  SELECT vec_id, u.i - 1 AS d,
         CAST(floor(CAST(embedding[u.i] AS DOUBLE) * {QUANT}) AS BIGINT) AS qx
  FROM (SELECT DISTINCT * FROM embeddings) embeddings,
       UNNEST(generate_series(1, len(embedding))) AS u(i)
  WHERE {_FIN}
"""

_ASSIGN_TMPL = """
dists{n} AS (
  SELECT e.vec_id, c.cent_id,
         CAST(SUM((e.qx - c.qc) * (e.qx - c.qc)) AS BIGINT) AS dist
  FROM ex e JOIN cents{m} c USING (d)
  GROUP BY e.vec_id, c.cent_id
),
assign{n} AS (
  SELECT vec_id, cent_id AS cluster, dist FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
    FROM dists{n}
  ) WHERE rn = 1
),
cents{n} AS (
  SELECT a.cluster AS cent_id, e.d,
         CAST(floor(CAST(SUM(e.qx) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS qc
  FROM ex e JOIN assign{n} a USING (vec_id)
  GROUP BY a.cluster, e.d
)
"""

_KMEANS_ORACLE = (
    f"""
WITH ex AS ({_EX}),
cents0 AS (
  SELECT vec_id AS cent_id, d, qx AS qc FROM ex WHERE vec_id < {K}
),
"""
    + ",\n".join(
        _ASSIGN_TMPL.format(n=i + 1, m=i) for i in range(N_ITER)
    )
    + f"""
SELECT a.cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CAST(floor((CAST(a.dist AS DOUBLE) / {float(QUANT) ** 2})
                            * 1e9 + 0.5) / 1e9
                 AS {_INERTIA_DECIMAL})) AS DOUBLE) AS inertia,
       (SELECT CAST(SUM(qc) AS BIGINT) FROM cents{N_ITER} c
        WHERE c.cent_id = a.cluster) AS coord_sum
FROM assign{N_ITER} a
GROUP BY a.cluster
"""
)


QUERIES = {
    "kmeans_lloyd": kmeans_lloyd,
}

ORACLES = {
    "kmeans_lloyd": _KMEANS_ORACLE,
}
