"""Duplicate-cluster resolution: candidate pairs → connected components
→ canonical-document election.

Pair generators (``dedup.py``, ``similarity.py``) emit *edges*; an
actual corpus-dedup pipeline must then partition the duplicate graph
into clusters and keep one canonical document per cluster (the
reference's dedup surface stops at pair SQL for the same reason ours
stops at pairs — clustering is the engine-side step a warehouse cannot
express; cf. ``modeling_tables/business_layer/*.sql`` which always
reduce through GROUP BY, never through a transitive closure).

Algorithm: iterative min-label propagation (each node adopts the
smallest label among itself and its neighbors until fixpoint), the
standard BSP formulation of connected components. Each round is one
shuffle (join edges↔labels + groupBy min) — all built-in DataFrame
ops, whole-stage codegen, no UDFs.

Scale posture (100 TB):

- Rounds = graph diameter. Duplicate graphs are star-shaped
  (copies cluster around an original), so diameter is 2-4 and the
  loop converges in ≤ a handful of rounds; for adversarial long-chain
  graphs the upgrade path is alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond") which converges in O(log n) rounds with the same
  join+min building blocks.
- Lineage is truncated each round with ``localCheckpoint`` —
  an iterative join would otherwise compound the plan and
  re-evaluate every prior round at each action.
- Convergence is detected by the per-round sum of labels: labels
  only ever decrease, so an unchanged sum IS the fixpoint — one
  cheap aggregate per round, no extra join against the previous
  labels.
- ``max_iter`` is a hard bound that RAISES on non-convergence
  (no silent caps — a truncated component map is corrupt output).

Oracle: the same component map computed by DuckDB with a recursive
CTE (transitive closure → MIN(reachable label)), composed on top of
the verbatim MinHash pair CTEs from ``dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions import dedup

#: LSH pairs at or above this signature-match fraction become edges of
#: the duplicate graph (0.5 ≈ Jaccard 0.5 — conservative near-dup).
EDGE_THRESHOLD = 0.5


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Component label (the minimum reachable node id) for every node
    that appears in ``edges``. Returns (node, component).

    Runs eagerly (it is an iterative fixpoint, each round is a Spark
    job); the returned frame is a localCheckpoint — small (two longs
    per noded-in-a-duplicate-pair), already materialized.
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("node")
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        lab = labels.select(F.col("node").alias("lnode"), "label")
        nbr_min = (
            sym.join(lab, sym.nbr == lab.lnode)
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component labels are incomplete; raise max_iter (or switch to "
        "star-contraction for long-chain graphs)"
    )


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-node cluster roll-up: (doc_id, component, cluster_size,
    keep_flag) — keep_flag marks the elected canonical document (the
    minimum doc_id, i.e. the component label itself)."""
    w = Window.partitionBy("component")
    return components.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        F.count("*").over(w).alias("cluster_size"),
        (F.col("node") == F.col("component")).cast("long").alias("keep_flag"),
    )


# ---------------------------------------------------------------------------
# Registered query + oracle
# ---------------------------------------------------------------------------


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs ≥ EDGE_THRESHOLD → connected components →
    canonical election, over the shared near-dup fixture."""
    sigs = dedup.minhash_signatures(dedup.neardup_fixture(spark, sf_dir))
    edges = dedup.lsh_candidate_pairs(sigs).filter(
        F.col("sig_match_frac") >= EDGE_THRESHOLD
    )
    return cluster_summary(connected_components(edges))


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {dedup.MINHASH_PAIR_CTES},
edges AS (
  SELECT doc_a, doc_b FROM scored WHERE sig_match_frac >= {EDGE_THRESHOLD}
),
sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM edges
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM edges
),
reach(node, r) AS (
  SELECT node, node FROM sym
  UNION
  SELECT s.nbr, reach.r FROM reach JOIN sym s ON s.node = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT
  CAST(node AS BIGINT) AS doc_id,
  CAST(component AS BIGINT) AS component,
  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
  CAST(CASE WHEN node = component THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM comp
"""

QUERIES = {"dedup_clusters": dedup_clusters}
ORACLES = {"dedup_clusters": _CLUSTERS_ORACLE}
