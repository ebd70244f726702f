"""Semantic tests for fixed-point PageRank — the oracle check proves
Spark ≡ DuckDB; these prove rank semantics on known graphs."""

from __future__ import annotations

import pytest

from datapipeline_gcp_spark.functions.clusters import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def test_star_center_dominates(spark):
    """In a star graph the hub must outrank every leaf."""
    e = _edges(spark, _sym([("hub", f"leaf{i}") for i in range(6)]))
    r = {
        row["node"]: row["rank"] for row in pagerank(e, n_nodes=7).collect()
    }
    assert all(r["hub"] > r[f"leaf{i}"] for i in range(6))
    # leaves are symmetric → identical ranks
    leaf_ranks = {r[f"leaf{i}"] for i in range(6)}
    assert len(leaf_ranks) == 1


def test_rank_mass_conserved(spark):
    """Total rank stays ≈ 1 (fixed-point floor loses < 1e-12 per edge,
    and an undirected graph has no dangling mass)."""
    e = _edges(
        spark, _sym([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    )
    ranks = [row["rank"] for row in pagerank(e, n_nodes=4).collect()]
    assert sum(ranks) == pytest.approx(1.0, abs=1e-9)


def test_partitioning_invariance(spark):
    """Fixed-point quantization makes the result independent of how the
    contribution sum is partitioned — the property plain double sums
    lack."""
    pairs = _sym([(f"n{i}", f"n{(i * 7 + 1) % 20}") for i in range(20)])
    e = _edges(spark, pairs)
    a = sorted(pagerank(e, n_nodes=20).collect())
    b = sorted(pagerank(e.repartition(17), n_nodes=20).collect())
    assert a == b


def test_sink_nodes_in_universe(spark):
    """A pure sink (appears only as dst) must be in the node universe,
    receive rank, and count toward n_nodes (ADVICE r2: the old node
    list came from src only, silently dropping sinks)."""
    e = _edges(spark, [("a", "b"), ("c", "b")])  # b is a pure sink
    r = {row["node"]: row["rank"] for row in pagerank(e).collect()}
    assert set(r) == {"a", "b", "c"}
    assert r["b"] > r["a"] == r["c"] > 0


def test_dangling_mass_conserved_on_dag(spark):
    """On a directed chain (dangling tail) total rank stays ≈ 1 because
    the sink's mass is redistributed uniformly each round."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    ranks = [row["rank"] for row in pagerank(e).collect()]
    assert len(ranks) == 4
    assert sum(ranks) == pytest.approx(1.0, abs=1e-9)


def test_dag_partitioning_invariance(spark):
    """Quantized dangling redistribution keeps directed-graph results
    independent of partitioning too."""
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(15)] + [("n3", "n9")]
    e = _edges(spark, pairs)
    a = sorted(pagerank(e).collect())
    b = sorted(pagerank(e.repartition(13)).collect())
    assert a == b


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------

from datapipeline_gcp_spark.functions.clusters import triangle_counts


def _und(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_triangle_known_graph(spark):
    """K4 plus a pendant edge: every K4 vertex sits in C(3,2)=3
    triangles, the pendant in none (and is absent from the output)."""
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    counts = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_und(spark, k4 + [("d", "e")])).collect()
    }
    assert counts == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_free_graph(spark):
    """A 4-cycle (square) has zero triangles."""
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert triangle_counts(_und(spark, sq)).count() == 0


def test_triangle_partitioning_invariance(spark):
    """Counts are independent of input partitioning (degree-ordered
    orientation emits each triangle exactly once either way)."""
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(120)
        }
    )
    a = sorted(triangle_counts(_und(spark, pairs)).collect())
    b = sorted(triangle_counts(_und(spark, pairs).repartition(17)).collect())
    assert a == b and len(a) > 0
