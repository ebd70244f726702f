"""Guards for the registry's verification-aware rotation.

The driver's correctness gate checks only the first ~50 entries of
``registry.all_queries()`` per round. These tests pin the properties
that keep that window useful: every query has an oracle, and no query
still awaiting proof is pushed behind one the latest round already
proved green.
"""

from __future__ import annotations

import json
import os

from datapipeline_gcp_spark import registry

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_green() -> set[str]:
    last_green, _failed, latest = registry.correctness_history(_REPO_ROOT)
    return {n for n, rnd in last_green.items() if rnd == latest}


def test_every_query_has_an_oracle():
    queries, oracles = registry.all_queries(), registry.all_oracles()
    missing = set(queries) - set(oracles)
    assert not missing, f"queries without DuckDB oracles: {sorted(missing)}"


def test_queries_and_oracles_share_order():
    assert list(registry.all_oracles()) == [
        n for n in registry.all_queries() if n in registry.all_oracles()
    ]


def test_unproven_queries_precede_latest_green():
    """Self-correcting rotation: anything not proven green by the latest
    CORRECTNESS_r*.json artifact must sort ahead of everything that was,
    so the driver's fixed-size check window always spends itself on the
    unproven tail first."""
    order = list(registry.all_queries())
    latest_green = _latest_green()
    if not latest_green:
        return  # no artifacts yet — declaration order is fine
    first_proven = min(
        (order.index(n) for n in latest_green if n in order), default=len(order)
    )
    stragglers = [
        n for n in order[first_proven:] if n not in latest_green
    ]
    assert not stragglers, (
        "unproven queries sorted behind latest-round greens: "
        f"{stragglers} (a new query would miss the driver's check window)"
    )


def test_rotation_rank_prefers_known_failures():
    last_green = {"a": 1, "b": 2}
    failed = {"c"}
    rank = lambda n: registry._rotation_rank(n, last_green, failed)  # noqa: E731
    assert rank("c") < rank("never-seen") < rank("a") < rank("b")


def test_history_parses_committed_artifacts():
    last_green, ever_failed, latest = registry.correctness_history(_REPO_ROOT)
    # round-1 and round-2 artifacts are committed; history must see them
    artifacts = [
        f for f in os.listdir(_REPO_ROOT) if f.startswith("CORRECTNESS_r")
    ]
    if artifacts:
        assert latest >= 1
        assert last_green or ever_failed
        # spot check: every green row in the latest artifact is recorded
        newest = sorted(artifacts)[-1]
        with open(os.path.join(_REPO_ROOT, newest)) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match", True
            ):
                assert name in last_green
