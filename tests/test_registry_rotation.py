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
    missing = set(queries) - set(oracles) - registry.ROWS_ONLY
    assert not missing, f"queries without DuckDB oracles: {sorted(missing)}"
    # the rows-only set must not quietly accumulate
    assert registry.ROWS_ONLY <= set(queries)
    assert len(registry.ROWS_ONLY) <= 3


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
    last_green, _failed, _latest = registry.correctness_history(_REPO_ROOT)
    # an actively _RECHECK-pinned query is latest-green but deliberately
    # re-queued at the FRONT (its code was rewritten after the green),
    # so it must not anchor the "first proven" position
    pinned = {
        n for n, rnd in registry._RECHECK.items()
        if last_green.get(n, 0) < rnd
    }
    latest_green = _latest_green() - pinned
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


def test_regression_after_green_ranks_as_failure(tmp_path):
    """A red row in a round AFTER a query's last green is a caught
    regression and must rank 0 — an old green may not launder it into
    the stale-green tier (where the backlog would starve it)."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "x": {"rows_match": True, "schema_match": True, "hash_match": True},
        "y": {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "x": {"rows_match": False, "schema_match": True, "hash_match": False},
        "y": {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    last_green, ever_failed, latest = registry.correctness_history(str(tmp_path))
    assert latest == 3
    assert ever_failed == {"x"}          # regressed after its green
    assert last_green["y"] == 3
    rank = lambda n: registry._rotation_rank(n, last_green, ever_failed)  # noqa: E731
    assert rank("x") == 0.0
    assert rank("x") < rank("never-seen") < rank("y")
    # and the inverse order (red r1, green r3) counts as FIXED
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "x": {"rows_match": False, "schema_match": True, "hash_match": False},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "x": {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    _green, failed2, _ = registry.correctness_history(str(tmp_path))
    assert failed2 == set()


def test_no_oracle_visit_is_checked_not_red(tmp_path):
    """The driver writes explicit nulls + err="no_oracle" for a query
    it visited but had no oracle for (CORRECTNESS_r04.json). That row
    must NOT rank as a failure — it would sit at 0.0 forever, burning
    a window slot every round on a query the gate cannot prove
    (VERDICT r4 "What's wrong" #1). It parks in the latest-green tier;
    a _RECHECK pin re-fronts it when the code is made provable."""
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({
        "sketchy": {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": 30, "oracle_rows": None, "err": "no_oracle",
        },
        # a genuine execution failure must still rank red
        "broken": {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": "boom",
        },
    }))
    last_green, ever_failed, latest = registry.correctness_history(str(tmp_path))
    assert latest == 4
    assert "sketchy" not in ever_failed
    assert last_green.get("sketchy") == 4
    assert "broken" in ever_failed
    rank = lambda n: registry._rotation_rank(n, last_green, ever_failed)  # noqa: E731
    assert rank("broken") == 0.0
    assert rank("sketchy") > rank("never-seen")
    # and with a _RECHECK pin at a later round it re-fronts
    orig = registry._RECHECK
    registry._RECHECK = {"sketchy": 5}
    try:
        # recheck tier ranks newest-rewrite-first: 0.5 − 0.001·round
        assert rank("sketchy") == 0.5 - 0.001 * 5
    finally:
        registry._RECHECK = orig


def test_rewritten_since_green_precedes_never_checked_and_stale():
    """A stale green whose module was rewritten after its last green
    (declared in ``registry._RECHECK``) must rank between known
    failures and never-checked entries — otherwise a rewritten operator
    can hide behind its obsolete green row for rounds (VERDICT r3)."""
    last_green = {"rewritten": 1, "stale": 1, "fresh": 3, "satisfied": 2}
    failed = {"red"}
    orig = registry._RECHECK
    registry._RECHECK = {"rewritten": 2, "satisfied": 2}
    try:
        rank = lambda n: registry._rotation_rank(n, last_green, failed)  # noqa: E731
        assert rank("red") < rank("rewritten") < rank("new") < rank("stale") < rank("fresh")
        # a RECHECK pin is inert once a round >= its value re-proves the
        # query: "satisfied" (green r2, rewrite r2) ranks as a plain green
        assert rank("satisfied") > rank("new")
    finally:
        registry._RECHECK = orig


def test_recheck_entries_enter_current_window():
    """Live rewritten-since-green pins must occupy the FRONT of the
    rotation: every one ranks before any unpinned query, and all of them
    sit inside the ~50-entry window whenever they fit. A round may pin
    more than 50 (r8's nulltext + nullkeys fix classes did) — then the
    overflow is the LAST pins by module order and fronts the next
    round's window automatically, but no pin may ever trail a non-pin."""
    order = list(registry.all_queries())
    last_green, failed, _latest = registry.correctness_history(_REPO_ROOT)
    live = [
        name
        for name, rewritten in registry._RECHECK.items()
        if last_green.get(name, 0) < rewritten and name in order
    ]
    if not live:
        return
    worst_pin = max(order.index(n) for n in live)
    # negative-_DEFER names are the judge-requested front-of-line tier
    # (never-proven queries that legitimately outrank recheck pins)
    front = {
        n for n, pos in registry._DEFER.items()
        if pos < 0 and n not in last_green
    }
    first_unpinned = min(
        i
        for i, n in enumerate(order)
        if n not in live and n not in failed and n not in front
    )
    assert worst_pin < first_unpinned, (
        "a live _RECHECK pin ranks behind an unpinned query"
    )
    if len(live) + len(failed) <= 50:
        assert worst_pin < 50, "pins fit the window but one sits outside"


def test_pins_name_registered_queries():
    """Every ``_RECHECK``/``_DEFER`` key must be a registered query name
    (VERDICT r6 "What's wrong" #2: a _DEFER pin naming a nonexistent
    query silently ranked nothing for a whole round — the promised gate
    looked queued while it was simply unbuilt)."""
    names = set(registry.all_queries())
    dangling = (set(registry._RECHECK) | set(registry._DEFER)) - names
    assert not dangling, f"pins naming unregistered queries: {sorted(dangling)}"


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
