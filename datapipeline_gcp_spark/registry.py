"""Central query registry: merges every operator module's QUERIES and
ORACLES dicts. ``__spark_entry__`` (the driver contract) re-exports
these. Keys are unique across modules — a collision is a bug and raises
at import time.

Ordering is *verification-aware* (self-correcting rotation): the driver
checks only the first N (~50) entries of ``all_queries()`` per round, so
the registry orders queries by how much they need re-proving:

1. checked-and-FAILED in some ``CORRECTNESS_r*.json`` and never green
   since (highest priority — a known-red fix awaiting proof),
2. rewritten since last green (``_RECHECK``): the implementing code
   changed after the round that proved it, so the green no longer
   covers the shipped code,
3. never checked by any round's gate,
4. green in an old round but not in the latest (stale green — oldest
   green first),
5. green in the latest round's artifact (lowest priority).

Ties keep ``_MODULES`` declaration order, which fronts the modules most
recently modified. Because each round's ``CORRECTNESS_r{N}.json`` lands
in the repo root, the rotation adjusts itself every round without code
changes: whatever the gate did not prove last time goes first next time.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

#: Declaration order doubles as the tie-break for the rotation: modules
#: with the most recent code churn (LLM-pipeline functions) come first so
#: their stale-green entries re-enter the check window before untouched
#: modules' entries do.
_MODULES = [
    "datapipeline_gcp_spark.functions.retrieval",
    "datapipeline_gcp_spark.functions.kmeans",
    "datapipeline_gcp_spark.functions.bpe",
    "datapipeline_gcp_spark.functions.quality",
    "datapipeline_gcp_spark.functions.udfs",
    "datapipeline_gcp_spark.functions.multimodal",
    "datapipeline_gcp_spark.functions.dedup",
    "datapipeline_gcp_spark.functions.clusters",
    "datapipeline_gcp_spark.functions.similarity",
    "datapipeline_gcp_spark.functions.text",
    "datapipeline_gcp_spark.functions.urls",
    "datapipeline_gcp_spark.functions.cleaning",
    "datapipeline_gcp_spark.functions.curation",
    "datapipeline_gcp_spark.functions.corpus",
    "datapipeline_gcp_spark.functions.indexing",
    "datapipeline_gcp_spark.operators.layout",
    "datapipeline_gcp_spark.operators.maintenance",
    "datapipeline_gcp_spark.operators.tpch",
    "datapipeline_gcp_spark.operators.master",
    "datapipeline_gcp_spark.operators.business",
    "datapipeline_gcp_spark.operators.report",
    "datapipeline_gcp_spark.operators.relational",
    "datapipeline_gcp_spark.operators.asof",
    "datapipeline_gcp_spark.operators.analytics",
    "datapipeline_gcp_spark.operators.rangejoin",
    "datapipeline_gcp_spark.sources.generators",
    "datapipeline_gcp_spark.sources.readers",
    "datapipeline_gcp_spark.streaming.windows",
    "datapipeline_gcp_spark.streaming.joins",
    "datapipeline_gcp_spark.streaming.stateful",
    "datapipeline_gcp_spark.streaming.dedup",
    "datapipeline_gcp_spark.streaming.e2e",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries whose implementing code was rewritten AFTER the round that
#: last proved them green — the artifact row no longer covers the
#: shipped code (the rotation cannot see git history, so rewrites are
#: declared here by hand; VERDICT r3 "What's wrong" #2). Maps query
#: name → the round in which the rewrite landed. An entry is inert once
#: a round >= that value records the query green again, so the set is
#: self-cleaning: stale pins cost nothing and can be pruned lazily.
_RECHECK: dict[str, int] = {
    # (r5 pins pruned: both reshaped sketch twins were proven green in
    # r5 — CORRECTNESS_r05.json — making them inert; earlier rounds'
    # pins pruned the same way.)
    # r6 rewrote this gate's body + the archival machinery under it
    # without pinning (VERDICT r6 "What's wrong" #1) — re-prove on the
    # shipped code; r7 additionally adds the parquet landing branch to
    # the shared ``streaming/ingest.py`` reader both event gates ride.
    "events_stream_e2e_ingest_gate": 7,
    "events_stream_crossrun_redelivery_gate": 7,
    # r7 adds the id-floor guard (ADVICE r6) inside the query body
    "dedup_clusters_incremental": 7,
    # r7 makes the DPP layer write once per (session, sf) (ADVICE r6)
    "orders_partition_pruned_join": 7,
    # r7 rewrote ``grams_of`` (element_at → try_element_at: a plain OOB
    # element_at THROWS under ANSI — Spark 4 default and the driver's
    # vanilla session — so sub-n-token documents crashed every shingle
    # consumer; caught by the containment property test shrinking to
    # single-token docs). Output is identical on gate data, but every
    # shingle-consuming green outside the r7 window must re-prove on
    # the shipped code; the in-window consumers (dedup_minhash_lsh,
    # text_repetition, contamination_eval_vs_train, the new gates)
    # re-prove without pins.
    "dedup_verified": 7,
    "dedup_incremental": 7,
    "dedup_minhash_calibration": 7,
    "dedup_clusters": 7,
    "dedup_ngram_jaccard": 7,
    "dedup_substring": 7,
    # r7: bpe_train stops early at pair exhaustion instead of raising
    # a bare IndexError (empty-input robustness probe)
    "bpe_train_merges": 7,
    # r7: pagerank returns an empty rank frame on an empty graph
    # instead of ZeroDivisionError (same probe)
    "graph_pagerank": 7,
    # r7: multimodal workers skip NULL payloads (bytes(None) killed the
    # Arrow worker; an absent/corrupt object must not fail the job)
    "multimodal_feature_extract": 7,
    "multimodal_frame_sample": 7,
    "multimodal_resize": 7,
    "multimodal_phash_dedup": 7,
    # r7: sample_weight guarded with nullif — a zero per-mille stratum
    # rate crashed at PLAN time under ANSI constant folding
    "corpus_stratified_sample": 7,
    # r7: ANSI divide-by-zero guards — under Spark 4's default ANSI
    # mode a double division by zero THROWS (DuckDB returns NULL), so
    # zero-magnitude embeddings crashed every cosine consumer and a
    # zero sampling weight crashed weighted_sample. cosine() now
    # nullif-guards (NULL, exactly the oracle's semantics); every
    # cosine consumer outside the window is pinned below. The r3-tier
    # consumers re-prove without pins, but the pins push the last two
    # CODE-UNCHANGED r3-stale entries (corpus_unigram_logprob,
    # corpus_datacard) out of the 50-slot window — accepted trade
    # (VERDICT r6 #5 anticipated displacement; an unpinned rewrite is
    # the worse violation), they re-front in r8. Two sibling guards
    # are DEFERRED to r8 for the same window arithmetic: text-ratio
    # divisions on empty documents (functions/text.py, would pin
    # text_metrics + corpus_mixture_weights + corpus_source_budget)
    # and the funnel n1=0 conversion rate (operators/analytics.py,
    # would pin events_funnel).
    "dedup_semantic": 7,
    "ann_ivf_cell_stats": 7,
    "mining_hard_negatives": 7,
    "ann_bruteforce_topk": 7,
    "ann_lsh_topk": 7,
    "embedding_cosine_neardup": 7,
    # grams_of consumers pushed past slot 50 by the pins above
    "dedup_minhash_lsh": 7,
    "text_repetition": 7,
    # weighted_sample itself rewrote (try_divide) — pin per policy
    # (its r4-tier rank happened to sit at slot 49, but policy rank is
    # 0.5, not luck)
    "corpus_weighted_sample": 7,
    # line_filter kept_frac try_divide-guarded (zero-line document) —
    # window-neutral pin: text_line_filter already sat in the r7
    # window as r3-stale
    "text_line_filter": 7,
    # readability ratios nullif-guarded (a zero-[a-z]-word document —
    # digits-only or non-Latin — crashed both divisions under ANSI;
    # DuckDB double/0 is NULL so the oracle string is unchanged).
    # Window-neutral: text_readability already sat in the r7 window
    # as r3-stale
    "text_readability": 7,
    # centroid-ranking division nullif-guarded in ann_ivf_topk /
    # ann_ivf_cell_stats / dedup_semantic (a zero padding vector among
    # the centroid seeds has cnorm = 0 → ANSI throw; DuckDB yields
    # NULL, ordered last by DESC in both engines). cell_stats and
    # semantic were already pinned above; ann_ivf_topk sat in the r7
    # window as r3-stale — window-neutral
    "ann_ivf_topk": 7,
    # r7 empty-corpus sweep (tools/make_degenerate_fixtures.py +
    # driver_sim at SIM_SF=empty): every registered query run against
    # ZERO-row tables with the DuckDB oracle as arbiter found five fix
    # classes; each touched green below re-proves per policy. Eight of
    # nine are out-of-window pins — they displace the window tail's
    # r3-stale refreshes into r8 (accepted: an unpinned rewrite is the
    # worse violation, VERDICT r6 #2).
    # (a) driver-side types[0] crash on empty events (shared split
    #     helper — NULL-literal filter mirrors the oracle's min/max)
    "asof_join_events": 7,
    "asof_join_forward_events": 7,
    # (b) ANSI grand-total patch-up: Spark's Expand-based grouping sets
    #     emit nothing from nothing; ANSI and DuckDB emit the () row —
    #     unioned a COUNT(*)=0-gated global aggregate (hot path
    #     untouched)
    "rollup_agg": 7,
    "cube_agg": 7,
    "grouping_sets_agg": 7,
    "corpus_datacard": 7,
    # (c) funnel conv_rate n1=0 nullif guard (the r7-deferred sibling,
    #     now sweep-proven)
    "events_funnel": 7,
    # (d) profile: format_string renders NULL as the literal 'null'
    #     (DuckDB printf yields NULL) + SUM-over-empty vs COUNT(*)=0
    "lineitem_profile": 7,
    # (e) gate row-count expectation now skips no-data batches, exactly
    #     as process() does (in-window already — neutral)
    "dedup_stream_incremental_gate": 7,
    # r7 (late): the previously-DEFERRED with_text_metrics ratio guards
    # — an empty document (n_chars = 0) threw under ANSI; nullif = the
    # oracle's BIGINT/0 NULL (probed directly: DuckDB 3/0 IS NULL).
    # 38 pins + 5 defers left 7 window slots, so these four fit without
    # pushing any pinned recheck out (they displace 4 more r3/r4-stale
    # tail entries into r8). All four consumers of the shared helper:
    "text_metrics": 7,
    "corpus_mixture_weights": 7,
    "corpus_source_budget": 7,
    "corpus_curation": 7,
    # boiler_frac nullif-guarded (zero-line document — the latent
    # sibling of line_filter's kept_frac crash; fixture never reaches
    # it, property test does)
    "text_boilerplate_lines": 7,
    # seasonality change ratios nullif-guarded (a zero-revenue month's
    # successor divided by 0 under ANSI; DuckDB double/0 is NULL).
    # 45 pins + 5 defers = the window is now exactly full.
    "orders_monthly_seasonality": 7,
}

#: Newly-registered queries that must NOT jump ahead of the existing
#: never-checked backlog (VERDICT r3 next-steps #1: the check window is
#: ~50 entries and the backlog fills it). Ranked after never-checked
#: but before every green, so they enter the window as the backlog
#: drains; an entry goes inert once the query has any green row. The
#: VALUE is an explicit queue position within the tier (lower = enters
#: the window sooner) — module declaration order is the wrong tie-break
#: for a hand-prioritized queue.
_DEFER: dict[str, int] = {
    # (r3-r5 entries pruned: all nine carried green rows by r5 —
    # CORRECTNESS_r04/r05.json — making them inert.)
    # (r6 entries pruned: crossrun gate / DPP proof / incremental CC all
    # carry r6 greens — inert.)
    # r7 registrations (VERDICT r6 next-steps #2/#6). The r7 window:
    # 3 _RECHECK pins + these two + the 24 r3-stale greens = 29 slots,
    # leaving ~21 for the oldest r4 tier.
    "multimodal_stream_ingest_gate": 0,  # r6 verdict #2 (r5 #6b)
    "dedup_stream_incremental_gate": 1,  # r6 verdict #6
    "retrieval_rrf_hybrid": 2,  # hybrid lexical+dense rank fusion
    "dedup_containment": 3,  # asymmetric-Jaccard excerpt detection
    "corpus_dsir_select": 4,  # DSIR importance weighting (Xie 2023)
}

#: Queries with NO DuckDB oracle, each for a declared reason — the
#: driver records the weaker rows-only check for these and the judge
#: sees which. Kept deliberately tiny; ``tests/test_registry_rotation``
#: enforces that every other query ships an oracle.
ROWS_ONLY: set[str] = set()
# (Empty since r5: the two sketch twins — formerly here because HLL /
# GK summaries have no DuckDB bit-twin — now emit their accuracy
# contract AS DATA (group keys + exact counts + within-bound flags
# computed against the exact twin in the same job), a deterministic
# relation DuckDB can oracle directly. The tighter numeric bounds stay
# pinned in ``tests/test_analytics_scale_variants``.)


def correctness_history(root: str = _REPO_ROOT) -> tuple[dict[str, int], set[str], int]:
    """Parse every ``CORRECTNESS_r*.json`` in *root*.

    Returns ``(last_green_round, ever_failed, latest_round)`` where
    ``last_green_round[name]`` is the newest round whose gate proved
    *name* green (rows+schema+hash all matching) and ``ever_failed`` is
    the set of names that appear in some artifact without a full match.
    Missing/corrupt artifacts are skipped — an empty history degrades to
    plain declaration order.
    """
    last_green: dict[str, int] = {}
    last_red: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        latest = max(latest, rnd)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                # rows-only checks (no oracle) have no hash key; count
                # them green on rows+schema so they rotate like the rest
                and row.get("hash_match", True)
            )
            # An oracle-less query the driver visited but could not
            # check (it writes explicit nulls + err="no_oracle" rather
            # than omitting the keys — CORRECTNESS_r04.json) is
            # checked-NOT-red: counting it red would rank it 0.0
            # forever and burn a window slot every round on a query
            # the gate cannot prove (VERDICT r4 "What's wrong" #1).
            # Recording it green parks it in the latest-green tier;
            # a _RECHECK pin re-fronts it if its code is later made
            # provable.
            # ... but only when the row carries no real verdict: an
            # artifact that somehow recorded BOTH a mismatch and the
            # no_oracle err must stay red, not be laundered green.
            if row.get("err") == "no_oracle" and row.get("rows_match") is None:
                green = True
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_red[name] = max(last_red.get(name, 0), rnd)
    # "failed" means the most RECENT verdict is red — a green from an
    # older round must not launder a later regression out of rank 0
    # (each query appears at most once per round's artifact, so the
    # comparison is well-defined).
    ever_failed = {
        n for n, r in last_red.items() if r > last_green.get(n, 0)
    }
    return last_green, ever_failed, latest


def _rotation_rank(
    name: str, last_green: dict[str, int], ever_failed: set[str]
) -> float:
    if name in ever_failed:
        return 0.0  # checked and red, fix unproven — front of the line
    if name in last_green and last_green[name] < _RECHECK.get(name, 0):
        return 0.5  # green, but the code was rewritten since — re-prove
    if name not in last_green:
        # new registrations queue behind the existing never-checked
        # backlog instead of displacing it from the check window,
        # in their declared order (the 0.01 step keeps the whole
        # deferred tier inside (1, 2))
        if name in _DEFER:
            return 1.5 + 0.01 * _DEFER[name]
        return 1.0
    return 2.0 + last_green[name]  # stale green first, latest green last


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in getattr(mod, "QUERIES", {}):
                raise ValueError(f"oracle {name!r} in {modname} has no query")
            oracles[name] = sql

    last_green, ever_failed, _ = correctness_history()
    order = sorted(queries, key=lambda n: _rotation_rank(n, last_green, ever_failed))
    queries = {n: queries[n] for n in order}
    oracles = {n: oracles[n] for n in order if n in oracles}
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
