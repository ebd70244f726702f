"""Source budget enforcement (functions/corpus.py source_budget_enforce):
the mixture-weight targets turned into an actual greedy selection.

Invariants pinned here (the DuckDB oracle pins exact values):
- conservation: kept + dropped = totals, per source;
- budget honored: tokens_kept ≤ target_tokens, always;
- greedy maximality: the first dropped doc in admission order would
  not have fit (tokens_kept + its n_tokens > target);
- determinism: two runs produce identical reports.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.corpus import (
    BUDGET_BUCKETS,
    _docs,
    corpus_source_budget,
    mixture_weights,
    source_budget_enforce,
)
from datapipeline_gcp_spark.functions.dedup import base_hash
from datapipeline_gcp_spark.functions.text import with_text_metrics

from tests.conftest import SF_CORRECTNESS


def _report(spark):
    return {r["source"]: r for r in corpus_source_budget(spark, SF_CORRECTNESS).collect()}


def test_conservation_and_budget(spark):
    rep = _report(spark)
    assert rep
    for s, r in rep.items():
        assert r["n_docs_kept"] + r["n_docs_dropped"] == r["n_docs"], s
        assert r["tokens_kept"] + r["tokens_dropped"] == r["n_tokens"], s
        assert r["tokens_kept"] <= r["target_tokens"], s
        assert 0.0 <= r["fill_pct"] <= 1.0, s


def test_targets_come_from_mixture(spark):
    """target_s = floor(weight_s × floor(0.6 × total_tokens)) with the
    weights from mixture_weights — the join the operator claims."""
    import math

    rep = _report(spark)
    mix = mixture_weights(
        with_text_metrics(_docs(spark, SF_CORRECTNESS))
    ).collect()
    total = sum(r["n_tokens"] for r in mix)
    budget = math.floor((total * 3) / 5.0)
    for r in mix:
        want = math.floor(r["weight"] * float(budget))
        assert rep[r["source"]]["target_tokens"] == want, r["source"]


def test_greedy_maximality(spark):
    """Recompute the admission order driver-side and check the cut
    point: every kept doc's cumsum fits, and the first dropped doc
    (in order) would overflow the budget."""
    rep = _report(spark)
    d = (
        with_text_metrics(_docs(spark, SF_CORRECTNESS))
        .select(
            "source",
            "doc_id",
            "n_tokens",
            base_hash(F.col("doc_id").cast("string")).alias("h"),
        )
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in d:
        by_src.setdefault(r["source"], []).append(r)
    for s, rows in by_src.items():
        rows.sort(key=lambda r: (r["h"] % BUDGET_BUCKETS, r["h"], r["doc_id"]))
        target = rep[s]["target_tokens"]
        cum, kept, tok_kept = 0, 0, 0
        first_dropped = None
        for r in rows:
            cum += r["n_tokens"]
            if cum <= target:
                kept += 1
                tok_kept += r["n_tokens"]
            elif first_dropped is None:
                first_dropped = r
        assert kept == rep[s]["n_docs_kept"], s
        assert tok_kept == rep[s]["tokens_kept"], s
        if first_dropped is not None:
            assert tok_kept + first_dropped["n_tokens"] > target, s


def test_deterministic_across_runs(spark):
    a = sorted(map(tuple, corpus_source_budget(spark, SF_CORRECTNESS).collect()))
    b = sorted(map(tuple, corpus_source_budget(spark, SF_CORRECTNESS).collect()))
    assert a == b


def test_enforcement_actually_cuts(spark):
    """The 60%-of-corpus budget must make enforcement non-trivial:
    most sources lose documents (near-uniform sources all get ~60%
    targets), none loses everything."""
    rep = _report(spark)
    cut = [s for s, r in rep.items() if r["n_docs_dropped"] > 0]
    assert len(cut) > len(rep) / 2, (len(cut), len(rep))
    assert all(r["n_docs_kept"] > 0 for r in rep.values())
