"""URL canonicalization + dedup-by-URL (functions/urls.py).

The canonicalizer is the real operator; the registered query derives
deterministic messy URLs from documents to exercise it. These tests pin
the canonicalization rules on handcrafted URLs (each rule in isolation
and stacked) and the dedup report's survivorship invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.urls import (
    PAGES_PER_SOURCE,
    canonicalize_url,
    docs_url_dedup,
    url_dedup_report,
    with_raw_url,
)

from tests.conftest import SF_CORRECTNESS

CASES = [
    # already canonical → unchanged
    ("https://a.example.com/p/1", "https://a.example.com/p/1"),
    # scheme/host case + www + default port
    ("HTTPS://WWW.A.Example.COM:443/p/1", "https://a.example.com/p/1"),
    # http folds into https; fragment stripped
    ("http://a.example.com/p/1#sec-2", "https://a.example.com/p/1"),
    # trailing slashes stripped
    ("https://a.example.com/p/1///", "https://a.example.com/p/1"),
    # tracking params dropped entirely → no '?'
    ("https://a.example.com/p/1?utm_source=x&ref=rss", "https://a.example.com/p/1"),
    # param order normalized, tracking removed, rest kept
    (
        "https://www.a.example.com/p/1?b=2&a=1&utm_campaign=x",
        "https://a.example.com/p/1?a=1&b=2",
    ),
    # :80 stripped too; empty path survives as empty
    ("http://a.example.com:80", "https://a.example.com"),
    # non-default port is KEPT (it addresses a different server)
    ("https://a.example.com:8443/p/1", "https://a.example.com:8443/p/1"),
]


def test_canonicalize_rules(spark):
    df = spark.createDataFrame(
        [(raw, want) for raw, want in CASES], ["raw", "want"]
    )
    rows = df.select(
        "raw", "want", canonicalize_url(F.col("raw")).alias("got")
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], r["raw"]


def test_dedup_report_survivorship(spark):
    out = docs_url_dedup(spark, SF_CORRECTNESS).collect()
    assert out
    n_docs_total = sum(r["n_docs"] for r in out)
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    assert n_docs_total == docs.count()  # partition, nothing lost
    for r in out:
        # canonical URLs are in canonical form (idempotence)
        assert r["canonical_url"].startswith("https://")
        assert "www." not in r["canonical_url"]
        assert "#" not in r["canonical_url"]
        assert "utm_" not in r["canonical_url"]
        assert 1 <= r["n_spellings"] <= r["n_docs"]


def test_dedup_actually_collapses_spellings(spark):
    """The variant generator must produce multi-spelling groups —
    otherwise the canonicalizer is never exercised by the gate."""
    out = docs_url_dedup(spark, SF_CORRECTNESS).collect()
    multi = [r for r in out if r["n_spellings"] > 1]
    assert len(multi) > len(out) / 2, (len(multi), len(out))


def test_canonical_groups_match_page_grid(spark):
    """Canonical URLs group by page identity, not by spelling: count is
    bounded by the occupied (source, page) grid × 2 — variant 5 keeps
    real query params (?a=1&b=2), a genuinely different resource, so a
    page contributes at most two canonical URLs."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    grid = (
        docs.select("source", (F.col("doc_id") % PAGES_PER_SOURCE).alias("p"))
        .distinct()
        .count()
    )
    n = docs_url_dedup(spark, SF_CORRECTNESS).count()
    assert grid <= n <= 2 * grid, (n, grid)


def test_funnel_monotone_and_conserving(spark):
    """Each stage can only shrink: n_raw >= n_after_url >=
    n_after_content per source, with both stages showing real attrition
    somewhere (the fixture plants same-page re-crawls for the URL stage
    and cross-host exact mirrors for the content stage)."""
    from datapipeline_gcp_spark.functions.urls import dedup_url_content_funnel

    rows = dedup_url_content_funnel(spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        assert r["n_raw"] >= r["n_after_url"] >= r["n_after_content"], r
        assert 0.0 < r["retained_pct"] <= 1.0, r
    assert sum(r["n_raw"] - r["n_after_url"] for r in rows) > 0
    assert sum(r["n_after_url"] - r["n_after_content"] for r in rows) > 0


def test_funnel_content_stage_drops_only_true_duplicates(spark):
    """Recompute stage 2 driver-side: every content-stage drop must be
    a document whose normalized text equals a surviving lower-id
    document's — the exact stage may never delete unique content (the
    near variants' perturbed text is unique, so wherever they survive
    stage 1 they must survive stage 2)."""
    from datapipeline_gcp_spark.functions.dedup import (
        neardup_fixture,
        normalized,
    )
    from datapipeline_gcp_spark.functions.urls import (
        canonicalize_url,
        dedup_url_content_funnel,
        with_raw_url,
    )

    docs = neardup_fixture(spark, SF_CORRECTNESS)
    host_src = F.when(
        F.col("doc_id") >= 500_000, F.concat(F.col("source"), F.lit("-mirror"))
    ).otherwise(F.col("source"))
    canon = with_raw_url(
        docs.select("doc_id", "text", host_src.alias("source"))
    ).select(
        "doc_id",
        F.md5(normalized(F.col("text"))).alias("fp"),
        canonicalize_url(F.col("raw_url")).alias("cu"),
    )
    rows = canon.collect()
    url_min: dict[str, int] = {}
    for r in rows:
        url_min[r["cu"]] = min(url_min.get(r["cu"], r["doc_id"]), r["doc_id"])
    s1 = [r for r in rows if url_min[r["cu"]] == r["doc_id"]]
    fp_min: dict[str, int] = {}
    for r in s1:
        fp_min[r["fp"]] = min(fp_min.get(r["fp"], r["doc_id"]), r["doc_id"])
    n_after_content = sum(1 for r in s1 if fp_min[r["fp"]] == r["doc_id"])
    report = dedup_url_content_funnel(spark, SF_CORRECTNESS).collect()
    assert sum(r["n_after_url"] for r in report) == len(s1)
    assert sum(r["n_after_content"] for r in report) == n_after_content
    # every stage-2 drop shares a fingerprint with a lower-id survivor
    for r in s1:
        if fp_min[r["fp"]] != r["doc_id"]:
            assert fp_min[r["fp"]] < r["doc_id"]


def test_keep_doc_id_is_group_min(spark):
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    raw = with_raw_url(docs.select("doc_id", "source"))
    rep = {r["canonical_url"]: r for r in url_dedup_report(raw).collect()}
    canon = raw.select(
        "doc_id", canonicalize_url(F.col("raw_url")).alias("cu")
    ).collect()
    mins: dict[str, int] = {}
    for r in canon:
        mins[r["cu"]] = min(mins.get(r["cu"], r["doc_id"]), r["doc_id"])
    for cu, m in mins.items():
        assert rep[cu]["keep_doc_id"] == m
