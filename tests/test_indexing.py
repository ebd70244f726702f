"""Semantic tests for corpus indexing/partitioning (inverted index,
hash split, KMV sketch) — the oracle check proves Spark ≡ DuckDB on the
fixture; these prove the semantics on crafted inputs with known
answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions import indexing


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_inverted_index_postings_and_df(spark):
    df = _docs(
        spark,
        [
            (1, "apple banana"),
            (2, "apple apple cherry"),  # within-doc dup counted once
            (3, "apple banana"),
            (4, "durian"),
        ],
    )
    out = (
        indexing.inverted_index(df, cap=2, min_df=1)
        .toPandas()
        .set_index("token")
    )
    # df counts documents (not occurrences), postings capped at 2 but
    # df still sees all documents
    assert out.loc["apple", "df"] == 3
    assert out.loc["apple", "postings"] == "1,2"
    assert out.loc["banana", "df"] == 2
    assert out.loc["banana", "postings"] == "1,3"
    assert out.loc["cherry", "df"] == 1
    assert out.loc["durian", "postings"] == "4"


def test_inverted_index_min_df_filters(spark):
    df = _docs(spark, [(1, "common rare1"), (2, "common rare2")])
    toks = set(
        indexing.inverted_index(df, cap=5, min_df=2)
        .toPandas()["token"]
    )
    assert toks == {"common"}


def test_split_assign_deterministic_and_stable_under_growth(spark):
    """The split of a document depends only on its id: adding documents
    later never moves an old document to a different split (the
    property a shuffle+slice split lacks)."""
    small = _docs(spark, [(i, f"doc {i}") for i in range(50)])
    big = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    s_small = {
        r["doc_id"]: r["split"]
        for r in indexing.split_assign(small).collect()
    }
    s_big = {
        r["doc_id"]: r["split"]
        for r in indexing.split_assign(big).collect()
    }
    assert all(s_big[k] == v for k, v in s_small.items())
    # ratios roughly honor the 80/10/10 buckets over a larger draw
    from collections import Counter

    c = Counter(s_big.values())
    assert c["train"] > c["valid"] and c["train"] > c["test"]
    assert set(c) == {"train", "valid", "test"}


def test_kmv_estimate_accuracy_and_small_group_fallback(spark):
    """KMV estimate lands within the standard ~1/sqrt(K) error band on
    a group with >> K distinct values; a group with < K values returns
    the exact count."""
    rows = [("big", f"tok{i}") for i in range(5000)] + [
        ("small", f"s{i}") for i in range(10)
    ]
    toks = spark.createDataFrame(rows, ["lang", "token"])
    out = indexing.distinct_kmv(toks, k=64).toPandas().set_index("lang")
    big = out.loc["big"]
    assert big["n_hashes"] == pytest.approx(5000, abs=5)  # md5 collisions ~0
    # 3-sigma band for K=64 is ~38%
    assert abs(big["est_distinct"] - 5000) / 5000 < 0.4
    small = out.loc["small"]
    assert small["h_k"] is None or bool(small.isna()["h_k"])
    assert small["est_distinct"] == small["n_hashes"]


def test_kmv_partial_merge_equals_global(spark):
    """Mergeability: the sketch built from a repartitioned frame equals
    the sketch from the original — the property that makes it one
    partial+final aggregation at scale."""
    rows = [("en", f"tok{i}") for i in range(2000)]
    toks = spark.createDataFrame(rows, ["lang", "token"])
    a = indexing.distinct_kmv(toks, k=64).collect()[0]
    b = indexing.distinct_kmv(toks.repartition(13), k=64).collect()[0]
    assert a["h_k"] == b["h_k"] and a["est_distinct"] == b["est_distinct"]


def test_funnel_click_before_first_view_does_not_count(spark):
    from datetime import datetime

    from datapipeline_gcp_spark.operators.analytics import funnel

    rows = [
        # user 1: proper view -> click -> purchase
        (1, "view", datetime(2024, 1, 1, 10)),
        (1, "click", datetime(2024, 1, 1, 11)),
        (1, "purchase", datetime(2024, 1, 1, 12)),
        # user 2: click BEFORE first view — must stop at stage 1
        (2, "click", datetime(2024, 1, 1, 9)),
        (2, "view", datetime(2024, 1, 1, 10)),
        # user 3: view then purchase but no click — purchase must not count
        (3, "view", datetime(2024, 1, 1, 10)),
        (3, "purchase", datetime(2024, 1, 1, 11)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = funnel(ev).toPandas().set_index("stage")
    assert out.loc["view", "n_users"] == 3
    assert out.loc["click", "n_users"] == 1
    assert out.loc["purchase", "n_users"] == 1
    assert out.loc["purchase", "conv_rate"] == 1 / 3


def test_resample_ffill_gap_days_carry_last_value(spark):
    from datetime import datetime

    from datapipeline_gcp_spark.operators.analytics import resample_ffill

    rows = [
        (7, "view", datetime(2024, 3, 1, 9), 10.0, 1),
        (7, "view", datetime(2024, 3, 1, 18), 11.0, 2),  # same-day later obs wins
        # 3/2 and 3/3 have no observations -> carry 11.0
        (7, "view", datetime(2024, 3, 4, 8), 12.0, 3),
        (9, "view", datetime(2024, 3, 2, 12), 5.0, 4),  # single-day key
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_type", "ts", "value", "event_id"]
    )
    out = resample_ffill(ev).toPandas()
    u7 = out[out.user_id == 7].sort_values("day").reset_index(drop=True)
    assert list(u7["value"]) == [11.0, 11.0, 11.0, 12.0]
    assert list(u7["has_obs"]) == [1, 0, 0, 1]
    assert len(out[out.user_id == 9]) == 1


def test_weighted_sample_prefers_heavy_docs(spark):
    """Inclusion probability scales with weight: a doc 1000x heavier
    than the rest must make a small sample; near-zero-weight docs
    mostly should not."""
    from datapipeline_gcp_spark.functions.corpus import weighted_sample

    rows = [(i, "web", 10) for i in range(200)] + [(999, "web", 10_000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    picked = {
        r["doc_id"] for r in weighted_sample(docs, k=20).collect()
    }
    assert 999 in picked
    assert len(picked) == 20


def test_weighted_sample_deterministic_rerun(spark):
    from datapipeline_gcp_spark.functions.corpus import weighted_sample

    rows = [(i, "s", 50 + i) for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    a = weighted_sample(docs, k=30).collect()
    b = weighted_sample(docs.repartition(11), k=30).collect()
    assert a == b
