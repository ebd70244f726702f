"""Tests for the registered 100 TB swap variants (VERDICT r3 #6).

Each exact operator whose registered form would NOT be the one run at
scale now ships its at-scale twin as a first-class registered query:

- ``events_active_users_hll``: per-day HLL sketch union instead of the
  spine × pairs exact rolling distinct. No DuckDB oracle possible
  (sketches are engine-specific), so accuracy vs the exact twin is
  pinned HERE: every estimate within 5% relative error at lgK default.
- ``customers_rfm_segments_cuts``: broadcast quintile cut values
  instead of three global single-partition ntile windows. This one IS
  oracle-checked (cut semantics are deterministic); the test pins its
  agreement with the ntile twin away from tie boundaries.
"""

from __future__ import annotations

from datapipeline_gcp_spark.operators.analytics import (
    PCT_ACCURACY,
    _active_users_hll_estimates,
    _percentile_approx_estimates,
    customers_rfm_segments,
    customers_rfm_segments_cuts,
    events_active_users,
    events_active_users_hll,
    events_percentiles_approx,
)
from datapipeline_gcp_spark.operators.relational import orders_bloom_semijoin
from datapipeline_gcp_spark.schemas import load_testdata

from tests.conftest import SF_CORRECTNESS


def _events(spark):
    return load_testdata(spark, SF_CORRECTNESS, ("events",))["events"]


def test_hll_active_users_within_tolerance(spark):
    exact = {
        r["day"]: r
        for r in events_active_users(spark, SF_CORRECTNESS).collect()
    }
    approx = _active_users_hll_estimates(_events(spark)).collect()
    assert len(approx) == len(exact)
    for row in approx:
        ref = exact[row["day"]]
        for m in ("dau", "wau", "mau"):
            rel = abs(row[f"{m}_est"] - ref[m]) / max(ref[m], 1)
            assert rel <= 0.05, (row["day"], m, row[f"{m}_est"], ref[m])


def test_hll_contract_query_emits_all_green_flags(spark):
    """The registered gate form (r5 reshape): exact counts + flags,
    one row per exact day, every flag 1 — the same relation the DuckDB
    oracle asserts, checked here without the driver."""
    exact = {
        r["day"]: r
        for r in events_active_users(spark, SF_CORRECTNESS).collect()
    }
    rows = events_active_users_hll(spark, SF_CORRECTNESS).collect()
    assert len(rows) == len(exact)
    for row in rows:
        ref = exact[row["day"]]
        assert (row["dau"], row["wau"], row["mau"]) == (
            ref["dau"], ref["wau"], ref["mau"],
        )
        for flag in ("dau_ok", "wau_ok", "mau_ok", "nested_ok"):
            assert row[flag] == 1, (row["day"], flag)


def test_hll_counts_are_monotone_nested(spark):
    """DAU ⊆ WAU ⊆ MAU as sets; HLL union only raises registers and
    the estimator is monotone in them, so the ESTIMATES must be
    ordered too — deterministically, not just in expectation."""
    for row in _active_users_hll_estimates(_events(spark)).collect():
        assert row["dau_est"] <= row["wau_est"] <= row["mau_est"], row


def test_rfm_cuts_quintiles_well_formed(spark):
    """Every quintile label lands in 1..5, and the value-based cuts on
    the effectively-continuous monetary metric keep buckets near 20%
    (ties can't dominate a metric with distinct per-customer sums)."""
    rows = customers_rfm_segments_cuts(spark, SF_CORRECTNESS).collect()
    from collections import Counter

    m_counts = Counter()
    for r in rows:
        for q in ("r_q", "f_q", "m_q"):
            assert 1 <= r[q] <= 5, r
        m_counts[r["m_q"]] += 1
    for q in range(1, 6):
        assert 0.1 <= m_counts[q] / len(rows) <= 0.3, m_counts


def test_rfm_cuts_monotone_in_monetary(spark):
    """Strictly more spend can never mean a lower monetary quintile —
    the stateless comparison form makes this exact."""
    rows = customers_rfm_segments_cuts(spark, SF_CORRECTNESS).collect()
    by_m = sorted(rows, key=lambda r: r["monetary"])
    for a, b in zip(by_m, by_m[1:]):
        assert a["m_q"] <= b["m_q"], (a, b)


def test_approx_percentiles_honor_gk_rank_contract(spark):
    """Greenwald-Khanna guarantee: each estimate is an actual data
    value whose rank in its group is within n/accuracy of the target
    rank. Checked against the raw values, not the exact-percentile
    twin, because the exact twin interpolates BETWEEN values while GK
    returns a member — rank space is the honest comparison."""
    approx = _percentile_approx_estimates(_events(spark)).collect()
    ev = (
        load_testdata(spark, SF_CORRECTNESS, ("events",))["events"]
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for row in approx:
        vals = sorted(by_type[row["event_type"]])
        n = len(vals)
        assert row["n_events"] == n
        for p, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            est = row[col]
            lo = sum(v < est for v in vals)  # rank range of the estimate
            hi = sum(v <= est for v in vals)
            err = n / PCT_ACCURACY + 1
            assert lo - err <= p * n <= hi + err, (row["event_type"], col)


def test_percentile_contract_query_emits_all_green_flags(spark):
    """The registered gate form (r5 reshape): per-group counts + rank
    contract flags, all 1 — the relation the DuckDB oracle asserts."""
    rows = events_percentiles_approx(spark, SF_CORRECTNESS).collect()
    assert rows
    for row in rows:
        assert row["n_events"] > 0
        for flag in ("p50_ok", "p95_ok", "p99_ok"):
            assert row[flag] == 1, (row["event_type"], flag)


def test_bloom_semijoin_contract(spark):
    """Structure guarantees, data-independent: a bloom filter can NEVER
    produce a false negative (every exact member passes), so
    n_bloom_pass == n_exact + n_false_pos exactly; and at these
    parameters (k=3, ~300 keys, 65k bits) the false-positive rate must
    sit far below the 1% theoretical envelope."""
    for row in orders_bloom_semijoin(spark, SF_CORRECTNESS).collect():
        assert row["n_bloom_pass"] == row["n_exact"] + row["n_false_pos"], row
        assert row["n_bloom_pass"] >= row["n_exact"], row
        if row["fp_rate"] is not None:
            assert row["fp_rate"] < 0.01, row


def test_rfm_cuts_mostly_agree_with_ntile(spark):
    """Cut-based quintiles differ from ntile only where values tie
    across a forced-equal-bucket boundary, and then by at most ONE
    quintile — for ALL THREE metrics (an inverted orientation flips
    labels by up to 4). Agreement floors reflect measured tie density
    at sf0.01 with margin: m_q 100%, r_q 99%, f_q 76% (n_orders is a
    small-integer metric, so ties straddle boundaries often)."""
    ntile = {
        r["o_custkey"]: r
        for r in customers_rfm_segments(spark, SF_CORRECTNESS).collect()
    }
    cuts = customers_rfm_segments_cuts(spark, SF_CORRECTNESS).collect()
    assert len(cuts) == len(ntile)
    agree = {"r_q": 0, "f_q": 0, "m_q": 0}
    for row in cuts:
        ref = ntile[row["o_custkey"]]
        for q in agree:
            assert abs(row[q] - ref[q]) <= 1, (q, row["o_custkey"])
            agree[q] += row[q] == ref[q]
    n = len(cuts)
    assert agree["m_q"] / n > 0.9
    assert agree["r_q"] / n > 0.9
    assert agree["f_q"] / n > 0.6


def test_rfm_cuts_orientation_five_is_best(spark):
    """5 must mean best on every axis: the r_q=5 group is the most
    RECENT (smallest mean days-since-order), f_q=5 the most frequent,
    m_q=5 the biggest spenders. Catches an inverted orientation that
    per-label agreement floors alone might tolerate."""
    import statistics

    rows = customers_rfm_segments_cuts(spark, SF_CORRECTNESS).collect()

    def mean(metric, q_col, q):
        return statistics.mean(r[metric] for r in rows if r[q_col] == q)

    assert mean("r_days", "r_q", 5) < mean("r_days", "r_q", 1)
    assert mean("n_orders", "f_q", 5) > mean("n_orders", "f_q", 1)
    assert mean("monetary", "m_q", 5) > mean("monetary", "m_q", 1)


def test_range_join_rejects_span_scaled_interval(spark):
    """r9 extremes audit (the gap-detection OOM class): an interval with
    corrupt century-wide bounds must fail LOUDLY at the explode guard,
    not materialize ~867k buckets per row. Narrow intervals pass."""
    import pytest
    from pyspark.sql import functions as F

    from datapipeline_gcp_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(1, "2024-01-05 10:30:00", 10)],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ok = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00", "2024-01-05 11:00:00", 1)],
        "user_id long, s string, e string, win_id long",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "win_id",
    )
    got = range_join(points, ok, "ts", "s", "e", ["user_id"]).collect()
    assert len(got) == 1

    corrupt = spark.createDataFrame(
        [(1, "1901-03-07 04:05:06", "2099-11-23 21:22:23", 2)],
        "user_id long, s string, e string, win_id long",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "win_id",
    )
    with pytest.raises(Exception, match="buckets"):
        range_join(points, corrupt, "ts", "s", "e", ["user_id"]).collect()

    # Inverted bounds (end << start) must ALSO raise: a one-sided
    # `b1 - b0 < cap` check passes a negative span, and sequence()
    # with start > stop DESCENDS — materializing the same ~867k-slot
    # array the guard exists to prevent (ADVICE r9, medium).
    inverted = spark.createDataFrame(
        [(1, "2099-11-23 21:22:23", "1901-03-07 04:05:06", 3)],
        "user_id long, s string, e string, win_id long",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "win_id",
    )
    with pytest.raises(Exception, match="buckets"):
        range_join(points, inverted, "ts", "s", "e", ["user_id"]).collect()

    # A NULL bound is NOT corrupt — it flows into sequence() as NULL
    # and the row drops, matching the oracle's inner-join NULL-drop
    # semantics (ADVICE r9, low: the r9 draft guard raised here).
    null_bound = spark.createDataFrame(
        [(1, None, "2024-01-05 11:00:00", 4), (1, "2024-01-05 10:00:00", None, 5)],
        "user_id long, s string, e string, win_id long",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "win_id",
    )
    assert range_join(points, null_bound, "ts", "s", "e", ["user_id"]).count() == 0
