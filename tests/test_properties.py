"""Property-based spot checks (SURVEY.md §5.5): algebraic invariants
that must hold by construction, over hypothesis-varied generator
parameters. Few examples + small n — each example runs Spark jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import within_block_pairs
from datapipeline_gcp_spark.operators.business import b_performance_metrics
from datapipeline_gcp_spark.operators.master import master_join
from datapipeline_gcp_spark.sources import generators as gen

_SETTINGS = dict(max_examples=3, deadline=None)


@given(n=st.integers(50, 300), seed=st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_profit_identity_per_group(spark, n, seed):
    """A2 invariant: total_profit == total_income - total_campaign_cost
    in every group, up to output-cast ulps (each aggregate is exact in
    decimal space, then independently rounded to DOUBLE)."""
    c = gen.gen_campaigns(spark, n=n, seed=seed)
    t = gen.gen_transactions(spark, n=n, seed=seed + 1)
    s = gen.gen_sales(spark, t, seed=seed + 2)
    m = master_join(c, t, s)
    pdf = b_performance_metrics(m).toPandas()
    if len(pdf):
        # each aggregate is exact in decimal space but independently
        # rounded to DOUBLE on output, so the identity holds to ulps,
        # not bit-exactly
        assert (
            (pdf.total_profit - (pdf.total_income - pdf.total_campaign_cost))
            .abs()
            .max()
            < 1e-6
        )
        # ratio invariant: avg transaction value * distinct count == total
        assert (
            (pdf.average_transaction_value * pdf.transaction_count - pdf.total_income)
            .abs()
            .max()
            < 1e-6
        )


@given(seed=st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_master_join_key_alignment(spark, seed):
    """Generators must produce joinable (country, date_time) slots —
    the FIXTURES.md 'critical' property."""
    c = gen.gen_campaigns(spark, n=100, seed=seed)
    t = gen.gen_transactions(spark, n=100, seed=seed)
    s = gen.gen_sales(spark, t, seed=seed)
    assert master_join(c, t, s).count() > 0


@given(sizes=st.lists(st.integers(1, 6), min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_within_block_pairs_combinatorics(spark, sizes):
    """Pair expansion yields exactly C(n,2) ordered pairs per block."""
    rows = [
        (block, block * 1000 + i)
        for block, n in enumerate(sizes)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "block int, item_id bigint")
    pairs = within_block_pairs(df, ["block"], ["item_id"]).select(
        F.col("a.item_id").alias("ia"), F.col("b.item_id").alias("ib")
    ).toPandas()
    want = sum(n * (n - 1) // 2 for n in sizes)
    assert len(pairs) == want
    assert (pairs.ia < pairs.ib).all()


def test_capped_block_pairs_reports_drops(spark, caplog):
    """No-silent-caps: the capped wrapper returns the dropped-block count
    and WARN-logs it; uncapped blocks still expand fully."""
    import logging

    from datapipeline_gcp_spark.functions.dedup import capped_block_pairs

    rows = [(0, i) for i in range(5)] + [(1, 100 + i) for i in range(2)]
    df = spark.createDataFrame(rows, "block int, item_id bigint")
    with caplog.at_level(logging.WARNING):
        pairs, dropped = capped_block_pairs(df, ["block"], ["item_id"], 3)
    assert dropped == 1  # the 5-row block exceeds the cap
    assert pairs.count() == 1  # only the 2-row block's single pair remains
    assert any("dropping 1 block" in r.message for r in caplog.records)

    pairs2, dropped2 = capped_block_pairs(df, ["block"], ["item_id"], 10)
    assert dropped2 == 0
    assert pairs2.count() == 10 + 1  # C(5,2) + C(2,2)


def test_qround_is_engine_identical_on_adversarial_doubles(spark):
    """qround must produce the SAME double in Spark SQL and DuckDB for
    any input — including repr-tie values like 0.285 where plain
    round() provably differs between the engines."""
    import duckdb
    import numpy as np

    from datapipeline_gcp_spark.determinism import sql_qround

    rng = np.random.default_rng(7)
    vals = list(rng.uniform(-1000, 1000, 400))
    # adversarial: values whose shortest repr ends at the tie digit
    vals += [0.285, -0.285, 1.005, 201.5, 0.0000005, -0.0000015, 63.5 / 127]
    expr6 = sql_qround("x", 6)
    expr9 = sql_qround("x", 9)
    sdf = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    sdf.createOrReplaceTempView("qround_probe")
    got_s = spark.sql(
        f"SELECT {expr6} AS q6, {expr9} AS q9 FROM qround_probe"
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    got_d = con.execute(f"SELECT {expr6} AS q6, {expr9} AS q9 FROM t").fetchall()
    for (s6, s9), (d6, d9), v in zip(got_s, got_d, vals):
        assert s6 == d6, (v, s6, d6)
        assert s9 == d9, (v, s9, d9)
