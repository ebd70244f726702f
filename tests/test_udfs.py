"""Pin the Python-extension operators' semantics: NFKC against known
Unicode cases, robust z-score against numpy."""

from __future__ import annotations

import numpy as np
import pytest

from datapipeline_gcp_spark.functions.udfs import (
    robust_zscore_per_group,
    with_nfkc_normalized,
)


def test_nfkc_known_cases(spark):
    cases = [
        (1, "ﬁle"),          # ligature fi → "file"
        (2, "Ｈｅｌｌｏ"),     # full-width → "Hello"
        (3, "a  b"),     # nbsp + space collapse
        (4, None),
    ]
    df = spark.createDataFrame(cases, "id long, text string")
    got = {r.id: r.text_nfkc for r in with_nfkc_normalized(df).collect()}
    assert got[1] == "file"
    assert got[2] == "Hello"
    assert got[3] == "a b"
    assert got[4] is None


def test_robust_zscore_matches_numpy(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([1, 2, 2, 3, 100])]
    rows += [(2, 10, 5.0), (2, 11, 5.0)]  # zero-MAD group
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    got = robust_zscore_per_group(df, ["user_id"], "value").toPandas()

    g1 = got[got.user_id == 1].sort_values("event_id")
    v = np.array([1, 2, 2, 3, 100.0])
    med = np.median(v)
    mad = np.median(np.abs(v - med))
    want = (v - med) / (1.4826 * mad)
    assert np.allclose(g1.robust_z.to_numpy(), want)
    # outlier stands out despite itself inflating a plain std
    assert g1.robust_z.abs().max() > 50

    g2 = got[got.user_id == 2]
    assert (g2.robust_z == 0.0).all()


def test_zero_mad_group_with_null_measure_all_three_agree(spark):
    """ADVICE r8: in a zero-MAD group containing NULL measures, the
    grouped-map variant, the built-in two-pass variant, and the shared
    DuckDB oracle must agree on "NULL measure → NULL score" — the 0.0
    zero-MAD fallback applies only to rows that HAVE a measure. The
    driver fixtures never produce this shape, so pin it here."""
    import duckdb

    from datapipeline_gcp_spark.functions.udfs import robust_zscore_builtin

    rows = [(1, 10, 5.0), (1, 11, 5.0), (1, 12, None), (2, 20, None)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, value double"
    )
    want = {10: 0.0, 11: 0.0, 12: None, 20: None}

    for variant in (robust_zscore_per_group, robust_zscore_builtin):
        got = {
            r.event_id: r.robust_z
            for r in variant(df, ["user_id"], "value").collect()
        }
        assert got == want, variant.__name__

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1, 10, 5.0), (1, 11, 5.0), (1, 12, NULL), (2, 20, NULL)"
        ") t(user_id, event_id, value)"
    )
    from datapipeline_gcp_spark.functions.udfs import _ZSCORE_ORACLE

    oracle = {
        r[1]: r[3] for r in con.execute(_ZSCORE_ORACLE).fetchall()
    }
    assert oracle == want
