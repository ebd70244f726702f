"""asof_join semantic tests: the matched right row must be carried
whole — including legitimate NULLs in value columns (ASOF returns the
latest row as-is; per-column carry would mix columns from different
right rows)."""

from __future__ import annotations

import datetime as dt

from datapipeline_gcp_spark.operators.asof import asof_join


def _ts(h):
    return dt.datetime(2023, 6, 1, h, 0, 0)


def test_asof_carries_latest_row_with_nulls_intact(spark):
    right = spark.createDataFrame(
        [
            (1, _ts(1), 100.0, "old"),
            (1, _ts(3), None, "new"),  # latest row holds a NULL value
        ],
        "user_id bigint, ts timestamp, price double, tag string",
    )
    left = spark.createDataFrame(
        [(1, _ts(2), "a"), (1, _ts(4), "b")],
        "user_id bigint, ts timestamp, label string",
    )
    out = {
        r.label: r
        for r in asof_join(
            left, right, ts_col="ts", by_cols=["user_id"],
            value_cols=["price", "tag"],
        ).collect()
    }
    # left@2h matches right@1h: both columns from that row
    assert out["a"].price_right == 100.0 and out["a"].tag_right == "old"
    # left@4h matches right@3h: price must be NULL (not resurrected 100.0)
    assert out["b"].price_right is None and out["b"].tag_right == "new"
    assert out["b"].ts_right == _ts(3)


def test_asof_no_preceding_right_row_yields_nulls(spark):
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0)], "user_id bigint, ts timestamp, price double"
    )
    left = spark.createDataFrame(
        [(1, _ts(2), "early")], "user_id bigint, ts timestamp, label string"
    )
    row = asof_join(
        left, right, ts_col="ts", by_cols=["user_id"], value_cols=["price"]
    ).first()
    assert row.price_right is None and row.ts_right is None
