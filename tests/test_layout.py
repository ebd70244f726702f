"""Z-order layout: the write must produce files whose min/max spans are
tight on BOTH dimensions — the property file-level pruning exploits."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from datapipeline_gcp_spark.operators.layout import (
    Z_BITS,
    orders_zorder_buckets,
    write_zordered,
    zorder_key,
)
from datapipeline_gcp_spark.schemas import load_testdata

from tests.conftest import SF_CORRECTNESS


def test_zorder_key_is_morton(spark):
    # spot-check the interleave against a pure-python reference
    df = spark.range(0, 300).selectExpr(
        "id % 17 AS a", "CAST(id % 13 AS LONG) AS b"
    )
    from pyspark.sql import functions as F

    got = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()

    def morton(a, b):
        z = 0
        for i in range(Z_BITS):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for r in got:
        assert r.z == morton(r.a, r.b), (r.a, r.b)


def test_write_zordered_files_bound_both_dims(spark, tmp_path):
    orders = load_testdata(spark, SF_CORRECTNESS, ("orders",))["orders"]
    keyed = orders_zorder_buckets(orders)
    out = str(tmp_path / "zorders")
    write_zordered(keyed, out, n_files=8)

    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) >= 4  # range partitioner may merge sparse ranges

    # Each file must cover a NARROW zkey range (contiguous ranges, no
    # overlap) — and therefore bound both bucketized dims far tighter
    # than the full 0..255 domain on average.
    spans = []
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["zkey", "b_cust", "b_date"])
        zmin, zmax = min(t["zkey"].to_pylist()), max(t["zkey"].to_pylist())
        ranges.append((zmin, zmax))
        spans.append(
            (
                max(t["b_cust"].to_pylist()) - min(t["b_cust"].to_pylist()),
                max(t["b_date"].to_pylist()) - min(t["b_date"].to_pylist()),
            )
        )
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "zkey ranges overlap across files"

    # average span per dim must beat the unclustered expectation (~255)
    avg_cust = sum(s[0] for s in spans) / len(spans)
    avg_date = sum(s[1] for s in spans) / len(spans)
    assert avg_cust < 200 and avg_date < 200, (avg_cust, avg_date)
