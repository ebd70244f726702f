"""Z-order (Morton) data layout: multi-dimensional clustering for
data-skipping at scale.

At 100 TB the dominant cost of selective queries is how many files a
scan must open. Sorting by ONE column gives perfect min/max pruning on
that column and none on any other; interleaving the bits of two (or
more) bucketized dimensions gives every file a tight min/max range on
BOTH — the standard Z-order technique (Delta Lake OPTIMIZE ZORDER,
Hudi clustering). Everything here is closed-form integer bit math —
codegen'd column expressions, no UDFs — and the same expression string
runs on DuckDB, so the key derivation itself is oracle-checked.

Surface:
- :func:`zorder_key` — the Morton key column for two dimensions.
- :func:`write_zordered` — repartitionByRange + sortWithinPartitions on
  the key, then a parquet write: the plan that makes every output file
  cover a contiguous Z-range (unit-tested for per-file min/max
  tightness in ``tests/test_layout.py``).
- ``layout_zorder`` (registered query) — per-Z-bucket min/max spans of
  both dimensions, the measurable clustering-quality statement: each
  bucket bounds BOTH dims, which is exactly why file-level pruning
  works on either predicate.

Reference parity note: the reference delegates layout to BigQuery
partitioning+clustering (`ronnygang/datapipeline_gcp`
cloud_composer/datapipeline_gcp.py:95-117 writes date-partitioned
tables); Z-order is the lake-side equivalent of its clustered-table
declarations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata

#: bits per dimension (8 ⇒ 256 buckets/dim, 16-bit Morton key)
Z_BITS = 8
#: anchor for date bucketization — any fixed literal works; days since
#: the anchor are folded into the bucket space with pmod
_DATE_ANCHOR = "1995-01-01"


def _bucket_key(c: Column, n: int = 1 << Z_BITS) -> Column:
    return F.pmod(c, F.lit(n)).cast("long")


def zorder_key(b1: Column, b2: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave two ``bits``-wide bucket ids: bit i of ``b1``
    lands at position 2i+1, bit i of ``b2`` at 2i. Pure shift/and/or
    arithmetic — one codegen expression, no UDF."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        parts.append(F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def _sql_zorder_key(e1: str, e2: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({e1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({e2} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def orders_zorder_buckets(orders: DataFrame) -> DataFrame:
    """Bucketize (o_custkey, o_orderdate) and attach the Morton key."""
    b1 = _bucket_key(F.col("o_custkey"))
    b2 = _bucket_key(
        F.datediff(F.col("o_orderdate"), F.lit(_DATE_ANCHOR).cast("date")).cast(
            "long"
        )
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        b1.alias("b_cust"),
        b2.alias("b_date"),
        zorder_key(b1, b2).alias("zkey"),
    )


def write_zordered(
    df: DataFrame, path: str, zkey_col: str = "zkey", n_files: int = 16
) -> None:
    """The layout write: range-partition on the Z-key so each output
    file owns a contiguous key range, sort within partitions so pages
    inside a file are clustered too, drop the helper key, write parquet.
    At cluster scale ``n_files`` comes from target file size (~1 GB),
    not a constant."""
    (
        df.repartitionByRange(n_files, F.col(zkey_col))
        .sortWithinPartitions(zkey_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality statement: group rows into Z-buckets (top
    bits of the Morton key ≈ one output file each) and report each
    bucket's span over BOTH source dimensions. Tight spans on both
    columns are the property file-level min/max pruning exploits."""
    orders = load_testdata(spark, sf_dir, ("orders",))["orders"]
    keyed = orders_zorder_buckets(orders)
    return (
        keyed.groupBy(F.shiftright(F.col("zkey"), Z_BITS).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("b_cust").alias("min_cust_b"),
            F.max("b_cust").alias("max_cust_b"),
            F.min("b_date").alias("min_date_b"),
            F.max("b_date").alias("max_date_b"),
        )
    )


_N = 1 << Z_BITS
_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT
    ((o_custkey % {_N}) + {_N}) % {_N} AS b_cust,
    ((date_diff('day', DATE '{_DATE_ANCHOR}', o_orderdate) % {_N}) + {_N}) % {_N}
      AS b_date
  FROM orders
),
z AS (
  SELECT b_cust, b_date,
         {_sql_zorder_key("b_cust", "b_date")} AS zkey
  FROM keyed
)
SELECT zkey >> {Z_BITS} AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(b_cust) AS min_cust_b,
       MAX(b_cust) AS max_cust_b,
       MIN(b_date) AS min_date_b,
       MAX(b_date) AS max_date_b
FROM z GROUP BY 1
"""


QUERIES = {
    "layout_zorder": layout_zorder,
}

ORACLES = {
    "layout_zorder": _ZORDER_ORACLE,
}
