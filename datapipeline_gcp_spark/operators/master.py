"""Master-layer integration: the 3-way join producing ``m_data_model``.

Reference semantics (``modeling_tables/master_layer/m_data_model.sql:1-19``,
inline variant ``cloud_composer/datapipeline_gcp.py:95-117``):

    campaigns  INNER JOIN  transactions
        ON  c.country = t.country AND c.date_time = t.date_time   (J1)
    INNER JOIN sales
        ON  t.transaction_id = s.transaction_id                    (J2)

J1 is a composite-key many-to-many join (several campaigns and several
transactions can share a (country, timestamp) slot → row fan-out); J2 is
a single-key 1:N join. The business layer's COUNT(DISTINCT ...) exists
to undo that fan-out (SURVEY.md §2.4).

Scale notes
-----------
- J1's key space is (country × second) — low-cardinality country makes
  this skew-prone (the reference generator emits one constant country,
  ``cloud_function/create_campaigns/csv/main.py:29``). AQE skew-join is
  enabled in the session; for known-hot keys, salt via
  ``relational.salted_join``.
- Both joins are plain equi-joins, so Catalyst chooses
  broadcast/shuffled-hash/sort-merge per side sizes; nothing here forces
  a strategy, and AQE can demote to broadcast at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata

#: Canonical master column order (m_data_model.sql:2-13).
MASTER_COLUMNS = (
    "campaign_id",
    "campaign_cost",
    "transaction_id",
    "income",
    "transaction_country",
    "customer_id",
    "product_id",
    "quantity",
    "price",
    "category",
    "transaction_datetime",
)


def master_join(
    campaigns: DataFrame, transactions: DataFrame, sales: DataFrame
) -> DataFrame:
    """Reference-shaped master join over the three raw tables.

    Input schemas are the raw-layer schemas (``schemas.CAMPAIGNS`` etc.).
    Output columns exactly match ``m_data_model.sql:2-13``.
    """
    c = campaigns.alias("c")
    t = transactions.alias("t")
    s = sales.alias("s")
    return (
        c.join(
            t,
            on=[
                F.col("c.country") == F.col("t.country"),
                F.col("c.date_time") == F.col("t.date_time"),
            ],
            how="inner",
        )
        .join(s, on=F.col("t.transaction_id") == F.col("s.transaction_id"), how="inner")
        .select(
            F.col("c.campaign_id"),
            F.col("c.cost").alias("campaign_cost"),
            F.col("t.transaction_id"),
            F.col("t.income"),
            F.col("t.country").alias("transaction_country"),
            F.col("s.customer_id"),
            F.col("s.product_id"),
            F.col("s.quantity"),
            F.col("s.price"),
            F.col("s.category"),
            F.col("t.date_time").alias("transaction_datetime"),
        )
    )


def master_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master join role-mapped onto the driver testdata (FIXTURES.md §4):
    customer→campaigns (dimension side), orders→transactions,
    lineitem→sales (the 1:N fan-out side).

    customer is the small dimension — Catalyst broadcasts it (verified
    via explain at sf0.1); the orders⋈lineitem join shuffles on
    o_orderkey/l_orderkey, the natural co-partitioning key at scale.
    """
    t = load_testdata(spark, sf_dir, ("customer", "orders", "lineitem"))
    return (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey, "inner")
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey, "inner")
        .select(
            F.col("c_custkey").alias("campaign_id"),
            F.col("c_acctbal").alias("campaign_cost"),
            F.col("o_orderkey").alias("transaction_id"),
            F.col("o_totalprice").alias("income"),
            F.col("c_mktsegment").alias("transaction_country"),
            F.col("o_custkey").alias("customer_id"),
            F.col("l_partkey").alias("product_id"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_returnflag").alias("category"),
            F.col("o_orderdate").alias("transaction_datetime"),
        )
    )


#: DuckDB oracle for master_from_testdata — same mapping, ANSI SQL.
MASTER_ORACLE = """
SELECT
  c_custkey      AS campaign_id,
  c_acctbal      AS campaign_cost,
  o_orderkey     AS transaction_id,
  o_totalprice   AS income,
  c_mktsegment   AS transaction_country,
  o_custkey      AS customer_id,
  l_partkey      AS product_id,
  l_quantity     AS quantity,
  l_extendedprice AS price,
  l_returnflag   AS category,
  o_orderdate    AS transaction_datetime
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
"""

QUERIES = {"master_join": master_from_testdata}
ORACLES = {"master_join": MASTER_ORACLE}
