"""Business-layer KPI aggregates A1-A5 (SURVEY.md §2.5).

Each builder takes the master DataFrame (``master.MASTER_COLUMNS``) and
reproduces one reference business table exactly — same group keys, same
aggregate set, same output aliases:

- ``b_sales_kpi``           — ``b_sales_kpi.sql:2-14``
- ``b_performance_metrics`` — ``b_performance_metrics.sql:1-16`` (also
  inline at ``cloud_composer/datapipeline_gcp.py:119-135``)
- ``b_customer_retention``  — ``b_customer_retention.sql:2-13``
- ``b_profitability_kpi``   — ``b_profitability_kpi.sql:2-14``
- ``b_product_performance`` — ``b_product_performance.sql:2-18`` (inline
  ``datapipeline_gcp.py:137-154``; canonical ``b_`` name per SURVEY §1.5.3)

All are single hash aggregations: Spark plans partial (map-side) +
final HashAggregate, so the shuffle carries pre-combined groups — the
right shape at 100 TB. The mixed COUNT(DISTINCT)+SUM aggregates use
Catalyst's expand-based distinct rewrite automatically. Money SUM/AVG
go through exact decimal internals (see ``determinism``) so results are
order- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import (
    davg,
    dsum,
    dsum_diff,
    sql_davg,
    sql_dsum,
    sql_dsum_diff,
)
from datapipeline_gcp_spark.operators.master import MASTER_ORACLE, master_from_testdata

def _country_date() -> list:
    # Built lazily — Column construction needs an active SparkContext.
    return [
        F.col("transaction_country").alias("country"),
        F.to_date("transaction_datetime").alias("date"),
    ]


def b_sales_kpi(master: DataFrame) -> DataFrame:
    """A1 — sales KPI by country and date (``b_sales_kpi.sql:2-14``)."""
    return master.groupBy(*_country_date()).agg(
        F.countDistinct("transaction_id").alias("transaction_count"),
        dsum("income").alias("total_income"),
        davg("income").alias("average_income"),
        dsum_diff("income", "campaign_cost").alias("total_profit"),
    )


def b_performance_metrics(master: DataFrame) -> DataFrame:
    """A2 — A1's aggregates + campaign-cost measures + the post-agg
    ratio SUM(income)/COUNT(DISTINCT transaction_id)
    (``b_performance_metrics.sql:1-16``)."""
    return master.groupBy(*_country_date()).agg(
        F.countDistinct("transaction_id").alias("transaction_count"),
        dsum("income").alias("total_income"),
        dsum("campaign_cost").alias("total_campaign_cost"),
        davg("income").alias("average_income"),
        davg("campaign_cost").alias("average_campaign_cost"),
        dsum_diff("income", "campaign_cost").alias("total_profit"),
        (dsum("income") / F.countDistinct("transaction_id")).alias(
            "average_transaction_value"
        ),
    )


def b_customer_retention(master: DataFrame) -> DataFrame:
    """A3 — conditional distinct counts (``b_customer_retention.sql:2-13``).

    COUNT(DISTINCT CASE WHEN income > 0 THEN customer_id END): the
    un-ELSE'd CASE yields NULL, which count-distinct ignores — Spark's
    ``when`` without ``otherwise`` has identical NULL semantics.
    """
    return master.groupBy(*_country_date()).agg(
        F.countDistinct("customer_id").alias("unique_customers"),
        F.countDistinct(
            F.when(F.col("income") > 0, F.col("customer_id"))
        ).alias("paying_customers"),
        F.countDistinct(
            F.when(F.col("income") == 0, F.col("customer_id"))
        ).alias("non_paying_customers"),
    )


def b_profitability_kpi(master: DataFrame) -> DataFrame:
    """A4 — profitability by product and country, no date key
    (``b_profitability_kpi.sql:2-14``)."""
    return master.groupBy(
        "product_id", F.col("transaction_country").alias("country")
    ).agg(
        dsum("quantity").alias("total_quantity"),
        dsum("income").alias("total_income"),
        davg("income").alias("average_income"),
        dsum_diff("income", "campaign_cost").alias("total_profit"),
    )


def b_product_performance(master: DataFrame) -> DataFrame:
    """A5 — product performance by product, country and date — the
    3-key grouping (``b_product_performance.sql:2-18``)."""
    return master.groupBy(
        "product_id",
        F.col("transaction_country").alias("country"),
        F.to_date("transaction_datetime").alias("date"),
    ).agg(
        F.countDistinct("transaction_id").alias("transaction_count"),
        dsum("quantity").alias("total_quantity"),
        dsum("income").alias("total_income"),
        davg("income").alias("average_income"),
        dsum_diff("income", "campaign_cost").alias("total_profit"),
        (dsum("income") / F.countDistinct("transaction_id")).alias(
            "average_transaction_value"
        ),
    )


BUILDERS = {
    "b_sales_kpi": b_sales_kpi,
    "b_performance_metrics": b_performance_metrics,
    "b_customer_retention": b_customer_retention,
    "b_profitability_kpi": b_profitability_kpi,
    "b_product_performance": b_product_performance,
}

# ---------------------------------------------------------------------------
# Driver-testdata wiring + DuckDB oracles
# ---------------------------------------------------------------------------
# The testdata master (master_from_testdata) has income = o_totalprice,
# which is never 0 — the retention query's income=0 branch would be
# vacuous. For that one query the fixture adaptation maps income to 0 for
# a deterministic 1/7th of transactions (o_orderkey % 7 = 0) so both CASE
# branches are exercised; the reference-shaped pipeline tests cover the
# literal >0/=0 semantics on generated fixtures with real zero incomes.


def _retention_master(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = master_from_testdata(spark, sf_dir)
    return m.withColumn(
        "income",
        F.when(F.col("transaction_id") % 7 == 0, F.lit(0.0)).otherwise(
            F.col("income")
        ),
    )


_RETENTION_MASTER_SQL = f"""
SELECT * REPLACE (
  CASE WHEN transaction_id % 7 = 0 THEN 0.0 ELSE income END AS income
) FROM ({MASTER_ORACLE})
"""


def _q(builder, master_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return builder(master_fn(spark, sf_dir))

    return run


QUERIES = {
    "b_sales_kpi": _q(b_sales_kpi, master_from_testdata),
    "b_performance_metrics": _q(b_performance_metrics, master_from_testdata),
    "b_customer_retention": _q(b_customer_retention, _retention_master),
    "b_profitability_kpi": _q(b_profitability_kpi, master_from_testdata),
    "b_product_performance": _q(b_product_performance, master_from_testdata),
}

#: Oracle SQL per business table, templated on the master relation —
#: rendered against the testdata master for the driver, and against the
#: reference-shaped raw tables in the end-to-end pipeline tests.
ORACLE_TEMPLATES = {
    "b_sales_kpi": f"""
WITH m AS ({{master}})
SELECT
  transaction_country AS country,
  CAST(transaction_datetime AS DATE) AS date,
  COUNT(DISTINCT transaction_id) AS transaction_count,
  {sql_dsum('income')} AS total_income,
  {sql_davg('income')} AS average_income,
  {sql_dsum_diff('income', 'campaign_cost')} AS total_profit
FROM m
GROUP BY 1, 2
""",
    "b_performance_metrics": f"""
WITH m AS ({{master}})
SELECT
  transaction_country AS country,
  CAST(transaction_datetime AS DATE) AS date,
  COUNT(DISTINCT transaction_id) AS transaction_count,
  {sql_dsum('income')} AS total_income,
  {sql_dsum('campaign_cost')} AS total_campaign_cost,
  {sql_davg('income')} AS average_income,
  {sql_davg('campaign_cost')} AS average_campaign_cost,
  {sql_dsum_diff('income', 'campaign_cost')} AS total_profit,
  {sql_dsum('income')} / COUNT(DISTINCT transaction_id)
    AS average_transaction_value
FROM m
GROUP BY 1, 2
""",
    "b_customer_retention": f"""
WITH m AS ({{master}})
SELECT
  transaction_country AS country,
  CAST(transaction_datetime AS DATE) AS date,
  COUNT(DISTINCT customer_id) AS unique_customers,
  COUNT(DISTINCT CASE WHEN income > 0 THEN customer_id ELSE NULL END)
    AS paying_customers,
  COUNT(DISTINCT CASE WHEN income = 0 THEN customer_id ELSE NULL END)
    AS non_paying_customers
FROM m
GROUP BY 1, 2
""",
    "b_profitability_kpi": f"""
WITH m AS ({{master}})
SELECT
  product_id,
  transaction_country AS country,
  {sql_dsum('quantity')} AS total_quantity,
  {sql_dsum('income')} AS total_income,
  {sql_davg('income')} AS average_income,
  {sql_dsum_diff('income', 'campaign_cost')} AS total_profit
FROM m
GROUP BY 1, 2
""",
    "b_product_performance": f"""
WITH m AS ({{master}})
SELECT
  product_id,
  transaction_country AS country,
  CAST(transaction_datetime AS DATE) AS date,
  COUNT(DISTINCT transaction_id) AS transaction_count,
  {sql_dsum('quantity')} AS total_quantity,
  {sql_dsum('income')} AS total_income,
  {sql_davg('income')} AS average_income,
  {sql_dsum_diff('income', 'campaign_cost')} AS total_profit,
  {sql_dsum('income')} / COUNT(DISTINCT transaction_id)
    AS average_transaction_value
FROM m
GROUP BY 1, 2, 3
""",
}

#: Reference-shaped master join as ANSI SQL over the three raw tables —
#: the oracle counterpart of ``master.master_join``.
REFERENCE_MASTER_SQL = """
SELECT
  c.campaign_id,
  c.cost AS campaign_cost,
  t.transaction_id,
  t.income,
  t.country AS transaction_country,
  s.customer_id,
  s.product_id,
  s.quantity,
  s.price,
  s.category,
  t.date_time AS transaction_datetime
FROM r_campaigns AS c
JOIN r_transactions AS t
  ON c.country = t.country AND c.date_time = t.date_time
JOIN r_sales AS s
  ON t.transaction_id = s.transaction_id
"""


def oracle_for(name: str, master_sql: str) -> str:
    """Render a business table's oracle SQL against any master relation."""
    return ORACLE_TEMPLATES[name].format(master=master_sql)


ORACLES = {
    name: oracle_for(
        name,
        _RETENTION_MASTER_SQL if name == "b_customer_retention" else MASTER_ORACLE,
    )
    for name in ORACLE_TEMPLATES
}
