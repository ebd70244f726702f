"""TPC-H-shaped benchmark queries over the driver testdata — the
standard relational stress shapes (wide aggregate scan; selective
join + top-k) expressed once in ANSI SQL and executed verbatim by BOTH
Spark (``spark.sql`` over temp views) and the DuckDB oracle. One string,
two engines — the strongest form of the parity argument.

Q1 (pricing summary): full lineitem scan, 8 aggregates, 2 group keys —
bounded by scan + partial-agg throughput; no join. Q3 (shipping
priority): selective dimension filter → 3-way join → aggregate → global
top-k (Spark plans TakeOrderedAndProject, no full sort). Derived
measures aggregate through exact decimals (multiplication of
DECIMAL(18,4) operands is exact; only the final value returns to
DOUBLE), with a unique-key tie-break on the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipeline_gcp_spark.schemas import load_testdata

_DEC = "DECIMAL(18,4)"
_DISC = f"(CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC}))"
_CHARGE = f"(CAST(1 AS {_DEC}) + CAST(l_tax AS {_DEC}))"

TPCH_Q1 = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC} * {_CHARGE}) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) / COUNT(l_extendedprice)
    AS avg_price,
  CAST(SUM(CAST(l_discount AS {_DEC})) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

TPCH_Q3 = f"""
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC}) AS DOUBLE) AS revenue,
  CAST(o_orderdate AS DATE) AS order_date,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = (SELECT min(c_mktsegment) FROM customer)
  AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-06-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


TPCH_Q5 = f"""
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

TPCH_Q6 = f"""
SELECT
  CAST(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC})) AS DOUBLE)
    AS revenue,
  COUNT(*) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def _run(spark: SparkSession, sf_dir: str, sql: str, tables) -> DataFrame:
    load_testdata(spark, sf_dir, tables)
    return spark.sql(sql)


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, TPCH_Q1, ("lineitem",))


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, TPCH_Q3, ("customer", "orders", "lineitem"))


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir, TPCH_Q5,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, TPCH_Q6, ("lineitem",))


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
}
# the SAME SQL strings are the oracles — dialect-shared ANSI
ORACLES = {
    "tpch_q1": TPCH_Q1,
    "tpch_q3": TPCH_Q3,
    "tpch_q5": TPCH_Q5,
    "tpch_q6": TPCH_Q6,
}
