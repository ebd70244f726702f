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
# Narrow operand types for the THREE-factor product in Q1's sum_charge: with
# (18,4) operands the product precision overflows 38 digits, and both engines
# degrade differently (Spark truncates scale, DuckDB falls back to DOUBLE) —
# observed as a last-ULP mismatch at sf0.1. l_extendedprice < 10^7 (4 dp) and
# the (1±x) factors are < 10 (4 dp), so DECIMAL(11,4) × DECIMAL(7,4) ×
# DECIMAL(7,4) → DECIMAL(27,12) stays exact in both engines.
_DECN = "DECIMAL(11,4)"
_DECF = "DECIMAL(6,4)"
_DISCN = f"(CAST(1 AS {_DECF}) - CAST(l_discount AS {_DECF}))"
_CHARGEN = f"(CAST(1 AS {_DECF}) + CAST(l_tax AS {_DECF}))"


def _dbl(expr: str) -> str:
    """Exact-decimal → double through a VARCHAR round-trip.

    Spark's decimal→double cast is correctly rounded
    (``BigDecimal.doubleValue``); DuckDB's goes through an intermediate
    division and can be 1 ULP off for wide scales (measured:
    DECIMAL(38,12) '2786415501.094159' → ...586 direct, ...59 via
    VARCHAR). String→double is correctly rounded in BOTH engines, so the
    round-trip makes the shared SQL produce bit-identical doubles.
    """
    return f"CAST(CAST({expr} AS VARCHAR(64)) AS DOUBLE)"

TPCH_Q1 = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_dbl(f'SUM(CAST(l_quantity AS {_DEC}))')} AS sum_qty,
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}))')} AS sum_base_price,
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC})')} AS sum_disc_price,
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DECN}) * {_DISCN} * {_CHARGEN})')}
    AS sum_charge,
  {_dbl(f'SUM(CAST(l_quantity AS {_DEC}))')} / COUNT(l_quantity) AS avg_qty,
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}))')} / COUNT(l_extendedprice)
    AS avg_price,
  {_dbl(f'SUM(CAST(l_discount AS {_DEC}))')} / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

TPCH_Q3 = f"""
SELECT
  l_orderkey,
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC})')} AS revenue,
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
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC})')} AS revenue
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
  {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC}))')}
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
