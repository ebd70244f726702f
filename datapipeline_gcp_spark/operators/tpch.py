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


# ---------------------------------------------------------------------------
# Wider TPC-H coverage over the trimmed driver schema. The testdata lacks
# partsupp and several attribute columns (l_commitdate/l_receiptdate,
# l_shipmode, p_container, c_phone, o_comment), so queries that depend on
# them are re-shaped onto available columns while keeping the STRUCTURAL
# stress point intact (the exists semi-join of Q4, the two-nation volume
# matrix of Q7, the market-share ratio of Q8, the outer-join double
# aggregation of Q13, the correlated scalar subquery of Q17, the
# disjunctive join predicate of Q19, the anti-join of Q22). Predicate
# constants are chosen against the generated distributions so each query
# returns a non-trivial, stable result. All money math follows the Q1
# pattern: exact DECIMAL internally, one VARCHAR-roundtrip cast to DOUBLE
# at the end (`_dbl`) so both engines emit bit-identical values; float
# literals are written `2e-1`-style because a bare `0.2` parses as
# DECIMAL in Spark SQL and decimal-contagions the output type.
# ---------------------------------------------------------------------------

_QTY = f"CAST(l_quantity AS {_DEC})"
_REV = f"CAST(l_extendedprice AS {_DEC}) * {_DISC}"

TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_quantity > 45
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

TPCH_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       {_dbl('SUM(volume)')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         {_REV} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# Q8 market share: numerator CASE keeps both branches DECIMAL(18,4) so the
# sum types (and therefore the final doubles) unify identically in both
# engines; the share is a ratio of two bit-identical doubles.
TPCH_Q8 = f"""
SELECT o_year,
       {_dbl(f"SUM(CASE WHEN supp_nation = 'NATION_2' THEN CAST(volume_base AS {_DEC}) ELSE CAST(0 AS {_DEC}) END * volume_disc)")}
       / {_dbl(f'SUM(CAST(volume_base AS {_DEC}) * volume_disc)')}
         AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice AS volume_base,
         {_DISC} AS volume_disc,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

TPCH_Q10 = f"""
SELECT c_custkey, c_name,
       {_dbl(f'SUM({_REV})')} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

TPCH_Q14 = f"""
SELECT 1e2 * {_dbl(f"SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS {_DEC}) ELSE CAST(0 AS {_DEC}) END * {_DISC})")}
           / {_dbl(f'SUM({_REV})')}
         AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""

# Q15: the revenue CTE's doubles are bit-identical in both engines (exact
# decimal sum, VARCHAR-roundtrip cast), so the MAX-equality join selects
# the same supplier(s) in both.
TPCH_Q15 = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         {_dbl(f'SUM({_REV})')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""

TPCH_Q17 = f"""
SELECT {_dbl(f'SUM(CAST(l_extendedprice AS {_DEC}))')} / 7e0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#11'
  AND p_size < 15
  AND l_quantity < (
    SELECT 2e-1 * {_dbl(f'SUM(CAST(l_quantity AS {_DEC}))')} / COUNT(l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""

TPCH_Q18 = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice,
       {_dbl(f'SUM({_QTY})')} AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({_QTY}) > 300
)
GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""

TPCH_Q19 = f"""
SELECT {_dbl(f'SUM({_REV})')} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""

# Q12 re-shaped (shipping-mode priority check): the trimmed lineitem has no
# l_shipmode/l_commitdate/l_receiptdate, so the mode group becomes
# l_returnflag and "late-but-not-too-late" becomes a shipping-delay band on
# l_shipdate - o_orderdate (both present). The structural stress point —
# join + two conditional counts per group — is intact. Sums are CAST to
# BIGINT because DuckDB widens SUM(INTEGER) to HUGEINT while Spark stays
# LONG.
TPCH_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate < o_orderdate + INTERVAL 365 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Q21 re-shaped (suppliers who kept orders waiting): "late" is re-expressed
# as shipping >365 days after the order date (no l_receiptdate /
# l_commitdate in the trimmed schema). The structural stress point is
# intact: a 4-way join plus an EXISTS and a NOT EXISTS against the SAME
# fact table with different correlated predicates — the NOT EXISTS needs
# its own orders join so the correlation stays a pure equality on
# l_orderkey (both engines decorrelate that reliably). Non-vacuous by
# construction: generated orders have ~13 distinct suppliers, so "no other
# supplier was late on this order" prunes most candidates but not all.
TPCH_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_nationkey < 13
  AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1
    FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 365 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Derived partsupp: the driver testdata has no partsupp table, so the five
# queries that need one (q2/q9/q11/q16/q20) derive it as a CTE — the distinct
# (partkey, suppkey) pairs actually traded in lineitem, with supplycost and
# availqty as deterministic integer functions of the keys. The SAME CTE text
# runs in both engines (pure integer arithmetic — engine-identical), so the
# oracle argument is unchanged: one SQL string, two engines.
# ---------------------------------------------------------------------------

_PS_CTE = """ps AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST((l_partkey * 7 + l_suppkey * 13) % 1000 + 1 AS DOUBLE)
           AS ps_supplycost,
         CAST((l_partkey * 31 + l_suppkey * 17) % 500 + 1 AS BIGINT)
           AS ps_availqty
  FROM lineitem
)"""

# Q2: min-cost supplier per part within a region — the correlated-MIN
# stress. ps_supplycost is integer-valued (exact in DOUBLE), so the
# equality against MIN is safe cross-engine.
TPCH_Q2 = f"""WITH {_PS_CTE}
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
FROM part
JOIN ps ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 10 AND p_type = 'LARGE' AND r_name = 'ASIA'
  AND ps_supplycost = (
    SELECT MIN(p2.ps_supplycost)
    FROM ps p2
    JOIN supplier s2 ON s2.s_suppkey = p2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE p2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

# Q9: product-type profit by nation and year. Money through the exact
# decimal path: revenue and supply cost both (37,8)-exact before the sum.
TPCH_Q9 = f"""WITH {_PS_CTE}
SELECT nation, o_year, {_dbl('SUM(amount)')} AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice AS {_DEC}) * {_DISC}
           - CAST(ps_supplycost AS {_DEC}) * CAST(l_quantity AS {_DEC})
           AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE 'red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

# Q11: important-stock fraction — a HAVING against a scalar-subquery
# threshold over the same aggregate. Both sides of the comparison go
# through the exact-decimal sum + VARCHAR-roundtrip double, so the
# threshold cut is bit-identical.
_Q11_VALUE = (
    f"SUM(CAST(ps_supplycost AS {_DEC}) * CAST(ps_availqty AS {_DEC}))"
)
TPCH_Q11 = f"""WITH {_PS_CTE}
SELECT ps_partkey, {_dbl(_Q11_VALUE)} AS value
FROM ps
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
GROUP BY ps_partkey
HAVING {_dbl(_Q11_VALUE)} > (
  SELECT {_dbl(_Q11_VALUE)} * 1e-3
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
ORDER BY value DESC, ps_partkey
"""

# Q16: supplier count per part descriptor, excluding flagged suppliers
# (negative account balance stands in for the comment-based exclusion) —
# the NOT IN anti-join + COUNT(DISTINCT) stress.
TPCH_Q16 = f"""WITH {_PS_CTE}
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
"""

# Q20: suppliers holding excess stock of a part family — nested IN plus a
# doubly-correlated scalar subquery (both engines decorrelate the pure
# equality correlation on (partkey, suppkey)).
TPCH_Q20 = f"""WITH {_PS_CTE}
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > (
        SELECT 5e-1 * {_dbl(f'SUM(CAST(l_quantity AS {_DEC}))')}
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
ORDER BY s_suppkey
"""

# Q22 re-shaped: country code comes from c_nationkey (no c_phone column),
# and "dormant" = no order since 2000-01-01 (every generated customer has
# at least one order ever, so the classic no-orders-at-all anti-join would
# be vacuous). The average-balance threshold is computed through the same
# decimal/VARCHAR path in both engines, so the filter boundary is
# bit-identical.
TPCH_Q22 = f"""
SELECT cntrycode,
       COUNT(*) AS numcust,
       {_dbl(f'SUM(CAST(c_acctbal AS {_DEC}))')} AS totacctbal
FROM (
  SELECT c_nationkey AS cntrycode, c_acctbal
  FROM customer
  WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    AND c_acctbal > (
      SELECT {_dbl(f'SUM(CAST(c_acctbal AS {_DEC}))')} / COUNT(c_acctbal)
      FROM customer
      WHERE c_acctbal > 0e0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
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


_TABLES = {
    "tpch_q1": ("lineitem",),
    "tpch_q2": ("lineitem", "part", "supplier", "nation", "region"),
    "tpch_q3": ("customer", "orders", "lineitem"),
    "tpch_q4": ("orders", "lineitem"),
    "tpch_q5": ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    "tpch_q6": ("lineitem",),
    "tpch_q7": ("supplier", "lineitem", "orders", "customer", "nation"),
    "tpch_q8": (
        "part", "lineitem", "supplier", "orders", "customer", "nation", "region",
    ),
    "tpch_q9": ("lineitem", "part", "supplier", "orders", "nation"),
    "tpch_q10": ("customer", "orders", "lineitem", "nation"),
    "tpch_q11": ("lineitem", "supplier", "nation"),
    "tpch_q12": ("orders", "lineitem"),
    "tpch_q13": ("customer", "orders"),
    "tpch_q14": ("lineitem", "part"),
    "tpch_q15": ("lineitem", "supplier"),
    "tpch_q16": ("lineitem", "part", "supplier"),
    "tpch_q17": ("lineitem", "part"),
    "tpch_q18": ("customer", "orders", "lineitem"),
    "tpch_q19": ("lineitem", "part"),
    "tpch_q20": ("lineitem", "part", "supplier", "nation"),
    "tpch_q21": ("supplier", "lineitem", "orders", "nation"),
    "tpch_q22": ("customer", "orders"),
}

_SQL = {
    "tpch_q1": TPCH_Q1,
    "tpch_q2": TPCH_Q2,
    "tpch_q3": TPCH_Q3,
    "tpch_q4": TPCH_Q4,
    "tpch_q5": TPCH_Q5,
    "tpch_q6": TPCH_Q6,
    "tpch_q7": TPCH_Q7,
    "tpch_q8": TPCH_Q8,
    "tpch_q9": TPCH_Q9,
    "tpch_q10": TPCH_Q10,
    "tpch_q11": TPCH_Q11,
    "tpch_q12": TPCH_Q12,
    "tpch_q13": TPCH_Q13,
    "tpch_q14": TPCH_Q14,
    "tpch_q15": TPCH_Q15,
    "tpch_q16": TPCH_Q16,
    "tpch_q17": TPCH_Q17,
    "tpch_q18": TPCH_Q18,
    "tpch_q19": TPCH_Q19,
    "tpch_q20": TPCH_Q20,
    "tpch_q21": TPCH_Q21,
    "tpch_q22": TPCH_Q22,
}


def _make_query(name):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _run(spark, sf_dir, _SQL[name], _TABLES[name])

    q.__name__ = name
    return q


QUERIES = {name: _make_query(name) for name in _SQL}
# the SAME SQL strings are the oracles — dialect-shared ANSI
ORACLES = dict(_SQL)
