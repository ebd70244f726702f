"""Table maintenance: MERGE-style upsert (SCD type 1) and slowly-
changing-dimension history (SCD type 2) as batch DataFrame operators.

The reference maintains its layer tables purely by append
(`cloud_composer/datapipeline_gcp.py` WRITE_APPEND dispositions); a
warehouse would reach for MERGE for dimension maintenance. Spark on
parquet has no MERGE primitive (that is a table-format feature — Delta/
Iceberg), so the engine expresses both merge flavors as ONE full-outer
shuffle join on the business key, which is exactly the physical plan a
format-level MERGE lowers to:

- **scd1_upsert**: update wins column-by-column; emits an ``op``
  column (insert / update / keep) so callers can audit the merge —
  the row-count identity |current ∪ updates-by-key| is asserted in
  tests.
- **scd2_history**: updated keys close their current version
  (valid_to = run date) and append a new open version; inserts open
  their first version; untouched rows pass through. One join + one
  union of projections — no window, no per-key sort.

Scale: both are a single hash-partitioned join on the key (AQE handles
size asymmetry — a small update batch broadcasts automatically), plus
map-side projections. The updates fixture is deterministic (every 17th
customer changes segment and gains balance; every 23rd key past the max
is a fresh insert) so the oracle is plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata

RUN_DATE = "2024-06-01"
BASE_DATE = "2024-01-01"


def scd1_upsert(
    current: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE (update-wins) of ``updates`` into ``current`` on ``keys``.
    Output = all key-distinct rows, update columns preferred, plus
    ``op`` ∈ {insert, update, keep}."""
    value_cols = [c for c in current.columns if c not in keys]
    u = updates.select(
        *(F.col(k).alias(f"_uk_{k}") for k in keys),
        *(F.col(c).alias(f"_uv_{c}") for c in value_cols),
    )
    cond = [current[k] == u[f"_uk_{k}"] for k in keys]
    joined = current.join(u, cond, "full_outer")
    has_upd = F.col(f"_uk_{keys[0]}").isNotNull()
    has_cur = current[keys[0]].isNotNull()
    out_cols = [
        F.coalesce(current[k], F.col(f"_uk_{k}")).alias(k) for k in keys
    ] + [
        F.when(has_upd, F.col(f"_uv_{c}")).otherwise(current[c]).alias(c)
        for c in value_cols
    ]
    op = (
        F.when(has_upd & ~has_cur, F.lit("insert"))
        .when(has_upd & has_cur, F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(*out_cols, op.alias("op"))


def scd2_history(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    run_date: str = RUN_DATE,
    base_date: str = BASE_DATE,
) -> DataFrame:
    """SCD2: versioned output with (valid_from, valid_to, is_current).
    ``current`` rows are the open version as of ``base_date``."""
    upd_keys = updates.select(*keys).distinct()
    # rows whose key got an update: close the old version
    closed = (
        current.join(upd_keys, keys, "left_semi")
        .withColumn("valid_from", F.lit(base_date).cast("date"))
        .withColumn("valid_to", F.lit(run_date).cast("date"))
        .withColumn("is_current", F.lit(0).cast("long"))
    )
    # untouched current rows stay open
    untouched = (
        current.join(upd_keys, keys, "left_anti")
        .withColumn("valid_from", F.lit(base_date).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(1).cast("long"))
    )
    # every update row (changed or fresh) opens a new version
    opened = (
        updates.withColumn("valid_from", F.lit(run_date).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(1).cast("long"))
    )
    return closed.unionByName(untouched).unionByName(opened)


# ---------------------------------------------------------------------------
# Registered queries: deterministic update batch over customer
# ---------------------------------------------------------------------------

_CUSTOMER_COLS = [
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_mktsegment",
    "c_acctbal",
]


def _current(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_testdata(spark, sf_dir, ("customer",))["customer"]
    return cust.select(*_CUSTOMER_COLS)


def _updates(current: DataFrame) -> DataFrame:
    """Every 17th customer: segment→'UPSERTED', balance +100. Every 23rd
    key, shifted past the key space: a fresh insert."""
    changed = (
        current.filter(F.col("c_custkey") % 17 == 0)
        .withColumn("c_mktsegment", F.lit("UPSERTED"))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    )
    inserts = (
        current.filter(F.col("c_custkey") % 23 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 10_000_000)
        .withColumn("c_name", F.concat(F.lit("new#"), F.col("c_name")))
    )
    return changed.unionByName(inserts)


def merge_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    cur = _current(spark, sf_dir)
    return scd1_upsert(cur, _updates(cur), keys=["c_custkey"])


def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cur = _current(spark, sf_dir)
    return scd2_history(cur, _updates(cur), keys=["c_custkey"])


_UPDATES_SQL = """
SELECT c_custkey, c_name, c_nationkey, 'UPSERTED' AS c_mktsegment,
       c_acctbal + 100.0 AS c_acctbal
FROM customer WHERE c_custkey % 17 = 0
UNION ALL
SELECT c_custkey + 10000000, concat('new#', c_name), c_nationkey,
       c_mktsegment, c_acctbal
FROM customer WHERE c_custkey % 23 = 0
"""

_SCD1_ORACLE = f"""
WITH cur AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
             FROM customer),
upd AS ({_UPDATES_SQL})
SELECT
  COALESCE(cur.c_custkey, upd.c_custkey) AS c_custkey,
  CASE WHEN upd.c_custkey IS NOT NULL THEN upd.c_name ELSE cur.c_name END
    AS c_name,
  CASE WHEN upd.c_custkey IS NOT NULL THEN upd.c_nationkey
       ELSE cur.c_nationkey END AS c_nationkey,
  CASE WHEN upd.c_custkey IS NOT NULL THEN upd.c_mktsegment
       ELSE cur.c_mktsegment END AS c_mktsegment,
  CASE WHEN upd.c_custkey IS NOT NULL THEN upd.c_acctbal
       ELSE cur.c_acctbal END AS c_acctbal,
  CASE WHEN upd.c_custkey IS NOT NULL AND cur.c_custkey IS NULL THEN 'insert'
       WHEN upd.c_custkey IS NOT NULL THEN 'update'
       ELSE 'keep' END AS op
FROM cur FULL OUTER JOIN upd ON cur.c_custkey = upd.c_custkey
"""

_SCD2_ORACLE = f"""
WITH cur AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
             FROM customer),
upd AS ({_UPDATES_SQL}),
upd_keys AS (SELECT DISTINCT c_custkey FROM upd)
SELECT cur.*, DATE '{BASE_DATE}' AS valid_from, DATE '{RUN_DATE}' AS valid_to,
       CAST(0 AS BIGINT) AS is_current
FROM cur WHERE c_custkey IN (SELECT c_custkey FROM upd_keys)
UNION ALL
SELECT cur.*, DATE '{BASE_DATE}', NULL, CAST(1 AS BIGINT)
FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM upd_keys)
UNION ALL
SELECT upd.*, DATE '{RUN_DATE}', NULL, CAST(1 AS BIGINT)
FROM upd
"""

# ---------------------------------------------------------------------------
# Table profiling (ANALYZE-style column statistics)
# ---------------------------------------------------------------------------

#: (column, kind) — kind picks the cross-engine-safe string rendering
#: of min/max: ints/strings cast exactly; doubles qround to 4 dp first
#: (a qround'd double can never sit exactly on a %.4f rounding tie, so
#: Java's HALF_UP and C's round-to-even format identically); timestamps
#: via a shared strftime pattern.
_PROFILE_COLS = (
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_tax", "double"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _fmt(col, kind):
    from datapipeline_gcp_spark.determinism import qround

    if kind == "double":
        # Java's Formatter renders a NULL argument as the literal string
        # "null" (empty-table min/max); DuckDB's printf yields NULL —
        # gate on the input so both engines agree
        return F.when(
            col.isNotNull(), F.format_string("%.4f", qround(col, 4))
        )
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def _fmt_sql(expr: str, kind: str) -> str:
    from datapipeline_gcp_spark.determinism import sql_qround

    if kind == "double":
        return f"printf('%.4f', {sql_qround(expr, 4)})"
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({expr} AS VARCHAR)"


def table_profile(df: DataFrame, cols=_PROFILE_COLS) -> DataFrame:
    """Per-column profile — (column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr) — the ANALYZE/data-quality sweep a pipeline
    runs before trusting a new drop of data.

    Shape: one independent branch per column, unioned. Each branch
    scans exactly ONE column (columnar pruning makes this the cheap
    direction at 100 TB — the audit point is ReadSchema showing a
    single field per scan) and computes distinct-count by group-then-
    count, so every aggregate is a partial+final HASH aggregation.
    The tempting alternative — one aggregation with N COUNT(DISTINCT)s
    — planned as Expand(×N+1) → Sort → SortAggregate over the expanded
    rows (measured 27 s vs ~4 s at sf0.1): a full-width sort of
    12× the table is exactly the shape to avoid. Min/max aggregate in
    the column's own type, then render with tie-free formatting
    (qround before %.4f) so the profile is engine-identical."""
    branches = []
    for c, kind in cols:
        col = F.col(c)
        grouped = df.select(col).groupBy(c).agg(F.count("*").alias("cnt"))
        branches.append(
            grouped.agg(
                F.lit(c).alias("column_name"),
                # coalesce: SUM over an empty table is NULL; the
                # oracle's COUNT(*) is 0
                F.coalesce(F.sum("cnt"), F.lit(0).cast("bigint")).alias(
                    "n_rows"
                ),
                F.coalesce(
                    F.sum(F.when(col.isNull(), F.col("cnt"))), F.lit(0)
                ).alias("n_nulls"),
                F.count(col).alias("n_distinct"),
                _fmt(F.min(col), kind).alias("min_repr"),
                _fmt(F.max(col), kind).alias("max_repr"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir, ("lineitem",))
    return table_profile(t["lineitem"])


def _profile_oracle() -> str:
    # min/max aggregate in the column's own type, then format — same
    # order as the Spark side.
    blocks = []
    for c, kind in _PROFILE_COLS:
        blocks.append(
            f"""
SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_fmt_sql(f'MIN({c})', kind)} AS min_repr,
       {_fmt_sql(f'MAX({c})', kind)} AS max_repr
FROM lineitem"""
        )
    return "\nUNION ALL".join(blocks)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-rollup refresh)
# ---------------------------------------------------------------------------

#: the refresh boundary: rows strictly before are the "already
#: materialized" base; rows at/after are the late-arriving delta
ROLLUP_CUTOFF = "1998-01-01"


def mergeable_daily_rollup(orders: DataFrame) -> DataFrame:
    """Per-day PARTIAL aggregate states — decimal sum (exact, mergeable)
    and count. Keeping states mergeable is what makes the rollup
    incrementally maintainable: refresh cost is O(delta) + O(groups),
    never O(history)."""
    return orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("price_state"),
        F.count("*").alias("n_state"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Union partial-state tables and re-merge: SUM over decimal states
    is associative, so merging K state tables equals aggregating the
    union of their inputs — asserted by this query's full-recompute
    oracle."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionAll(s)
    return (
        merged.groupBy("day")
        .agg(
            F.sum("price_state").alias("price_state"),
            F.sum("n_state").alias("n_state"),
        )
        .select(
            "day",
            F.col("n_state").cast("bigint").alias("n_orders"),
            F.col("price_state").cast("double").alias("total_price"),
        )
    )


def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup refresh: the base (history before
    ``ROLLUP_CUTOFF``) is aggregated once into mergeable states — in
    production those live in a parquet/Delta state table and are NOT
    recomputed — and a refresh only aggregates the delta partition and
    merges states. The oracle is the full recompute over all orders:
    the gate certifies base⊕delta ≡ full, i.e. the refresh is lossless.

    100 TB framing: this is the pattern that turns a daily 100 TB
    re-aggregation into an O(1-day) job; it needs only (a) mergeable
    states (sum/count/min/max/HLL — not medians), (b) a monotone
    partition column to split base from delta."""
    orders = load_testdata(spark, sf_dir, ("orders",))["orders"]
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")
    base = mergeable_daily_rollup(orders.filter(F.col("o_orderdate") < cutoff))
    delta = mergeable_daily_rollup(orders.filter(F.col("o_orderdate") >= cutoff))
    return merge_rollup_states(base, delta)


_ROLLUP_INC_ORACLE = f"""
SELECT CAST(o_orderdate AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1
"""


def table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over orders (the dbt-test /
    Great-Expectations tier a pipeline runs before publishing a layer —
    the reference enforces schema contracts at load time via BigQuery
    schemas, `cloud_composer/datapipeline_gcp.py` load jobs; this is
    the post-load twin for semantic constraints schemas can't express).

    Five constraints, one row each (constraint, n_violations, passed):
    not_null and accepted_values are metadata-free single-pass
    aggregates over ONE scan (a conditional-count fused aggregate — no
    per-constraint rescans); uniqueness is a group-count; referential
    integrity is a LEFT ANTI join against the dimension (broadcast —
    the standard FK probe). At 100 TB: the fused scan reads only the
    constrained columns; the anti-join shuffles at most the violating
    side, and AQE broadcasts customer.

    Registered as an operator (not a test) deliberately: expectation
    results are DATA — pipelines route on them (publish/quarantine) and
    audit logs keep them, so they belong in the engine surface.
    """
    loaded = load_testdata(spark, sf_dir, ("orders", "customer"))
    o, c = loaded["orders"], loaded["customer"]
    viol = lambda cond, name: F.sum(  # noqa: E731
        F.when(cond, 1).otherwise(0)
    ).cast("bigint").alias(name)
    fused = o.agg(
        viol(F.col("o_orderkey").isNull(), "null_key"),
        viol(
            ~F.col("o_orderstatus").isin("O", "F", "P"), "bad_status"
        ),
        viol(F.col("o_totalprice") <= 0, "nonpos_price"),
    )
    dup_keys = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count("*").cast("bigint").alias("dup_key"))
    )
    orphans = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        ).agg(F.count("*").cast("bigint").alias("orphan_fk"))
    )
    wide = fused.crossJoin(dup_keys).crossJoin(orphans)
    checks = [
        ("o_orderkey_not_null", "null_key"),
        ("o_orderkey_unique", "dup_key"),
        ("o_orderstatus_accepted_values", "bad_status"),
        ("o_totalprice_positive", "nonpos_price"),
        ("o_custkey_references_customer", "orphan_fk"),
    ]
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint"),
                        F.col(col).alias("n_violations"),
                    )
                    for name, col in checks
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        F.col("r.constraint").alias("constraint"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("passed"),
    )


_EXPECT_ORACLE = """
WITH fused AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS null_key,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
      AS BIGINT) AS bad_status,
    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS nonpos_price
  FROM orders
),
dups AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS dup_key FROM (
    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
  )
),
orph AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphan_fk
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
),
stacked AS (
  SELECT 'o_orderkey_not_null' AS constraint, null_key AS n_violations
  FROM fused
  UNION ALL
  SELECT 'o_orderkey_unique', dup_key FROM dups
  UNION ALL
  SELECT 'o_orderstatus_accepted_values', bad_status FROM fused
  UNION ALL
  SELECT 'o_totalprice_positive', nonpos_price FROM fused
  UNION ALL
  SELECT 'o_custkey_references_customer', orphan_fk FROM orph
)
SELECT "constraint", n_violations, n_violations = 0 AS passed FROM stacked
"""


QUERIES = {
    "table_expectations": table_expectations,
    "merge_scd1": merge_scd1,
    "merge_scd2": merge_scd2,
    "lineitem_profile": lineitem_profile,
    "rollup_incremental": rollup_incremental,
}
ORACLES = {
    "table_expectations": _EXPECT_ORACLE,
    "merge_scd1": _SCD1_ORACLE,
    "merge_scd2": _SCD2_ORACLE,
    "lineitem_profile": _profile_oracle(),
    "rollup_incremental": _ROLLUP_INC_ORACLE,
}
