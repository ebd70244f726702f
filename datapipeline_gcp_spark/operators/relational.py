"""Generic relational operators.

Covers the scalar/projection/predicate inventory of SURVEY.md §2.3
(P1-P10) as first-class, individually-tested operators, plus the
standard engine surface the reference implicitly delegates to BigQuery
(WHERE filters, DISTINCT, ORDER BY/LIMIT, window functions, semi/anti
joins) — SURVEY §2.3/§2.6 notes these exist nowhere in the reference
but a general engine must expose them.

Also hosts ``salted_join``, the explicit skew-mitigation strategy for
hot keys (the reference's single-country generator,
``cloud_function/create_campaigns/csv/main.py:29``, makes the master
join's (country, date_time) key skew-prone at scale; AQE skew-join
handles it adaptively, salting handles it deterministically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import (
    SQL_EVENTS_NANSAFE,
    dsum,
    nan_to_null,
    sql_dsum,
    sql_qround,
)
from datapipeline_gcp_spark.schemas import load_testdata

# ---------------------------------------------------------------------------
# Skew-aware join (scale utility)
# ---------------------------------------------------------------------------


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed key distributions.

    The left (large, skewed) side gets a random salt in [0, buckets);
    the right side is replicated ``salt_buckets`` times via an exploded
    literal array, so every (key, salt) partition joins locally. Use for
    known-hot keys when AQE's runtime skew splitting is insufficient
    (e.g. a single country carrying most rows). Row multiplicity is
    unchanged — each left row matches exactly the right rows it would
    have matched un-salted.

    Supported ``how``: inner and the left-side family (left/leftouter,
    left_semi, left_anti) — for these, replicating the right side is
    multiplicity-preserving. Right/full outer joins are rejected: an
    unmatched right row would surface once per salt bucket.
    """
    normalized_how = how.lower().replace("_", "")
    if normalized_how not in {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the salted right side "
            "is replicated, so unmatched right rows would appear "
            f"{salt_buckets}x in a right/full outer join. Use AQE skew-join "
            "handling for those join types."
        )
    salt = "__salt"
    left_s = left.withColumn(
        salt, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    right_s = right.withColumn(
        salt,
        F.explode(F.array([F.lit(i) for i in range(salt_buckets)])),
    )
    joined = left_s.join(right_s, on=keys + [salt], how=how)
    return joined.drop(salt)


# ---------------------------------------------------------------------------
# P-row operators over the driver testdata, each with a DuckDB oracle
# ---------------------------------------------------------------------------


def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P6/P7 + WHERE: projection with rename, cast, date scalar fns,
    and a pushed-down predicate. ``explain`` shows PushedFilters on the
    parquet scan and a 4-column ReadSchema (column pruning)."""
    li = load_testdata(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.filter(F.col("l_shipdate") < "1995-06-01").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("quantity_int"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_ts_str"),
        F.substring(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss"), 1, 10).alias(
            "ship_day_str"
        ),
    )


_SCAN_FILTER_ORACLE = """
SELECT
  l_orderkey AS order_id,
  l_extendedprice AS price,
  CAST(l_quantity AS BIGINT) AS quantity_int,
  CAST(l_shipdate AS DATE) AS ship_date,
  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts_str,
  SUBSTR(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), 1, 10) AS ship_day_str
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-06-01'
"""


def case_when_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5: CASE WHEN conditional + arithmetic expressions, then a
    grouped count over the conditional class."""
    o = load_testdata(spark, sf_dir, ("orders",))["orders"]
    classed = o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, F.lit("high"))
        .when(F.col("o_totalprice") > 100000, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("price_band"),
        (F.col("o_totalprice") * 0.1).alias("commission"),
    )
    return classed.groupBy("price_band").agg(
        F.count("o_orderkey").alias("n_orders"),
        dsum("commission").alias("total_commission"),
    )


_CASE_WHEN_ORACLE = f"""
WITH classed AS (
  SELECT
    o_orderkey,
    CASE WHEN o_totalprice > 200000 THEN 'high'
         WHEN o_totalprice > 100000 THEN 'mid'
         ELSE 'low' END AS price_band,
    o_totalprice * 0.1 AS commission
  FROM orders
)
SELECT price_band, COUNT(o_orderkey) AS n_orders,
       {sql_dsum('commission')} AS total_commission
FROM classed GROUP BY 1
"""


def join_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 semantics: composite-key equi-join, many-to-one, joining a
    rollup back to its detail rows on (user_id, event_type) — the same
    shape as the reference's campaigns⋈transactions on
    (country, date_time) (``m_data_model.sql:17``)."""
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    # NaN measure ≡ NULL (r8 nanvalues boundary; determinism.nan_to_null)
    ev = ev.withColumn("value", nan_to_null("value"))
    rollup = ev.groupBy("user_id", "event_type").agg(
        F.count("event_id").alias("n_events"),
        dsum("value").alias("total_value"),
    )
    return ev.join(rollup, on=["user_id", "event_type"], how="inner").select(
        "event_id", "user_id", "event_type", "value", "n_events", "total_value"
    )


_COMPOSITE_JOIN_ORACLE = f"""
WITH rollup AS (
  SELECT user_id, event_type, COUNT(event_id) AS n_events,
         {sql_dsum('value')} AS total_value
  FROM {SQL_EVENTS_NANSAFE} GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.event_type, e.value, r.n_events, r.total_value
FROM {SQL_EVENTS_NANSAFE} e
JOIN rollup r ON e.user_id = r.user_id AND e.event_type = r.event_type
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 parts per brand by retail price
    (ROW_NUMBER with a deterministic p_partkey tie-break)."""
    p = load_testdata(spark, sf_dir, ("part",))["part"]
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rank_in_brand", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rank_in_brand")
    )


_TOPK_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, rank_in_brand
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
         ) AS BIGINT) AS rank_in_brand
  FROM part
) WHERE rank_in_brand <= 3
"""


def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY ... LIMIT with a unique-key tie-break
    (Spark plans TakeOrderedAndProject — no full sort at scale)."""
    o = load_testdata(spark, sf_dir, ("orders",))["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_ORDERBY_LIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-level DISTINCT (dedup of a projection)."""
    c = load_testdata(spark, sf_dir, ("customer",))["customer"]
    return c.select("c_mktsegment", "c_nationkey").distinct()


_DISTINCT_ORACLE = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins (EXISTS / NOT EXISTS): customers
    with at least one high-value order, labeled against those without.
    """
    t = load_testdata(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 250000)
    with_big = (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("has_big_order", F.lit(True))
    )
    without_big = (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("has_big_order", F.lit(False))
    )
    return with_big.unionAll(without_big)


_SEMI_ANTI_ORACLE = """
SELECT c_custkey, TRUE AS has_big_order FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 250000)
UNION ALL
SELECT c_custkey, FALSE AS has_big_order FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
"""


def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (SURVEY §2.6 notes the reference has neither;
    an engine needs them): nations present in both the customer and
    supplier bases vs customer-only nations."""
    t = load_testdata(spark, sf_dir, ("customer", "supplier"))
    cust_n = t["customer"].select(F.col("c_nationkey").alias("nation_key"))
    supp_n = t["supplier"].select(F.col("s_nationkey").alias("nation_key"))
    both = cust_n.intersect(supp_n).withColumn("membership", F.lit("both"))
    cust_only = cust_n.subtract(supp_n).withColumn(
        "membership", F.lit("customer_only")
    )
    return both.unionAll(cust_only)


_SET_OPS_ORACLE = """
WITH cn AS (SELECT c_nationkey AS nation_key FROM customer),
     sn AS (SELECT s_nationkey AS nation_key FROM supplier)
SELECT nation_key, 'both' AS membership
FROM (SELECT nation_key FROM cn INTERSECT SELECT nation_key FROM sn)
UNION ALL
SELECT nation_key, 'customer_only' AS membership
FROM (SELECT nation_key FROM cn EXCEPT SELECT nation_key FROM sn)
"""


def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery as a filter threshold: orders above
    90% of the global max price. DataFrame spelling = broadcast the
    1-row aggregate and filter against it (the plan Catalyst builds for
    the SQL subquery too). MAX (not AVG) keeps the threshold exact —
    no float-accumulation drift between engines."""
    o = load_testdata(spark, sf_dir, ("orders",))["orders"]
    mx = o.agg(F.max("o_totalprice").alias("max_price"))
    return (
        o.join(F.broadcast(mx))
        .filter(F.col("o_totalprice") > 0.9 * F.col("max_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_SCALAR_SUBQUERY_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
"""


def fuzzy_match_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    text_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Entity-resolution fuzzy matching: pairs of rows in the same block
    whose ``text_col`` values are within ``max_distance`` Levenshtein
    edits.

    Candidate generation is FastSS deletion-neighborhood blocking
    (Bocek et al.): every string emits itself plus its
    single-character-deletion variants; any two strings within one edit
    share at least one variant, so candidates come from tiny
    variant-keyed buckets — corpus-linear × (len+1), never
    block-quadratic (nation-blocked quadratic pairs were measured 4.5 M
    pairs / ~8 s at sf0.1; variant blocking cuts candidates to
    ~the true-match count). ``max_distance`` > 1 falls back to plain
    block-quadratic pairs (d-deletion neighborhoods grow as len^d).
    Shared variants produce duplicate candidates — deduped before the
    verify. Verification uses threshold Levenshtein (banded DP,
    O(d·len); -1-when-exceeded filtered out), identical results to the
    unbounded form the DuckDB oracle computes."""
    from datapipeline_gcp_spark.functions.dedup import within_block_pairs

    if max_distance == 1:
        t = F.col(text_col)
        variants = F.concat(
            F.array(t),
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
                lambda i: F.concat(
                    F.substr(t, F.lit(1), i - 1),
                    F.substr(t, i + 1, F.length(t)),
                ),
            ),
        )
        exploded = df.select(
            *(F.col(c) for c in block_cols),
            F.col(id_col),
            F.col(text_col),
            F.explode_outer(F.array_distinct(variants)).alias("_variant"),
        )
        pairs = within_block_pairs(
            exploded, [*block_cols, "_variant"], [id_col, text_col]
        )
        cand = pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{text_col}").alias("_ta"),
            F.col(f"b.{text_col}").alias("_tb"),
        ).dropDuplicates(["id_a", "id_b"])
        dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_distance)
    else:
        pairs = within_block_pairs(df, block_cols, [id_col, text_col])
        len_gate = (
            F.abs(
                F.length(F.col(f"a.{text_col}"))
                - F.length(F.col(f"b.{text_col}"))
            )
            <= max_distance
        )
        cand = pairs.filter(len_gate).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{text_col}").alias("_ta"),
            F.col(f"b.{text_col}").alias("_tb"),
        )
        dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_distance)
    return (
        cand.select("id_a", "id_b", dist.alias("distance"))
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
    )


def fuzzy_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_testdata(spark, sf_dir, ("customer",))["customer"]
    # entity resolution is over LOGICAL entities: an exact duplicate
    # storage row (r9 dupkeys) would otherwise surface as a
    # distance-0 self-pair (id_a == id_b) that the oracle's a < b join
    # can never produce; distinct at the boundary, mirrored below
    return fuzzy_match_pairs(
        cust.select("c_nationkey", "c_custkey", "c_name").distinct(),
        block_cols=["c_nationkey"],
        id_col="c_custkey",
        text_col="c_name",
    )


_FUZZY_ORACLE = """
WITH cust_d AS (
  SELECT DISTINCT c_nationkey, c_custkey, c_name FROM customer
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
FROM cust_d a JOIN cust_d b
  -- IS NOT DISTINCT FROM: blocking is grouping — the engine blocks via
  -- groupBy, where a NULL nation is a block value (r8 nullkeys sweep)
  ON a.c_nationkey IS NOT DISTINCT FROM b.c_nationkey
  AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew-join, proven through the correctness gate: the
    Spark side runs :func:`salted_join` (left side salted, right side
    replicated per bucket) while the oracle is the PLAIN inner join —
    the gate thereby certifies salting is result-invariant, which is
    the entire point of the technique. Use when one hot key dwarfs its
    siblings and AQE's runtime skew splitting isn't enough (it only
    splits the shuffle side; salting also spreads the hash-table
    build). The salt column never leaves the operator."""
    t = load_testdata(spark, sf_dir, ("orders", "customer"))
    dim = t["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    joined = salted_join(t["orders"], dim, keys=["o_custkey"], salt_buckets=8)
    return joined.select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_nationkey"
    )


_SALTED_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name, c.c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


def snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join — the diff primitive
    behind CDC validation, backfill audits, and cross-system
    consistency checks (the reference's append-only layers have no
    diff; its rerun semantics make this the first tool you need when a
    backfill double-loads — see SURVEY §1.5.4).

    Two deterministic snapshots of orders diverge three ways: keys
    missing from "old" (added), keys missing from "new" (removed), and
    keys whose price changed; everything else is unchanged. The join
    coalesces the key (USING semantics, identical in both engines);
    classification is a null/equality CASE over the two payloads.

    Scale: fact-to-fact FULL OUTER — deliberately NOT broadcastable;
    it shuffles both sides on the join key (SortMergeJoin), which is
    the right plan, and the reconciliation of two bucketed snapshots
    written with `sinks.write_bucketed` co-locates for free. Double
    equality is safe here because unchanged values are bit-identical
    copies, not recomputed floats."""
    o = load_testdata(spark, sf_dir, ("orders",))["orders"]
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    status = (
        F.when(F.col("old_price").isNull(), F.lit("added"))
        .when(F.col("new_price").isNull(), F.lit("removed"))
        .when(F.col("old_price") != F.col("new_price"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "o_orderkey", "old_price", "new_price", status.alias("status")
    )


_RECONCILE_ORACLE = """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS old_price
  FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS new_price
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT o_orderkey, old_price, new_price,
       CASE WHEN old_price IS NULL THEN 'added'
            WHEN new_price IS NULL THEN 'removed'
            WHEN old_price <> new_price THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new USING (o_orderkey)
"""


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (hand-rolled, engine-exact)
# ---------------------------------------------------------------------------

BLOOM_BITS = 65_472  # 1056 words × 62 usable bits (shifts stay < 62: no
#                      sign-bit games, << is then value-identical in
#                      Spark and DuckDB signed-64 arithmetic)
BLOOM_WORD = 62
BLOOM_K = 3  # hash functions


def _bloom_positions(key: Column, prefix: str = "bloom") -> list[Column]:
    """The BLOOM_K bit positions of *key*: seeded md5-derived hashes
    (``base_hash`` — the repo's engine-shared hash; Spark's native
    hash()/xxhash64 have no DuckDB twin) reduced mod BLOOM_BITS."""
    from datapipeline_gcp_spark.functions.dedup import base_hash

    return [
        base_hash(F.concat(F.lit(f"{prefix}{i}_"), key.cast("string")))
        % BLOOM_BITS
        for i in range(BLOOM_K)
    ]


def bloom_semijoin_report(orders: DataFrame, keys: DataFrame) -> DataFrame:
    """Bloom-filter pre-filtering of a fact table against a dimension
    key set, with exact false-positive accounting — the technique
    behind runtime row-group pruning and shuffle-free semi-joins
    (Spark's own runtime filters build exactly this; hand-rolling it
    keeps every bit engine-exact and therefore oracle-checkable).

    Build: each dim key sets BLOOM_K md5-derived bit positions; the
    bitmap lives as (word, 62-bit mask) rows built with ONE ``bit_or``
    hash aggregate — bitwise OR is commutative, so the build is
    partitioning-independent and mergeable (the distributed-build
    property that makes blooms work at 100 TB). Probe: three BROADCAST
    left joins of the ~1k-word bitmap against the fact table — zero
    fact shuffles; a row passes iff all K bits are set. The report
    compares the bloom verdict against exact membership (broadcast
    left join) per order priority: false positives are inherent to the
    structure (and bounded by (1-e^{-kn/m})^k); false negatives are
    impossible — the test suite pins both.

    Returns (o_orderpriority, n_orders, n_exact, n_bloom_pass,
    n_false_pos, fp_rate)."""
    positions = (
        keys.select(
            F.explode(F.array(*_bloom_positions(F.col("c_custkey")))).alias(
                "pos"
            )
        )
    )
    # per-row shift amounts need the SQL shiftleft (the PySpark helper
    # only takes a Python-int shift)
    _mask = "shiftleft(CAST(1 AS BIGINT), CAST({p} % {w} AS INT))"
    words = (
        positions.select(
            F.floor(F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
            F.expr(_mask.format(p="pos", w=BLOOM_WORD)).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("w"))
        # ~1k-row bitmap consumed by three probe joins; checkpoint so
        # each broadcast reuses it instead of re-scanning the dimension
        # and re-building the bitmap (same policy as the HLL sketch
        # table in operators/analytics.py)
        .localCheckpoint()
    )
    probe = orders.select("o_orderkey", "o_custkey", "o_orderpriority")
    pass_flags = []
    for i, pos in enumerate(_bloom_positions(F.col("o_custkey"))):
        probe = probe.withColumn(f"_p{i}", pos)
        w_i = words.select(
            F.col("word").alias(f"_word{i}"), F.col("w").alias(f"_w{i}")
        )
        probe = probe.withColumn(
            f"_word{i}", F.floor(F.col(f"_p{i}") / BLOOM_WORD).cast("long")
        ).join(F.broadcast(w_i), f"_word{i}", "left")
        pass_flags.append(
            F.col(f"_w{i}").isNotNull()
            & (
                F.col(f"_w{i}").bitwiseAND(
                    F.expr(_mask.format(p=f"_p{i}", w=BLOOM_WORD))
                )
                != 0
            )
        )
    bloom_pass = pass_flags[0] & pass_flags[1] & pass_flags[2]
    member = keys.select("c_custkey", F.lit(1).alias("_is_member"))
    flagged = probe.withColumn("_bloom_pass", bloom_pass).join(
        F.broadcast(member),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    agg = flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.coalesce(F.col("_is_member"), F.lit(0))).alias("n_exact"),
        F.sum(F.col("_bloom_pass").cast("bigint")).alias("n_bloom_pass"),
        F.sum(
            (F.col("_bloom_pass") & F.col("_is_member").isNull()).cast(
                "bigint"
            )
        ).alias("n_false_pos"),
    )
    from datapipeline_gcp_spark.determinism import qround

    fp_rate = F.when(
        F.col("n_orders") > F.col("n_exact"),
        qround(
            F.col("n_false_pos").cast("double")
            / (F.col("n_orders") - F.col("n_exact")).cast("double"),
            9,
        ),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "n_exact",
        "n_bloom_pass",
        "n_false_pos",
        fp_rate.alias("fp_rate"),
    )


def orders_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir, ("orders", "customer"))
    keys = t["customer"].filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey"
    )
    return bloom_semijoin_report(t["orders"], keys)


def _sql_bloom_pos(expr: str, i: int) -> str:
    # interpolate the hash modulus from the Spark side's base_hash so
    # query and oracle can never silently diverge on P (ADVICE r4)
    from datapipeline_gcp_spark.functions.dedup import P

    return (
        f"((CAST(concat('0x', substr(md5(concat('bloom{i}_', "
        f"CAST({expr} AS VARCHAR))),1,15)) AS BIGINT) % {P})"
        f" % {BLOOM_BITS})"
    )


_BLOOM_ORACLE = f"""
WITH keys AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
),
pos AS (
  {" UNION ALL ".join(
      f"SELECT {_sql_bloom_pos('c_custkey', i)} AS pos FROM keys"
      for i in range(BLOOM_K)
  )}
),
words AS (
  SELECT pos // {BLOOM_WORD} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD} AS INTEGER)) AS w
  FROM pos GROUP BY 1
),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         {", ".join(f"{_sql_bloom_pos('o_custkey', i)} AS p{i}" for i in range(BLOOM_K))}
  FROM orders
),
flagged AS (
  SELECT pr.o_orderpriority,
         ({" AND ".join(
             f"(w{i}.w IS NOT NULL AND (w{i}.w & (CAST(1 AS BIGINT) << "
             f"CAST(pr.p{i} % {BLOOM_WORD} AS INTEGER))) <> 0)"
             for i in range(BLOOM_K)
         )}) AS bloom_pass,
         (k.c_custkey IS NOT NULL) AS is_member
  FROM probe pr
  {" ".join(
      f"LEFT JOIN words w{i} ON pr.p{i} // {BLOOM_WORD} = w{i}.word"
      for i in range(BLOOM_K)
  )}
  LEFT JOIN keys k ON pr.o_custkey = k.c_custkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_pos,
       CASE WHEN COUNT(*) > SUM(CASE WHEN is_member THEN 1 ELSE 0 END)
            THEN {sql_qround(
                "CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END) AS DOUBLE)"
                " / CAST(COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS DOUBLE)", 9)}
            END AS fp_rate
FROM flagged
GROUP BY o_orderpriority
"""


QUERIES = {
    "snapshot_reconcile": snapshot_reconcile,
    "orders_bloom_semijoin": orders_bloom_semijoin,
    "join_skew_salted": join_skew_salted,
    "scan_filter_project": scan_filter_project,
    "case_when_projection": case_when_projection,
    "join_composite_key": join_composite_key,
    "topk_per_group": topk_per_group,
    "orderby_limit": orderby_limit,
    "distinct_projection": distinct_projection,
    "semi_anti_join": semi_anti_join,
    "set_intersect_except": set_intersect_except,
    "scalar_subquery_filter": scalar_subquery_filter,
    "fuzzy_customer_names": fuzzy_customer_names,
}

ORACLES = {
    "snapshot_reconcile": _RECONCILE_ORACLE,
    "orders_bloom_semijoin": _BLOOM_ORACLE,
    "join_skew_salted": _SALTED_ORACLE,
    "scan_filter_project": _SCAN_FILTER_ORACLE,
    "case_when_projection": _CASE_WHEN_ORACLE,
    "join_composite_key": _COMPOSITE_JOIN_ORACLE,
    "topk_per_group": _TOPK_ORACLE,
    "orderby_limit": _ORDERBY_LIMIT_ORACLE,
    "distinct_projection": _DISTINCT_ORACLE,
    "semi_anti_join": _SEMI_ANTI_ORACLE,
    "set_intersect_except": _SET_OPS_ORACLE,
    "scalar_subquery_filter": _SCALAR_SUBQUERY_ORACLE,
    "fuzzy_customer_names": _FUZZY_ORACLE,
}
