"""As-of join — the time-series operator Spark lacks natively.

``asof_join(left, right, on, by)``: for every left row, attach the most
recent right row with ``right.ts <= left.ts`` within the same ``by``
group. The reference's J1 is the degenerate exact-equality case
(``m_data_model.sql:17`` joins on timestamp equality); this is the
general form every time-series/analytics engine ships.

Implementation is a union-and-sweep composition of built-in operators —
the scalable shape for as-of:

1. Tag right rows (marker 0) and left rows (marker 1), union them.
2. One window sort per ``by`` group over (ts, marker): ``last_value``
   with ``ignoreNulls`` carries the latest right payload forward.
3. Keep left rows; the carried columns are the as-of match.

Cost: ONE shuffle on the group key + a sort within partitions —
identical to a sort-merge join, with no range-explosion (a naive
range-join produces O(|L|·|R|) intermediate pairs per group). Skewed
groups behave like any skewed window (AQE does not split windows; for a
pathological group, pre-split by time-bucketing the carry column).

The oracle is DuckDB's native ``ASOF JOIN`` — an independent
implementation agreeing on every row is strong evidence for the
composition's semantics. Right-side ties on (by, ts) are resolved
before joining (keep the max event_id) because ASOF's choice among
exact-tie duplicates is otherwise unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import dsum, sql_dsum
from datapipeline_gcp_spark.schemas import load_testdata


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the nearest right ``value_cols``
    at or before its timestamp (``direction="backward"``, the default:
    latest right with ``r.ts <= l.ts``) or at or after it
    (``direction="forward"``: earliest right with ``r.ts >= l.ts``).
    NULLs when no right row qualifies. The forward sweep is the same
    single-shuffle composition with the sort reversed.

    The right payload is carried as ONE struct of (value_cols + ts) —
    the struct itself is non-null for every right row, so
    ``last(ignorenulls)`` always picks the *latest whole right row*,
    NULL fields included. Carrying each value column independently
    would resurrect older non-null values into a newer row whenever a
    right row legitimately holds NULL in one column — a deviation from
    ASOF semantics (which returns the matched row as-is)."""
    marker = "__is_left"
    payload = "__asof_payload"
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{ts_col}{suffix}"]

    # JOIN equality semantics for the by-keys (r8 nullkeys sweep): a
    # NULL by-key matches NOTHING — SQL's ASOF JOIN (the oracle) and
    # pandas merge_asof both say so, while this union+window sweep's
    # partitionBy would group NULL keys together and match them. NULL
    # right rows can never be picked, so they are dropped; NULL left
    # rows keep left-join semantics (they pass through unmatched, via
    # a window partition that contains no right rows).
    null_by = None
    for c in by_cols:
        cond = F.col(c).isNull()
        null_by = cond if null_by is None else (null_by | cond)
    if null_by is not None:  # a global (no-key) as-of has nothing to drop
        right = right.filter(~null_by)

    r = right.select(
        *by_cols,
        F.col(ts_col),
        F.lit(0).alias(marker),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
        ).alias(payload),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by_cols and c != ts_col],
    )
    l = left.select(
        *by_cols,
        F.col(ts_col),
        F.lit(1).alias(marker),
        F.lit(None).cast(r.schema[payload].dataType).alias(payload),
        *[F.col(c) for c in left.columns if c not in by_cols and c != ts_col],
    )
    unioned = r.unionByName(l)
    # right rows sort before left rows at equal ts (marker 0 < 1), so an
    # exact-timestamp right row IS visible to the left row — ASOF <= for
    # the backward sweep, >= for the forward sweep (which just reverses
    # the timestamp order and carries the nearest FOLLOWING right row).
    if direction == "backward":
        order = [F.col(ts_col), F.col(marker)]
    elif direction == "forward":
        order = [F.col(ts_col).desc(), F.col(marker)]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = unioned.select(
        "*",
        F.last(F.col(payload), ignorenulls=True).over(w).alias("__carry"),
    )
    out_cols = (
        [F.col(c) for c in by_cols]
        + [F.col(ts_col)]
        + [F.col(c) for c in left.columns if c not in by_cols and c != ts_col]
        + [F.col("__carry").getField(c).alias(c) for c in carried]
    )
    return swept.filter(F.col(marker) == 1).select(*out_cols)


# ---------------------------------------------------------------------------
# Registered query: clicks as-of joined to the user's latest purchase
# ---------------------------------------------------------------------------


def _events_split(spark: SparkSession, sf_dir: str):
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    # isNotNull: the oracle picks the types via min/max, which SKIP
    # NULLs — a NULL event_type sorting first (Spark ASC = NULLS FIRST)
    # must not become the left type (r8 nullkeys sweep)
    types = [
        r[0]
        for r in ev.filter(F.col("event_type").isNotNull())
        .select("event_type")
        .distinct()
        .orderBy("event_type")
        .collect()
    ]
    # empty events: the oracle's min/max(event_type) are NULL and its
    # `event_type = NULL` predicates keep no rows — mirror that instead
    # of crashing on types[0] (NULL-literal equality filters to empty
    # with the schema intact)
    left_t = types[0] if types else None
    right_t = types[-1] if types else None
    left = ev.filter(F.col("event_type") == left_t).select(
        "user_id", "ts", F.col("event_id").alias("left_event_id"),
        F.col("value").alias("left_value"),
    )
    # dedupe right side on (user_id, ts): keep max event_id — exact-tie
    # duplicates make ASOF's pick unspecified
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    right = (
        ev.filter(F.col("event_type") == right_t)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("right_event_id"),
                F.col("value").alias("right_value"))
    )
    return left, right, left_t, right_t


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right, _lt, _rt = _events_split(spark, sf_dir)
    joined = asof_join(
        left, right, ts_col="ts", by_cols=["user_id"],
        value_cols=["right_event_id", "right_value"],
    )
    return joined.select(
        "user_id",
        F.col("left_event_id"),
        F.col("left_value"),
        F.col("right_event_id_right").alias("matched_event_id"),
        F.col("right_value_right").alias("matched_value"),
        F.col("ts_right").alias("matched_ts"),
    )


# The oracle discovers the same first/last event types dynamically so the
# SQL stays correct across scale factors.
_ASOF_ORACLE = """
WITH types AS (
  SELECT min(event_type) AS lt, max(event_type) AS rt FROM events
),
l AS (
  SELECT user_id, ts, event_id AS left_event_id, value AS left_value
  FROM events, types WHERE event_type = lt
),
r0 AS (
  SELECT user_id, ts, event_id AS right_event_id, value AS right_value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events, types WHERE event_type = rt
),
r AS (SELECT user_id, ts, right_event_id, right_value FROM r0 WHERE rn = 1)
SELECT
  l.user_id,
  l.left_event_id,
  l.left_value,
  r.right_event_id AS matched_event_id,
  r.right_value AS matched_value,
  r.ts AS matched_ts
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""

def asof_join_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward variant of the registered as-of query: each left event
    matched to the user's NEXT right event (earliest ``r.ts >= l.ts``)."""
    left, right, _lt, _rt = _events_split(spark, sf_dir)
    joined = asof_join(
        left, right, ts_col="ts", by_cols=["user_id"],
        value_cols=["right_event_id", "right_value"],
        direction="forward",
    )
    return joined.select(
        "user_id",
        F.col("left_event_id"),
        F.col("left_value"),
        F.col("right_event_id_right").alias("matched_event_id"),
        F.col("right_value_right").alias("matched_value"),
        F.col("ts_right").alias("matched_ts"),
    )


_ASOF_FWD_ORACLE = _ASOF_ORACLE.replace("l.ts >= r.ts", "l.ts <= r.ts")

QUERIES = {
    "asof_join_events": asof_join_events,
    "asof_join_forward_events": asof_join_forward_events,
}
ORACLES = {
    "asof_join_events": _ASOF_ORACLE,
    "asof_join_forward_events": _ASOF_FWD_ORACLE,
}
