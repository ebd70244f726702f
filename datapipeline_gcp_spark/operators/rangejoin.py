"""Range (interval) join — point-in-interval matching at scale.

``range_join`` matches point rows to interval rows on an equi-key plus
``start <= ts < end``. The naive plan is a theta-join (O(|L|·|R|) pairs
per key); the scale path maps both sides to fixed-width time buckets,
explodes each interval into the buckets it covers, equi-joins on
(key, bucket) — so candidate pairs are bucket-local — and applies the
exact predicate last, deduplicating interval spans. The DuckDB oracle is
the naive BETWEEN join, so the optimization is verified against the
straightforward semantics.

Bucket width trades explode factor against candidate precision: set it
near the typical interval length (one bucket ≈ one interval row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import (
    SQL_EVENTS_NANSAFE,
    dsum,
    nan_to_null,
    sql_dsum,
)
from datapipeline_gcp_spark.schemas import load_testdata

BUCKET = "1 hour"
_BUCKET_SECONDS = 3600

#: Loud ceiling on the per-interval bucket explosion (r9 extremes
#: audit, the gap-detection OOM class): one interval with corrupt
#: century-wide bounds would explode into ~867k boxed longs per row
#: and bucket-multiply every downstream join. An interval this many
#: buckets wide is either corrupt bounds or a mis-sized BUCKET for the
#: workload — both should fail with a diagnosable error, not an
#: executor OOM. 10k hourly buckets ≈ 14 months per interval.
MAX_BUCKETS_PER_INTERVAL = 10_000


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by_cols: list[str],
) -> DataFrame:
    """Inner join: point rows × interval rows with matching ``by_cols``
    and ``start <= ts < end``. Bucketed equi-join underneath."""
    p = points.withColumn(
        "__bucket", (F.unix_timestamp(ts_col) / _BUCKET_SECONDS).cast("long")
    )
    b0 = (F.unix_timestamp(start_col) / _BUCKET_SECONDS).cast("long")
    # end is exclusive: a bucket containing only `end` itself cannot
    # match, but the filter below settles exactness
    b1 = (F.unix_timestamp(end_col) / _BUCKET_SECONDS).cast("long")
    # Guard the explode, per row, inside codegen. Three arms (r10,
    # closing the ADVICE r9 findings on this guard):
    #  - NULL start/end flows through as NULL: sequence(NULL, …) is
    #    NULL and explode drops the row — matching the oracle's
    #    inner-join NULL-drop semantics (the r9 draft raised here).
    #  - Inverted bounds (end < start) raise: sequence(b0, b1) with
    #    b0 > b1 DESCENDS by default, so an inverted century-wide
    #    interval would bypass a one-sided `b1 - b0 < cap` check with
    #    a negative span and materialize the very array the guard
    #    exists to prevent. An interval ending before it starts is
    #    corrupt by definition.
    #  - Spans at/over MAX_BUCKETS_PER_INTERVAL raise loudly instead
    #    of OOMing an executor on a span-scaled array.
    span_ok = (b1 >= b0) & (b1 - b0 < F.lit(MAX_BUCKETS_PER_INTERVAL))
    null_bounds = b0.isNull() | b1.isNull()
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.when(null_bounds | span_ok, b0).otherwise(
                    F.raise_error(
                        F.format_string(
                            "range_join interval spans %s buckets "
                            f"(cap {MAX_BUCKETS_PER_INTERVAL}): corrupt "
                            "or inverted bounds, or BUCKET is mis-sized "
                            "for this workload",
                            b1 - b0 + F.lit(1),
                        )
                    )
                ),
                b1,
            )
        ),
    )
    return (
        p.join(i, on=by_cols + ["__bucket"])
        .filter((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )


# ---------------------------------------------------------------------------
# Registered query: events inside per-user "active windows" (deterministic
# intervals derived from every 7th event: [trunc_hour(ts), +45 min))
# ---------------------------------------------------------------------------


def _parts(spark: SparkSession, sf_dir: str):
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    intervals = (
        ev.filter(F.col("event_id") % 7 == 0)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("win_start"),
            (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 45 MINUTES")).alias(
                "win_end"
            ),
            F.col("event_id").alias("win_id"),
        )
        .distinct()
    )
    return ev, intervals


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, intervals = _parts(spark, sf_dir)
    # NaN measure ≡ NULL (r8 nanvalues boundary)
    ev = ev.withColumn("value", nan_to_null("value"))
    joined = range_join(
        ev.select("user_id", "ts", "event_id", "value"),
        intervals,
        ts_col="ts",
        start_col="win_start",
        end_col="win_end",
        by_cols=["user_id"],
    )
    return joined.groupBy("user_id", "win_id", "win_start").agg(
        F.count("event_id").alias("n_events_in_window"),
        dsum("value").alias("window_value"),
    )


_RANGE_ORACLE = f"""
WITH intervals AS (
  SELECT DISTINCT
    user_id,
    date_trunc('hour', ts) AS win_start,
    date_trunc('hour', ts) + INTERVAL 45 MINUTE AS win_end,
    event_id AS win_id
  FROM events WHERE event_id % 7 = 0
)
SELECT
  e.user_id, i.win_id, i.win_start,
  COUNT(e.event_id) AS n_events_in_window,
  {sql_dsum('e.value')} AS window_value
FROM {SQL_EVENTS_NANSAFE} e
JOIN intervals i
  ON e.user_id = i.user_id
 AND i.win_start <= e.ts AND e.ts < i.win_end
GROUP BY 1, 2, 3
"""

QUERIES = {"range_join_events": range_join_events}
ORACLES = {"range_join_events": _RANGE_ORACLE}
