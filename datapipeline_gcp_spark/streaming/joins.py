"""Stream-stream event-time interval join (attribution join).

The canonical Structured Streaming join: match each purchase to the
same user's clicks in the preceding hour. The builder is mode-agnostic
(works on batch and streaming frames — same policy as
``streaming/windows.py``): the batch form is oracle-checked against
DuckDB; the streaming form adds watermarks on BOTH sides and is tested
stream(availableNow) ≡ batch.

Scale: a stream-stream inner join keys state by user and buffers each
side only until the watermark passes the join window (Spark derives the
state retention bound from the time-interval predicate + watermarks —
without both, state grows forever). The batch form is a plain
hash-partitioned equi-join on user_id with the interval as a residual
filter — the time dimension never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata
from datapipeline_gcp_spark.streaming.harness import SQL_EVENT_TIME_VALID

JOIN_INTERVAL = "1 HOUR"
STREAM_WATERMARK = "2 hours"


def interval_join(
    purchases: DataFrame, clicks: DataFrame, interval: str = JOIN_INTERVAL
) -> DataFrame:
    """Pairs (purchase, click) with the same user_id and
    ``p_ts - interval <= c_ts <= p_ts``. Returns (user_id, purchase_id,
    click_id, p_ts, c_ts, gap_us)."""
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {interval}"))
    )
    return p.join(c, cond).select(
        "user_id",
        "purchase_id",
        "click_id",
        "p_ts",
        "c_ts",
        # timestamp_diff does naive microsecond arithmetic, so it works on
        # both TIMESTAMP and TIMESTAMP_NTZ inputs (parquet naive timestamps
        # load as NTZ, which unix_micros rejects).
        F.timestamp_diff("MICROSECOND", F.col("c_ts"), F.col("p_ts")).alias(
            "gap_us"
        ),
    )


def streaming_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    interval: str = JOIN_INTERVAL,
    watermark: str = STREAM_WATERMARK,
) -> DataFrame:
    """Streaming form: watermark both sides so the join state is
    bounded; append mode emits a pair once both rows are final."""
    return interval_join(
        purchases.withWatermark("ts", watermark),
        clicks.withWatermark("ts", watermark),
        interval,
    )


# ---------------------------------------------------------------------------
# Registered batch query + oracle
# ---------------------------------------------------------------------------


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    return interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


_INTERVAL_ORACLE = f"""
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.ts AS p_ts,
       c.ts AS c_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events p JOIN events c ON p.user_id = c.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL {JOIN_INTERVAL}
"""

def enrich_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: left-join the (possibly streaming)
    event side to a static dimension on user_id = c_custkey. The dim is
    broadcast — a stream-static join never shuffles the stream and
    keeps no state (the static side is re-resolved per micro-batch, so
    a dim refresh is picked up between batches). Mode-agnostic like the
    other builders; the batch form is the oracle-checked query."""
    d = dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return events.select("event_id", "user_id", "event_type", "value").join(
        F.broadcast(d), "user_id", "left"
    )


def events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    loaded = load_testdata(spark, sf_dir, ("events", "customer"))
    return enrich_with_dim(loaded["events"], loaded["customer"])


_ENRICH_ORACLE = """
SELECT e.user_id, e.event_id, e.event_type, e.value,
       c.c_name AS customer_name, c.c_mktsegment AS segment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""

def events_stream_interval_join_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the attribution join as a REAL stream-stream join — two
    ``readStream`` sides (purchases, clicks) with watermarks on both,
    availableNow, append-mode memory sink — and return the sink.

    The semantic this gate pins: a stream-stream INNER join emits a
    pair in the micro-batch where both rows are present — the
    watermark bounds STATE, not emission — so the availableNow replay
    must equal the batch interval join EXACTLY (the oracle is the
    unfiltered batch SQL). Contrast with the windowed-agg gates
    (`windows.events_stream_*_gate`), whose append mode withholds
    open windows: a hash match here + a closure-filtered match there
    certifies both halves of append-mode semantics. Outer interval
    joins are the case that would need a closure filter (NULL rows
    emit only after the watermark passes); inner join is deliberately
    the gate because its contract is exactness.

    Harness cost settings (8 state partitions, tmpfs checkpoint —
    result-identical) are shared gate policy: see
    :mod:`datapipeline_gcp_spark.streaming.harness`.

    Event-time validity split before BOTH sides' watermarks (r9
    watermark-poisoning defense): on a stream-stream join one corrupt
    future clock on EITHER side advances the shared watermark and
    evicts the other side's honest buffered rows, silently losing
    pairs. The quarantine stream (one unfiltered scan, before the
    purchase/click split) makes every rejected event observable in
    ``stream_interval_join_gate_quarantine``.
    """
    from datapipeline_gcp_spark.schemas import pin_utc
    from datapipeline_gcp_spark.streaming.harness import (
        events_stream,
        run_gate_query,
        split_event_time,
        valid_event_time,
    )

    pin_utc(spark)

    def _valid_side() -> DataFrame:
        return events_stream(spark, sf_dir).filter(valid_event_time())

    agg = streaming_interval_join(
        _valid_side().filter(F.col("event_type") == "purchase"),
        _valid_side().filter(F.col("event_type") == "click"),
    )
    _, rejected = split_event_time(events_stream(spark, sf_dir))
    return run_gate_query(
        spark, agg, "stream_interval_join_gate", quarantine=rejected
    ).select(
        "user_id",
        "purchase_id",
        "click_id",
        F.col("p_ts").cast("timestamp_ntz").alias("p_ts"),
        F.col("c_ts").cast("timestamp_ntz").alias("c_ts"),
        "gap_us",
    )


#: the gate's oracle mirrors the validity boundary on both sides; the
#: batch query (`events_interval_join`) stays unfiltered — batch has no
#: watermark to poison
_STREAM_INTERVAL_ORACLE = f"""
WITH valid AS (SELECT * FROM events WHERE {SQL_EVENT_TIME_VALID})
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.ts AS p_ts,
       c.ts AS c_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM valid p JOIN valid c ON p.user_id = c.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL {JOIN_INTERVAL}
"""

QUERIES = {
    "events_interval_join": events_interval_join,
    "events_stream_interval_join_gate": events_stream_interval_join_gate,
    "events_enriched": events_enriched,
}
ORACLES = {
    "events_interval_join": _INTERVAL_ORACLE,
    # inner stream-stream join must equal the batch join exactly —
    # over validity-filtered events (the gate's ingest boundary)
    "events_stream_interval_join_gate": _STREAM_INTERVAL_ORACLE,
    "events_enriched": _ENRICH_ORACLE,
}
