"""Windowed aggregations over record streams (SURVEY.md §2.7 design
decision: the reference does no record-level streaming math — these are
the standard streaming capabilities a general engine must expose, built
on ``window()`` / ``session_window()`` / ``withWatermark``).

Every builder works on BOTH batch and streaming DataFrames (Spark's
window functions are mode-agnostic), which is how they are verified:
the batch form is oracle-checked against DuckDB SQL, and the streaming
tests assert stream(availableNow) ≡ batch on the same rows.

Scale: streaming state is keyed by (window, group keys); the watermark
bounds state size — without it a 100 TB stream accumulates state
forever. ``DEFAULT_WATERMARK`` is deliberately explicit in the
streaming wrappers.
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
from datapipeline_gcp_spark.schemas import load_testdata, pin_utc
from datapipeline_gcp_spark.streaming.harness import SQL_EVENT_TIME_VALID

DEFAULT_WATERMARK = "10 minutes"


def _project_window(df: DataFrame, extra: list[str]) -> DataFrame:
    return df.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *extra,
    )


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling windows: each event in exactly one [start, start+width)
    bucket, keyed by event_type."""
    events = events.withColumn("value", nan_to_null("value"))
    agg = events.groupBy(F.window("ts", width), "event_type").agg(
        F.count("event_id").alias("n_events"),
        dsum("value").alias("total_value"),
    )
    return _project_window(agg, ["event_type", "n_events", "total_value"])


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide overlapping
    buckets (2 here)."""
    events = events.withColumn("value", nan_to_null("value"))
    agg = events.groupBy(F.window("ts", width, slide), "event_type").agg(
        F.count("event_id").alias("n_events"),
        dsum("value").alias("total_value"),
    )
    return _project_window(agg, ["event_type", "n_events", "total_value"])


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events merge while consecutive gaps are
    < gap; the window end is last-event-time + gap."""
    # NaN measure ≡ NULL in all three builders (r8 nanvalues boundary;
    # determinism.nan_to_null) — shared by the batch queries AND the
    # streaming gates, so one edit covers both execution modes
    events = events.withColumn("value", nan_to_null("value"))
    agg = events.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count("event_id").alias("n_events"),
        dsum("value").alias("total_value"),
    )
    return agg.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "user_id",
        "n_events",
        "total_value",
    )


def streaming_tumbling(
    events_stream: DataFrame,
    width: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming form: watermark bounds state and admits late data up to
    the bound; append-mode emits a window once the watermark passes its
    end."""
    return tumbling_agg(events_stream.withWatermark("ts", watermark), width)


def streaming_session(
    events_stream: DataFrame,
    gap: str = "10 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    return session_agg(events_stream.withWatermark("ts", watermark), gap)


# ---------------------------------------------------------------------------
# Driver-testdata wiring (batch mode) + DuckDB oracles
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, ("events",))["events"]


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(_events(spark, sf_dir))


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(_events(spark, sf_dir))


def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(_events(spark, sf_dir))


def _tumbling_sql(src: str) -> str:
    """Tumbling-agg SQL over event source *src* — shared by the batch
    oracle (raw nansafe events) and the stream-gate oracle (validity-
    filtered events)."""
    return f"""
SELECT
  date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  COUNT(event_id) AS n_events,
  {sql_dsum('value')} AS total_value
FROM {src}
GROUP BY 1, 2, 3
"""


_TUMBLING_ORACLE = _tumbling_sql(SQL_EVENTS_NANSAFE)

# Slide 30 min ⇒ an event belongs to the windows starting at
# trunc30(ts) and trunc30(ts) - 30 min.
_SLIDING_ORACLE = f"""
WITH exploded AS (
  SELECT e.*, s.window_start
  FROM {SQL_EVENTS_NANSAFE} e,
  UNNEST([
    time_bucket(INTERVAL 30 MINUTE, ts),
    time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
  ]) AS s(window_start)
)
SELECT
  window_start,
  window_start + INTERVAL 1 HOUR AS window_end,
  event_type,
  COUNT(event_id) AS n_events,
  {sql_dsum('value')} AS total_value
FROM exploded
GROUP BY 1, 2, 3
"""

# Gaps-and-islands: a new session starts where the gap from the previous
# event is >= 10 min (Spark's session window is end-exclusive: an event
# exactly gap after the last one opens a new session).
def _session_sql(src: str) -> str:
    return f"""
WITH flagged AS (
  SELECT
    user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM {src}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING
    ) AS session_no
  FROM flagged
)
SELECT
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 10 MINUTE AS session_end,
  user_id,
  COUNT(event_id) AS n_events,
  {sql_dsum('value')} AS total_value
FROM numbered
GROUP BY user_id, session_no
"""


_SESSION_ORACLE = _session_sql(SQL_EVENTS_NANSAFE)


def events_stream_tumbling_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the tumbling aggregation as a REAL structured stream —
    ``readStream`` over the events parquet → event-time validity split
    → ``withWatermark`` → windowed agg → append-mode memory sink,
    ``availableNow`` trigger — and return the sink's contents. This is
    the one registry entry where the oracle checks *streaming*
    semantics, not a batch twin:

    Append mode emits a window only once the watermark passes it, and
    the final no-data micro-batch flushes every window the terminal
    watermark ``max(valid ts) − delay`` has closed; windows newer than
    that stay in state and are NOT in the result. The DuckDB oracle
    encodes exactly that contract: the batch tumbling aggregation over
    validity-filtered events restricted to ``window_end <= max(valid
    ts) − delay``. A wrong watermark implementation (dropping data,
    emitting open windows, off-by-one on the closure boundary) breaks
    the hash match.

    The validity split (``harness.split_event_time``) is the r9
    watermark-poisoning defense: without it one corrupt 2099 clock
    advances the watermark a century and silently drops every
    subsequent in-order event. Rejected rows are observable in the
    ``stream_tumbling_gate_quarantine`` memory sink, never silently
    dropped.

    Scale: this is the bounded-state streaming shape for 100 TB/day
    event streams — state is (window × event_type) keyed and the
    watermark caps it at (delay / width + 1) windows per key; the
    memory sink holds only closed aggregate rows (window-cardinality,
    not event-cardinality). ``availableNow`` is also the production
    backfill pattern: replay a parquet landing zone through the SAME
    query that tails the live stream.
    """
    from datapipeline_gcp_spark.streaming.harness import (
        events_stream,
        run_gate_query,
        split_event_time,
    )

    pin_utc(spark)
    valid, rejected = split_event_time(events_stream(spark, sf_dir))
    agg = streaming_tumbling(valid)
    return run_gate_query(
        spark, agg, "stream_tumbling_gate", quarantine=rejected
    ).select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


#: oracle mirror of the gates' event-time validity boundary: the agg
#: source and the terminal watermark both see VALID rows only (an
#: invalid clock can neither contribute to a window nor poison the
#: watermark); the rejected rows land in the quarantine sink, which the
#: harness tests assert directly.
_SQL_EVENTS_STREAM_SAFE = (
    f"(SELECT * FROM {SQL_EVENTS_NANSAFE} WHERE {SQL_EVENT_TIME_VALID})"
)
_SQL_VALID_TERMINAL_WM = (
    f"(SELECT max(ts) - INTERVAL 10 MINUTE FROM events"
    f" WHERE {SQL_EVENT_TIME_VALID})"
)

#: append-mode closure: the terminal watermark is max(valid ts) − delay
#: and a window is emitted iff the watermark passed its end
_STREAM_TUMBLING_ORACLE = f"""
WITH agg AS ({_tumbling_sql(_SQL_EVENTS_STREAM_SAFE)})
SELECT * FROM agg
WHERE window_end <= {_SQL_VALID_TERMINAL_WM}
"""


def events_stream_session_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window twin of :func:`events_stream_tumbling_gate`:
    readStream → watermark → ``session_window`` agg → append-mode
    memory sink (availableNow). Session state is the harder case the
    gate should pin — windows MERGE as events arrive (two sessions
    within gap collapse into one), so wrong merge logic silently
    corrupts aggregates in a way the batch twin can't reveal; the
    closure rule is the same (a session emits once the terminal
    watermark ``max(ts) − delay`` passes its end = last event + gap).

    Scale: state per (user, open session); the gap bounds merge scope
    and the watermark expires closed sessions — the unbounded-key
    analogue of the tumbling case's fixed window count per key.
    Event-time validity split + observable quarantine: same
    watermark-poisoning defense as the tumbling gate.
    """
    from datapipeline_gcp_spark.streaming.harness import (
        events_stream,
        run_gate_query,
        split_event_time,
    )

    pin_utc(spark)
    valid, rejected = split_event_time(events_stream(spark, sf_dir))
    agg = streaming_session(valid)
    return run_gate_query(
        spark, agg, "stream_session_gate", quarantine=rejected
    ).select(
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        "n_events",
        "total_value",
    )


_STREAM_SESSION_ORACLE = f"""
WITH agg AS ({_session_sql(_SQL_EVENTS_STREAM_SAFE)})
SELECT * FROM agg
WHERE session_end <= {_SQL_VALID_TERMINAL_WM}
"""


QUERIES = {
    "events_stream_tumbling_gate": events_stream_tumbling_gate,
    "events_stream_session_gate": events_stream_session_gate,
    "events_tumbling_window": events_tumbling,
    "events_sliding_window": events_sliding,
    "events_session_window": events_session,
}

ORACLES = {
    "events_stream_tumbling_gate": _STREAM_TUMBLING_ORACLE,
    "events_stream_session_gate": _STREAM_SESSION_ORACLE,
    "events_tumbling_window": _TUMBLING_ORACLE,
    "events_sliding_window": _SLIDING_ORACLE,
    "events_session_window": _SESSION_ORACLE,
}
