"""Streaming exactly-once ingest dedup (``dropDuplicatesWithinWatermark``).

The ingest-side twin of the batch dedup family (`functions/dedup.py`):
an event bus redelivers (at-least-once semantics), an idempotent
pipeline must drop the redeliveries BEFORE they land — the reference's
Pub/Sub consumer (`/root/reference/messaging/consumer/main.py:39-74`)
gets this for free from GCS object overwrite; a Spark ingest gets it
from watermark-scoped dedup state.

Why ``dropDuplicatesWithinWatermark`` and not plain ``dropDuplicates``:
on a stream, plain dropDuplicates keeps EVERY key ever seen in state —
unbounded growth, the classic slow-death of a streaming job.
``dropDuplicatesWithinWatermark`` expires a key's state once the
watermark passes it, bounding state to (watermark delay × arrival
rate) — the deliberate trade: a duplicate arriving later than the
delay is no longer caught, which is exactly the delivery-window
contract real buses (Pub/Sub, Kinesis) give you anyway.

Scale: state is keyed by the dedup key and hash-partitioned like any
stateful operator; at 100 TB/day the delay bounds state to the
redelivery horizon, not the corpus. The registered gate proves the
exactly-once property: the input stream is the events file UNIONED
WITH ITSELF (every row delivered twice — a worst-case redelivery
storm) and the output must equal the batch DISTINCT of the key column,
which is the DuckDB oracle. A dedup that leaks duplicates doubles the
row count; one that drops too much loses keys — both break the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.streaming.harness import SQL_EVENT_TIME_VALID

DEDUP_WATERMARK = "2 hours"


def streaming_ingest_dedup(
    stream: DataFrame,
    keys: list[str],
    watermark: str = DEDUP_WATERMARK,
    project_keys: bool = True,
) -> DataFrame:
    """Watermark-bounded exactly-once dedup on *keys*; by default emits
    the key columns only (which physical row survives a redelivery is
    bus-dependent and deliberately not part of the contract).
    ``project_keys=False`` keeps the full row — for pipelines whose key
    is unique per logical record (e.g. an event id), where every
    surviving row is identical no matter which delivery won (the e2e
    ingest gate's case)."""
    out = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )
    return out.select(*keys) if project_keys else out


def events_stream_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redelivery-storm gate: every event delivered twice (self-union
    of the source), exactly-once output proven against batch DISTINCT
    over validity-filtered events. The event-time validity split sits
    BEFORE the union's watermark (r9 watermark-poisoning defense): a
    corrupt clock must not expire every honest key's dedup state.
    Rejected deliveries (BOTH copies of a corrupt-clock event — the
    quarantine sees deliveries, not logical events) are observable in
    ``stream_dedup_gate_quarantine``."""
    from datapipeline_gcp_spark.schemas import pin_utc
    from datapipeline_gcp_spark.streaming.harness import (
        events_stream,
        run_gate_query,
        split_event_time,
    )

    pin_utc(spark)
    # at-least-once: everything twice
    doubled = events_stream(spark, sf_dir).union(events_stream(spark, sf_dir))
    valid, rejected = split_event_time(doubled)
    agg = streaming_ingest_dedup(valid, ["event_id"])
    return run_gate_query(
        spark, agg, "stream_dedup_gate", quarantine=rejected
    ).select("event_id")


_DEDUP_GATE_ORACLE = f"""
SELECT DISTINCT event_id FROM events WHERE {SQL_EVENT_TIME_VALID}
"""

QUERIES = {
    "events_stream_dedup_gate": events_stream_dedup_gate,
}
ORACLES = {
    "events_stream_dedup_gate": _DEDUP_GATE_ORACLE,
}
