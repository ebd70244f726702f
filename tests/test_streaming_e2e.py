"""End-to-end ingest composition gate (streaming/e2e.py): router +
watermark dedup + append + deferred archival in one run. The gate
itself asserts archival completeness (it raises if landing files
remain); these tests pin batch equivalence and idempotence across
re-runs at smoke scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_gcp_spark.streaming.e2e import (
    ASSET_GATE_TABLE,
    CROSSRUN_TABLE,
    GATE_TABLE,
    dedup_stream_incremental_gate,
    events_stream_crossrun_redelivery_gate,
    events_stream_e2e_ingest_gate,
    multimodal_stream_ingest_gate,
)

from tests.conftest import SF_SMOKE


def test_e2e_gate_matches_batch_distinct(spark):
    out = events_stream_e2e_ingest_gate(spark, SF_SMOKE)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert out.count() == ev.count()  # every event once, none twice
    got = {r["event_id"] for r in out.select("event_id").collect()}
    want = {r["event_id"] for r in ev.select("event_id").collect()}
    assert got == want


def test_e2e_gate_rerun_is_idempotent(spark):
    """A second full run must rebuild the table from scratch (DROP at
    entry), not append onto the previous run's rows."""
    a = events_stream_e2e_ingest_gate(spark, SF_SMOKE).count()
    b = events_stream_e2e_ingest_gate(spark, SF_SMOKE).count()
    assert a == b
    assert spark.table(GATE_TABLE).groupBy("event_id").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_crossrun_gate_matches_batch_distinct(spark):
    """Cross-run redelivery (VERDICT r5 #2): a second availableNow run
    on the same checkpoint redelivers two whole landing files — the
    table must still equal batch DISTINCT (no dup leak through the
    restored state/watermark, no loss) and the gate itself asserts both
    runs' files archived (it raises otherwise — the seam where archival
    must come from the source log, not surviving rows)."""
    out = events_stream_crossrun_redelivery_gate(spark, SF_SMOKE)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert out.count() == ev.count()
    got = {r["event_id"] for r in out.select("event_id").collect()}
    want = {r["event_id"] for r in ev.select("event_id").collect()}
    assert got == want
    assert spark.table(CROSSRUN_TABLE).groupBy("event_id").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_multimodal_gate_matches_batch_phash_distinct(spark):
    """Binary-payload ingest (VERDICT r6 #2): streaming phash dedup over
    redelivered asset shards must land exactly the batch-distinct aHash
    set — a leaked redelivery or an uncollapsed planted duplicate writes
    a repeated hash; a lost shard loses hashes. The gate itself asserts
    archival completeness for all five shards."""
    from datapipeline_gcp_spark.functions.multimodal import (
        ahash_stage,
        phash_stream_assets,
    )

    out = multimodal_stream_ingest_gate(spark, SF_SMOKE)
    batch = ahash_stage(
        phash_stream_assets(spark, SF_SMOKE).select("asset_id", "payload")
    )
    want = {r["ahash"] for r in batch.select("ahash").distinct().collect()}
    got = [r["ahash"] for r in out.collect()]
    assert set(got) == want
    assert len(got) == len(want)  # append-exactly-once: no repeated hash
    assert spark.table(ASSET_GATE_TABLE).columns == ["ahash"]  # no payload landed


def test_incremental_dedup_gate_matches_one_shot_incremental(spark):
    """Streaming composition (VERDICT r6 #6): per-micro-batch index
    probe + component merge across TWO checkpointed runs must produce
    the exact component map of the one-shot ``dedup_clusters_incremental``
    query (itself oracle-proven against full recursive-CTE CC) — and the
    gate internally asserts no batch was reprocessed and the persisted
    index grew by exactly each batch's banded rows."""
    from datapipeline_gcp_spark.functions.clusters import (
        dedup_clusters_incremental,
    )

    got = sorted(
        tuple(r) for r in dedup_stream_incremental_gate(spark, SF_SMOKE).collect()
    )
    want = sorted(
        tuple(r) for r in dedup_clusters_incremental(spark, SF_SMOKE).collect()
    )
    assert got == want
