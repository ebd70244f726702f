"""State-store growth probe for the stateful streaming family at scale
(VERDICT r12 #5): run the three state-backed gate operators over an N×
events fixture split into multiple micro-batches, and record the state
store's rows/bytes per batch from the streaming progress metrics.

The 100 TB question these numbers answer: how does STATE SIZE scale
with input for each operator's contract —

- ``streaming_sessionize_stateful``: state = events not yet in a final
  session, bounded by the watermark horizon (expect state rows << input
  rows once the watermark advances, and a final-batch flush toward 0);
- ``streaming_first_seen`` (exact-forever): state = every id ever seen
  per key — expect state rows == cumulative distinct ids (linear), the
  documented unbounded contract, with the ``max_ids_per_key`` cap loud;
- ``dropDuplicatesWithinWatermark``: state = ids within the delay
  horizon — bounded by (arrival rate × delay), expiring as the
  watermark passes.

Usage:
    python tools/probe_state_growth.py [--sf=/tmp/sf_scale64]
        [--batches=8] [--ops=session,firstseen,dedup]

Prints one markdown table per operator: batch, input rows, state rows,
state bytes (memoryUsedBytes), rows updated/removed.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _split_events(spark, sf_dir: str, n_files: int, workdir: str) -> str:
    """Rewrite the fixture's events as n_files parquet files under a
    directory layout (the manyfiles/production shape events_stream
    already handles), so maxFilesPerTrigger yields real micro-batches.
    Files are range-split on ts so batches arrive roughly in event-time
    order — the shape a replayed log has, and the one that lets the
    watermark advance per batch instead of jumping to max on batch 0."""
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = os.path.join(workdir, "events.parquet")
    (
        src.repartitionByRange(n_files, F.col("ts"))
        .write.mode("overwrite")
        .parquet(out)
    )
    return workdir


def _run(spark, stream_df, name: str, files_per_trigger_hint: str) -> list:
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(dir=ckpt_base, prefix=f"state_probe_{name}_")
    try:
        q = (
            stream_df.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return list(q.recentProgress)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def _report(name: str, progresses: list) -> None:
    print(f"\n### {name}")
    print("| batch | input rows | state rows | state MB | updated | removed |")
    print("|---|---|---|---|---|---|")
    cum_in = 0
    for p in progresses:
        ops = p.get("stateOperators") or []
        n_in = p.get("numInputRows", 0)
        cum_in += n_in
        if not ops:
            continue
        st = ops[0]
        mb = st.get("memoryUsedBytes", 0) / 1e6
        print(
            f"| {p.get('batchId')} | {n_in:,} | "
            f"{st.get('numRowsTotal', 0):,} | {mb:,.1f} | "
            f"{st.get('numRowsUpdated', 0):,} | "
            f"{st.get('numRowsRemoved', 0):,} |"
        )
    print(f"(cumulative input rows: {cum_in:,})")


def main() -> None:
    sf = "/tmp/sf_scale64"
    n_batches = 8
    ops = {"session", "firstseen", "dedup"}
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--batches="):
            n_batches = int(a.split("=", 1)[1])
        elif a.startswith("--ops="):
            ops = set(a.split("=", 1)[1].split(","))

    from datapipeline_gcp_spark.schemas import pin_utc
    from datapipeline_gcp_spark.session import get_session
    from datapipeline_gcp_spark.streaming.harness import split_event_time
    from datapipeline_gcp_spark.streaming.stateful import (
        streaming_first_seen,
        streaming_sessionize_stateful,
    )

    spark = get_session(
        app_name="probe_state_growth",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_utc(spark)

    workdir = tempfile.mkdtemp(prefix="state_probe_fixture_")
    try:
        probe_dir = _split_events(spark, sf, n_batches, workdir)
        path = f"{probe_dir}/events.parquet"
        schema = spark.read.parquet(path).schema

        def stream(files_per_trigger: int = 1):
            s = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", files_per_trigger)
                .parquet(path)
            )
            return s.withColumn("ts", F.col("ts").cast("timestamp"))

        n_rows = spark.read.parquet(path).count()
        print(f"fixture: {sf} -> {n_rows:,} events in {n_batches} batches")

        if "session" in ops:
            valid, _ = split_event_time(stream())
            agg = streaming_sessionize_stateful(valid)
            _report(
                "streaming_sessionize_stateful (watermark-bounded buffer)",
                _run(spark, agg, "session", "1"),
            )
        if "firstseen" in ops:
            s = stream().select("user_id", "event_id", "event_type", "value")
            out = streaming_first_seen(s)
            _report(
                "streaming_first_seen (exact-forever seen-id sets)",
                _run(spark, out, "firstseen", "1"),
            )
        if "dedup" in ops:
            valid, _ = split_event_time(stream())
            out = valid.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
                ["user_id", "event_id"]
            )
            _report(
                "dropDuplicatesWithinWatermark (horizon-bounded)",
                _run(spark, out, "dedup", "1"),
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
