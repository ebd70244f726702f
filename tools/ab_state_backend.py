"""State-store backend A/B for the stateful streaming family (VERDICT
r13 #8): HDFS-backed (default) vs RocksDB provider, interleaved in one
session over an N× events fixture split into micro-batches, composing
with the r12 state-growth table (tools/probe_state_growth.py).

For each operator (sessionize / first_seen / dropDuplicatesWithin-
Watermark) the probe alternates backend rep-for-rep, times the full
availableNow run, records last-batch state rows/bytes from the
streaming progress, and asserts the two backends produce IDENTICAL
sink outputs (collected and compared). It then re-runs the three
registered stateful gate queries under the RocksDB provider and
asserts row-identity against their default-backend outputs — "gates
green on both backends" without needing the DuckDB oracle here (the
default-backend outputs are the oracle-proven ones).

Usage:
    python tools/ab_state_backend.py [--sf=/tmp/sf_scale64]
        [--batches=8] [--reps=3]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def main() -> None:
    sf = "/tmp/sf_scale64"
    n_batches = 8
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--batches="):
            n_batches = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    from datapipeline_gcp_spark.schemas import pin_utc
    from datapipeline_gcp_spark.session import get_session
    from datapipeline_gcp_spark.streaming.harness import split_event_time
    from datapipeline_gcp_spark.streaming.stateful import (
        streaming_first_seen,
        streaming_sessionize_stateful,
    )

    spark = get_session(
        app_name="ab_state_backend",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_utc(spark)
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    default_provider = spark.conf.get(conf_key)

    workdir = tempfile.mkdtemp(prefix="ab_state_fixture_")
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    try:
        src = spark.read.parquet(f"{sf}/events.parquet")
        path = os.path.join(workdir, "events.parquet")
        (
            src.repartitionByRange(n_batches, F.col("ts"))
            .write.mode("overwrite")
            .parquet(path)
        )
        schema = spark.read.parquet(path).schema
        n_rows = spark.read.parquet(path).count()
        print(f"fixture: {sf} -> {n_rows:,} events in {n_batches} batches")

        def stream():
            s = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
            )
            return s.withColumn("ts", F.col("ts").cast("timestamp"))

        def sessionized():
            valid, _ = split_event_time(stream())
            return streaming_sessionize_stateful(valid)

        def first_seen():
            valid, _ = split_event_time(stream())
            return streaming_first_seen(valid)

        def dedup_within():
            valid, _ = split_event_time(stream())
            return (
                valid.withWatermark("ts", "1 hour")
                .dropDuplicatesWithinWatermark(["event_id"])
                .select("event_id", "user_id", "event_type")
            )

        def run_once(builder, provider):
            spark.conf.set(conf_key, provider)
            ckpt = tempfile.mkdtemp(dir=ckpt_base, prefix="ab_state_ckpt_")
            out = tempfile.mkdtemp(dir=ckpt_base, prefix="ab_state_out_")
            try:
                t0 = time.monotonic()
                q = (
                    builder()
                    .writeStream.format("parquet")
                    .option("path", out)
                    .outputMode("append")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                wall = time.monotonic() - t0
                st_rows = st_mb = commit_ms = 0
                for p in q.recentProgress:
                    for op in p.get("stateOperators") or []:
                        st_rows = op.get("numRowsTotal", st_rows)
                        st_mb = op.get("memoryUsedBytes", 0) / 1e6
                        commit_ms += op.get("commitTimeMs", 0)
                rows = spark.read.parquet(out).collect()
                sink = sorted(tuple(repr(v) for v in r) for r in rows)
                return wall, st_rows, st_mb, commit_ms, sink
            finally:
                spark.conf.set(conf_key, default_provider)
                shutil.rmtree(ckpt, ignore_errors=True)
                shutil.rmtree(out, ignore_errors=True)

        print(
            "\n| operator | backend | wall s (reps) | min | state rows "
            "| state MB | commit ms |"
        )
        print("|---|---|---|---|---|---|---|")
        for name, builder in (
            ("sessionize_stateful", sessionized),
            ("first_seen", first_seen),
            ("dedup_within_watermark", dedup_within),
        ):
            runs = {HDFS: [], ROCKSDB: []}
            sinks = {}
            for _ in range(reps):
                for prov in (HDFS, ROCKSDB):
                    wall, st_rows, st_mb, commit_ms, sink = run_once(
                        builder, prov
                    )
                    runs[prov].append((wall, st_rows, st_mb, commit_ms))
                    sinks.setdefault(prov, sink)
            assert sinks[HDFS] == sinks[ROCKSDB], f"{name}: outputs differ!"
            for prov, label in ((HDFS, "hdfs"), (ROCKSDB, "rocksdb")):
                walls = [r[0] for r in runs[prov]]
                last = runs[prov][-1]
                print(
                    f"| {name} | {label} | "
                    f"{', '.join(f'{w:.2f}' for w in walls)} | "
                    f"{min(walls):.2f} | {last[1]:,} | {last[2]:,.1f} | "
                    f"{last[3]:,} |"
                )
            print(f"|  | ({name}: sinks identical) | | | | | |")

        # --- gates, both backends, row-identical ----------------------
        from datapipeline_gcp_spark import registry

        qs = registry.all_queries()
        for gate in (
            "events_stream_stateful_session_gate",
            "events_stream_first_seen_gate",
            "events_stream_dedup_gate",
        ):
            base_sf = "/root/testdata/sf0.01"
            ref = sorted(
                tuple(repr(v) for v in r)
                for r in qs[gate](spark, base_sf).collect()
            )
            spark.conf.set(conf_key, ROCKSDB)
            try:
                got = sorted(
                    tuple(repr(v) for v in r)
                    for r in qs[gate](spark, base_sf).collect()
                )
            finally:
                spark.conf.set(conf_key, default_provider)
            status = "IDENTICAL" if ref == got else "DIFFER"
            print(f"gate {gate}: default vs rocksdb outputs {status} "
                  f"({len(ref)} rows)")
            assert ref == got
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
