"""End-to-end streaming ingest composition gate (VERDICT r4 #6): the
landing-file router, the watermark-bounded exactly-once dedup, the raw
table append, and the crash-safe deferred archival — composed into ONE
running pipeline and proven against the batch equivalent.

This is the full Spark-native redesign of the reference's event path
(GCS finalize → Pub/Sub → consumer routes by filename → load DAG →
archive; ``/root/reference/messaging/consumer/main.py:39-74``,
``load_campaigns_csv.py:115-141``) exercised end to end: the pieces are
individually gated (router e2e tests, ``events_stream_dedup_gate``,
archival crash-replay tests), but only a composed run proves the seams
— that the dedup operator rides the ingest checkpoint, that the append
sees deduped rows, that archival fires for a transformed stream.

The gate: the driver's events table is written out as THREE landing
CSV files (hash-split by event id), and two of them are written AGAIN
under new object names — a bus redelivering whole objects, the
at-least-once failure mode the reference absorbs via GCS overwrite.
One ``availableNow`` run of ``stream_landing_table`` with
``transform=streaming_ingest_dedup`` must land exactly the distinct
events in the raw table, and drain() must archive the landing files.
Oracle: the events table itself (event ids are unique, so batch
equivalence is plain SELECT — a leaked duplicate doubles rows, an
over-eager dedup loses rows, a broken route loses a whole file's
worth).

Scale: identical machinery to production — file-source globbing,
maxFilesPerTrigger batching, hash-partitioned dedup state bounded by
the watermark, append sink, post-commit archival. The redelivered
files land in the same trigger here (deterministic single-batch gate);
cross-trigger redelivery is the already-proven
``events_stream_dedup_gate`` contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_gcp_spark.schemas import load_testdata, pin_utc
from datapipeline_gcp_spark.sources.generators import write_landing_file
from datapipeline_gcp_spark.streaming.dedup import streaming_ingest_dedup
from datapipeline_gcp_spark.streaming.harness import GATE_SHUFFLE_PARTITIONS
from datapipeline_gcp_spark.streaming.ingest import drain, stream_landing_table

N_PARTS = 3
REDELIVERED_PARTS = (0, 1)  # these parts arrive twice
GATE_TABLE = "gate_e2e_raw_events"
CROSSRUN_TABLE = "gate_crossrun_raw_events"

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    )


def _drop_gate_table(spark: SparkSession, table: str) -> None:
    """DROP plus managed-location cleanup: a crashed earlier run can
    leave the location behind after the catalog entry is gone —
    saveAsTable then refuses the name."""
    from datapipeline_gcp_spark.streaming.ingest import _local_path

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(os.path.join(_local_path(wh), table), ignore_errors=True)


def events_stream_e2e_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_utc(spark)
    ev = _load_events(spark, sf_dir)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(dir=base, prefix="gate_e2e_")
    landing = f"{root}/landing"
    archive = f"{root}/archive"
    ckpt = f"{root}/ckpt"
    _drop_gate_table(spark, GATE_TABLE)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        parts = {
            i: ev.filter(F.pmod(F.col("event_id"), N_PARTS) == i)
            for i in range(N_PARTS)
        }
        for i in range(N_PARTS):
            write_landing_file(parts[i], landing, "events", "csv", "20240101")
        for i in REDELIVERED_PARTS:  # same rows, new object name
            write_landing_file(parts[i], landing, "events", "csv", "20240101")

        spark.conf.set("spark.sql.shuffle.partitions", GATE_SHUFFLE_PARTITIONS)
        stream = stream_landing_table(
            spark,
            landing,
            "events",
            "csv",
            _CSV_SCHEMA,
            GATE_TABLE,
            archive,
            ckpt,
            transform=lambda s: streaming_ingest_dedup(
                s, ["event_id"], project_keys=False
            ),
        )
        drain(stream)
        n_landing = len(os.listdir(f"{landing}/csv"))
        n_archived = len(
            [f for f in os.listdir(archive) if f.endswith(".csv")]
        )
        if n_landing or n_archived != N_PARTS + len(REDELIVERED_PARTS):
            raise AssertionError(
                f"archival incomplete: {n_landing} still landing, "
                f"{n_archived} archived"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(root, ignore_errors=True)
    return spark.table(GATE_TABLE).select("event_id", "user_id", "event_type")


def events_stream_crossrun_redelivery_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The cross-RUN redelivery seam (VERDICT r5 #2): the single-batch
    e2e gate deliberately keeps redelivery inside one trigger; this gate
    proves the composition across a checkpoint RESTART — the reference's
    at-least-once Pub/Sub path redelivering an object days later, after
    the consumer restarted (``messaging/consumer/main.py:39-74``).

    Run 1 ingests all three landing files to completion (one batch —
    the files hash-split the full time range, so a single trigger is
    the correct watermark posture) and archives them. Then two of the
    parts are written AGAIN under new object names and a SECOND
    ``availableNow`` run starts on the SAME checkpoint. Everything the
    second run sees is a duplicate, and both defenses the checkpoint
    carries must hold: keys still inside the watermark horizon are
    dropped by restored dedup state; keys older than the restored
    watermark are dropped by the stateful operator's late-data filter.
    Either leak doubles rows vs the batch oracle. Archival must fire
    for BOTH runs' files even though run 2 emits zero surviving rows —
    exactly the seam the source-log-derived pending set exists for
    (``ingest._source_log_files``); a row-derived fallback would strand
    run 2's files in landing, which this gate asserts against."""
    pin_utc(spark)
    ev = _load_events(spark, sf_dir)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(dir=base, prefix="gate_crossrun_")
    landing = f"{root}/landing"
    archive = f"{root}/archive"
    ckpt = f"{root}/ckpt"
    _drop_gate_table(spark, CROSSRUN_TABLE)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        parts = {
            i: ev.filter(F.pmod(F.col("event_id"), N_PARTS) == i)
            for i in range(N_PARTS)
        }
        spark.conf.set("spark.sql.shuffle.partitions", GATE_SHUFFLE_PARTITIONS)

        def start_run() -> None:
            stream = stream_landing_table(
                spark,
                landing,
                "events",
                "csv",
                _CSV_SCHEMA,
                CROSSRUN_TABLE,
                archive,
                ckpt,
                transform=lambda s: streaming_ingest_dedup(
                    s, ["event_id"], project_keys=False
                ),
            )
            drain(stream)

        def check_archival(run: str, want_archived: int) -> None:
            n_landing = len(os.listdir(f"{landing}/csv"))
            n_archived = len(
                [f for f in os.listdir(archive) if f.endswith(".csv")]
            )
            if n_landing or n_archived != want_archived:
                raise AssertionError(
                    f"{run}: archival incomplete: {n_landing} still "
                    f"landing, {n_archived} archived (want {want_archived})"
                )

        for i in range(N_PARTS):
            write_landing_file(parts[i], landing, "events", "csv", "20240101")
        start_run()
        check_archival("run 1", N_PARTS)
        # the bus redelivers two whole objects AFTER the pipeline run
        # finished — new object names, same rows
        for i in REDELIVERED_PARTS:
            write_landing_file(parts[i], landing, "events", "csv", "20240101")
        start_run()  # same checkpoint: restored state + watermark
        check_archival("run 2", N_PARTS + len(REDELIVERED_PARTS))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(root, ignore_errors=True)
    return spark.table(CROSSRUN_TABLE).select(
        "event_id", "user_id", "event_type"
    )


_E2E_ORACLE = """
SELECT event_id, user_id, event_type FROM events
"""

QUERIES = {
    "events_stream_e2e_ingest_gate": events_stream_e2e_ingest_gate,
    "events_stream_crossrun_redelivery_gate": events_stream_crossrun_redelivery_gate,
}
ORACLES = {
    "events_stream_e2e_ingest_gate": _E2E_ORACLE,
    "events_stream_crossrun_redelivery_gate": _E2E_ORACLE,
}
