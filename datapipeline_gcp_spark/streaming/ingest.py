"""Event-driven ingestion as Structured Streaming (SURVEY.md §2.7 E1-E4).

The reference's event path is: GCS object-finalize → Pub/Sub message
carrying the object name (``messaging/producer/main.py:4-9``) → consumer
parses ``{table}_{date}_{uuid}.{ext}`` from the name and triggers DAG
``load_{table}_{ext}`` (``messaging/consumer/main.py:39-74``) → that DAG
loads the file into its raw table and archives it
(``load_campaigns_csv.py:115-141``).

Spark-native redesign: the landing directory IS the topic — a streaming
file source discovers new files; ``foreachBatch`` appends the batch to
the raw table and only then archives exactly the files that fed the
batch (``_metadata.file_path``), preserving the reference's
load-then-archive ordering with exactly-once per-batch semantics (file
source tracks processed files in the checkpoint; a replayed batch
re-reads the same files).

Routing (E2): ``stream_landing_router`` runs one stream per (table,
format), the "simpler, chosen" design from SURVEY §2.7 — each stream's
glob plays the consumer's filename-parse-and-dispatch. The parse itself
(P9 string ops on ``_metadata.file_path``) is exposed as
``parse_landing_filename`` for the shared-stream alternative.

Scale notes: the file-source maxFilesPerTrigger caps per-batch work;
checkpointed offsets make restarts exactly-once into the idempotent
(partition-overwrite) sink or at-least-once into the append sink —
same trade the reference's BQ loads made. Streaming appends create
small files; ``compact_table`` is the periodic rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from datapipeline_gcp_spark import sinks


def parse_landing_filename(col: F.Column) -> tuple[F.Column, F.Column]:
    """E2/P9 — extract (table, ext) from a landing path
    ``.../{table}_{yyyymmdd}_{hex}.{ext}`` with built-in string ops
    (the consumer's ``split('_')`` / ``split('.')`` routing,
    ``messaging/consumer/main.py:51-53``)."""
    fname = F.element_at(F.split(col, "/"), -1)
    table = F.element_at(F.split(fname, "_"), 1)
    ext = F.lower(F.element_at(F.split(fname, r"\."), -1))
    return table, ext


def stream_landing_table(
    spark: SparkSession,
    landing_dir: str,
    table: str,
    fmt: str,
    schema: T.StructType,
    target_table: str,
    archive_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
    on_batch=None,
) -> StreamingQuery:
    """One (table, format) ingestion stream: landing glob → raw table
    append → archive the batch's files. Returns the started query;
    with ``available_now`` it drains what exists and finishes (the
    test/poll mode, E3's ``trigger(availableNow=True)``).

    ``on_batch(spark, batch_id)`` runs after each committed batch — the
    E3 "trigger downstream" hook (the reference POSTs the Airflow REST
    API to run the dependent DAG; here the dependent transform runs
    in-process, e.g. refresh the master join for the new rows)."""
    path = f"{landing_dir}/{fmt}"
    os.makedirs(path, exist_ok=True)
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", f"{table}_*.{fmt}")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    )
    if fmt == "txt":
        stream = reader.option("sep", "\t").option("header", False).csv(path)
    else:
        stream = reader.option("header", True).csv(path)
    stream = stream.select("*", F.col("_metadata.file_path").alias("_src"))

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.cache()
        try:
            files = [r._src for r in batch.select("_src").distinct().collect()]
            sinks.append_table(batch.drop("_src"), target_table)
            for f in files:  # archive only after the append committed (K4)
                # _metadata.file_path is a URI ("file:/x" or "file:///x")
                local = f.split(":", 1)[1] if f.startswith("file:") else f
                while local.startswith("//"):
                    local = local[1:]
                sinks.archive_files(local, archive_dir)
            sinks.write_manifest(files, f"{archive_dir}/_manifests", str(batch_id))
            # foreachBatch runs in a cloned session: its append invalidates
            # the clone's relation cache only — refresh the outer session's
            # view of the table or subsequent reads see a stale file list.
            spark.catalog.refreshTable(target_table)
            if on_batch is not None:
                on_batch(spark, batch_id)
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_landing_router(
    spark: SparkSession,
    landing_dir: str,
    routes: dict[tuple[str, str], tuple[T.StructType, str]],
    archive_dir: str,
    checkpoint_root: str,
    available_now: bool = True,
) -> dict[tuple[str, str], StreamingQuery]:
    """E2 — the full router: one stream per (table, fmt) route, e.g.
    ``{("campaigns", "csv"): (schemas.CAMPAIGNS, "raw_layer.r_campaigns")}``.
    Unknown files simply match no glob — the reference's
    unknown-extension → monitoring no-op branch."""
    queries = {}
    for (table, fmt), (schema, target) in routes.items():
        queries[(table, fmt)] = stream_landing_table(
            spark,
            landing_dir,
            table,
            fmt,
            schema,
            target,
            archive_dir,
            f"{checkpoint_root}/{table}_{fmt}",
            available_now=available_now,
        )
    return queries


def drain(queries) -> None:
    """Wait for availableNow queries to finish (test helper)."""
    qs = queries.values() if isinstance(queries, dict) else [queries]
    for q in qs:
        q.awaitTermination()


def compact_table(
    spark: SparkSession, table: str, target_file_rows: int = 1_000_000
) -> None:
    """Small-file compaction for streaming-append tables: rewrite the
    table coalesced to ~``target_file_rows`` rows per file. Streaming
    micro-batches write a few small files each; at scale this periodic
    rewrite keeps scan task counts sane (SURVEY.md §4 "small-file
    compaction")."""
    df = spark.table(table).cache()
    try:
        n = df.count()
        parts = max(1, n // target_file_rows)
        tmp = f"{table}__compact_tmp"
        df.coalesce(parts).write.mode("overwrite").saveAsTable(tmp)
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    finally:
        df.unpersist()
