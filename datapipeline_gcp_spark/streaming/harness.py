"""Shared harness for the registered structured-streaming GATE queries.

Every gate runs one ``availableNow`` batch of a real ``readStream``
pipeline into an append-mode memory sink and returns the sink table —
the semantics under test (watermark closure, session merge, join state)
live in the streaming plan, not here.

``run_gate_query`` applies the gate-harness cost settings
(VERDICT r3 #5): stateful operators materialize state stores per
shuffle partition (4 per side for a stream-stream join) plus per-batch
checkpoint commits, so at the session default of 32 partitions the
fixed machinery dwarfed the actual work (8 s for a 371-row interval
join at sf0.1). One availableNow batch at 8 partitions with the
checkpoint on tmpfs cuts that 4× and changes NO emitted row — values
are deterministic under any partitioning, so the CORRECTNESS hash is
identical. Both settings are restored/cleaned up afterwards; they are
bench-harness choices, not engine policy — a production deployment
sizes ``spark.sql.shuffle.partitions`` to the stream's key cardinality
and checkpoints to durable storage.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

GATE_SHUFFLE_PARTITIONS = "8"


def run_gate_query(spark: SparkSession, agg: DataFrame, name: str) -> DataFrame:
    """Run *agg* (a streaming DataFrame) through one availableNow
    append-mode batch into memory sink *name*; return the sink table."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(dir=ckpt_base, prefix="gate_ckpt_")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", GATE_SHUFFLE_PARTITIONS)
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
