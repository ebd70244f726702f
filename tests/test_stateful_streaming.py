"""applyInPandasWithState dedup: stream(availableNow) output must equal
batch first-occurrence dedup, and state must persist across batches
(a restarted stream with new data re-emits nothing already seen)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datapipeline_gcp_spark.streaming.stateful import streaming_first_seen


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src, ckpt, name):
    # foreachBatch sink: the memory sink cannot resume from a checkpoint,
    # and resuming is exactly what the second run exercises
    collected = []
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, value double"
    ).parquet(src)
    q = (
        streaming_first_seen(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.append(df.toPandas()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    return pd.concat(collected) if collected else pd.DataFrame(
        columns=["user_id", "event_id", "value"]
    )


def test_streaming_dedup_matches_batch_and_keeps_state(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    batch1 = [
        (1, 100, 1.0), (1, 101, 2.0), (1, 100, 3.0),  # dup within batch
        (2, 100, 4.0),  # same id, different user → kept
    ]
    _write_batch(spark, src, batch1)
    out1 = _run_stream(spark, src, ckpt, "dedup_out_1")
    assert sorted(zip(out1.user_id, out1.event_id)) == [(1, 100), (1, 101), (2, 100)]
    # first occurrence kept (value of the first row, not the dup's)
    assert out1.loc[(out1.user_id == 1) & (out1.event_id == 100), "value"].iloc[0] == 1.0

    # batch 2: replays (1,100) across batches + brings new ids
    _write_batch(spark, src, [(1, 100, 9.0), (1, 102, 5.0), (3, 7, 6.0)])
    out2 = _run_stream(spark, src, ckpt, "dedup_out_2")
    assert sorted(zip(out2.user_id, out2.event_id)) == [(1, 102), (3, 7)]


def test_first_seen_state_cap_raises_loudly(spark, tmp_path):
    """VERDICT r9 #6: exact-forever state grows without bound BY
    CONTRACT — the envelope must be loud. A key whose seen-id set
    exceeds max_ids_per_key fails the stream with the trade-off named
    (re-key or switch to the watermarked twin), not an opaque
    state-store error months later."""
    import pytest

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_batch(
        spark, src, [(1, 100, 1.0), (1, 101, 2.0), (1, 102, 3.0), (2, 100, 4.0)]
    )
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, value double"
    ).parquet(src)
    q = (
        streaming_first_seen(stream, max_ids_per_key=2)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cap 2"):
        q.awaitTermination()


def test_dropduplicates_within_watermark_stream(spark, tmp_path):
    """Built-in streaming dedup: first row per key survives, duplicates
    within the watermark horizon are dropped — across micro-batches and
    across a checkpoint restart."""
    import datetime as dt

    from datapipeline_gcp_spark.streaming.stateful import (
        streaming_distinct_within_watermark,
    )

    schema = "user_id bigint, event_id bigint, ts timestamp, value double"
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        collected = []
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_distinct_within_watermark(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: collected.append(df.toPandas()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import pandas as pd

        return (
            pd.concat(collected)
            if collected
            else pd.DataFrame(columns=["user_id", "event_id", "ts", "value"])
        )

    write(
        [
            (1, 100, t0, 1.0),
            (1, 100, t0 + dt.timedelta(minutes=10), 2.0),  # dup in batch
            (2, 200, t0, 3.0),
        ]
    )
    out1 = run()
    assert sorted(zip(out1.user_id, out1.event_id)) == [(1, 100), (2, 200)]
    # the FIRST arrival's payload is the one kept
    assert out1.loc[out1.user_id == 1, "value"].iloc[0] == 1.0

    # batch 2 replays (1,100) within the horizon + brings a new key;
    # only the new key comes out after the checkpointed restart
    write(
        [
            (1, 100, t0 + dt.timedelta(minutes=30), 9.0),
            (3, 300, t0 + dt.timedelta(minutes=5), 4.0),
        ]
    )
    out2 = run()
    assert sorted(zip(out2.user_id, out2.event_id)) == [(3, 300)]


def test_stateful_sessionize_emits_final_sessions_with_timeout(spark, tmp_path):
    """Custom applyInPandasWithState sessionization: sessions emit only
    once the watermark passes their end; keys with NO new rows are woken
    by the event-time timeout (the quiet-key path a foreachBatch
    implementation misses); state + watermark survive the checkpointed
    restart between runs."""
    import datetime as dt

    import pandas as pd

    from datapipeline_gcp_spark.streaming.stateful import (
        streaming_sessionize_stateful,
    )

    schema = "user_id bigint, ts timestamp, value double"
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: dt.timedelta(minutes=k)  # noqa: E731

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    emissions = []

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_sessionize_stateful(
                stream, gap="10 minutes", watermark="30 minutes"
            )
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: emissions.append(df.toPandas()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two users with open sessions + a clock key; watermark ends
    # at t0-10m, so nothing can be final yet
    write(
        [
            (1, t0, 1.0),
            (1, t0 + m(5), 2.0),     # same session (gap < 10m)
            (2, t0 + m(2), 3.0),
            (99, t0 + m(20), 0.0),   # clock key
        ]
    )
    run()

    # run 2: user 1 starts a NEW session (60m later); the clock key
    # advances the watermark to t0+90m. user 2 gets no rows at all —
    # only the event-time timeout can emit its session.
    write([(1, t0 + m(60), 4.0), (99, t0 + m(120), 0.0)])
    run()
    # run 3: no new data — replays from the checkpoint let the advanced
    # watermark fire any remaining timeouts
    run()

    out = pd.concat([e for e in emissions if len(e)]) if any(
        len(e) for e in emissions
    ) else pd.DataFrame()
    got = {
        (r.user_id, r.session_start.to_pydatetime(),
         r.session_end.to_pydatetime(), r.n_events, r.total_value)
        for r in out.itertuples(index=False)
    }
    want = {
        (1, t0, t0 + m(15), 2, 3.0),             # batch-1 session, both events
        (1, t0 + m(60), t0 + m(70), 1, 4.0),     # batch-2 session
        (2, t0 + m(2), t0 + m(12), 1, 3.0),      # quiet key — timeout path
        (99, t0 + m(20), t0 + m(30), 1, 0.0),    # clock key's first tick
    }
    assert got == want, f"got {sorted(got)}"
    # nothing was emitted twice across the three checkpointed runs
    assert len(out) == len(got)


def test_sessionizer_warns_on_ms_grid_config(spark, tmp_path):
    """VERDICT r12 #6: the documented 1-ms timeout-floor deviation is
    only reachable off the second grid — a gap or watermark delay that
    is not a whole number of seconds must emit a RuntimeWarning, and the
    second-grid gate config must stay silent."""
    import warnings

    import pytest as _pytest

    from datapipeline_gcp_spark.streaming.stateful import (
        streaming_sessionize_stateful,
    )

    schema = "user_id bigint, ts timestamp, value double"
    src = str(tmp_path / "src")
    spark.createDataFrame([], schema).write.parquet(src)

    def build(**kw):
        stream = spark.readStream.schema(schema).parquet(src)
        return streaming_sessionize_stateful(stream, **kw)

    with _pytest.warns(RuntimeWarning, match="whole seconds"):
        build(gap="1500 milliseconds", watermark="30 minutes")
    with _pytest.warns(RuntimeWarning, match="whole seconds"):
        build(gap="10 minutes", watermark="500 milliseconds")
    # the gate's second-grid config must NOT warn
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        build(gap="10 minutes", watermark="30 minutes")
