"""Late / out-of-order events BEYOND the watermark horizon (VERDICT r10
#8): when files arrive one per micro-batch, which late rows drop, which
aggregate, and which windows emit — checked against an independent
in-test simulator of the watermark contract, not against Spark's own
output re-read.

The EMPIRICAL contract (established by probing Spark 4.1.2 and encoded
in ``_simulate``; the naive textbook model is wrong in two ways):

- the eviction/emission watermark in force during batch N is computed
  from event times through batch N-1 (one-batch lag, readable as
  ``batchWatermarkMs`` in the checkpoint offset log);
- the LATE-ROW FILTER lags one batch further: batch N's input is
  filtered with batch N-1's in-force watermark. Consequence: a late row
  whose window closes IN THIS VERY BATCH is still absorbed before the
  end-of-batch eviction emits the window, while a row for an
  already-evicted window is dropped (and never re-emits the window —
  append-mode outputs stay unique per window);
- ``availableNow`` runs a final EMPTY batch after the data is drained,
  so every window the fully-advanced watermark passed emits before
  termination; windows beyond it emit nothing (the closure semantics
  every streaming-gate oracle encodes).
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import types as T

from datapipeline_gcp_spark.streaming.harness import run_to_memory_sink
from datapipeline_gcp_spark.streaming.windows import tumbling_agg

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_D = dt.datetime  # naive; the session is pinned UTC so the cast is identity
WIDTH = dt.timedelta(hours=1)
DELAY = dt.timedelta(minutes=30)

#: (event_id, ts, value) per micro-batch — one file per batch.
BATCHES = [
    # batch 0: two rows in the 10:00 window
    [(1, _D(2024, 1, 1, 10, 5), 1.0), (2, _D(2024, 1, 1, 10, 45), 2.0)],
    # batch 1: 12:xx rows; wm in force next batch becomes 12:20
    [(3, _D(2024, 1, 1, 12, 10), 4.0), (4, _D(2024, 1, 1, 12, 50), 8.0)],
    # batch 2: 10:30 arrives in the SAME batch that evicts the 10:00
    # window (late filter lags) → absorbed, emitted inside it; 12:15 is
    # older than the eviction wm but its window is open → aggregated
    [(5, _D(2024, 1, 1, 10, 30), 16.0), (6, _D(2024, 1, 1, 12, 15), 32.0)],
    # batch 3: 13:40 pushes the next wm to 13:10
    [(7, _D(2024, 1, 1, 13, 40), 64.0)],
    # batch 4: 10:35 targets the ALREADY-EVICTED 10:00 window → dropped,
    # and the window must NOT re-emit
    [(8, _D(2024, 1, 1, 10, 35), 100.0)],
    # batch 5: 15:30 advances the final wm to 15:00 → the 13:00 window
    # closes in the final flush batch; 15:00's own window never emits
    [(9, _D(2024, 1, 1, 15, 30), 200.0)],
]


def _simulate(batches):
    """Independent fold of the empirical contract in the module
    docstring. Returns {window_start: [(event_id, value), ...]} for the
    EMITTED windows only."""
    floor_min = dt.datetime.min
    wm_in_force = floor_min  # evicts/emits during the current batch
    wm_late = floor_min  # filters the current batch's input (lags 1)
    state: dict[dt.datetime, list] = {}
    emitted: dict[dt.datetime, list] = {}
    max_ts = None
    for batch in batches + [[]]:  # availableNow's final empty flush batch
        for eid, ts, val in batch:
            ws = ts.replace(minute=0, second=0, microsecond=0)
            if ws + WIDTH <= wm_late:
                continue  # too late per the PREVIOUS trigger's watermark
            state.setdefault(ws, []).append((eid, val))
        for ws in sorted(state):
            if ws + WIDTH <= wm_in_force:
                assert ws not in emitted  # append-mode: one emission ever
                emitted[ws] = state.pop(ws)
        for _, ts, _ in batch:
            max_ts = ts if max_ts is None else max(max_ts, ts)
        wm_late = wm_in_force
        if max_ts is not None:
            wm_in_force = max(wm_in_force, max_ts - DELAY)
    return emitted


def test_late_data_drops_match_watermark_contract(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "late_events"
    os.makedirs(src)
    now = time.time()
    for i, batch in enumerate(BATCHES):
        # one plain FILE per batch (the streaming file source does not
        # recurse into Spark-style output directories), written UTC-typed
        # so the declared TimestampType schema reads it as an instant
        tbl = pa.table(
            {
                "event_id": pa.array([e for e, _, _ in batch], pa.int64()),
                "ts": pa.array(
                    [ts for _, ts, _ in batch], pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array([100 + e for e, _, _ in batch], pa.int64()),
                "event_type": pa.array(["click"] * len(batch), pa.string()),
                "value": pa.array([v for _, _, v in batch], pa.float64()),
            }
        )
        part = str(src / f"b{i}.parquet")
        pq.write_table(tbl, part)
        # the file source orders files by modification time: force the
        # batch order to be the declared one
        os.utime(part, (now + i, now + i))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "30 minutes")
    )
    out = tumbling_agg(stream)
    run_to_memory_sink(spark, out, "late_data_sink", str(tmp_path / "ckpt"))
    rows = spark.table("late_data_sink").collect()
    got = {
        r.window_start.replace(tzinfo=None): (r.n_events, r.total_value)
        for r in rows
    }
    assert len(rows) == len(got)  # no window emitted twice

    want = {
        ws: (len(evs), float(sum(v for _, v in evs)))
        for ws, evs in _simulate(BATCHES).items()
    }
    assert got == want
    # pin the shape the simulator predicts, so a silent simulator bug
    # cannot vacuously pass: the 10:00 window emitted WITH the
    # same-batch-as-eviction late row 5 but WITHOUT the already-evicted
    # row 8; the 12:00 window emitted WITH the late-but-open row 6; the
    # 13:00 window emitted in the final flush; 15:00's never emitted
    assert want == {
        _D(2024, 1, 1, 10): (3, 19.0),
        _D(2024, 1, 1, 12): (3, 44.0),
        _D(2024, 1, 1, 13): (1, 64.0),
    }


# ---------------------------------------------------------------------------
# Property form: the simulator must match Spark on RANDOM batch shapes,
# not just the one pinned fixture. Timestamps carry a fixed :17 second
# offset so max_ts - DELAY can never EQUAL an hour-aligned window end —
# the emit-at-exact-boundary tie is deliberately out of scope (both
# engines' behavior at strict inequality is what the contract pins).
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_MINUTES = st.integers(min_value=0, max_value=600)
_BATCHES_STRATEGY = st.lists(
    st.lists(_MINUTES, min_size=1, max_size=5), min_size=2, max_size=5
)


def _run_stream(spark, root, batches):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = root / "ev"
    os.makedirs(src)
    now = time.time()
    for i, batch in enumerate(batches):
        tbl = pa.table(
            {
                "event_id": pa.array([e for e, _, _ in batch], pa.int64()),
                "ts": pa.array(
                    [ts for _, ts, _ in batch], pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array([100 + e for e, _, _ in batch], pa.int64()),
                "event_type": pa.array(["click"] * len(batch), pa.string()),
                "value": pa.array([v for _, _, v in batch], pa.float64()),
            }
        )
        part = str(src / f"b{i}.parquet")
        pq.write_table(tbl, part)
        os.utime(part, (now + i, now + i))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "30 minutes")
    )
    name = f"late_prop_{os.path.basename(root)}"
    run_to_memory_sink(
        spark, tumbling_agg(stream), name, str(root / "ckpt")
    )
    return {
        r.window_start.replace(tzinfo=None): (r.n_events, r.total_value)
        for r in spark.table(name).collect()
    }


@given(minute_batches=_BATCHES_STRATEGY)
@settings(max_examples=4, deadline=None)
def test_late_data_contract_holds_on_random_batches(
    spark, tmp_path_factory, minute_batches
):
    base = _D(2024, 3, 1, 8, 0, 17)  # :17 — never on a wm/end boundary
    eid = 0
    batches = []
    for mb in minute_batches:
        batch = []
        for m in mb:
            eid += 1
            batch.append((eid, base + dt.timedelta(minutes=m), float(eid)))
        batches.append(batch)
    got = _run_stream(spark, tmp_path_factory.mktemp("latep"), batches)
    want = {
        ws: (len(evs), float(sum(v for _, v in evs)))
        for ws, evs in _simulate(batches).items()
    }
    assert got == want
