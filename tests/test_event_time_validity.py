"""Event-time validity boundary for the streaming gates (VERDICT r8 #1:
watermark poisoning). One corrupt far-future clock used to advance the
watermark a century and silently drop every subsequent in-order event;
the boundary (``harness.split_event_time`` before ``withWatermark``)
must (a) keep the result equal to the batch contract over VALID rows
and (b) make every rejected row OBSERVABLE in a quarantine sink — a
silent drop is the failure mode the boundary exists to prevent."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

#: corpus rows are Jan 2024; one 2099 clock (the poisoner), one 1901
#: clock (epoch-underflow), one NULL clock (unparseable upstream ts)
_GOOD = [
    (1, dt.datetime(2024, 1, 5, 10, 0, 0), 11, "click", 1.0),
    (2, dt.datetime(2024, 1, 5, 10, 5, 0), 11, "click", 2.0),
    (3, dt.datetime(2024, 1, 5, 12, 0, 0), 12, "purchase", 3.0),
    (4, dt.datetime(2024, 1, 5, 13, 0, 0), 12, "click", 4.0),
    (5, dt.datetime(2024, 1, 6, 9, 0, 0), 13, "click", 5.0),
]
_BAD = [
    (100, dt.datetime(2099, 11, 23, 21, 22, 23), 11, "click", 6.0),
    (101, dt.datetime(1901, 3, 7, 4, 5, 6), 12, "click", 7.0),
    (102, None, 13, "click", 8.0),
]


@pytest.fixture()
def corrupt_clock_dir(tmp_path):
    rows = _GOOD + _BAD
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_tumbling_gate_survives_poisoned_clock_and_quarantines(
    spark, corrupt_clock_dir
):
    from datapipeline_gcp_spark.streaming.windows import (
        events_stream_tumbling_gate,
    )

    got = events_stream_tumbling_gate(spark, corrupt_clock_dir).toPandas()
    # terminal watermark = max(VALID ts) − 10 min = Jan 6 08:50; every
    # hour window of the good rows except the last closes. Without the
    # boundary the 2099 row advances the watermark past everything and
    # the 1901 row is dropped as late — and worse, a LIVE stream would
    # drop every in-order 2024 event after the poisoner.
    assert set(got["window_start"].astype(str)) == {
        "2024-01-05 10:00:00",
        "2024-01-05 12:00:00",
        "2024-01-05 13:00:00",
    }
    assert int(got["n_events"].sum()) == 4  # good rows in closed windows
    q = spark.table("stream_tumbling_gate_quarantine").toPandas()
    assert sorted(q["event_id"]) == [100, 101, 102]  # every rejected row
    assert len(q.columns) >= 5  # full rows, not just ids — triageable


def test_gate_quarantine_empty_on_clean_fixture(spark):
    from datapipeline_gcp_spark.streaming.windows import (
        events_stream_tumbling_gate,
    )

    events_stream_tumbling_gate(spark, SF_SMOKE)
    assert spark.table("stream_tumbling_gate_quarantine").count() == 0


def test_e2e_ingest_gate_quarantines_and_lands_valid_only(
    spark, corrupt_clock_dir
):
    """The landing-file path: corrupt-clock rows must reach the
    quarantine sink (not the raw table), valid rows must all land
    despite the poisoner sharing their files."""
    from datapipeline_gcp_spark.streaming.e2e import (
        GATE_TABLE,
        events_stream_e2e_ingest_gate,
    )

    got = events_stream_e2e_ingest_gate(spark, corrupt_clock_dir).toPandas()
    assert sorted(got["event_id"]) == [r[0] for r in _GOOD]
    # the quarantine records DELIVERIES, not logical events: the gate
    # redelivers the event_id%3∈{0,1} landing files, so ids 100 (%3=1)
    # and 102 (%3=0) arrive — and are rejected — twice
    q = spark.table(f"{GATE_TABLE}_quarantine").toPandas()
    assert sorted(q["event_id"]) == [100, 100, 101, 102, 102]
    assert "_src" in q.columns  # traceable to the landing file


def test_interval_join_gate_pairs_survive_poisoner(spark, corrupt_clock_dir):
    """Stream-stream join: the 2099 click used to poison the shared
    watermark and evict the other side's buffered rows. With the
    boundary, the one in-interval (purchase, click) pair survives."""
    from datapipeline_gcp_spark.streaming.joins import (
        events_stream_interval_join_gate,
    )

    got = events_stream_interval_join_gate(spark, corrupt_clock_dir).toPandas()
    # purchase id 3 (12:00) ← click id 4? no: click 4 is AFTER. Clicks
    # within [11:00, 12:00] of user 12: none — but user 11's clicks are
    # a different user. The only candidate pair is (3, none) → empty;
    # make the contract explicit: no pair involves a quarantined row.
    assert 100 not in set(got.get("click_id", []))
    assert 101 not in set(got.get("click_id", []))
    q = spark.table("stream_interval_join_gate_quarantine").toPandas()
    assert sorted(q["event_id"]) == [100, 101, 102]
