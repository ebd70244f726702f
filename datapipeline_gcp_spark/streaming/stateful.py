"""Custom stateful streaming operator: first-seen dedup with
``applyInPandasWithState`` (SURVEY.md §2.7 — the extension point for
operators Spark's built-in streaming aggregates can't express).

``streaming_first_seen``: across micro-batches, emit each key-group's
rows only for ids not seen before — the streaming form of exact dedup
(the batch twin is ``row_number() == 1`` per id). State per group is the
set of seen ids.

Scale notes: state lives in the state store keyed by the group column —
size it by choosing a group key with bounded per-group cardinality (here
user_id; per-user seen-set is small). For unbounded streams add a state
TTL via the timeout conf and re-admit after expiry, trading exactness
for bounded state — the same trade every streaming dedup makes. The
worker closure is self-contained (no package import on executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from datapipeline_gcp_spark.streaming.harness import SQL_EVENT_TIME_VALID


def streaming_distinct_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_id"),
    ts_col: str = "ts",
    delay: str = "2 hours",
) -> DataFrame:
    """Built-in streaming dedup: keep the first row per ``keys`` and
    drop any duplicate arriving within ``delay`` (event time) of it.

    This is the JVM-side scale path — state lives in the state store
    with NO Python workers, and entries auto-expire once the watermark
    passes, so state is bounded by (key arrival rate × delay) instead
    of growing forever. Use it when a bounded dedup horizon is
    acceptable; :func:`streaming_first_seen` below is the exact-forever
    variant (Python state, never expires) for when it is not — the
    standard trade of streaming dedup, made explicit as two operators.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_sessionize_stateful(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom sessionization with ``applyInPandasWithState`` + event-time
    timeout — the hand-rolled twin of ``windows.streaming_session``
    (built-in ``session_window``), kept as the template for session
    semantics the built-in can't express (per-session early results,
    custom merge rules, session-scoped model state).

    Emits one row per FINAL session: (key, session_start,
    session_end = last event + gap, n_events, total_value). A session is
    final only when the event-time watermark has passed its end — no
    late event can extend it — which the operator guarantees two ways:
    rows arriving in a batch are merged with the buffered events and
    re-scanned, and keys with NO new rows are woken by an event-time
    TIMEOUT set to the open session's end, so quiet keys still emit
    (the part a naive foreachBatch implementation gets wrong).

    State per key is the (ts, value) buffer of events not yet in a final
    session — bounded by the watermark horizon plus the open session,
    NOT by stream length. Out-of-order events within the watermark are
    handled exactly: the merge+rescan recomputes session boundaries from
    the sorted union, so an in-horizon straggler can split or bridge
    sessions just as the built-in does."""
    gap_ms = _duration_ms(gap)
    _warn_if_ms_grid(gap, watermark, gap_ms)
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_ms", T.ArrayType(T.LongType())),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
        ]
    )

    def sessionize(key, pdf_iter, state):
        import functools
        import operator

        import pandas as pd

        wm = state.getCurrentWatermarkMs()
        ts_ms: list[int] = []
        vals: list[float] = []
        if state.exists:
            old = state.get
            ts_ms.extend(int(t) for t in old[0])
            vals.extend(float(v) for v in old[1])
        for pdf in pdf_iter:
            if len(pdf):
                t = (
                    pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000
                )
                ts_ms.extend(int(x) for x in t)
                vals.extend(float(v) for v in pdf[value_col])
        if not ts_ms:
            state.remove()
            return
        order = sorted(range(len(ts_ms)), key=lambda i: (ts_ms[i], vals[i]))
        ts_ms = [ts_ms[i] for i in order]
        vals = [vals[i] for i in order]
        # split the sorted union into sessions by the gap rule
        sessions: list[tuple[int, int]] = []  # [start_idx, end_idx)
        start = 0
        for i in range(1, len(ts_ms)):
            if ts_ms[i] - ts_ms[i - 1] >= gap_ms:
                sessions.append((start, i))
                start = i
        sessions.append((start, len(ts_ms)))
        rows = []
        keep_from = len(ts_ms)
        first_pending_end = None
        for lo, hi in sessions:
            end_ms = ts_ms[hi - 1] + gap_ms
            # INCLUSIVE closure (end <= wm), matching the built-in
            # session_window's append-mode convention exactly: the r12
            # unikeys x late-data probe caught the strict form
            # withholding a session whose end TIES the terminal
            # watermark while the built-in emits it.
            if end_ms <= wm:  # final: watermark reached the session end
                rows.append(
                    (
                        key[0],
                        pd.Timestamp(ts_ms[lo], unit="ms"),
                        pd.Timestamp(end_ms, unit="ms"),
                        hi - lo,
                        # left-fold from the FIRST value, not sum()'s
                        # +0.0 seed: a single-event session of -0.0
                        # must emit -0.0 (SQL SUM folds from the first
                        # value — Spark's native sum and DuckDB agree;
                        # r10 negzero sweep)
                        float(
                            functools.reduce(operator.add, vals[lo:hi])
                        ),
                    )
                )
            else:
                keep_from = min(keep_from, lo)
                if first_pending_end is None:
                    first_pending_end = end_ms
        if keep_from < len(ts_ms):
            state.update((ts_ms[keep_from:], vals[keep_from:]))
            # wake this key as soon as the EARLIEST pending session could
            # become final, even if no further rows ever arrive — waking
            # on the latest would starve earlier closed-but-unemitted
            # sessions. The timeout fires once the watermark EXCEEDS the
            # set timestamp, so end-1ms wakes the key exactly when
            # wm >= end (the inclusive-closure tie included). Timeouts
            # must sit strictly beyond the current watermark; when the
            # floor binds (only possible when end == wm + 1ms exactly),
            # the wake needs wm to pass end — a TERMINAL watermark
            # landing exactly on such an end would miss the session.
            # This is a known 1-ms-measure-zero deviation from the
            # inclusive-closure oracle, unreachable at the
            # second-granularity event time of every fixture and gate;
            # ms-granularity deployments should size the watermark
            # delay off the ms grid.
            state.setTimeoutTimestamp(max(first_pending_end - 1, wm + 1))
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    key_col, "session_start", "session_end", "n_events",
                    "total_value",
                ],
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            sessionize,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(spec: str) -> int:
    qty, unit = spec.split()
    scale = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(qty) * scale


def _warn_if_ms_grid(gap: str, watermark: str, gap_ms: int) -> None:
    """Make the sessionizer's documented 1-ms timeout-floor corner
    unmissable (VERDICT r12 #6): the event-time timeout must sit
    strictly beyond the current watermark, so a session whose end lands
    EXACTLY at ``wm + 1ms`` can be missed by a terminal watermark — a
    measure-zero deviation from the inclusive-closure oracle that is
    unreachable when gap and watermark delay are whole seconds (every
    fixture and gate) but real for ms-grid configs. Warn once per
    config instead of letting such a deployment hit it silently."""
    import warnings

    try:
        delay_ms = _duration_ms(watermark)
    except (KeyError, ValueError):
        delay_ms = 0  # unknown spelling: Spark validates downstream
    if gap_ms % 1000 or delay_ms % 1000:
        warnings.warn(
            f"streaming_sessionize_stateful: gap={gap!r} / "
            f"watermark={watermark!r} are not whole seconds — the "
            "event-time timeout floor deviates from inclusive session "
            "closure when a session end lands exactly 1 ms past the "
            "terminal watermark (see the closure notes in "
            "streaming/stateful.py); size gap and watermark delay in "
            "whole seconds to keep that corner unreachable",
            RuntimeWarning,
            stacklevel=3,
        )


#: Loud per-key ceiling on the exact-forever seen-id state (VERDICT r9
#: #6): the state row is a sorted id array REWRITTEN every batch the key
#: appears in, so both the rewrite cost and the state-store row size are
#: linear in ids-seen-per-key — unbounded by this operator's own
#: contract. 10M longs ≈ 80 MB per key is already far past where the
#: watermarked twin (``dropDuplicatesWithinWatermark``) or a re-keyed
#: deployment (below) is the right tool; past it, fail with the
#: trade-off named instead of letting one hot key grow a state row until
#: the store or the Arrow transfer dies opaquely.
MAX_SEEN_IDS_PER_KEY = 10_000_000


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    max_ids_per_key: int = MAX_SEEN_IDS_PER_KEY,
) -> DataFrame:
    """Emit only the first occurrence of each ``id_col`` within each
    ``key_col`` group, across micro-batches (exactly-once per id).

    State-growth envelope (100 TB posture): state is one sorted
    ``array<long>`` of every id ever seen per key — EXACT-FOREVER by
    contract, the complement of ``dropDuplicatesWithinWatermark``'s
    bounded-state/bounded-horizon trade. Growth is linear in distinct
    ids per key with no expiry (``NoTimeout``), and the array is
    rewritten on every batch that touches the key. Production posture
    for long-lived streams: (a) run the state store on RocksDB
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``) so state spills off-heap instead of
    living on the executor heap; (b) bound the id universe by re-keying
    — e.g. key by ``(user_id, day)`` so each state row's universe is one
    day's ids and old rows go cold; or (c) accept a horizon and use the
    watermarked twin. The ``max_ids_per_key`` guard (default
    :data:`MAX_SEEN_IDS_PER_KEY`) makes the envelope loud: a key
    exceeding it raises with the trade-off named, instead of an opaque
    state-store/Arrow failure long after the design was wrong.
    """
    out_schema = stream.schema
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.LongType()))]
    )
    out_cols = [f.name for f in out_schema.fields]

    def dedup_group(key, pdf_iter, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            fresh = pdf[~pdf[id_col].isin(seen)]
            # first occurrence within the batch too
            fresh = fresh.drop_duplicates(subset=[id_col], keep="first")
            if len(fresh):
                seen.update(int(x) for x in fresh[id_col])
                yield fresh[out_cols]
        if len(seen) > max_ids_per_key:
            raise RuntimeError(
                f"streaming_first_seen: key {key!r} has seen "
                f"{len(seen)} distinct {id_col}s (cap {max_ids_per_key});"
                " exact-forever state is unbounded by contract — re-key"
                " to bound the per-key id universe, or switch to the"
                " watermarked dropDuplicatesWithinWatermark twin"
            )
        state.update((sorted(seen),))

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            dedup_group,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Gate entry: the custom stateful sessionizer vs a closure-semantics oracle
# ---------------------------------------------------------------------------

GATE_GAP_MS = 10 * 60 * 1000
GATE_DELAY_MS = 30 * 60 * 1000


def events_stream_stateful_session_gate(spark, sf_dir: str) -> DataFrame:
    """Run the HAND-ROLLED ``applyInPandasWithState`` sessionizer as a
    real stream (readStream → availableNow → append memory sink) and
    hash-compare it against a DuckDB encoding of its full contract —
    this is the registry's only gate over custom Python streaming
    state, and it pins four things at once:

    1. gaps-and-islands session assembly on MILLISECOND-truncated event
       time (the operator buffers epoch-ms; the oracle truncates
       ``epoch_us // 1000`` identically — events carry µs precision, so
       an oracle on raw timestamps would split sessions differently);
    2. append-mode closure: a session emits iff the terminal watermark
       ``(max_ts_ms − delay)`` reached its end (the operator's
       ``end_ms <= wm`` — INCLUSIVE, the built-in session_window
       convention; r12 probe), including QUIET keys woken by
       event-time timeout — the path a naive implementation starves;
    3. exact aggregates: ``total_value`` is a sequential left-fold over
       (ts_ms, value)-sorted floats in BOTH engines (Python ``sum`` ≡
       DuckDB ``list_reduce`` over an ordered ``list()`` — same IEEE
       additions in the same order, bitwise-equal);
    4. the ms→timestamp round-trip of the emitted boundaries.
    """
    from pyspark.sql import functions as F

    from datapipeline_gcp_spark.schemas import pin_utc
    from datapipeline_gcp_spark.streaming.harness import (
        events_stream,
        run_gate_query,
        split_event_time,
    )

    pin_utc(spark)
    # event-time validity split BEFORE the watermark (r9 poisoning
    # defense, same contract as the windows gates); rejected rows are
    # observable in stream_stateful_session_gate_quarantine
    valid, rejected = split_event_time(events_stream(spark, sf_dir))
    agg = streaming_sessionize_stateful(valid)
    return run_gate_query(
        spark, agg, "stream_stateful_session_gate", quarantine=rejected
    ).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        "total_value",
    )


_STATEFUL_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, value FROM events
  WHERE {SQL_EVENT_TIME_VALID}
),
flagged AS (
  SELECT user_id, ts_ms, value,
    CASE WHEN lag(ts_ms) OVER w IS NULL
           OR ts_ms - lag(ts_ms) OVER w >= {GATE_GAP_MS}
         THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, value)
),
numbered AS (
  SELECT *,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts_ms, value
      ROWS UNBOUNDED PRECEDING
    ) AS session_no
  FROM flagged
),
sess AS (
  SELECT user_id,
         MIN(ts_ms) AS start_ms,
         MAX(ts_ms) + {GATE_GAP_MS} AS end_ms,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         list_reduce(list(value ORDER BY ts_ms, value),
                     (x, y) -> x + y) AS total_value
  FROM numbered
  GROUP BY user_id, session_no
),
wm AS (
  SELECT (epoch_us(max(ts)) // 1000) - {GATE_DELAY_MS} AS wm_ms FROM events
  WHERE {SQL_EVENT_TIME_VALID}
)
SELECT user_id,
       make_timestamp(start_ms * 1000) AS session_start,
       make_timestamp(end_ms * 1000) AS session_end,
       n_events,
       total_value
FROM sess, wm
WHERE end_ms <= wm_ms
"""


def events_stream_first_seen_gate(spark, sf_dir: str) -> DataFrame:
    """Redelivery-storm gate for the EXACT-FOREVER dedup
    (:func:`streaming_first_seen`, ``applyInPandasWithState`` with
    ``NoTimeout`` — per-user seen-id sets that never expire): every
    event delivered twice via self-union, output must equal the batch
    first-occurrence relation exactly. This is the registry's second
    custom-Python-state gate and pins the complement of
    ``events_stream_dedup_gate``'s contract: the built-in
    ``dropDuplicatesWithinWatermark`` trades exactness for bounded
    state, the hand-rolled first-seen trades bounded state for
    exactness — both trades must actually deliver their guarantee
    under an at-least-once bus.

    No event-time is involved (that is the point — state never
    expires), so the r9 validity boundary does not apply: there is no
    watermark to poison. Duplicate deliveries carry identical rows (the
    dupkeys contract), so WHICH copy survives is immaterial and the
    sink is deterministic; the oracle is the DISTINCT row set.

    Scale: state is the per-user id set — unbounded by design; deploy
    it where exactness beats the horizon trade (dedup of a bounded
    id universe, e.g. per-day re-keyed streams), or switch to the
    watermarked twin when it does not.
    """
    from pyspark.sql import functions as F

    from datapipeline_gcp_spark.schemas import pin_utc
    from datapipeline_gcp_spark.streaming.harness import (
        events_stream,
        run_gate_query,
    )

    pin_utc(spark)

    def _side() -> DataFrame:
        return events_stream(spark, sf_dir).select(
            "user_id", "event_id", "event_type", "value"
        )

    doubled = _side().union(_side())  # at-least-once: everything twice
    out = streaming_first_seen(doubled)
    return run_gate_query(spark, out, "stream_first_seen_gate").select(
        "user_id", "event_id", "event_type", "value"
    )


_FIRST_SEEN_ORACLE = """
SELECT DISTINCT user_id, event_id, event_type, value FROM events
"""


QUERIES = {
    "events_stream_stateful_session_gate": events_stream_stateful_session_gate,
    "events_stream_first_seen_gate": events_stream_first_seen_gate,
}

ORACLES = {
    "events_stream_stateful_session_gate": _STATEFUL_SESSION_ORACLE,
    "events_stream_first_seen_gate": _FIRST_SEEN_ORACLE,
}
