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


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Emit only the first occurrence of each ``id_col`` within each
    ``key_col`` group, across micro-batches (exactly-once per id)."""
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
