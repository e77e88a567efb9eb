"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 / driver north star "custom stateful operators").

`running_user_stats` keeps one state row per user_id — event count,
value sum (integer cents — exact), last-seen event time — and emits the
updated totals every micro-batch. This is the engine's pattern for
arbitrary keyed streaming state the built-in window aggs can't express
(per-entity counters, session carry-over, dedup-seen sets).

Scale posture: state is partitioned by the group key across executors
and persisted in the state store per micro-batch; per-key state here is
O(1) (three scalars), so total state is O(|users|) with no growth over
time. `running_user_stats(expire_after_ms=...)` additionally bounds
O(|users|) itself: idle keys expire on EVENT-TIME timeout (watermark
passes last_seen + horizon), emit a final `expired` row, and their
state is removed — the mechanism that keeps a 100 TB/day feed's state
store at O(|active keys|) instead of O(|all keys ever seen|).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # round per ROW, then sum: rounding a batch-level float sum would
        # make the state depend on micro-batch boundaries (sub-cent
        # residues accumulate differently per batching). dropna first:
        # a NULL value contributes nothing, like SQL SUM — and a NaN
        # would crash the int64 cast in the state worker (found by
        # tests/test_null_events_parity.py).
        cents += int((pdf["value"] * 100).round().dropna().astype("int64").sum())
        if len(pdf):
            v = pdf["ts"].max()
            # ts arrives either as a pandas Timestamp (.value = epoch ns)
            # or already as long micros (the tz-free path callers use
            # when the result must hash-match an oracle under ANY
            # session timezone — Arrow localizes TimestampType to the
            # session tz on the way into pandas, long never shifts).
            us = int(v.value // 1000) if hasattr(v, "value") else int(v)
            last_us = max(last_us, us)
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [cents / 100.0],
            "last_seen_us": [last_us],
        }
    )


EXPIRING_OUTPUT_SCHEMA = T.StructType(
    list(OUTPUT_SCHEMA.fields) + [T.StructField("expired", T.BooleanType())]
)


def _make_expiring_update(expire_after_ms: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def row(n, cents, last_us, expired):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [cents / 100.0],
                    "last_seen_us": [last_us],
                    "expired": [expired],
                }
            )

        if state.hasTimedOut:
            # Watermark passed last_seen + horizon with no new data:
            # emit the tombstone/final row and FREE the state — this is
            # what bounds the state store on unbounded key spaces.
            n, cents, last_us = state.get
            state.remove()
            yield row(n, cents, last_us, True)
            return
        n, cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            if len(pdf):
                v = pdf["ts"].max()
                us = int(v.value // 1000) if hasattr(v, "value") else int(v)
                last_us = max(last_us, us)
        state.update((n, cents, last_us))
        # Event-time timeout: fires when the WATERMARK (not wall clock)
        # passes this instant, so expiry is deterministic and replayable.
        state.setTimeoutTimestamp(last_us // 1000 + expire_after_ms)
        yield row(n, cents, last_us, False)

    return update


def running_user_stats(
    events: DataFrame, expire_after_ms: int | None = None
) -> DataFrame:
    """Per-user running totals with explicit keyed state; one output row
    per (user, micro-batch) holding the post-batch totals.

    With `expire_after_ms`, keys idle past that event-time horizon are
    expired: their final totals are emitted once more with
    `expired=True` and their state is removed (a later event starts the
    key fresh). Requires a watermark on `events` (EventTimeTimeout fires
    off the watermark, never wall clock)."""
    grouped = events.select("user_id", "ts", "value").groupBy("user_id")
    if expire_after_ms is None:
        return grouped.applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return grouped.applyInPandasWithState(
        _make_expiring_update(expire_after_ms),
        outputStructType=EXPIRING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
