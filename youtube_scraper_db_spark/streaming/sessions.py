"""Custom stateful streaming operator: inactivity-gap sessionization via
``applyInPandasWithState`` (the batch twin is the registry's
``sessionized_events`` window query).

This is the one operator class Spark's built-ins can't express on a
stream (per-key custom state machine with event-time timeouts), so it
uses the sanctioned escape hatch: Arrow-batched per-group state. State
per user is three scalars (session start, last seen, count) — bounded by
active keys, evicted by event-time timeout once the watermark passes
last_seen + gap, so state never grows with event volume.

Spark 4's newer arbitrary-state API (``transformWithStateInPandas``:
typed ValueState/ListState/MapState + timers over RocksDB) would be the
successor surface for this operator, but its Python state-server
protocol requires the ``protobuf`` package, which this container lacks
(verified: the TWS driver worker crashes on ``google.protobuf`` import;
no packages may be installed). Environment boundary, not an engine one —
the migration is mechanical (state scalars → a ValueState, the timeout
branch → an event-time timer callback).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def _emit(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap: dt.timedelta = dt.timedelta(minutes=30),
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Closed sessions per user: a session ends ``gap`` after its last
    event (emitted via event-time timeout) or when a later event arrives
    past the gap (emitted inline, new session opened)."""
    gap_us = int(gap.total_seconds()) * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n)
            return
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col]))
        out = []
        for t_us in sorted(ts_list):
            if start_us is None:
                start_us, last_us, n = t_us, t_us, 1
            elif t_us - last_us > gap_us:
                out.append(_emit(user_id, start_us, last_us, n))
                start_us, last_us, n = t_us, t_us, 1
            else:
                last_us, n = max(last_us, t_us), n + 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        yield from out

    wm = events.withWatermark(ts_col, watermark)
    return wm.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
