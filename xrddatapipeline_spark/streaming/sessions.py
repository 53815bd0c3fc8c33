"""Stateful streaming sessionization: applyInPandasWithState over an event stream.

The streaming form of the batch `w6_sessionize_events` query: events arrive
continuously, each user's session state (current session sequence, start,
last-seen, count) lives in the Spark state store, and a session row is
EMITTED when a gap larger than `gap_us` closes it. This is the custom
stateful-operator pattern the file-source image pipeline doesn't need
(its csim lookback is a store join) — kept generic over (user_id, event_id,
ts_us) rows.

Scale notes: state is partitioned by user_id across executors (one shuffle
per micro-batch), each group's events are handed to the function as Arrow
batches, and state size is O(active users) with a fixed 4-long tuple per
user — millions of concurrent users per executor are fine. In production
add an event-time watermark and use `GroupStateTimeout.EventTimeTimeout`
to flush sessions of users who go silent (here: NoTimeout, so a session
only closes when the user's next event proves the gap — the availableNow
test harness then drains deterministically).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)

# (session_seq, start_us, last_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_us: int) -> DataFrame:
    """Closed sessions per user from a stream of (user_id, event_id, ts_us).

    Emits one row per session the moment a later event of the same user
    arrives more than `gap_us` after the session's last event. The still-
    open session stays in state. Events inside one micro-batch are sorted
    by (ts_us, event_id); cross-batch order is the stream's arrival order,
    as in any state-store sessionizer without a watermark.
    """

    def close_sessions(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"])

        if state.exists:
            seq, start_us, last_us, n = state.get
        else:
            seq, start_us, last_us, n = 0, None, None, 0

        closed: list[tuple[int, int, int, int, int]] = []
        for ts in pdf["ts_us"]:
            ts = int(ts)
            if start_us is None:
                start_us, last_us, n = ts, ts, 1
            elif ts - last_us > gap_us:
                closed.append((user_id, seq, n, start_us, last_us))
                seq, start_us, last_us, n = seq + 1, ts, ts, 1
            else:
                last_us, n = max(last_us, ts), n + 1

        state.update((seq, start_us, last_us, n))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_seq", "n_events", "start_us", "end_us"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        close_sessions,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
