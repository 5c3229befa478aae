"""Custom stateful streaming operator: session windows per key.

The reference has no streaming at all (SURVEY §2.10); this is the idiomatic
Structured-Streaming upgrade the north-star brief asks for — a stateful
operator Spark's built-ins don't directly express (gap-based sessionization
with per-session aggregates), implemented with
``applyInPandasWithState``: Arrow-batched per-key state, watermark-driven
timeout so state is bounded and late data is handled.

Scale shape: state is partitioned by user key across executors (one shuffle
on the grouping key, exactly what a 1000-executor cluster wants); each
key's state is O(1) (open-session accumulator, not the event list).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _sessionize_key(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed the gap: the open session is final
        start_us, end_us, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    # interval-merge sessionization: every incoming event is a [t, t] span
    # and the open state session is one more span; merging the START-sorted
    # spans with the gap rule handles out-of-order arrivals in both
    # directions — a late event inside/adjacent to the open session extends
    # it (moving session_start back if needed), and a late event disjoint
    # BELOW it forms its own session, emitted closed immediately (any event
    # that could still extend it is bounded by the watermark)
    gap_us = gap_s * 1_000_000
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    spans: list[list] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        t_us = int(pd.Timestamp(ts).value // 1_000)
        v = 0.0 if pd.isna(value) else float(value)
        spans.append([t_us, t_us, 1, v])
    if state.exists:
        spans.append(list(state.get))
    spans.sort(key=lambda s: (s[0], s[1]))

    merged: list[list] = []
    for s in spans:
        if merged and s[0] - merged[-1][1] <= gap_us:
            last = merged[-1]
            last[1] = max(last[1], s[1])
            last[2] += s[2]
            last[3] += s[3]
        else:
            merged.append(s)
    *closed, open_span = merged
    start_us, end_us, n, total = open_span
    state.update((start_us, end_us, n, total))
    state.setTimeoutTimestamp(end_us // 1_000 + gap_s * 1_000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows over a stream of (user_id, ts, value).

    Emits one row per CLOSED session (closed by a later event beyond the
    gap, or by the event-time timeout once the watermark passes). The same
    call works on a batch DataFrame for testing via availableNow triggers.
    """

    def fn(key, pdf_iter, state):
        return _sessionize_key(key, pdf_iter, state, gap_s)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
