"""Stateful streaming sessionization (applyInPandasWithState).
[north_rule extension — no reference code; the reference is batch-BSP
only. This is the "custom stateful streaming operator" slot of the
engine: gap-based sessions, the one windowing shape Structured
Streaming's built-in tumbling/sliding windows cannot express.]

One sessionization rule, two execution modes:

  * sessionize_batch(events)  — window lag + cumulative session ids
    (the same rule as the `user_sessions` driver query, but emitting
    one row PER session rather than per-user counts);
  * sessionize_stream(events) — per-user GroupState carrying the open
    session, event-time timeout at last_ts + gap so sessions close
    exactly when the watermark proves no earlier event can arrive.

pytest asserts stream == batch row-for-row on the same input
(tests/test_streaming_sessions.py), which pins the stateful operator
to the declarative spec.

100-TB shape: state is O(open sessions) = one 3-long struct per active
user, hash-partitioned by user_id; each microbatch shuffles only its
own events. The batch form's window spec partitions by user_id — no
global sort. Arrow-batched pandas on both paths; no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_S = 1800  # 30-minute inactivity gap, same rule as q_user_sessions

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
_STATE_SCHEMA = "session_start long, last_ts long, n_events long"


def sessionize_batch(events: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """-> (user_id, session_start, session_end, n_events), one row per
    gap-delimited session (timestamps as unix seconds)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.unix_timestamp("ts")
    prev = F.lag(ts).over(w)
    marked = events.select(
        "user_id",
        ts.alias("ts_s"),
        F.when(prev.isNull() | (ts - prev > gap_s), 1)
        .otherwise(0)
        .alias("is_start"),
        "event_id",
    ).withColumn(
        "session_no",
        F.sum("is_start").over(
            Window.partitionBy("user_id")
            .orderBy("ts_s", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return marked.groupBy("user_id", "session_no").agg(
        F.min("ts_s").alias("session_start"),
        F.max("ts_s").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).select("user_id", "session_start", "session_end", "n_events")


def _session_fn(
    key: Tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user state machine: fold sorted event times into the open
    session; emit every session closed by a >gap successor; park the
    trailing open session in state with an event-time timeout."""
    user_id = key[0]
    gap_ms = GAP_S * 1000

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start // 1000],
                "session_end": [last // 1000],
                "n_events": [n],
            }
        )
        return

    times: list[int] = []
    for pdf in pdf_iter:
        # ms since epoch, unit-explicit (Arrow may hand us us or ns)
        times.extend(
            pdf["ts"].values.astype("datetime64[ms]").astype("int64").tolist()
        )
    times.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = times[0], times[0] - gap_ms - 1, 0

    closed: list[tuple[int, int, int]] = []
    for t in times:
        if t - last > gap_ms:
            if n > 0:
                closed.append((start, last, n))
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    state.setTimeoutTimestamp(last + gap_ms)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [s // 1000 for s, _, _ in closed],
                "session_end": [e // 1000 for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Streaming form: events must be a streaming DataFrame with an
    event-time `ts` column. Emits one row per CLOSED session (append
    mode); the open tail session per user closes when the watermark
    passes its last event + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
