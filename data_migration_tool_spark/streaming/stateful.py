"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.9 notes the reference has no
stateful streaming; this is the engine's scale path for the capability —
Structured Streaming's arbitrary-state API, Arrow-batched).

Semantics (emit-on-update): each micro-batch emits every session whose
aggregates changed in that batch — closed sessions once, the user's
open tail session with its current aggregates. State per user is O(1):
the open session's (id, start, last-seen, count, cents). Downstream
update-mode sinks keep the latest row per (user_id, session_id).

Exactness: event values are money-like doubles with ≤2 decimals; they
are accumulated as integer cents so the per-session sum is exact and
independent of batch boundaries, then surfaced as a double — the same
value a batch decimal-sum produces.

At 100 TB: state store size follows active users, not events; a skewed
power user is one state entry, and the Arrow transfer batches per
group. The shuffle key is user_id — identical to the batch twin.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

SESSION_GAP_US = 1800 * 1_000_000  # 30 minutes

STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_us", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _sessionize_batch(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if pdf.empty:
        return
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns → µs
    cents = (pdf["value"].to_numpy() * 100).round().astype("int64")

    if state.exists:
        sid0, start0, last0, n0, c0 = state.get
    else:
        sid0, start0, last0, n0, c0 = 0, None, None, 0, 0

    rows = []
    sid, start, last, n, c = sid0, start0, last0, n0, c0
    for t, cent in zip(us, cents):
        if last is not None and t - last > SESSION_GAP_US:
            rows.append((sid, n, last - start, c))  # close previous
            sid += 1
            start, n, c = t, 0, 0
        elif start is None:
            start = t
        last = t
        n += 1
        c += int(cent)
    rows.append((sid, n, last - start, c))  # open tail (emit-on-update)

    state.update((int(sid), int(start), int(last), int(n), int(c)))
    uid = key[0]
    yield pd.DataFrame(
        {
            "user_id": [uid] * len(rows),
            "session_id": [r[0] for r in rows],
            "n_events": [r[1] for r in rows],
            "duration_us": [r[2] for r in rows],
            "sum_value": [r[3] / 100.0 for r in rows],
        }
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → per-(user, session) aggregates, update-mode."""
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_batch,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
