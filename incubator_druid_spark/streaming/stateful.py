"""Custom stateful streaming operators via applyInPandasWithState.

Druid has no query-time stateful streaming (SURVEY §2.10 — "none; NOT needed
for parity"), so this is a capability superset for the training-data
pipeline: continuous gap-based sessionization whose sessions close when no
event arrives within the gap (the batch equivalent lives in
pipeline/sessions.py; this one maintains open sessions across micro-batches
and emits a row when a session times out).

State layout: one (user) group → (session_start, last_seen, n_events,
total_value).  GroupStateTimeout.ProcessingTimeTimeout closes idle sessions —
bounded state, watermark-friendly, and the shuffle key (user) matches the
batch operator's.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                 "n_events long, total_value double")
STATE_SCHEMA = "start long, last_seen long, n long, total double"


def streaming_sessionize(events: DataFrame, gap_minutes: float = 30.0,
                         user_col: str = "user_id",
                         time_col: str = "__time") -> DataFrame:
    """events (streaming DataFrame with user/time/value) → closed-session
    rows.  A session emits when the gap since its last event exceeds the
    threshold (checked per micro-batch via processing-time timeout)."""
    gap_ms = int(gap_minutes * 60_000)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(last, unit="ms")],
                "n_events": [n], "total_value": [total]})
            return

        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values(time_col)
        ts = rows[time_col].astype("int64") // 1_000_000  # ns → ms
        vals = rows["value"] if "value" in rows else pd.Series([0.0] * len(rows))

        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = int(ts.iloc[0]), int(ts.iloc[0]), 0, 0.0

        closed = []
        for t, v in zip(ts, vals):
            t = int(t)
            if n > 0 and t - last > gap_ms:
                closed.append((start, last, n, total))
                start, n, total = t, 0, 0.0
            last = t
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame({
                "user_id": [user] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed]})

    return (events.groupBy(user_col).applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.ProcessingTimeTimeout))
