"""Sessionization + window-analytics operators over event streams.

Druid 0.22 has no window functions (SURVEY §2.6) — these are capability
supersets the reference can't express, built on Spark's native window frames:

- sessionize: gap-based session ids (lag + cumulative sum over the gap
  indicator — one shuffle on the partition key, no UDFs).
- session_stats: per-session aggregates.
- Streaming equivalent: ``F.session_window`` in streaming/ingest-style plans.

Scale: the only shuffle is partitionBy(user) — the same key the session
belongs to; window functions then run within partitions.  Skewed users are
handled by AQE skew splitting on the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               time_col: str = "__time",
               gap_minutes: float = 30.0,
               tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Assign ``session_id`` (user-scoped ordinal) to each event: a new
    session starts when the gap to the previous event exceeds the threshold.

    ``tiebreak_cols`` makes the within-user ordering TOTAL: same-timestamp
    events are otherwise ordered arbitrarily per engine/run, which can move a
    tie across a session boundary and shuffle per-session aggregates.  Pass a
    unique id column for deterministic attribution."""
    w = Window.partitionBy(user_col).orderBy(time_col, *(tiebreak_cols or []))
    gap_ms = int(gap_minutes * 60_000)
    prev = F.lag(F.col(time_col)).over(w)
    # strict >: an event at EXACTLY last+gap extends the session — verified
    # to match Spark's session_window boundary behavior
    # (test_review_r6c.py::test_sessionize_boundary_matches_session_window)
    new_session = (prev.isNull() |
                   ((F.unix_millis(F.col(time_col)) - F.unix_millis(prev))
                    > gap_ms))
    return df.withColumn(
        "session_id",
        F.sum(new_session.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  time_col: str = "__time",
                  gap_minutes: float = 30.0,
                  tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Per-session rollup: event count, duration, value sum (if present)."""
    s = sessionize(df, user_col, time_col, gap_minutes, tiebreak_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        ((F.unix_millis(F.max(time_col))
          - F.unix_millis(F.min(time_col))) / 1000.0).alias("duration_sec"),
    ]
    if "value" in df.columns:
        aggs.append(F.sum("value").alias("total_value"))
    return s.groupBy(user_col, "session_id").agg(*aggs)


def session_window_stats(df: DataFrame, user_col: str = "user_id",
                         time_col: str = "__time",
                         gap_minutes: float = 30.0,
                         watermark_minutes: float | None = None) -> DataFrame:
    """Gap-session rollup via Spark's native ``session_window`` — the
    STREAMING-capable form of ``session_stats``: the same call works on a
    ``readStream`` DataFrame (append mode once a watermark is set), where
    the window-function path above is batch-only.

    Semantics vs session_stats: identical session boundaries (an event
    extends its session while within ``gap`` of the previous event); output
    carries the window's [start, end) envelope (end = last event + gap, the
    session_window contract) rather than first/last event times.

    Scale: one shuffle on (user, session-window); in streaming, state is
    per-open-session and evicted at the watermark — bounded by concurrently
    active sessions, not history."""
    sw = F.session_window(F.col(time_col), f"{int(gap_minutes * 60)} seconds")
    src = df
    if watermark_minutes is not None:
        src = df.withWatermark(time_col, f"{int(watermark_minutes * 60)} seconds")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if "value" in df.columns:
        aggs.append(F.sum("value").alias("total_value"))
    return (src.groupBy(F.col(user_col), sw)
               .agg(*aggs)
               .select(user_col,
                       F.col("session_window.start").alias("w_start"),
                       F.col("session_window.end").alias("w_end"),
                       *[F.col(c) for c in
                         (["n_events", "total_value"] if "value" in df.columns
                          else ["n_events"])]))
