"""Sessionization and event-time windows.

Reference semantics: chat session windows split on inactivity >= gap
(W4/ST8, chat/parser.py:47-56, 272-288). Batch formulation: lag(ts) per
user → gap > threshold flags a session start → running sum of flags is
the session id. The streaming twin (`session_window`) lives in
streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 3600,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a session_id per user; new session when gap >= gap_seconds."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    is_new = F.when(prev.isNull() | (gap >= gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return events.withColumn(
        "session_id", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 3600,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates: event count, duration, total value."""
    s = sessionize(events, gap_seconds, user_col=user_col, ts_col=ts_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double")), 6
        ).alias("duration_sec"),
        F.round(F.sum(value_col), 4).alias("total_value"),
    )


def tumbling_window_agg(
    events: DataFrame,
    window_seconds: int = 300,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time windows as epoch buckets (batch twin of the
    Structured Streaming `window()` agg; bucket id is oracle-friendly)."""
    bucket = F.floor(F.col(ts_col).cast("double") / window_seconds).cast("long")
    return events.groupBy(bucket.alias("window_id"), F.col(type_col)).agg(
        F.count("*").alias("n"),
        F.round(F.sum(value_col), 4).alias("total_value"),
    )
