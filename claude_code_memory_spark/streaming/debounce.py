"""Streaming debounce / coalesce — the watcher's event funnel.

Reference semantics (watcher/debounce.py):
- ST2 per-file last-event-wins coalescing with a 2 s quiet period
  (:149-260; default config/models.py:37)
- ST3 late/duplicate suppression: stale events dropped, GC after 300 s

Spark mapping: a processing-time trigger is the quiet period; within each
micro-batch, `last event per path` is a window/dedup; duplicates across
batches are suppressed by watermark + dropDuplicates on (path, sha256).
The batch twin (`coalesce_events`) is reused by foreachBatch so batch and
streaming share one code path — mirroring how the reference watcher calls
back into the batch indexer (handler.py:173-280).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_events(events: DataFrame) -> DataFrame:
    """Last-event-wins per file_path (batch shape, reusable in foreachBatch)."""
    w = Window.partitionBy("file_path").orderBy(F.desc("event_time"))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def debounced_stream(
    events_stream: DataFrame,
    *,
    quiet_seconds: float = 2.0,
    watermark: str = "5 minutes",
) -> DataFrame:
    """ST2/ST3 on a streaming DF: watermark bounds state; duplicates of the
    same (path, content-hash) are dropped; per-trigger coalescing happens
    in foreachBatch via `coalesce_events`."""
    return events_stream.withWatermark("event_time", watermark).dropDuplicates(
        ["file_path", "sha256"]
    )


def deduped_stream_within_watermark(
    events_stream: DataFrame,
    *,
    watermark: str = "5 minutes",
    keys: tuple[str, ...] = ("file_path", "sha256"),
) -> DataFrame:
    """ST3 with bounded per-key state: `dropDuplicatesWithinWatermark`
    dedups on the KEY COLUMNS ONLY and expires each key's state once the
    watermark passes its first-seen event time.

    Contrast with `debounced_stream`'s plain `dropDuplicates`: there the
    event-time column must be part of the key for state to expire, so two
    occurrences of the same (path, hash) at different timestamps are NOT
    duplicates. Here they are — the semantics a redelivering event feed
    (at-least-once file watcher, replayed queue) actually needs, with
    state O(distinct keys per watermark window) instead of O(all keys
    ever). Falls back to `debounced_stream` on Spark < 3.5."""
    with_wm = events_stream.withWatermark("event_time", watermark)
    if not hasattr(with_wm, "dropDuplicatesWithinWatermark"):
        return with_wm.dropDuplicates([*keys, "event_time"])
    return with_wm.dropDuplicatesWithinWatermark(list(keys))


def trigger_interval(quiet_seconds: float = 2.0) -> str:
    """The debounce quiet period expressed as a processing-time trigger."""
    return f"{int(quiet_seconds)} seconds"
