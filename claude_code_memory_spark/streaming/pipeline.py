"""Streaming incremental indexing: file events → debounce → foreachBatch
re-entry into the batch merge pipeline.

Reference flow (SURVEY.md §3.3): watchdog events → debounced batches →
the SAME per-batch indexing path as batch mode (handler.py:173-280 calls
back into indexer steps 4-9). We mirror that exactly: the streaming query
is just a debounced event feed whose foreachBatch calls
``CodeMemoryEngine.index`` — one code path for batch and streaming.

ST5 deletion propagation: 'deleted' events remove the file's rows from
every table (K2) and trigger orphan cleanup (J2) — all inside the same
merge, because merge_replace_by_file treats deleted files as replaced
files with zero new rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from claude_code_memory_spark.api import CodeMemoryEngine
from claude_code_memory_spark.schemas import EVENTS
from claude_code_memory_spark.streaming.debounce import (
    coalesce_events,
    debounced_stream,
    trigger_interval,
)


def file_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """ST1: a JSONL directory of filesystem events as a streaming source
    (stand-in for watchdog; on a cluster this is the CDC/notification feed)."""
    return spark.readStream.schema(EVENTS).json(events_dir)


def start_watch(
    engine: CodeMemoryEngine,
    events_dir: str,
    project_dir: str,
    *,
    quiet_seconds: float = 2.0,
) -> StreamingQuery:
    """ST4: debounced incremental indexing driven by an event stream."""
    stream = debounced_stream(file_event_stream(engine.spark, events_dir))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        events = coalesce_events(batch_df)
        if events.isEmpty():
            return
        # the batch pipeline re-scans + diffs, so any event (create/modify/
        # delete) is handled by one incremental index() call — identical to
        # the reference's handler → CoreIndexer re-entry.
        engine.index(project_dir, incremental=True)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .trigger(processingTime=trigger_interval(quiet_seconds))
        .option("checkpointLocation", f"{engine.store.root}/_checkpoints/watch")
        .start()
    )
