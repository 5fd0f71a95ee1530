"""Incremental rollup maintenance (plans/rollup.py): batch-merged
aggregates must EXACTLY equal a full recompute, with no rescan of the
event history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.plans.incremental import TableStore
from claude_code_memory_spark.plans.rollup import daily_rollup, merge_rollup
from claude_code_memory_spark.queries.base import ts_us_col


@pytest.fixture(scope="module")
def events_us(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.withColumn("ts_us", ts_us_col(e)).select(
        "ts_us", "event_type", "value", "event_id"
    )


def _as_map(df):
    return {
        (r["day"], r["event_type"]): (r["n"], r["total_value"])
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, events_us, tmp_path):
    """Three uneven appends through the store == one full aggregation,
    bit-for-bit (decimal sums are associative across any batch split)."""
    store = TableStore(spark, str(tmp_path / "rollup"))
    batches = [
        events_us.filter(F.col("event_id") % 5 <= 1),
        events_us.filter(F.col("event_id") % 5 == 2),
        events_us.filter(F.col("event_id") % 5 >= 3),
    ]
    for b in batches:
        old = store.read("daily")
        store.write("daily", merge_rollup(old, b))
    assert _as_map(store.read("daily")) == _as_map(daily_rollup(events_us))


def test_merge_never_rescans_event_history(spark, events_us, tmp_path):
    """The refresh plan must read the stored ROLLUP (day x type grain)
    plus the new batch — never the base events table."""
    store = TableStore(spark, str(tmp_path / "rollup2"))
    first = events_us.filter(F.col("event_id") % 2 == 0)
    store.write("daily", merge_rollup(None, first))

    batch = events_us.filter(F.col("event_id") % 2 == 1)
    merged = merge_rollup(store.read("daily"), batch)
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    # exactly two relations: the stored rollup + the batch's own source —
    # a third would mean the event history is being re-aggregated
    assert plan.count("Relation") <= 2
    files = merged.inputFiles()
    assert any("rollup2" in f for f in files), files  # reads the maintained table
    assert _as_map(merged) == _as_map(daily_rollup(events_us))


def test_empty_batch_is_identity(spark, events_us, tmp_path):
    base = daily_rollup(events_us)
    empty = events_us.filter("1 = 0")
    assert _as_map(merge_rollup(base, empty)) == _as_map(base)


def test_rollup_maintained_by_streaming_foreachbatch(spark, events_us, tmp_path):
    """The SAME merge_rollup maintains the store under Structured
    Streaming: events arrive as micro-batches, foreachBatch folds each
    into the TableStore, and the final rollup equals the batch answer —
    the batch/stream promotion path the module docstring claims."""
    import json as _json

    src = tmp_path / "stream_src"
    src.mkdir()
    rows = events_us.select("ts_us", "event_type", "value").collect()
    third = len(rows) // 3
    for i, chunk in enumerate([rows[:third], rows[third:2 * third], rows[2 * third:]]):
        with open(src / f"b{i}.jsonl", "w") as f:
            for r in chunk:
                f.write(_json.dumps(
                    {"ts_us": r["ts_us"], "event_type": r["event_type"],
                     "value": r["value"]}) + "\n")

    store = TableStore(spark, str(tmp_path / "stream_rollup"))

    def fold(batch_df, batch_id):
        store.write("daily", merge_rollup(store.read("daily"), batch_df))

    stream = (
        spark.readStream.schema("ts_us long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "roll_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _as_map(store.read("daily")) == _as_map(daily_rollup(events_us))
    # three micro-batches -> at least three committed versions (time travel
    # gives the rollup's own history for free)
    assert len(store.history("daily")) >= 3
