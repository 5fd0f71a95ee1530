"""Incremental aggregate maintenance: a daily event rollup kept current
by MERGING batch deltas, never rescanning the event history.

Counts and decimal sums are commutative monoids, so the maintained table
satisfies rollup(events ∪ batch) == merge(rollup(events), rollup(batch))
exactly — including the value sums, because they are DECIMAL(18,6)
(associative) rather than floating point. `tests/test_rollup.py` pins
the equality against a full recompute after multiple appends.

Cost model: each refresh aggregates ONLY the new batch (O(batch)) and
merges with the existing rollup (O(|rollup| + |delta|), and the rollup
is day x type — bounded). The event history is never rescanned; at
100 TB of accumulated events that is the difference between a minutes-
long daily job and an impossible one. The same `merge_rollup` runs
unchanged inside a Structured Streaming `foreachBatch` — the batch/
stream promotion path every operator in streaming/ follows.

Reference parity: the reference recomputes collection statistics from
the store on demand (storage/qdrant.py stats surface); this is the
maintained-view formulation those statistics need once the store stops
fitting one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def daily_rollup(events_us: DataFrame) -> DataFrame:
    """Aggregate an event frame (with epoch-µs ``ts_us``) to the rollup
    grain: (day, event_type) -> n, total_value DECIMAL(18,6)."""
    return events_us.groupBy(
        F.expr(f"ts_us div {_DAY_US}").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
    )


def merge_rollup(old: DataFrame | None, batch_events_us: DataFrame) -> DataFrame:
    """Fold a new event batch into an existing rollup.

    The merge is the monoid sum on matching (day, event_type) keys: a
    union + re-aggregate over rollup-grain rows only. Decimal sums make
    the merged totals EXACTLY equal to a full recompute, regardless of
    how events were split into batches or partitions.
    """
    delta = daily_rollup(batch_events_us)
    if old is None:
        return delta
    return (
        old.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("total_value").cast("decimal(18,6)").alias("total_value"),
        )
    )
