"""Stream-stream interval joins — the streaming twin of the batch
range join (`operators/asof.py::range_join_pairs`, catalog query
`range_join_click_to_purchase`).

Structured Streaming executes the SAME join expression incrementally:
both sides are watermarked, and the event-time interval condition is
what lets the state store evict — without it, each side's state grows
forever. The watermark + interval bound is the 100 TB contract: per-key
state is bounded by (watermark delay + interval width) of events, never
by stream history.

Reference parity: the reference's watcher correlates file events with
subsequent index completions in process memory (watcher/handler.py);
this is that correlation expressed as an engine operator with bounded
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "5 minutes",
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with the same ``key``
    that occur in ``[left_ts, left_ts + within]``.

    Works identically on batch and streaming inputs; on streams BOTH
    sides must carry a watermark (applied here) so join state is
    evictable. Column names are prefixed ``l_``/``r_`` to keep the
    output schema stable across both uses.

    ``how='leftOuter'`` additionally emits each unmatched left event
    with NULL right columns — on a stream this happens only once the
    watermark has passed the event's interval (the state store can then
    prove no match can still arrive), which is the streaming form of
    "click with no purchase within 5 minutes" abandonment analytics.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l["l_key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
