"""Heavy-hitter detection via per-partition Misra-Gries summaries plus
an exact verification pass.

The two-pass design is the one that scales: pass 1 runs a bounded-memory
Misra-Gries sketch inside every partition (mapInPandas — Arrow batches,
O(capacity) state, zero shuffle) and emits the partition's row count
alongside its candidates, so the stream total needs NO extra scan; pass
2 recounts ONLY the surviving candidates exactly. The MG guarantee
composes across partitions: an item with global count > n/capacity must
exceed n_p/capacity in at least one partition (otherwise its total could
not exceed the sum of the per-partition thresholds), so it survives pass
1 somewhere. The exact recount then discards every false positive,
making the FINAL output partition-invariant and oracle-checkable even
though the intermediate candidate set is not.

Reference parity: the corpus-frequency surface (BM25 document-frequency
stats, embeddings/bm25.py) — this is its bounded-memory streaming
counterpart for unbounded key spaces. At 100 TB the sketch output is
(capacity + 1) x partitions rows (thousands), always broadcastable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_fold(counters: dict, values, capacity: int) -> int:
    """Fold ``values`` into a Misra-Gries summary in place; returns the
    number of values consumed. Pure function — the per-partition closure
    and the hypothesis property tests share it, so the guarantee the
    tests prove is the guarantee the operator runs."""
    n = 0
    for v in values:
        n += 1
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return n


def _require_string_items(items: DataFrame, item_col: str) -> None:
    dtype = dict(items.dtypes).get(item_col)
    if dtype is None:
        raise ValueError(f"column {item_col!r} not in {items.columns}")
    if dtype != "string":
        # the Arrow schema below is declared string; fail at call time
        # with a clear message instead of deep inside the job
        raise ValueError(
            f"heavy_hitters requires a string item column; {item_col!r} is "
            f"{dtype} — cast it first"
        )


def misra_gries_partition_sketch(
    items: DataFrame, *, item_col: str = "item", capacity: int = 200
) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``capacity`` candidate
    rows (item, est_count) per partition, PLUS one total row per
    partition with ``item IS NULL`` and ``est_count`` = the partition's
    non-null row count (so the global total rides the same pass).
    Candidate est_counts are lower bounds and the candidate set depends
    on partitioning; feed into `heavy_hitters` for the deterministic
    final answer."""
    _require_string_items(items, item_col)

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += misra_gries_fold(
                counters, (v for v in pdf[item_col] if v is not None), capacity
            )
        if n_rows:
            yield pd.DataFrame(
                {
                    "item": list(counters) + [None],
                    "est_count": list(counters.values()) + [n_rows],
                }
            )

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        mg, schema="item string, est_count long"
    )


def heavy_hitters(
    items: DataFrame, *, item_col: str = "item", capacity: int = 200
) -> DataFrame:
    """All items with exact count * capacity > total count (the n/capacity
    threshold in overflow-free integer form), in TWO scans of the stream:
    the MG sketch pass (which also carries the total) and the exact
    recount of the broadcast candidates.

    Returns (item, n_occurrences, n_total) — deterministic regardless of
    partitioning (see module docstring for the guarantee argument).
    """
    sketch = misra_gries_partition_sketch(
        items, item_col=item_col, capacity=capacity
    ).persist()  # (capacity + 1) x partitions rows; two consumers below
    cands = (
        sketch.filter(F.col("item").isNotNull())
        .select(F.col("item").alias(item_col))
        .distinct()
    )
    total = sketch.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("est_count"), F.lit(0)).alias("n_total")
    )
    exact = (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * capacity > F.col("n_total"))
        .select(item_col, "n_occurrences", "n_total")
    )
