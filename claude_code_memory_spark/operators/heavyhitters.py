"""Heavy-hitter detection via per-partition Misra-Gries summaries plus
an exact verification pass.

The two-pass design is the one that scales: pass 1 runs a bounded-memory
Misra-Gries sketch inside every partition (mapInPandas — Arrow batches,
O(capacity) state, zero shuffle), pass 2 recounts ONLY the surviving
candidates exactly. The MG guarantee composes across partitions: an item
with global count > n/capacity must exceed n_p/capacity in at least one
partition (otherwise its total could not exceed the sum of the per-
partition thresholds), so it survives pass 1 somewhere. The exact
recount then discards every false positive, making the FINAL output
partition-invariant and oracle-checkable even though the intermediate
candidate set is not.

Reference parity: the corpus-frequency surface (BM25 document-frequency
stats, embeddings/bm25.py) — this is its bounded-memory streaming
counterpart for unbounded key spaces. At 100 TB the candidate set is
capacity x partitions rows (thousands), always broadcastable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partition_candidates(
    items: DataFrame, *, item_col: str = "item", capacity: int = 200
) -> DataFrame:
    """Per-partition Misra-Gries summaries: (item, est_count) rows, at
    most ``capacity`` per partition. Candidate-generation stage only —
    est_count is a lower bound and the row set depends on partitioning;
    feed into `heavy_hitters` for the deterministic final answer."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[item_col]:
                if v is None:
                    continue
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
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est_count": list(counters.values())}
            )

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        mg, schema="item string, est_count long"
    )


def heavy_hitters(
    items: DataFrame, *, item_col: str = "item", capacity: int = 200
) -> DataFrame:
    """All items with exact count * capacity > total count (the n/capacity
    threshold in overflow-free integer form), found without ever shuffling
    the full stream by item: MG candidates -> broadcast semi-join ->
    exact recount of candidates only.

    Returns (item, n_occurrences, n_total) — deterministic regardless of
    partitioning (see module docstring for the guarantee argument).
    """
    cands = (
        misra_gries_partition_candidates(
            items, item_col=item_col, capacity=capacity
        )
        .select(F.col("item").alias(item_col))
        .distinct()
    )
    total = items.select(F.count(item_col).alias("n_total"))
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
