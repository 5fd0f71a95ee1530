"""Deterministic sampling / splitting for training-data pipelines.

All decisions are pure functions of row content (md5-derived), never
`rand()`: re-running the pipeline on the same corpus yields the same
split bit-for-bit on any cluster size or partitioning — the property that
makes 100 TB dataset builds reproducible and lets a DuckDB oracle replay
them. (Spark's `sampleBy`/`randomSplit` are seed-stable only for a fixed
partitioning, which a cluster never guarantees.)

The hash bucket is the first 8 hex chars of md5 of the key column,
mod 10_000 — two decimal digits of split-fraction resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(col: Column | str) -> Column:
    """Deterministic bucket in [0, 10000) from the md5 of a key column."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % BUCKETS
    )


def deterministic_split(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    key_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) from
    cumulative hash-bucket ranges. Fractions must sum to <= 1; the
    remainder (hash ties at the boundary) lands in the LAST label."""
    names = list(fractions)
    b = hash_bucket(key_col)
    expr = F.lit(names[-1])  # boundary remainder → last label
    upper = 0
    cases = []
    for name in names[:-1]:
        lower = upper
        upper += int(round(fractions[name] * BUCKETS))
        cases.append((name, lower, upper))
    for name, lo, ub in reversed(cases):
        expr = F.when((b >= lo) & (b < ub), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    stratum_col: str,
    key_col: str,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    falls under its stratum's fraction (unlisted strata are dropped).
    The deterministic twin of ``DataFrame.sampleBy``."""
    b = hash_bucket(key_col)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = keep | (
            (F.col(stratum_col) == stratum) & (b < int(round(frac * BUCKETS)))
        )
    return df.filter(keep)


def bottom_k_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """EXACTLY-k-per-group deterministic sample: keep the rows whose
    md5(key) ranks among the group's k smallest (ties on identical keys
    broken by the full hash order). The bottom-k-by-hash trick
    (operators/kmv.py) applied to row sampling:

    - uniform within each group (a cryptographic hash is order-free);
    - append-stable: adding rows can only displace the largest hashes,
      so k-samples from overlapping snapshots agree on the overlap —
      unlike randomSplit, whose output depends on partitioning;
    - fixed size per group regardless of group skew (stratified_sample
      is the FRACTION-based twin).

    One partitioned window over (group, hash): shuffle bounded by input
    rows, no global sort."""
    w = Window.partitionBy(group_col).orderBy("__h", key_col)
    return (
        df.withColumn("__h", F.md5(F.col(key_col).cast("string")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )
