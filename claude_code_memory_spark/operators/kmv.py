"""K-minimum-values (KMV / bottom-k) distinct sketches as DataFrame
algebra — the second mergeable-sketch family next to HLL
(`sketch_hll_mergeable`), chosen because bottom-k sketches support what
HLL cannot: set INTERSECTION and Jaccard estimates between groups
(Beyer et al., "On synopses for distinct-value estimation under
multiset operations", SIGMOD'07).

A sketch is the k lexicographically-smallest md5 hashes of a key set.
Everything about it is exact integer/string algebra:

- build: distinct (group, hash) → per-group bottom-k via a partitioned
  row_number window (shuffle bounded by distinct keys, never events);
- merge: bottom-k of the UNION of sketches == bottom-k of the union of
  the underlying sets (any globally-bottom-k hash is bottom-k in its
  own group) — set algebra, no approximation in the merge itself;
- estimate: exact |set| while the sketch isn't full (size < k), else
  (k-1)/U_k with U_k = the kth hash mapped to [0,1).

md5 is the hash on purpose: DuckDB computes the identical digests, so
the sketch CONTENTS are oracle-checkable bit for bit — only the
[0,1)-mapping for the estimator needs `conv`, which stays Spark-side
behind boolean bound checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _h(col) -> F.Column:
    return F.md5(F.col(col).cast("string"))


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = 256
) -> DataFrame:
    """(group, sketch array<string>, n_in_sketch) — the bottom-k hashes
    of each group's distinct keys."""
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        df.select(F.col(group_col), _h(key_col).alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
        .withColumn("n_in_sketch", F.size("sketch"))
    )


def kmv_merge(sketches: DataFrame, k: int = 256) -> DataFrame:
    """One-row union sketch from per-group sketches: bottom-k of the
    union of all sketch members (exact — see module docstring)."""
    return (
        sketches.select(F.explode("sketch").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
        .withColumn("n_in_sketch", F.size("sketch"))
    )


def _u(col) -> F.Column:
    # first 15 hex chars → [0, 16^15) → [0, 1). 60 bits of the digest:
    # plenty below md5's collision floor for estimation purposes
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("double") / float(16**15)


def kmv_estimate(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Adds `est_distinct`: exact size while not full, else (k-1)/U_k."""
    kth = F.element_at("sketch", F.least(F.lit(k), F.size("sketch")))
    return sketches.withColumn(
        "est_distinct",
        F.when(F.size("sketch") < k, F.size("sketch").cast("double")).otherwise(
            F.lit(float(k - 1)) / _u(kth)
        ),
    )


def kmv_jaccard(a: DataFrame, b: DataFrame, k: int = 256) -> float:
    """Jaccard estimate between two one-row sketches: the fraction of
    the merged bottom-k present in both — the estimator HLL has no
    analogue of. Driver-side on two k-length arrays."""
    sa = set(a.first()["sketch"])
    sb = set(b.first()["sketch"])
    merged = sorted(sa | sb)[:k]
    if not merged:
        return 0.0
    both = sum(1 for h in merged if h in sa and h in sb)
    return both / len(merged)
