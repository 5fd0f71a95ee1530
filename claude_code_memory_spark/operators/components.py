"""Connected components over similarity edges — pairs → duplicate clusters.

Near-dup detection (dedup.py) emits *pairs*; an actual dedup pass needs
*clusters* (keep one doc per component). This is min-label propagation by
iterative joins: every node adopts the smallest label among itself and
its neighbors until fixpoint — converges in O(graph diameter) rounds,
and near-dup components are shallow (diameter ≪ 10) in practice.

Scale notes:
- each round is one shuffle join on node id + one min-aggregate — both
  key-partitioned, no driver-side data;
- `localCheckpoint` after every round truncates the lineage, otherwise
  the plan tree doubles per iteration and planning time explodes;
- for adversarial graphs (long chains, giant components) the
  O(diameter) bound hurts; the published fix is the alternating
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14), which converges in
  O(log² n) rounds with the same join-per-round shape. Diameter-bounded
  propagation is the right default for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id reachable. Raises if not converged within max_iter."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    labels = (
        sym.select(F.col("s").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels.withColumnRenamed("node", "d"), "d"
        ).select(F.col("s").alias("node"), "comp")
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every doc that is in a duplicate cluster but is not its
    cluster's min-id representative (docs without near-dup edges are kept
    untouched — they never enter the component computation)."""
    comp = connected_components(pairs, src="id_a", dst="id_b")
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
