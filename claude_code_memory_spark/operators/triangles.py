"""Triangle counting over a co-occurrence graph, as pure DataFrame
algebra.

The graph shape the reference's relation store induces (entities
connected by appearing in the same file/order/session) is exactly a
bipartite co-occurrence projection; triangle density over it is the
standard cohesion metric (clustering coefficient numerator). Reference
parity: the relation-graph traversal surface (`read_graph`,
storage/qdrant.py relation queries) — this adds the aggregate-analytics
counterpart.

Scale notes:
- Edge construction self-joins the fact table on the group key; the
  fan-out is bounded by the per-group size (TPC-H orders have <= 7
  lines; cap explicitly for unbounded group sizes).
- Triangle enumeration uses the ordered-edge ("node-iterator++")
  formulation: every undirected edge is kept once as (a < b), and a
  triangle is counted exactly once as a < b < c. Cost is one self-join
  of the edge list on its lower endpoint plus one membership semi-join —
  the textbook shape; at 100 TB add degree-ordering to cap the join
  fan-out at high-degree hubs (documented, not needed at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_occurrence_edges(
    facts: DataFrame,
    *,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Distinct undirected edges (a < b) between items sharing a group.

    ``max_group_size`` drops groups larger than the bound BEFORE the
    pairwise self-join — the guard that keeps a pathological mega-group
    from exploding quadratically at scale.
    """
    base = facts.select(group_col, item_col).distinct()
    if max_group_size is not None:
        sizes = base.groupBy(group_col).agg(F.count("*").alias("__gs"))
        base = base.join(
            F.broadcast(sizes.filter(F.col("__gs") <= max_group_size)), group_col
        ).drop("__gs")
    a = base.select(F.col(group_col).alias("__g"), F.col(item_col).alias("a"))
    b = base.select(F.col(group_col).alias("__g"), F.col(item_col).alias("b"))
    return (
        a.join(b, "__g")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts from an ordered edge list.

    ``edges`` must hold each undirected edge once with ``a < b``.
    Returns (node, n_triangles) for every node in at least one triangle.
    """
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")  # x < y < z by construction
    tris = wedges.join(e3, ["x", "z"])
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
