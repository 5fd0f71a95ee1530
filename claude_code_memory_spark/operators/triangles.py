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
    """Per-node triangle participation counts from an undirected edge list
    (each edge once, ``a < b``), via DEGREE-ORDERED orientation.

    Every edge is re-oriented from its lower-(degree, id) endpoint to the
    higher; wedges are then pairs of out-neighbors, and a triangle closes
    when the (ordered) third edge exists. Each triangle is found exactly
    once, and out-degrees are bounded by O(sqrt(m)) — the classic
    "compact-forward" bound that keeps the wedge fan-out tame on skewed
    graphs where hub nodes would make the id-ordered join quadratic.
    Per-node counts are enumeration-order-invariant, so any correct
    enumeration (e.g. an oracle's a<b<c formulation) yields identical
    results.

    Returns (node, n_triangles) for every node in at least one triangle.

    The edge list is persisted before use: it is referenced five times
    (degree counts twice, both wedge sides, the closing-edge probe), and
    without materialization each reference replays the caller's whole
    edge-derivation subtree — the audited plan carried ~122 Exchange
    nodes from that replication (the same iterative-lineage trap
    pagerank_fixed hit). At 100 TB the edge list is written to storage
    once instead (same note as the Lloyd/pagerank operators).
    """
    edges = edges.persist()
    edges.count()
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = edges.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("__da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("__db")), "b")
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("__db")).otherwise(F.col("__da")).alias("__dv"),
    ).persist()  # referenced three times (both wedge sides + closing probe)
    x = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("__dv").alias("__dx")
    )
    y = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("__dv").alias("__dy")
    )
    # wedge (x, y) ordered by the same (deg, id) total order, so the
    # closing edge — if present — is stored exactly as (u=x, v=y)
    wedges = x.join(y, "u").filter(
        (F.col("__dx") < F.col("__dy"))
        | ((F.col("__dx") == F.col("__dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    return (
        tris.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
