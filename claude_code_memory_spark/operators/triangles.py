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
    (each edge once, ``a < b``), via DEGREE-ORDERED orientation and
    adjacency-array intersection.

    Every edge is re-oriented from its lower-(degree, id) endpoint to the
    higher, which bounds out-degrees by O(sqrt(m)) — the classic
    "compact-forward" bound that keeps hub nodes from going quadratic.
    A triangle {x < y < z} (in that total order) is then found exactly
    once at its lowest edge: z ∈ N⁺(x) ∩ N⁺(y). The intersection runs as
    ``array_intersect`` over the two out-neighbor arrays attached to each
    oriented edge — the out-neighbor SETS (distinct edges in, so no
    duplicate elements, and Spark's array_intersect is set-semantics
    anyway). Per-node counts are enumeration-order-invariant, so any
    correct enumeration (e.g. an oracle's a<b<c formulation) yields
    identical results.

    r12 (optimization guide §1.2 "the distributed algorithm"): this
    REPLACES the wedge-generation self-join + closing-edge probe. Both
    formulations move O(W) bytes (W = Σ out-deg², the wedge count), but
    the wedge form materialized W rows and pushed them through a second
    shuffle into the closing join, while this form's only W-sized object
    is the join OUTPUT column (never re-shuffled — the intersect consumes
    it in the same stage) and the per-edge intersection is one tight JVM
    loop instead of W rows of join machinery. Measured on the sf0.1
    co-ordered-parts graph: 4.9 s → 2.3 s (2.2×), identical results;
    plan shrinks from ~197 exchanges (replayed lineage) to ~14.

    Returns (node, n_triangles) for every node in at least one triangle.

    The edge list is persisted before use: it is referenced four times
    (degree counts twice, the orientation join, the adjacency build), and
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
    # persisted: referenced three times (adjacency build + edge stream
    # feeding both adjacency joins)
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist()
    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    au = adj.select(F.col("u").alias("__ju"), F.col("nbrs").alias("__nu"))
    av = adj.select(F.col("u").alias("__jv"), F.col("nbrs").alias("__nv"))
    tris = (
        oriented.join(au, oriented["u"] == au["__ju"])
        .join(av, oriented["v"] == av["__jv"])
        .select("u", "v", F.explode(F.array_intersect("__nu", "__nv")).alias("w"))
    )
    return (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
