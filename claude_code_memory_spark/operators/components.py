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
  O(diameter) bound hurts; `connected_components_star` below implements
  the published fix — alternating large-star/small-star (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14),
  O(log² n) rounds with the same join-per-round shape, equivalence
  test-pinned against propagation. Diameter-bounded propagation stays
  the default for dedup workloads (near-dup components are shallow);
  switch to the star variant when the component structure is unknown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r12 (guide §2.4/§7.3, the pagerank/Lloyd literal-path pattern): every
# propagation/star round costs TWO blocking driver jobs (localCheckpoint
# materialization + convergence count) at a measured ~0.3-0.5 s/job
# scheduler floor, so a shallow near-dup graph pays ~8 sequential jobs
# to move a few thousand integer labels. When the edge list is small,
# collect it once and run union-find driver-side — the result, (node,
# min reachable id), is pure integer graph connectivity: no floats, no
# ordering subtleties, bit-free equivalence by definition. Big graphs
# (the 100 TB path) keep the iterative joins. Gated on int-typed,
# null-free keys; the cap is edges, probed with limit(cap+1).
_DRIVER_EDGE_CAP = 100_000


def _driver_components(pairs: list[tuple]) -> list[tuple]:
    """Union-find; returns sorted (node, min-id-in-component) rows."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: the smaller id becomes the root, so the root
            # IS the component's min — no second pass needed
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return sorted((n, find(n)) for n in parent)


def _try_driver_components(
    edges: DataFrame, src: str, dst: str
) -> DataFrame | None:
    """The gated driver path shared by both component operators; None
    when the graph is too big or the keys unsuitable."""
    probe = edges.select(src, dst).limit(_DRIVER_EDGE_CAP + 1).collect()
    if len(probe) > _DRIVER_EDGE_CAP:
        return None
    pairs = [(r[0], r[1]) for r in probe]
    if not all(
        isinstance(a, int) and isinstance(b, int) for a, b in pairs
    ):
        return None
    from pyspark.sql.types import StructField, StructType

    sym_type = (
        edges.select(F.col(src).alias("s"))
        .unionByName(edges.select(F.col(dst).alias("s")))
        .schema["s"]
    )
    return edges.sparkSession.createDataFrame(
        _driver_components(pairs),
        StructType(
            [
                StructField("node", sym_type.dataType, sym_type.nullable),
                StructField("comp", sym_type.dataType, sym_type.nullable),
            ]
        ),
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id reachable. Raises if not converged within max_iter."""
    local = _try_driver_components(edges, src, dst)
    if local is not None:
        return local
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


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log² n) rounds regardless of graph diameter, the
    adversarial-graph alternative to `connected_components`'s
    O(diameter) min-label propagation.

    Edges are kept canonically as (a, b) with a > b ("pointing down").
    Each round is two grouped min-aggregates + re-emissions, all keyed
    by node id — the same shuffle shape as one propagation round, so at
    100 TB the win is purely the round count on long-chain / giant
    components. Converges when the edge set reaches a fixpoint: a star
    per component centered on its minimum id.
    """
    # driver path (see _try_driver_components): the star contract drops
    # self-loop-only nodes (the x != y filter below), so self-edges are
    # filtered from the collected pairs before union-find — the node set
    # then matches `all_nodes` exactly.
    nonself = edges.filter(F.col(src) != F.col(dst))
    local = _try_driver_components(nonself, src, dst)
    if local is not None:
        return local
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(cur: DataFrame) -> DataFrame:
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("__mn"))
        m = mins.select("a", F.least("a", "__mn").alias("m"))
        return (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))  # strictly-larger neighbors re-point
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(cur: DataFrame) -> DataFrame:
        # stored a > b, so every neighbor via "a" is smaller: m = min(N)
        mins = cur.groupBy("a").agg(F.min("b").alias("m"))
        re_pointed = (
            cur.join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(mins.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        return re_pointed

    for _ in range(max_iter):
        nxt = small_star(large_star(e)).localCheckpoint()
        if (
            nxt.count() == e.count()
            and nxt.exceptAll(e).limit(1).count() == 0
        ):
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    return all_nodes.join(
        e.select(F.col("a").alias("node"), F.col("b").alias("comp")), "node", "left"
    ).select("node", F.coalesce("comp", "node").alias("comp"))
