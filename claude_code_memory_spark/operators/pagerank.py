"""Fixed-iteration weighted PageRank as pure DataFrame algebra.

The reference walks its relation graph breadth-first (read_graph /
get_implementation BFS over `relations`); centrality over the same graph
is the natural batch companion — "which entities does everything depend
on" — and the canonical example of an iterative algorithm people assume
needs RDD loops or GraphX. It doesn't: each Lloyd-style round is one
broadcast join (rank vector, ~|nodes| rows) against the edge table plus
one aggregate keyed by destination.

Determinism contract (same recipe as operators/clustering.py): per-node
contributions are rounded to 12 dp then summed as DECIMAL(38,12) —
associative, so the rank vector is bit-identical under any partitioning
and the whole iteration chain replays in a DuckDB oracle. Damping
constants are spelled as the literals 0.85 / 0.15 on both sides (NOT
`1 - d`, whose float value differs from the 0.15 literal).

Scale: the edge table never moves — it is scanned once per iteration
with the rank vector broadcast onto it; the only shuffle is the
groupBy(dst) whose key space is |nodes|. Dangling-node mass (nodes with
no out-edges) is dropped, the common simplification; ranks then sum to
<= 1, which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
BASE = 0.15  # literal, NOT 1 - DAMPING (different double)
SCALE = 12  # rounding of the per-iteration rank vector


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, pr) after ``iters`` rounds of weighted PageRank over
    (src, dst, weight>=0) edges. Node universe = src ∪ dst.

    ``edges`` is persisted here: the iteration lineage references it
    2 + iters times, and without materialization Spark replays the whole
    upstream extraction (potentially a multi-table join over the raw
    data) once per reference — the classic iterative-algorithm trap.
    Caching the aggregated edge table (|nodes|^2 rows at most) makes
    every subsequent pass an in-memory scan."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    # one scalar driver action (like collecting KMeans centroids): |V| as
    # a literal removes 1 + iters broadcast mini-jobs from the plan
    n_nodes = nodes.count()
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__outw"))
    # ratio is exact when weights are integers (IEEE division, both engines)
    e2 = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            (F.col(weight).cast("double") / F.col("__outw").cast("double")).alias("__ratio"),
        )
    )
    pr = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(n_nodes), SCALE).alias("pr")
    )
    for _ in range(iters):
        contrib = e2.join(
            F.broadcast(pr), e2["__src"] == pr["node"]
        ).select(
            F.col("__dst"),
            F.round(F.col("pr") * F.col("__ratio"), SCALE)
            .cast(f"decimal(38,{SCALE})")
            .alias("__c"),
        )
        sums = contrib.groupBy("__dst").agg(F.sum("__c").alias("__s"))
        pr = nodes.join(sums, nodes["node"] == sums["__dst"], "left").select(
            "node",
            F.round(
                F.lit(BASE) / F.lit(n_nodes)
                + F.lit(DAMPING) * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                SCALE,
            ).alias("pr"),
        )
    return pr
