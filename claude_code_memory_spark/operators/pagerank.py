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
    # |V| as a literal removes 1 + iters broadcast mini-jobs from the
    # plan. r12: probe with limit(257).collect() so the literal-path gate
    # and the node-key gather share ONE driver action (each blocking
    # round-trip is ~0.15-0.2 s of scheduler floor at bench scale); only
    # a >256-node graph pays the separate count() on the fallback path.
    probe_rows = nodes.limit(257).collect()
    if len(probe_rows) <= 256:
        n_nodes = len(probe_rows)
    else:
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
    # r12 (guide §2.4/§7.3, same move as the Lloyd loops): when the rank
    # vector is small enough to inline, the iteration collapses from a
    # broadcast-join + groupBy + node-left-join chain per round — whose
    # lazy lineage compounded into ~58 Exchange nodes at iters=3 — to ONE
    # aggregate job per round over the persisted (src, dst, ratio) table,
    # with the rank vector re-injected as a literal CASE over __src.
    # Equivalence, step by step (pinned by test_pagerank's literal-vs-
    # join A/B and the oracle):
    #   * per-edge contribution: round(pr * ratio, 12) cast decimal —
    #     the identical expression over the identical doubles (literals
    #     round-trip bit-exactly via double_sql_literal);
    #   * the groupBy(dst) DECIMAL(38,12) sum is exact and associative,
    #     so attaching pr by literal instead of broadcast join cannot
    #     change it;
    #   * the per-node update round(0.15/n + 0.85*s, 12) moves driver-
    #     side with Spark's own semantics replicated exactly: Spark's
    #     Round(double) is BigDecimal(shortest-repr).setScale(s, HALF_UP)
    #     .toDouble, i.e. Decimal(repr(x)).quantize(1e-12, HALF_UP) in
    #     Python, and the decimal->double cast (BigDecimal.doubleValue)
    #     and Python float(Decimal) are both correctly rounded.
    # Dangling mass handling is unchanged (missing dst -> s = 0.0).
    # Gated like the clustering literal paths: node keys must be ints or
    # alnum strings and the vector small; big graphs keep the broadcast-
    # join form, whose cost model is what scales to 100 TB.
    literal_ok = 0 < n_nodes <= 256
    if literal_ok:
        node_keys = [r["node"] for r in probe_rows]
        literal_ok = all(
            isinstance(k, int) or (isinstance(k, str) and k.isalnum())
            for k in node_keys
        )
    if not literal_ok:
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
                    + F.lit(DAMPING)
                    * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                    SCALE,
                ).alias("pr"),
            )
        return pr

    from decimal import ROUND_HALF_UP, Decimal

    from claude_code_memory_spark.functions.vector import double_sql_literal

    def _jround(x: float, scale: int) -> float:
        # Spark Round(DoubleType): BigDecimal.valueOf(x) — the shortest
        # round-trip decimal, == Python repr — setScale(scale, HALF_UP),
        # toDouble (correctly rounded, as is float(Decimal)).
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
            )
        )

    e2 = e2.persist()  # scanned once per iteration
    pr_map = {k: _jround(1.0 / n_nodes, SCALE) for k in node_keys}
    for _ in range(iters):
        arms = " ".join(
            f"WHEN __src = {k!r} THEN {double_sql_literal(v)}"
            if isinstance(k, str)
            else f"WHEN __src = {k} THEN {double_sql_literal(v)}"
            for k, v in sorted(pr_map.items())
        )
        rank = F.expr(f"CASE {arms} END")
        sums = (
            e2.groupBy("__dst")
            .agg(
                F.sum(
                    F.round(rank * F.col("__ratio"), SCALE).cast(
                        f"decimal(38,{SCALE})"
                    )
                ).alias("__s")
            )
            .collect()
        )
        s_by_node = {r["__dst"]: r["__s"] for r in sums}
        pr_map = {
            k: _jround(
                BASE / n_nodes
                + DAMPING
                * (float(s_by_node[k]) if s_by_node.get(k) is not None else 0.0),
                SCALE,
            )
            for k in node_keys
        }
    from pyspark.sql.types import DoubleType, StructField, StructType

    node_field = nodes.schema["node"]
    return edges.sparkSession.createDataFrame(
        sorted(pr_map.items()),
        StructType(
            [
                StructField("node", node_field.dataType, node_field.nullable),
                StructField("pr", DoubleType(), False),
            ]
        ),
    )
