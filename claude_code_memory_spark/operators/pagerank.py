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
# driver-path gate: collect the (src, dst, ratio) edge list and iterate
# driver-side only under this row cap (module-level so tests can force
# the in-plan fallbacks)
DRIVER_EDGE_CAP = 100_000


def _driver_pagerank(e2_rows, iters: int) -> dict | None:
    """All ``iters`` rounds over an already-collected (src, dst, ratio)
    edge list, replicating the in-plan literal-CASE iteration bit for bit
    (returns None when any gate fails, so the caller falls back to the
    Spark paths):

    - contribution ``round(pr * ratio, 12)`` — Python float multiplication
      is the same IEEE double op, and Spark's Round(DoubleType) is
      BigDecimal.valueOf(x) (shortest round-trip repr, == Python ``repr``)
      .setScale(12, HALF_UP).toDouble — correctly rounded back, as is
      ``float(Decimal)``;
    - the double→DECIMAL(38,12) cast is the same shortest-repr quantize
      (HALF_UP), and the per-dst sum of 12-dp decimals is exact integer
      arithmetic — associative, so driver summation order cannot differ
      from the partition-order-free Spark aggregate;
    - the per-node update replays ``round(0.15/n + 0.85 * double(s), 12)``
      with the identical operator order and the correctly-rounded
      decimal→double cast.

    Gates: node keys must be ints or alnum strings (the literal-CASE
    contract), ≤ 256 nodes (same bound as the in-plan literal path), and
    every ratio finite in [0, 1] — the regime of non-negative weights,
    where rank mass stays ≤ 1 and the decimal sums can never reach the
    DECIMAL(38,12) overflow-to-NULL edge the driver form does not model.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    node_keys = set()
    for r in e2_rows:
        node_keys.add(r["__src"])
        node_keys.add(r["__dst"])
        if len(node_keys) > 256:  # bail during the scan, not after it
            return None
    if not node_keys:
        return None
    for k in node_keys:
        if isinstance(k, bool) or not (
            isinstance(k, int) or (isinstance(k, str) and k.isalnum())
        ):
            return None
    edge_list = []
    for r in e2_rows:
        ratio = r["__ratio"]
        if ratio is None or not math.isfinite(ratio) or not 0.0 <= ratio <= 1.0:
            return None
        edge_list.append((r["__src"], r["__dst"], ratio))
    n_nodes = len(node_keys)
    q12 = Decimal(1).scaleb(-SCALE)

    def _jround(x: float) -> float:
        return float(Decimal(repr(x)).quantize(q12, rounding=ROUND_HALF_UP))

    pr = {k: _jround(1.0 / n_nodes) for k in node_keys}
    with localcontext() as ctx:
        ctx.prec = 38
        for _ in range(iters):
            sums: dict = {}
            for s, d, ratio in edge_list:
                c = Decimal(repr(_jround(pr[s] * ratio))).quantize(
                    q12, rounding=ROUND_HALF_UP
                )
                sums[d] = sums.get(d, Decimal(0)) + c
            pr = {
                k: _jround(
                    BASE / n_nodes
                    + DAMPING * (float(sums[k]) if k in sums else 0.0)
                )
                for k in node_keys
            }
    return pr


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
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__outw"))
    # ratio is exact when weights are integers (IEEE division, both engines).
    # LEFT join (not inner): a null-src edge has no outw match and an inner
    # join would silently drop it from e2 — invisible to the driver-path
    # probe below, which must SEE the null to refuse the collapsed form
    # (the node universe includes null and such an edge's dst). On the
    # in-plan paths the extra null-ratio rows contribute nothing: null
    # never matches the rank CASE or the broadcast-join condition, and
    # the decimal sum skips the resulting nulls.
    e2 = (
        edges.join(outw, src, "left")
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            (F.col(weight).cast("double") / F.col("__outw").cast("double")).alias("__ratio"),
        )
    )
    # r12 session 3 (guide §2.4/§7.3, same gate family as the components
    # union-find): for graphs whose weighted edge list fits a bounded
    # driver collect, EVERY iteration runs driver-side — the whole
    # operator is then ONE Spark job (the e2 limit-probe doubles as the
    # edge gather) instead of a probe + one aggregate job per round.
    # The arithmetic is the literal-CASE path's, replicated step by step
    # (see _driver_pagerank); the bit-equivalence is pinned by
    # test_pagerank_literal_path_matches_join_form, which compares both
    # small-graph paths against the original broadcast-join form packed
    # to raw double bits. 100 TB graphs blow the cap and keep the
    # iterative aggregates below, whose cost model is the scale story.
    probe_e2 = e2.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(probe_e2) <= DRIVER_EDGE_CAP:
        driver_pr = _driver_pagerank(probe_e2, iters)
        if driver_pr is not None:
            src_f = e2.schema["__src"]
            dst_f = e2.schema["__dst"]
            if src_f.dataType == dst_f.dataType:
                from pyspark.sql.types import DoubleType, StructField, StructType

                # the persist existed for the iterative fallbacks' reuse;
                # on this path the probe was the only consumer — release
                # the cached blocks instead of holding them for nothing
                # (advice r12)
                edges.unpersist()
                return edges.sparkSession.createDataFrame(
                    sorted(driver_pr.items()),
                    StructType(
                        [
                            StructField(
                                "node",
                                src_f.dataType,
                                src_f.nullable or dst_f.nullable,
                            ),
                            StructField("pr", DoubleType(), False),
                        ]
                    ),
                )
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
