"""Fixed-iteration PageRank (operators/pagerank.py): determinism,
probability-mass bounds, and structural sanity on a known graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.pagerank import pagerank_fixed


@pytest.fixture(scope="module")
def tri(spark):
    # A -> B -> C -> A cycle plus a D -> B feeder (D is dangling-source
    # only: it has out-edges; C also feeds D so all nodes have in-edges)
    rows = [(0, 1, 2), (1, 2, 1), (2, 0, 1), (3, 1, 1), (2, 3, 1)]
    return spark.createDataFrame(rows, "src int, dst int, w int")


def _ranks(df):
    return {r["node"]: r["pr"] for r in df.collect()}


def test_pagerank_partition_invariant(spark, tri):
    r1 = _ranks(pagerank_fixed(tri, iters=3))
    r2 = _ranks(pagerank_fixed(tri.repartition(7, "dst"), iters=3))
    assert r1 == r2  # decimal contribution sums: bit-identical


def test_pagerank_mass_and_floor(tri):
    pr = pagerank_fixed(tri, iters=3)
    ranks = _ranks(pr)
    assert len(ranks) == 4
    total = sum(ranks.values())
    # no dangling nodes in this graph -> mass conserved up to rounding
    assert abs(total - 1.0) < 1e-9
    # every node keeps at least the teleport floor (1-d)/N
    assert all(v >= 0.15 / 4 - 1e-12 for v in ranks.values())
    # B has two in-edges incl. the heavy A->B; it must outrank D (one
    # weak in-edge from C's split mass)
    assert ranks[1] > ranks[3]


def test_pagerank_weights_matter(spark):
    # star: hub 0 points to 1 and 2 with weights 9:1 -> node 1 outranks 2
    edges = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)], "src int, dst int, w int"
    )
    ranks = _ranks(pagerank_fixed(edges, iters=3))
    assert ranks[1] > ranks[2] > 0


def test_pagerank_literal_path_matches_join_form(spark, tri):
    """r12: small graphs take the literal-rank iteration (one aggregate
    job per round); this replays the original broadcast-join formulation
    inline and demands BIT-identical doubles — the equivalence the
    optimization claims. Also covers a string-keyed graph (other CASE
    arm type) and a >256-node graph exercising the fallback gate."""
    from claude_code_memory_spark.operators.pagerank import BASE, DAMPING, SCALE

    def join_form(edges, iters):
        edges = edges.persist()
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n_nodes = nodes.count()
        outw = edges.groupBy("src").agg(F.sum("w").alias("__outw"))
        e2 = edges.join(outw, "src").select(
            F.col("src").alias("__src"),
            F.col("dst").alias("__dst"),
            (F.col("w").cast("double") / F.col("__outw").cast("double")).alias(
                "__ratio"
            ),
        )
        pr = nodes.select(
            "node", F.round(F.lit(1.0) / F.lit(n_nodes), SCALE).alias("pr")
        )
        for _ in range(iters):
            contrib = e2.join(F.broadcast(pr), e2["__src"] == pr["node"]).select(
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

    import struct as _struct

    def bits(d):
        return {k: _struct.pack("<d", v) for k, v in d.items()}

    assert bits(_ranks(pagerank_fixed(tri, iters=3))) == bits(
        _ranks(join_form(tri, iters=3))
    )

    named = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("c", "b", 1)],
        "src string, dst string, w int",
    )
    assert bits(_ranks(pagerank_fixed(named, iters=2))) == bits(
        _ranks(join_form(named, iters=2))
    )

    # 300-node ring > the 256 literal gate -> join-form fallback runs
    big = spark.createDataFrame(
        [(i, (i + 1) % 300, 1) for i in range(300)], "src int, dst int, w int"
    )
    assert bits(_ranks(pagerank_fixed(big, iters=1))) == bits(
        _ranks(join_form(big, iters=1))
    )


def test_pagerank_driver_path_matches_inplan_paths(spark, tri, monkeypatch):
    """r12 session 3: small graphs now run EVERY iteration driver-side
    (one Spark job). Force each in-plan fallback and demand bit-identical
    doubles against the driver path on the same graph."""
    import struct as _struct

    from claude_code_memory_spark.operators import pagerank as pg

    def bits(df):
        return {r["node"]: _struct.pack("<d", r["pr"]) for r in df.collect()}

    driver = bits(pagerank_fixed(tri, iters=3))
    # cap 0 -> the probe always overflows -> in-plan literal-CASE path
    monkeypatch.setattr(pg, "DRIVER_EDGE_CAP", 0)
    assert bits(pagerank_fixed(tri, iters=3)) == driver
    monkeypatch.undo()

    # null src: the driver path must refuse (node universe includes null
    # and the dangling dst), falling back to the join form — compare the
    # result with and without the cap to prove the refusal is the gate,
    # not the arithmetic
    nullg = spark.createDataFrame(
        [(None, 5, 1), (1, 2, 1), (2, 1, 1)], "src int, dst int, w int"
    )
    with_gate = bits(pagerank_fixed(nullg, iters=2))
    monkeypatch.setattr(pg, "DRIVER_EDGE_CAP", 0)
    assert bits(pagerank_fixed(nullg, iters=2)) == with_gate
    monkeypatch.undo()
    assert set(with_gate) == {None, 5, 1, 2}  # null node + its dst survive

    # negative weight -> ratio outside [0, 1] -> driver path refuses,
    # in-plan literal path (which has no ratio gate) handles it; both
    # cap settings must agree
    neg = spark.createDataFrame(
        [(0, 1, -2), (1, 0, 1), (0, 2, 3)], "src int, dst int, w int"
    )
    r_gated = bits(pagerank_fixed(neg, iters=2))
    monkeypatch.setattr(pg, "DRIVER_EDGE_CAP", 0)
    assert bits(pagerank_fixed(neg, iters=2)) == r_gated


def test_pagerank_dangling_leaks_bounded(spark):
    # 0 -> 1 and 1 has no out-edges: dangling mass is dropped, so the
    # total is < 1 but every rank stays >= the teleport floor
    edges = spark.createDataFrame([(0, 1, 1)], "src int, dst int, w int")
    ranks = _ranks(pagerank_fixed(edges, iters=2))
    assert set(ranks) == {0, 1}
    assert sum(ranks.values()) < 1.0
    assert all(v >= 0.15 / 2 - 1e-12 for v in ranks.values())


def test_driver_pagerank_refuses_bad_ratio_directly():
    """Advice r12: assert the ratio gate ITSELF fires — calling
    _driver_pagerank on rows whose ratio is outside [0, 1] (negative
    weight) or non-finite must return None, independent of which Spark
    path a caller would then take."""
    from claude_code_memory_spark.operators.pagerank import _driver_pagerank

    def row(s, d, r):
        return {"__src": s, "__dst": d, "__ratio": r}

    ok = [row(0, 1, 0.5), row(1, 0, 1.0)]
    assert _driver_pagerank(ok, iters=1) is not None
    assert _driver_pagerank([row(0, 1, -0.5)] + ok, iters=1) is None
    assert _driver_pagerank([row(0, 1, 1.5)] + ok, iters=1) is None
    assert _driver_pagerank([row(0, 1, float("nan"))] + ok, iters=1) is None
    assert _driver_pagerank([row(0, 1, None)] + ok, iters=1) is None
    # >256 nodes bails during the scan
    many = [row(i, i + 1, 0.5) for i in range(300)]
    assert _driver_pagerank(many, iters=1) is None


def test_pagerank_driver_matches_literal_on_random_graphs(spark, monkeypatch):
    """Advice r12: the driver path replicates round(pr*ratio, 12) via the
    repr==shortest-toString assumption on a NEW operation class — pin it
    with randomized graphs (irregular weights drive the 12-dp rounding
    through many halfway-ish products) bit-compared against the in-plan
    literal path."""
    import random
    import struct as _struct

    from claude_code_memory_spark.operators import pagerank as pg

    def bits(df):
        return {r["node"]: _struct.pack("<d", r["pr"]) for r in df.collect()}

    for seed in (7, 23):
        rng = random.Random(seed)
        n = rng.randint(5, 24)
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randint(1, 9))
            for _ in range(3 * n)
        ]
        df = spark.createDataFrame(edges, "src int, dst int, w int")
        driver = bits(pagerank_fixed(df, iters=3))
        monkeypatch.setattr(pg, "DRIVER_EDGE_CAP", 0)
        inplan = bits(pagerank_fixed(df, iters=3))
        monkeypatch.undo()
        assert driver == inplan, f"seed {seed}: driver/in-plan bit mismatch"
