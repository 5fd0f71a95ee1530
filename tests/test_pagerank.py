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


def test_pagerank_dangling_leaks_bounded(spark):
    # 0 -> 1 and 1 has no out-edges: dangling mass is dropped, so the
    # total is < 1 but every rank stays >= the teleport floor
    edges = spark.createDataFrame([(0, 1, 1)], "src int, dst int, w int")
    ranks = _ranks(pagerank_fixed(edges, iters=2))
    assert set(ranks) == {0, 1}
    assert sum(ranks.values()) < 1.0
    assert all(v >= 0.15 / 2 - 1e-12 for v in ranks.values())
