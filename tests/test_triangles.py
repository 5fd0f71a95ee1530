"""Triangle counting (operators/triangles.py): exact counts on known
graphs, group-size capping, and once-per-triangle enumeration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.triangles import (
    co_occurrence_edges,
    triangle_counts,
)


@pytest.fixture(scope="module")
def k4_edges(spark):
    # complete graph on {1,2,3,4}: 4 triangles, each node in exactly 3
    rows = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    return spark.createDataFrame(rows, "a int, b int")


def test_k4_triangle_counts(k4_edges):
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(k4_edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_path_graph_has_no_triangles(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a int, b int")
    assert triangle_counts(edges).count() == 0


def test_co_occurrence_edges_dedup_and_order(spark):
    facts = spark.createDataFrame(
        [(10, 3), (10, 1), (10, 3), (11, 1), (11, 3)], "g int, i int"
    )
    got = {(r["a"], r["b"]) for r in
           co_occurrence_edges(facts, group_col="g", item_col="i").collect()}
    assert got == {(1, 3)}  # deduped across groups, always a < b


def test_group_size_cap_drops_mega_groups(spark):
    rows = [(1, i) for i in range(20)] + [(2, 1), (2, 2), (2, 3)]
    facts = spark.createDataFrame(rows, "g int, i int")
    edges = co_occurrence_edges(
        facts, group_col="g", item_col="i", max_group_size=5
    )
    got = {(r["a"], r["b"]) for r in edges.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}  # only group 2 survives


def test_triangle_total_matches_handcount(spark):
    # two triangles sharing edge (1,2): {1,2,3} and {1,2,4}
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "a int, b int"
    )
    per_node = triangle_counts(edges)
    total = per_node.agg((F.sum("n_triangles") / 3).alias("t")).first()["t"]
    assert total == 2.0
    got = {r["node"]: r["n_triangles"] for r in per_node.collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}
