"""Deterministic k-means + SemDeDup semantic dedup (operators/clustering.py).

The load-bearing property is partition-invariance: the same input must
produce bit-identical assignments and centroids regardless of how the
data is partitioned — that is what makes the operator oracle-checkable
and incremental-reindex-safe.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.vector import cosine_similarity
from claude_code_memory_spark.operators.clustering import (
    assign_clusters,
    kmeans_lloyd,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _assignments(df):
    return {r["vec_id"]: r["cluster_id"] for r in df.select("vec_id", "cluster_id").collect()}


def test_kmeans_partition_invariant(spark, emb):
    a1, c1 = kmeans_lloyd(emb, k=4, iters=2)
    a2, c2 = kmeans_lloyd(emb.repartition(13, "label"), k=4, iters=2)
    assert _assignments(a1) == _assignments(a2)
    cents1 = {r["cluster_id"]: r["__cvec"] for r in c1.collect()}
    cents2 = {r["cluster_id"]: r["__cvec"] for r in c2.collect()}
    assert cents1 == cents2  # decimal sums make the means exactly equal


def test_kmeans_basic_invariants(emb):
    n = emb.count()
    assigned, cent = kmeans_lloyd(emb, k=4, iters=2)
    assert assigned.count() == n  # every vector assigned exactly once
    clusters = {r["cluster_id"] for r in cent.collect()}
    assert clusters <= set(range(4)) and len(clusters) >= 1
    got = assigned.select("cluster_id").distinct()
    assert {r["cluster_id"] for r in got.collect()} <= clusters


def test_kmeans_iterations_reduce_inertia(emb):
    """Lloyd monotonicity: mean distance to the assigned centroid after 2
    update steps is <= after 0 steps (assignment against the seeds)."""

    def inertia(assigned, cent):
        joined = assigned.join(cent, "cluster_id")
        d = F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.col("__cvec"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        return joined.agg(F.avg(d)).first()[0]

    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").cast("array<double>").alias("__cvec"),
    )
    a0 = assign_clusters(emb, seeds)
    a2, c2 = kmeans_lloyd(emb, k=4, iters=2)
    assert inertia(a2, c2) <= inertia(a0, seeds) + 1e-9


def test_kmeans_assignment_is_nearest_centroid(emb):
    assigned, cent = kmeans_lloyd(emb, k=4, iters=1)
    # for a sample of vectors, the chosen centroid must minimize L2
    rows = assigned.limit(20).collect()
    cents = {r["cluster_id"]: r["__cvec"] for r in cent.collect()}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        best = min(
            cents,
            key=lambda c: (
                math.fsum((a - b) * (a - b) for a, b in zip(v, cents[c])),
                c,
            ),
        )
        d_best = math.fsum((a - b) * (a - b) for a, b in zip(v, cents[best]))
        d_got = math.fsum((a - b) * (a - b) for a, b in zip(v, cents[r["cluster_id"]]))
        assert d_got <= d_best + 1e-9, (r["vec_id"], r["cluster_id"], best)


def test_semantic_dedup_verdicts(emb):
    assigned, _ = kmeans_lloyd(emb, k=4, iters=1)
    verdicts = semantic_dedup(assigned, threshold=0.4)
    assert verdicts.count() == emb.count()
    # every removed vector must have a lower-id cell-mate with cos >= t
    removed = verdicts.filter("removed").select("vec_id", "cluster_id")
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "cluster_id"
    )
    witness = (
        removed.join(assigned, ["vec_id", "cluster_id"])
        .join(a, "cluster_id")
        .filter(F.col("id_a") < F.col("vec_id"))
        .filter(F.round(cosine_similarity("va", "embedding"), 6) >= 0.4)
        .select("vec_id")
        .distinct()
    )
    assert witness.count() == removed.count()
    # min-id vector of every cell always survives
    min_ids = assigned.groupBy("cluster_id").agg(F.min("vec_id").alias("vec_id"))
    flagged = verdicts.join(min_ids, ["cluster_id", "vec_id"]).filter("removed")
    assert flagged.count() == 0


def test_assign_clusters_is_narrow(emb):
    """Assignment must be a NARROW projection (centroids inlined as
    literals): no join, no exchange, no window — a per-iteration shuffle
    or row fan-out would move the full corpus once per Lloyd round."""
    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").cast("array<double>").alias("__cvec"),
    )
    plan = assign_clusters(emb, seeds)._jdf.queryExecution().executedPlan().toString()
    for op in ("Join", "Exchange", "Window"):
        assert op not in plan, f"assignment plan contains {op}:\n{plan}"


def test_ivf_lloyd_build_contract_and_exactness(emb):
    """Full-probe IVF over Lloyd centroids must equal the brute-force
    scan (probing every cell IS the exact scan), and the centers array
    must align positionally with the ivf_cluster column."""
    from claude_code_memory_spark.operators.similarity import (
        brute_force_topk,
        ivf_lloyd_build,
        ivf_topk,
    )

    indexed, centers = ivf_lloyd_build(emb, n_centroids=4, iters=1)
    assert indexed.count() == emb.count()
    cl = {r["ivf_cluster"] for r in indexed.select("ivf_cluster").distinct().collect()}
    assert cl == set(range(len(centers)))
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = [(r["vec_id"], r["score"]) for r in brute_force_topk(emb, q, k=5).collect()]
    full_probe = [
        (r["vec_id"], r["score"])
        for r in ivf_topk(indexed, centers, q, k=5, nprobe=len(centers)).collect()
    ]
    assert full_probe == exact


def test_semantic_dedup_salted_equals_unsalted(emb):
    """n_salt>1 must change only the physical key space, never the pair
    set: verdicts are identical to the co-location-friendly default."""
    assigned, _ = kmeans_lloyd(emb, k=4, iters=1)
    plain = semantic_dedup(assigned, threshold=0.4)
    salted = semantic_dedup(assigned, threshold=0.4, n_salt=8)
    as_set = lambda df: {  # noqa: E731
        (r["vec_id"], r["cluster_id"], r["removed"]) for r in df.collect()
    }
    assert as_set(plain) == as_set(salted)
