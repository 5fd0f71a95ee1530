"""ANN path tests: brute-force agreement between SQL and numpy k-NN joins,
IVF recall, LSH bucket behavior — on the real embeddings table."""

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
    knn_join_numpy,
    knn_join_sql,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _qvec(emb, vec_id=0):
    return emb.filter(F.col("vec_id") == vec_id).collect()[0]["embedding"]


def test_knn_sql_vs_numpy_identical(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    a = {
        (r["q_id"], r["rnk"]): r["vec_id"]
        for r in knn_join_sql(queries, emb, k=5).collect()
    }
    b = {
        (r["q_id"], r["rnk"]): r["vec_id"]
        for r in knn_join_numpy(queries, emb, k=5).collect()
    }
    assert a == b  # Arrow/numpy fast path must be bit-compatible


def test_ivf_recall(spark, emb):
    q = _qvec(emb)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, 10, exclude_id=0).collect()]
    indexed, centers = ivf_build(emb, n_centroids=8)
    indexed = indexed.cache()
    # full probe = exact
    full = [
        r["vec_id"]
        for r in ivf_topk(indexed.filter(F.col("vec_id") != 0), centers, q, 10, nprobe=8).collect()
    ]
    assert full == exact
    # partial probe: meaningful recall at 1/2 the clusters
    half = [
        r["vec_id"]
        for r in ivf_topk(indexed.filter(F.col("vec_id") != 0), centers, q, 10, nprobe=4).collect()
    ]
    assert len(set(half) & set(exact)) >= 5


def test_lsh_bucket_subset_of_corpus(spark, emb):
    q = _qvec(emb)
    res = lsh_bucket_topk(emb, q, k=10, n_planes=6)
    rows = res.collect()
    assert 0 < len(rows) <= 10
    # the query's own vector lands in its own bucket with score 1.0
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-5
