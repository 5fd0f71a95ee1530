"""Distributed PCA (operators/pca.py): exact covariance, driver eigh,
narrow projection — with the PCA optimality identities as the oracle."""

from __future__ import annotations

import numpy as np
import pytest

from claude_code_memory_spark.operators.pca import (
    covariance_long,
    pca_fit,
    pca_project,
    pca_reconstruction_mse,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def fitted(emb):
    return pca_fit(emb, "embedding", k=8)


def test_covariance_matches_numpy(emb):
    rows = covariance_long(emb, "embedding").collect()
    X = np.array([r["embedding"] for r in emb.select("embedding").collect()])
    expected = np.cov(X, rowvar=False, bias=True)
    for r in rows:
        assert abs(r["cov"] - expected[r["i"], r["j"]]) < 1e-6, (r["i"], r["j"])


def test_components_orthonormal_eigenvalues_descending(fitted):
    comps, vals, _mean = fitted
    assert comps.shape[0] == 8
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(8), atol=1e-8)
    assert all(vals[i] >= vals[i + 1] >= -1e-12 for i in range(len(vals) - 1))


def test_projection_variance_equals_eigenvalues(emb, fitted):
    comps, vals, mean = fitted
    proj = pca_project(emb, comps, mean).select("projected").collect()
    P = np.array([r["projected"] for r in proj])
    # projections are centered by construction; their per-component
    # population variance is the eigenvalue
    assert np.allclose(P.mean(axis=0), 0.0, atol=1e-6)
    assert np.allclose(P.var(axis=0), vals, rtol=1e-6, atol=1e-9)


def test_reconstruction_mse_is_sum_of_dropped_eigenvalues(emb):
    import numpy as np

    X = np.array([r["embedding"] for r in emb.select("embedding").collect()])
    total_var = np.cov(X, rowvar=False, bias=True).trace()
    comps, vals, mean = pca_fit(emb, "embedding", k=8)
    mse8 = pca_reconstruction_mse(emb, comps, mean)
    assert abs(mse8 - (total_var - vals.sum())) < 1e-6
    comps4, vals4, mean4 = pca_fit(emb, "embedding", k=4)
    mse4 = pca_reconstruction_mse(emb, comps4, mean4)
    assert mse4 > mse8  # more components, less error


def test_projection_is_narrow(emb, fitted):
    """The projection must be a per-row expression: no join, no
    exchange, no window — the broadcast-literal move that keeps the
    100 TB scan single-pass."""
    comps, _vals, mean = fitted
    plan = (
        pca_project(emb, comps, mean)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("Join", "Exchange", "Window"):
        assert node not in plan, node


def test_save_load_roundtrip_and_projection_identical(emb, fitted, tmp_path):
    import numpy as np

    from claude_code_memory_spark.operators.pca import pca_load, pca_save

    comps, vals, mean = fitted
    p = str(tmp_path / "pca.json")
    pca_save(p, comps, vals, mean)
    c2, v2, m2 = pca_load(p)
    assert np.array_equal(c2, comps) and np.array_equal(v2, vals)
    assert np.array_equal(m2, mean)
    a = pca_project(emb, comps, mean).select("projected").collect()
    b = pca_project(emb, c2, m2).select("projected").collect()
    assert [r["projected"] for r in a] == [r["projected"] for r in b]
