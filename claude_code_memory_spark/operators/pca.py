"""Distributed PCA for embedding columns — the MLlib/RowMatrix pattern
built from public parts: the data-sized work is ONE aggregate that
reduces n x d rows to a d x d Gramian (map-side combined, shuffle
carries partitions x d² rows), the eigendecomposition happens on the
driver over the d x d matrix (d = 64 here; trivial for any d where PCA
makes sense), and the projection is a narrow per-row expression over
the broadcast component matrix.

Why this matters at 100 TB: PCA is the classic first stage of the ANN
compression stack (PCA -> rotate -> SQ/PQ, e.g. FAISS's OPQ/PCAR
preprocessing): dropping 64 dims to 16 shrinks every downstream scan
4x with bounded recall loss — composable with operators/quantize.py.

Determinism: per-dimension sums and pairwise-product sums are DECIMAL
(exact, associative), so the covariance matrix — and therefore the
oracle-checked catalog entry — is partition-order-invariant bit for
bit. The eigendecomposition consumes those exact values; numpy's eigh
is deterministic for a fixed input matrix. Sign convention: each
eigenvector is flipped so its largest-|coordinate| entry is positive
(eigenvectors are only defined up to sign).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_long(
    df: DataFrame, vec_col: str = "embedding", *, scale: int = 9
) -> DataFrame:
    """Exact covariance of a d-dim array column in long form
    ``(i, j, cov)`` for i <= j.

    One posexplode-squared pass: (i, j, x_i·x_j) rows aggregate to d²
    groups with map-side combine; per-dim sums ride the same scan. All
    sums are DECIMAL — exact — and the final covariance arithmetic is
    double over exact inputs, identical cross-engine.
    """
    dec = f"decimal(18,{scale})"
    e = df.select(F.posexplode(vec_col).alias("i", "xi"))
    pairs = (
        df.select(F.posexplode(vec_col).alias("i", "xi"), F.col(vec_col))
        .select("i", "xi", F.posexplode(vec_col).alias("j", "xj"))
        .filter(F.col("j") >= F.col("i"))
    )
    s2 = pairs.groupBy("i", "j").agg(
        F.sum(F.col("xi").cast(dec) * F.col("xj").cast(dec)).alias("s_ij"),
        F.count("*").alias("n"),
    )
    s1 = e.groupBy("i").agg(F.sum(F.col("xi").cast(dec)).alias("s_i"))
    si = s1.select(F.col("i"), F.col("s_i"))
    sj = s1.select(F.col("i").alias("j"), F.col("s_i").alias("s_j"))
    return (
        s2.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("s_ij").cast("double")
                    - F.col("s_i").cast("double")
                    * F.col("s_j").cast("double")
                    / F.col("n")
                )
                / F.col("n")
            ).alias("cov"),
        )
    )


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 16
) -> tuple["numpy.ndarray", "numpy.ndarray", "numpy.ndarray"]:  # noqa: F821
    """(components [k x d], eigenvalues [k], mean [d]) from the exact
    distributed covariance. Driver-side work is O(d³) on a d x d
    matrix — the RowMatrix.computePrincipalComponents split."""
    import numpy as np

    rows = covariance_long(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_fit: no vectors to fit (empty input)")
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    mean_rows = (
        df.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(
            (F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count("*")).alias("m")
        )
        .collect()
    )
    mean = np.zeros(d)
    for r in mean_rows:
        mean[r["i"]] = r["m"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    # canonical sign: largest-|entry| coordinate positive
    for c in comps:
        if c[int(np.argmax(np.abs(c)))] < 0:
            c *= -1
    return comps, vals[order], mean


def pca_project(
    df: DataFrame,
    components,
    mean,
    *,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project each row onto the k components: a narrow per-row
    expression over broadcast literal arrays (no join, no shuffle, no
    UDF) — the same inline-literal move as the de-shuffled Lloyd
    assignment (operators/clustering.py)."""
    k = len(components)
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    tmp = df.withColumn("__c", centered)
    projections = [
        F.aggregate(
            F.zip_with(
                F.col("__c"),
                F.array(*[F.lit(float(v)) for v in components[r]]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for r in range(k)
    ]
    return tmp.withColumn(out_col, F.array(*projections)).drop("__c")


def pca_reconstruction_mse(
    df: DataFrame, components, mean, *, vec_col: str = "embedding"
) -> float:
    """Mean squared reconstruction error of the rank-k projection —
    equals the sum of the DROPPED eigenvalues (the PCA optimality
    identity, asserted in tests)."""
    proj = pca_project(df, components, mean, vec_col=vec_col)
    k = len(components)
    recon = F.zip_with(
        F.array(*[F.lit(float(m)) for m in mean]),
        F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col("projected"),
                        F.array(*[F.lit(float(components[r][d_])) for r in range(k)]),
                        lambda p, w: p * w,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                for d_ in range(len(mean))
            ]
        ),
        lambda m, r: m + r,
    )
    err = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), recon, lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    row = proj.select(F.avg(err).alias("mse")).first()
    return float(row["mse"])


def pca_save(path: str, components, eigenvalues, mean) -> None:
    """Persist a fitted PCA (atomic tmp+rename, the TableStore commit
    discipline) so serving sessions project without refitting — the
    same model-artifact contract as embeddings/bm25.py save/load."""
    import json
    import os

    payload = {
        "components": [[float(x) for x in c] for c in components],
        "eigenvalues": [float(v) for v in eigenvalues],
        "mean": [float(m) for m in mean],
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


def pca_load(path: str):
    import json

    import numpy as np

    with open(path) as fh:
        p = json.load(fh)
    return (
        np.array(p["components"]),
        np.array(p["eigenvalues"]),
        np.array(p["mean"]),
    )
