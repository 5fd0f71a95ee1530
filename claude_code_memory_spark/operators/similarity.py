"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two paths, as any 100 TB design needs:
- brute-force exact top-k: O(N·d) scored scan, embarrassingly parallel,
  no shuffle (TakeOrderedAndProject). Correct to ~10^7-10^8 vectors per
  query batch. This is also the verification oracle for the ANN path.
- sign-LSH bucketed ANN: deterministic random-hyperplane signatures
  (seeded numpy, hyperplanes shipped as literal arrays → reproducible in
  any engine), candidates from matching buckets only.

Batch k-NN *join* (many queries at once) broadcasts the query matrix and
does a vectorized numpy matmul per Arrow batch via mapInPandas — the
standard Spark pattern for embedding search at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.vector import cosine_similarity, dot, vector_lit


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k for one query vector."""
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    scored = df.select(
        id_col, F.round(cosine_similarity(F.col(vec_col), vector_lit(query_vec)), 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def topk_per_group(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Top-k most-similar vectors within each group (window ranking)."""
    scored = embeddings.select(
        group_col,
        id_col,
        F.round(cosine_similarity(F.col(vec_col), vector_lit(query_vec)), 6).alias("score"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def knn_join_sql(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact k-NN join, pure DataFrame ops: broadcast the (small) query
    side, score every (query, corpus) pair, window top-k per query.

    Use when queries ≪ corpus — the only shuffle is the per-query top-k
    window, whose input is already reduced if you pre-limit per partition.
    """
    pairs = corpus.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        q_id,
        F.col(c_id),
        F.round(cosine_similarity(F.col(c_vec), F.col(q_vec)), 6).alias("score"),
    ).filter(F.col(q_id) != F.col(c_id))
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def knn_join_numpy(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact k-NN join, Arrow/numpy fast path: collect + broadcast the
    normalized query matrix, matmul per corpus batch, per-partition top-k,
    then a global per-query top-k. ~50-100x the throughput of the
    expression path at high dimensionality; identical results."""
    qrows = queries.select(q_id, q_vec).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    b_qids = spark.sparkContext.broadcast(qids)
    b_qmat = spark.sparkContext.broadcast(qmat)

    schema = f"{q_id} long, {c_id} long, score double"

    def score_batches(batches):
        qi, qm = b_qids.value, b_qmat.value
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.stack(pdf[c_vec].to_numpy()).astype(np.float64)
            cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ qm.T  # (batch, n_queries)
            cids = pdf[c_id].to_numpy(dtype=np.int64)
            out = []
            for j in range(qm.shape[0]):
                col = sims[:, j]
                # self-match excluded BEFORE the local top-k, or a query
                # whose own vector is in this batch returns k-1 rows
                mask = cids != qi[j]
                mcids, mcol = cids[mask], col[mask]
                n = min(k, len(mcids))
                if n == 0:
                    continue
                idx = (
                    np.argpartition(-mcol, n - 1)[:n] if len(mcol) > n else np.arange(len(mcol))
                )
                order = np.lexsort((mcids[idx], -mcol[idx]))
                sel = idx[order]
                out.append(
                    pd.DataFrame(
                        {q_id: qi[j], c_id: mcids[sel], "score": np.round(mcol[sel], 6)}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    local_topk = corpus.select(c_id, c_vec).mapInPandas(score_batches, schema=schema)
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return local_topk.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def blocked_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """All pairs (id_a < id_b) within each block whose cosine ≥ threshold
    — the verify step of embedding near-dup, BLAS path.

    The expression form (self-join on the block key + per-pair array
    cosine) materializes every candidate pair BEFORE the filter: the
    round-9 sf1 evidence run measured 76.6 s for ~43 M pairs of 64-dim
    floats, all but 98 k of which the threshold then discarded. Here each
    block becomes one Arrow group, rows are L2-normalized once, and a
    chunked ``N_chunk @ N.T`` matmul scores the block — survivors are the
    only rows that ever become Spark data. Identical results (same 6-dp
    round, nan/zero-norm rows drop, NULL blocks AND NULL vectors drop,
    duplicate ids never self-pair — all matching the join's
    ``id_a < id_b`` + null-propagation semantics); ~20x the throughput.
    Rows whose vector length differs from the rest of the block score
    only against same-length rows (the array-cosine of mismatched
    lengths is NULL in the join form, so those cross-length pairs never
    passed the threshold there either).

    Memory is bounded: the chunk size shrinks as the block grows so the
    score slab stays ≤ ~256 MB. A block must still fit one executor as a
    (rows × dim) float64 matrix — at 100 TB keep blocks bounded upstream
    (LSH/IVF bucketing, the dedup-family rule); this verifier is for the
    post-blocking stage, not a substitute for blocking."""
    import pandas as pd

    schema = "id_a long, id_b long, cos double"

    _empty = {"id_a": np.int64, "id_b": np.int64, "cos": np.float64}

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL vectors never pair (the join's cosine is NULL); ragged
        # dims only pair within their own length (mismatched-length
        # array cosine is NULL in the join form) — np.stack would raise
        # on either, so partition by length instead of assuming.
        pdf = pdf[pdf[vec_col].notna()].copy()
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(_empty)
        pdf["__dim"] = pdf[vec_col].map(len)
        frames = []
        for _, grp in pdf.groupby("__dim", sort=False):
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy(dtype=np.int64)
            n = len(ids)
            if n < 2:
                continue
            mat = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                nm = mat / norms  # zero-norm rows become nan → never ≥ threshold
            chunk = max(64, int(2**25 / max(n, 1)))  # ≤ ~256 MB of scores
            out_a, out_b, out_c = [], [], []
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                scores = np.round(nm[s:e] @ nm.T, 6)
                # the join's predicate is id_a < id_b on VALUES, not
                # positions: strict id inequality so duplicate ids never
                # emit a self-pair (ids are sorted, so this is also the
                # strict upper triangle for unique ids)
                mask = (scores >= threshold) & (ids[None, :] > ids[s:e, None])
                ri, ci = np.nonzero(mask)
                out_a.append(ids[s + ri])
                out_b.append(ids[ci])
                out_c.append(scores[ri, ci])
            if out_a:
                frames.append(
                    pd.DataFrame(
                        {
                            "id_a": np.concatenate(out_a),
                            "id_b": np.concatenate(out_b),
                            "cos": np.concatenate(out_c),
                        }
                    )
                )
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(_empty)
        return pd.concat(frames, ignore_index=True)

    return (
        embeddings.filter(F.col(block_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(per_block, schema)
    )


def ivf_knn_join(
    indexed: DataFrame,
    centers: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    *,
    nprobe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_same_id: bool = True,
) -> DataFrame:
    """Approximate batch k-NN join via shared IVF clustering — the scalable
    formulation when BOTH sides are large.

    ``exclude_same_id=True`` (default) drops pairs with ``q_id == c_id``
    — correct when the queries ARE corpus members (dedup candidate
    generation, the catalog entry). When the query side is a SEPARATE id
    namespace, an id collision would wrongly discard an unrelated corpus
    vector: pass ``exclude_same_id=False``.

    `knn_join_sql`/`knn_join_numpy` score every (query, corpus) pair —
    O(Q x N), fine when queries broadcast but quadratic when both sides
    grow. Here each query expands to its ``nprobe`` nearest IVF cells
    (broadcast centroid cross join — centroids are tiny), the corpus
    already carries its cell id from `ivf_build`, and an equi-join on
    ``ivf_cluster`` restricts scoring to same-cell pairs: cost ~
    Q x nprobe x (N / n_centroids). The cluster-id equi-join shuffles both
    sides by a key whose cardinality you control via n_centroids — at
    100 TB, store the corpus partitioned by `ivf_cluster` so only the
    query side moves. Per-query recall equals `ivf_topk`'s at the same
    nprobe (both scan exactly the probed cells)."""
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)]
    cent = queries.sparkSession.createDataFrame(
        cent_rows, f"ivf_cluster int, __cvec array<double>"
    )
    # squared L2 via the dot identity (three sequential dot products) —
    # same float evaluation order as ivf_seeded_topk and DuckDB's
    # list_dot_product, so probe tie-breaks replay identically in oracles
    qv = F.col(q_vec).cast("array<double>")
    d2 = dot(qv, qv) - 2 * dot(qv, F.col("__cvec")) + dot(F.col("__cvec"), F.col("__cvec"))
    w_probe = Window.partitionBy(q_id).orderBy("__d2", "ivf_cluster")
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("__d2", d2)
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(q_id, q_vec, "ivf_cluster")
    )
    pairs = indexed.join(probes, "ivf_cluster")
    scored = pairs.select(
        q_id,
        F.col(c_id),
        F.round(cosine_similarity(F.col(c_vec), F.col(q_vec)), 6).alias("score"),
    )
    if exclude_same_id:
        scored = scored.filter(F.col(q_id) != F.col(c_id))
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF index build: MLlib KMeans centroids + a cluster-id column.

    Returns (embeddings + `ivf_cluster`, centroid matrix). On a real
    cluster, write the result partitioned by `ivf_cluster` so a probe scan
    prunes to nprobe/n_centroids of the data at the file level."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = embeddings.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="__v", predictionCol="ivf_cluster").fit(
        with_vec
    )
    assigned = model.transform(with_vec).drop("__v")
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centers


def ivf_seeded_build(
    embeddings: DataFrame,
    n_centroids: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Deterministic twin of `ivf_build`: centroids = the first
    ``n_centroids`` vectors by id (the bootstrap every IVF build starts
    from before Lloyd iterations), assignment = argmin squared-L2 over a
    broadcast cross join, computed via the dot identity so the float
    evaluation order (and therefore every tie-break) replays exactly in a
    DuckDB oracle. Returns (embeddings + ``ivf_cluster``, centers matrix)
    — the same contract as `ivf_build`, so `ivf_knn_join`/`ivf_topk`
    consume either interchangeably. The driver-side collect is
    ``n_centroids`` rows (the centroid matrix is operator input, exactly
    as KMeans' clusterCenters() is)."""
    rows = (
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    if not rows:  # hashed/non-dense ids would silently index nothing
        raise ValueError(
            f"ivf_seeded_build found no rows with {id_col} < {n_centroids}; "
            "ids must be dense from 0 (re-key hashed ids first)"
        )
    centers = np.array([[float(x) for x in r[vec_col]] for r in rows])
    # r12 (guide §2.3/§2.4): the assignment used to be a broadcast
    # crossJoin (n_centroids-way row fan-out) + row_number window —
    # i.e. a full shuffle-and-sort of the fanned-out corpus by row id.
    # The centroid rows are ALREADY collected driver-side (they are this
    # function's return contract), so the assignment reuses the Lloyd
    # literal-candidate argmin (`_assign_from_cents`): a NARROW
    # projection, no fan-out, no shuffle. The d2 expression family, the
    # driver-side <c,c> fold order, and the (d2, cluster)-ascending
    # tie-break are node-for-node what the window form computed, so
    # assignments are identical (the IVF oracles pin it).
    from claude_code_memory_spark.operators.clustering import _assign_from_cents

    assigned = _assign_from_cents(
        embeddings,
        [(int(i), [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)],
        vec_col=vec_col,
        cluster_col="ivf_cluster",
    )
    return assigned, centers


def ivf_lloyd_build(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """KMeans-quality IVF build that is also partition-invariant:
    centroids from `kmeans_lloyd` (decimal-mean updates — bit-identical
    on any cluster size, unlike MLlib's KMeans|| accumulations), same
    (indexed, centers) contract as `ivf_build`/`ivf_seeded_build`.

    Lloyd can drop empty clusters, so surviving cluster ids are
    re-mapped to dense positions: `centers[i]` always corresponds to
    `ivf_cluster == i`, which `ivf_topk`'s argsort-probe relies on. The
    remap is a broadcast join of at most ``n_centroids`` rows."""
    from claude_code_memory_spark.operators.clustering import kmeans_lloyd

    assigned, cent = kmeans_lloyd(
        embeddings, k=n_centroids, iters=iters,
        id_col=id_col, vec_col=vec_col, cluster_col="__kc",
    )
    rows = cent.orderBy("__kc").collect()
    centers = np.array([[float(x) for x in r["__cvec"]] for r in rows])
    remap = embeddings.sparkSession.createDataFrame(
        [(int(r["__kc"]), i) for i, r in enumerate(rows)], "__kc int, ivf_cluster int"
    )
    indexed = assigned.join(F.broadcast(remap), "__kc").drop("__kc")
    return indexed, centers


def ivf_topk(
    indexed: DataFrame,
    centers: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids by distance to the query (driver-side,
    centroids are tiny), scan only the nprobe nearest clusters, exact
    top-k within. Recall rises with nprobe; nprobe = n_centroids is exact."""
    q = np.asarray(query_vec, dtype=np.float64)
    dists = np.linalg.norm(centers - q, axis=1)
    probe = [int(c) for c in np.argsort(dists)[:nprobe]]
    candidates = indexed.filter(F.col("ivf_cluster").isin(probe))
    scored = candidates.select(
        id_col,
        F.round(cosine_similarity(F.col(vec_col), vector_lit(q)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivf_seeded_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    *,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF probe, fully relational and collect-free.

    Centroids are the first `n_centroids` vectors by id (the bootstrap
    choice every IVF build starts from before Lloyd iterations;
    `ivf_build` is the KMeans-quality path). Assignment = argmin squared
    L2 per vector over a broadcast cross join; probe = the `nprobe`
    centroids nearest the query; candidates scan only probed clusters.
    Being pure column algebra, the whole operator is DuckDB-replicable —
    this is the oracle-checked twin of the KMeans IVF path. At 100 TB,
    write the assignment partitioned by cluster id and the probe filter
    becomes partition pruning (same layout note as ivf_build).

    `query` is a 1-row (id, vec) DataFrame; its row is excluded from
    results."""
    # squared L2 via the dot identity |a|^2 - 2ab + |b|^2: three sequential
    # dot products, the exact float-evaluation order DuckDB's
    # list_dot_product uses, so the oracle ranks ties identically
    d2 = lambda a, b: dot(a, a) - 2 * dot(a, b) + dot(b, b)  # noqa: E731
    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    q = query.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))

    w_assign = Window.partitionBy(id_col).orderBy("__d2", "cid")
    assigned = (
        embeddings.crossJoin(F.broadcast(cent))
        .withColumn("__d2", d2(F.col(vec_col), F.col("cvec")))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    w_probe = Window.orderBy("__d2", "cid")
    probe = (
        cent.crossJoin(F.broadcast(q.select("qvec")))
        .withColumn("__d2", d2(F.col("cvec"), F.col("qvec")))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("cid")
    )
    cands = assigned.join(F.broadcast(probe), "cid", "left_semi").crossJoin(
        F.broadcast(q)
    )
    scored = cands.filter(F.col(id_col) != F.col("qid")).select(
        id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("qvec")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivf_quantized_topk(
    indexed: DataFrame,
    centers: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    nprobe: int = 4,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe over 8-bit quantized codes with full-precision re-rank —
    the FAISS ``IVF,SQ8 + refine`` layout, expressed as DataFrame algebra.

    Two independent reductions compose here:
    - IVF partition pruning: only ``nprobe``/n_centroids of the corpus is
      scanned (file-level pruning when stored partitioned by cluster);
    - scalar quantization: the scanned bytes are ~4x smaller, which is
      what keeps the probe IO-bound scan short at 100 TB.

    The quantized scan over-fetches ``refine * k`` candidates, then ONLY
    those rows are re-scored against the full-precision column — at scale
    the re-rank reads `refine*k` rows by id, not a table scan. Quantization
    error only hurts if it reorders a true top-k result past position
    ``refine*k`` in the approximate ranking; `refine=4` makes that window
    generous (tests measure recall=1.0 on the fixture corpus).

    ``indexed`` must carry `ivf_cluster` (from `ivf_build`) and the full
    vector column; codes are derived in-plan so the operator is
    self-contained (a real deployment materializes `quantize_table`
    output partitioned by `ivf_cluster` instead).
    """
    from claude_code_memory_spark.operators.quantize import (
        quantize_vector,
        quantized_cosine,
    )

    q = np.asarray(query_vec, dtype=np.float64)
    dists = np.linalg.norm(centers - q, axis=1)
    probe = [int(c) for c in np.argsort(dists)[:nprobe]]
    candidates = indexed.filter(F.col("ivf_cluster").isin(probe))

    approx = (
        candidates.select(id_col, quantize_vector(vec_col).alias("__q"))
        .select(
            id_col, F.round(quantized_cosine("__q", list(q)), 6).alias("approx_score")
        )
        .orderBy(F.desc("approx_score"), F.asc(id_col))
        .limit(refine * k)
    )
    rerank = approx.join(candidates.select(id_col, vec_col), id_col)
    scored = rerank.select(
        id_col,
        F.round(cosine_similarity(F.col(vec_col), vector_lit(q)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Sign-LSH ANN: bucket = sign bits against seeded random hyperplanes;
    score only the query's bucket. Approximate — recall rises with fewer
    planes / multiple tables. The hyperplanes are literals, so the plan is
    a filter + scored scan: at 100 TB, write-time partitioning by bucket
    turns this into partition pruning."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = random_hyperplanes(dim or len(q), n_planes, seed)
    q_bucket = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, q)) > 0))

    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bucket = bucket + F.when(dot(F.col(vec_col), vector_lit(p)) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    bucketed = embeddings.withColumn("bucket", bucket).filter(F.col("bucket") == q_bucket)
    scored = bucketed.select(
        id_col,
        F.round(cosine_similarity(F.col(vec_col), vector_lit(q)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivfpq_build(
    embeddings: DataFrame,
    *,
    dim: int,
    n_centroids: int = 8,
    m: int = 8,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, "np.ndarray"]:
    """FAISS ``IVF{n},PQ{m}`` index build from the existing pieces:
    seeded-IVF cell assignment (`ivf_seeded_build`) + trained PQ
    codebook (`pq_trained_codebook`) + per-vector codes CARRYING their
    cell id, so the query path filters codes by cell with no join.

    Returns (codes [id, ivf_cluster, sub_idx, code_id], codebook,
    centers). Storage for the scan is m bytes/vector + a cell id —
    written `partitionBy(ivf_cluster)` the probe is directory pruning
    (test_layout::test_ivf_store_partition_pruning's layout). This
    variant PQ-encodes raw vectors; encoding residuals (vec − centroid)
    is the classic accuracy refinement and would reuse the same pieces
    with a centroid-subtracted column."""
    from claude_code_memory_spark.operators.quantize import (
        pq_encode,
        pq_trained_codebook,
    )

    assigned, centers = ivf_seeded_build(
        embeddings, n_centroids, id_col=id_col, vec_col=vec_col
    )
    codebook = pq_trained_codebook(
        embeddings, dim, m, 16, iters=train_iters, vec_col=vec_col
    )
    codes = pq_encode(
        assigned, codebook, dim, m, vec_col=vec_col, keep=(id_col, "ivf_cluster")
    )
    return codes, codebook, centers


def ivfpq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    centers: "np.ndarray",
    query_vec: Sequence[float],
    k: int = 10,
    *,
    nprobe: int = 2,
    refine: int = 0,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ query — the canonical billion-scale ANN scan: probe the
    ``nprobe`` nearest cells (driver-side argsort over the tiny centroid
    matrix), ADC-scan ONLY those cells' PQ codes (m lookups/vector over
    m-byte rows), and optionally re-rank the top ``refine * k``
    candidates against the full-precision vectors (point reads by id,
    never a table scan).

    Cost at 100 TB: scanned bytes ≈ corpus_bytes x (nprobe/n_centroids)
    x (m / (4·dim)) — both factors compound, which is why IVFPQ is the
    layout FAISS/Milvus/ScaNN-class systems default to. Returns
    (id, score-or-approx_d2) with deterministic tie-breaks."""
    from claude_code_memory_spark.operators.quantize import pq_topk

    q = np.asarray(query_vec, dtype=np.float64)
    dists = np.linalg.norm(centers - q, axis=1)
    probe = [int(c) for c in np.argsort(dists)[:nprobe]]
    cell_codes = codes.filter(F.col("ivf_cluster").isin(probe))
    fetch = (refine * k) if refine else k
    approx = pq_topk(cell_codes, codebook, list(q), fetch, id_col=id_col)
    if not refine:
        return approx
    if embeddings is None:
        raise ValueError("refine > 0 requires the full-precision embeddings")
    rerank = approx.join(embeddings.select(id_col, vec_col), id_col)
    scored = rerank.select(
        id_col,
        F.round(cosine_similarity(F.col(vec_col), vector_lit(q)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivfpq_build_residual(
    embeddings: DataFrame,
    *,
    dim: int,
    n_centroids: int = 8,
    m: int = 8,
    k_codes: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, "np.ndarray"]:
    """FAISS-faithful IVF,PQ: codes encode the RESIDUAL (vec − its
    cell's centroid), not the raw vector. Residuals are smaller in
    magnitude than vectors, so the same codebook budget spends its 16
    codes on a tighter distribution — lower quantization error at
    identical storage (test-pinned against the raw-vector build).
    The residual column is one broadcast join + zip_with; training and
    encoding reuse the plain PQ operators on that column.

    Centroids come from the Lloyd build: residuals only shrink against
    CONVERGED cell means — measured here, residuals vs arbitrary seeded
    centroids are strictly WORSE than raw encoding (450 vs 287 total
    sub_err on the fixture; Lloyd residuals: 270), because subtracting
    a non-mean point adds variance instead of removing it."""
    from claude_code_memory_spark.operators.quantize import (
        pq_encode,
        pq_trained_codebook,
    )

    assigned, centers = ivf_lloyd_build(
        embeddings, n_centroids, iters=3, id_col=id_col, vec_col=vec_col
    )
    cent = embeddings.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)],
        "ivf_cluster int, __cvec array<double>",
    )
    resid = assigned.join(F.broadcast(cent), "ivf_cluster").withColumn(
        "__resid",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("__cvec"),
            lambda x, c: x - c,
        ),
    )
    codebook = pq_trained_codebook(
        resid, dim, m, k_codes, iters=train_iters, id_col=id_col, vec_col="__resid"
    )
    codes = pq_encode(
        resid, codebook, dim, m, vec_col="__resid", keep=(id_col, "ivf_cluster")
    )
    return codes, codebook, centers


def ivfpq_topk_residual(
    codes: DataFrame,
    codebook: DataFrame,
    centers: "np.ndarray",
    query_vec: Sequence[float],
    k: int = 10,
    *,
    nprobe: int = 2,
    refine: int = 0,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query path for the residual index: each probed cell gets its OWN
    ADC distance table, derived from the query's residual against that
    cell's centroid (q − c) — nprobe small scans unioned, then one
    top-k. Per-cell cost is identical to the raw variant; the union is
    nprobe x fetch rows."""
    from claude_code_memory_spark.operators.quantize import pq_topk

    q = np.asarray(query_vec, dtype=np.float64)
    dists = np.linalg.norm(centers - q, axis=1)
    probe = [int(c) for c in np.argsort(dists)[:nprobe]]
    fetch = (refine * k) if refine else k
    per_cell = []
    for c in probe:
        qr = [float(x) for x in (q - centers[c])]
        cell = codes.filter(F.col("ivf_cluster") == c)
        per_cell.append(pq_topk(cell, codebook, qr, fetch, id_col=id_col))
    approx = per_cell[0]
    for p in per_cell[1:]:
        approx = approx.unionByName(p)
    approx = approx.orderBy(F.asc("approx_d2"), F.asc(id_col)).limit(fetch)
    if not refine:
        return approx
    if embeddings is None:
        raise ValueError("refine > 0 requires the full-precision embeddings")
    rerank = approx.join(embeddings.select(id_col, vec_col), id_col)
    scored = rerank.select(
        id_col,
        F.round(cosine_similarity(F.col(vec_col), vector_lit(q)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivfpq_knn_join(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    centers: "np.ndarray",
    k: int = 5,
    *,
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    exclude_same_id: bool = True,
) -> DataFrame:
    """Batch k-NN join over PQ CODES — `ivf_knn_join` at ADC cost.

    `ivf_knn_join`'s same-cell pairs carry full float vectors through
    the shuffle (dim x 8 bytes each side). Here the corpus side ships
    m one-byte codes and the query side ships an m x 16 distance table
    (derived once per query from the broadcast codebook): the pair
    scoring becomes an equi-join on (cell, sub_idx, code_id) + a
    decimal sum per (query, candidate) — for dim=64, m=8 that is ~16x
    less shuffled data per pair, which is the difference between a
    feasible and an infeasible nightly dedup join at 100 TB. Recall at
    a given nprobe is bounded by PQ quantization (refine the top
    candidates against full vectors when exactness matters — the
    `ivfpq_topk` refine pattern applies per query).

    ``codes`` must carry ``ivf_cluster`` (from `ivfpq_build`); returns
    (q_id, c_id, approx_d2, rnk <= k) ascending by distance."""
    from claude_code_memory_spark.operators.quantize import _d2, pq_split

    # 1. probe cells per query (broadcast centroid table, top-nprobe)
    cent = queries.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)],
        "ivf_cluster int, __cvec array<double>",
    )
    qv = F.col(q_vec).cast("array<double>")
    d2c = (
        dot(qv, qv) - 2 * dot(qv, F.col("__cvec"))
        + dot(F.col("__cvec"), F.col("__cvec"))
    )
    w_probe = Window.partitionBy(q_id).orderBy("__d2", "ivf_cluster")
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("__d2", d2c)
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(q_id, "ivf_cluster")
    )

    # 2. per-query ADC distance table: (q_id, sub_idx, code_id, qd2) —
    # Q x m x 16 rows, built from one broadcast join, never the corpus
    qsubs = pq_split(queries, _infer_dim(queries, q_vec),
                     _infer_m(codebook), vec_col=q_vec, keep=(q_id,))
    dtable = qsubs.join(F.broadcast(codebook), "sub_idx").select(
        q_id, "sub_idx", "code_id",
        F.round(_d2(F.col("sv"), F.col("cv")), 6).alias("qd2"),
    )
    # attach each query's probe cells so the code join restricts pairs
    dtable_cells = dtable.join(probes, q_id)

    # 3. pair scoring: equi-join on (cell, sub, code), decimal sum
    pairs = codes.withColumnRenamed("ivf_cluster", "__cell").join(
        dtable_cells.withColumnRenamed("ivf_cluster", "__cell"),
        ["__cell", "sub_idx", "code_id"],
    )
    scored = pairs.groupBy(q_id, c_id).agg(
        F.round(
            F.sum(F.col("qd2").cast("decimal(18,6)")).cast("double"), 6
        ).alias("approx_d2")
    )
    if exclude_same_id:
        scored = scored.filter(F.col(q_id) != F.col(c_id))
    w = Window.partitionBy(q_id).orderBy(F.asc("approx_d2"), F.asc(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


def _infer_m(codebook: DataFrame) -> int:
    return codebook.agg(F.max("sub_idx")).first()[0] + 1
