"""Scalar quantization of embedding vectors (float32 → 8-bit codes).

The reference stores full float vectors in Qdrant (storage/base.py:51-68)
and leans on model choice for storage savings (512-d Voyage vs 1536-d
OpenAI, README.md:213 "3x storage saving"). At 100 TB the bigger lever is
per-vector scalar quantization: 255-level codes cut the vector bytes ~4x
(and parquet bit-packs the small ints further), which is usually the
difference between an ANN scan being IO-bound or not. Qdrant itself
offers the same trade under `quantization_config` — this is the
DataFrame-native equivalent.

Scheme: per-vector min/max affine quantization,
    step  = (max - min) / 255
    code  = round((x - min) / step)            ∈ [0, 255]
    x̂     = min + code · step                  (|x − x̂| ≤ step/2)

Everything is built from deterministic double arithmetic on array
columns — no UDFs, so the whole pipeline stays in the JVM and is
oracle-checkable in DuckDB with the same expressions.

Search over quantized vectors: dequantize-on-the-fly inside the score
expression (two flops per element on top of the multiply-add). The win
is IO/memory footprint, not compute — exactly where a 100 TB scan hurts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEVELS = 255


def quantize_vector(vec: Column | str) -> Column:
    """STRUCT(qmin DOUBLE, qstep DOUBLE, codes ARRAY<INT>) for one vector.

    Flat (all-equal) vectors get qstep=0 and all-zero codes — dequantize
    reproduces them exactly."""
    v = F.col(vec) if isinstance(vec, str) else vec
    mn = F.array_min(v).cast("double")
    mx = F.array_max(v).cast("double")
    step = (mx - mn) / F.lit(float(LEVELS))
    codes = F.when(
        step == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, lambda x: F.round((x.cast("double") - mn) / step).cast("int")))
    return F.struct(mn.alias("qmin"), step.alias("qstep"), codes.alias("codes"))


def dequantize_vector(q: Column | str) -> Column:
    """ARRAY<DOUBLE> reconstruction from a quantize_vector struct."""
    s = F.col(q) if isinstance(q, str) else q
    return F.transform(s["codes"], lambda c: s["qmin"] + c.cast("double") * s["qstep"])


def quantize_table(
    df: DataFrame, *, vec_col: str = "embedding", keep: list[str] | None = None
) -> DataFrame:
    """Replace `vec_col` with its quantized struct (plus carried columns)."""
    keep = keep if keep is not None else [c for c in df.columns if c != vec_col]
    return df.select(*keep, quantize_vector(vec_col).alias("q"))


def quantized_cosine(q: Column | str, query_vec: list[float]) -> Column:
    """Cosine(dequantized stored vector, literal query vector).

    The query is L2-normalized driver-side by callers; the stored side is
    normalized in the expression since quantization perturbs the norm."""
    rec = dequantize_vector(q)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(rec, qlit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = F.sqrt(F.aggregate(F.transform(rec, lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    return dot / norm


def quantized_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    q_col: str = "q",
) -> DataFrame:
    """Brute-force top-k over quantized vectors (IO-reduced exact scan)."""
    return (
        df.select(id_col, F.round(quantized_cosine(q_col, query_vec), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Product quantization (PQ): split each vector into ``m`` subvectors and
# code each against a per-subspace codebook — ``m`` bytes per vector at
# k_codes <= 256, a 32x compression over float64 subvectors (Jegou et al.
# 2011, "Product Quantization for Nearest Neighbor Search"). SQ8 above
# compresses 4x with per-element codes; PQ is the next rung on the
# memory/recall ladder and the standard FAISS `PQ{m}` layout.
#
# The codebook here is seeded (per-subspace codewords = the subvectors of
# the first ``k_codes`` vectors by id) so encoding is a pure function of
# the input — partition-invariant and DuckDB-replayable, same rationale
# as `ivf_seeded_build`. A KMeans-trained codebook (one `kmeans_lloyd`
# per subspace) drops reconstruction error further at the same size; the
# seeded variant is the oracle-checkable twin.


def pq_split(
    df: DataFrame,
    dim: int,
    m: int = 8,
    *,
    vec_col: str = "embedding",
    keep: tuple[str, ...] = ("vec_id",),
) -> DataFrame:
    """Explode each vector into ``m`` contiguous subvectors:
    (keep..., sub_idx INT, sv ARRAY<DOUBLE>). One narrow projection —
    no shuffle; downstream joins key on ``sub_idx``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    v = F.col(vec_col).cast("array<double>")
    subs = F.array(*[F.slice(v, i * ds + 1, ds) for i in range(m)])
    return df.select(*keep, F.posexplode(subs).alias("sub_idx", "sv"))


def pq_seeded_codebook(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub_idx, code_id, cv): per-subspace codewords = subvectors of the
    first ``k_codes`` vectors by id. m x k_codes rows — always broadcast."""
    seeds = df.filter(F.col(id_col) < k_codes)
    if not seeds.take(1):  # hashed/non-dense ids would silently code nothing
        raise ValueError(
            f"pq_seeded_codebook found no rows with {id_col} < {k_codes}; "
            "ids must be dense from 0 (re-key hashed ids first)"
        )
    return pq_split(seeds, dim, m, vec_col=vec_col, keep=(id_col,)).select(
        "sub_idx", F.col(id_col).cast("int").alias("code_id"), F.col("sv").alias("cv")
    )


def pq_trained_codebook(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codebook trained with per-subspace Lloyd k-means — all ``m``
    subspaces in ONE plan via `kmeans_lloyd_grouped` (group = sub_idx).
    Same (sub_idx, code_id, cv) contract as `pq_seeded_codebook`; the
    seeded variant is iteration 0 of this one. Strictly lower
    reconstruction error at the same code size (tests assert it), and
    still fully deterministic/partition-invariant."""
    from claude_code_memory_spark.operators.clustering import kmeans_lloyd_grouped

    subs = pq_split(df, dim, m, vec_col=vec_col, keep=(id_col,))
    _, cent = kmeans_lloyd_grouped(
        subs,
        k=k_codes,
        iters=iters,
        group_cols=("sub_idx",),
        id_col=id_col,
        vec_col="sv",
        cluster_col="code_id",
    )
    return cent.select("sub_idx", "code_id", F.col("__cvec").alias("cv"))


def _d2(a: Column, b: Column) -> Column:
    """Squared L2 via the dot identity — the sequential evaluation order
    DuckDB's list_dot_product uses, so oracle tie-breaks replay. Built on
    the ONE shared dot (functions/vector.py): every operator under the
    determinism contract must use the same float evaluation order, so
    there is exactly one implementation to keep in lockstep with the
    oracles."""
    from claude_code_memory_spark.functions.vector import dot

    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    *,
    vec_col: str = "embedding",
    keep: tuple[str, ...] = ("vec_id",),
) -> DataFrame:
    """PQ codes + per-subspace squared reconstruction error:
    (keep..., sub_idx, code_id, sub_err). One broadcast join against the
    m x k_codes codebook, argmin per (row, subspace) — the corpus is
    scanned once and never shuffled by row (the only window partitions by
    the exploded row key). Errors are rounded to 6 dp BEFORE the argmin so
    cross-engine last-ulp noise cannot flip a code choice (ties then break
    on code_id)."""
    subs = pq_split(df, dim, m, vec_col=vec_col, keep=keep)
    joined = subs.join(F.broadcast(codebook), "sub_idx")
    d2r = F.round(_d2(F.col("sv"), F.col("cv")), 6)
    # r12 (guide §2.3 partial aggregation): the argmin used to be a
    # row_number window over the (row x k_codes) fan-out — shuffling and
    # sorting every candidate row by the exploded row key. min(struct)
    # under groupBy is the identical (d2r, code_id)-ascending selection
    # (round-6 BEFORE the min, so tie-breaks replay cross-engine exactly
    # as before), but the map-side partial aggregate collapses the k
    # candidates per (row, subspace) inside the scan stage — only one
    # row per group reaches the exchange, and the sort disappears.
    best = F.min(F.struct(F.col("__d2r"), F.col("code_id"))).alias("__best")
    return (
        joined.withColumn("__d2r", d2r)
        .groupBy(*keep, "sub_idx")
        .agg(best)
        .select(
            *keep,
            "sub_idx",
            F.col("__best.code_id").alias("code_id"),
            F.col("__best.__d2r").alias("sub_err"),
        )
    )


def pq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query's
    distance table (m x k_codes, one d2 per codeword) is derived from the
    broadcast codebook in-plan, then each stored vector's approximate
    distance is the sum of its m table entries — one broadcast join + one
    groupBy over rows that are ``m`` ints wide. This is the scan FAISS
    runs over `PQ{m}` indexes: per-vector cost is m lookups instead of
    dim multiplies, and the scanned bytes are the codes, not the floats.
    Entries are rounded then summed as DECIMAL so the ranking is
    partition-invariant. Returns (id, approx_d2) ascending."""
    dim = len(query_vec)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    m = [r[0] for r in codebook.agg(F.max("sub_idx")).collect()][0] + 1
    ds = dim // m
    qsub = F.slice(qlit, F.col("sub_idx") * ds + 1, ds)
    table = codebook.select(
        "sub_idx", "code_id", F.round(_d2(qsub, F.col("cv")), 6).alias("qd2")
    )
    dists = (
        codes.join(F.broadcast(table), ["sub_idx", "code_id"])
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("qd2").cast("decimal(18,6)")).cast("double"), 6).alias(
                "approx_d2"
            )
        )
    )
    return dists.orderBy(F.asc("approx_d2"), F.asc(id_col)).limit(k)
