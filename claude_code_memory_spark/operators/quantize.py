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
