"""Dense/sparse vector math as pure column expressions.

Reference semantics: cosine/euclid/dot distances (storage/qdrant.py:105-133),
dense search scoring (storage/qdrant.py:827-886), sparse BM25 dot product
(storage/qdrant.py:767-780).

Everything here is ``zip_with`` / ``aggregate`` over ``ARRAY<FLOAT|DOUBLE>``
— JVM-side, codegen'd, no Python. At 100 TB the brute-force score scan is
embarrassingly parallel (no shuffle: score is a map, top-k is
TakeOrderedAndProject); the ANN path for larger corpora lives in
``operators/similarity.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def double_sql_literal(x: float) -> str:
    """SQL double literal that parses to the bit-identical IEEE double.

    ``repr`` is Python's shortest round-trip form and Spark's parser
    round-trips it exactly (verified for subnormals, -0.0, max double).
    """
    return repr(float(x)) + "D"


def vector_lit(vec: Sequence[float]) -> Column:
    """A literal ARRAY<DOUBLE> column from a driver-side vector.

    Built as ONE ``F.expr`` string instead of per-element ``F.lit``
    columns: the per-element form costs 2 py4j round-trips per dimension
    (~130 calls for a 64-dim query vector, ~40 ms of driver time per
    query build — guide §7.3 driver-side work), while the single SQL
    string parses JVM-side in ~1 ms to a bit-identical literal tree.
    Non-finite values fall back to the per-element form (their reprs are
    not SQL literals)."""
    vals = [float(x) for x in vec]
    if vals and all(v == v and v not in (float("inf"), float("-inf")) for v in vals):
        return F.expr("array(" + ",".join(double_sql_literal(v) for v in vals) + ")")
    return F.array(*[F.lit(v).cast("double") for v in vals])


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (double)."""
    prods = F.zip_with(_c(a).cast("array<double>"), _c(b).cast("array<double>"), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    v = _c(a).cast("array<double>")
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(a: Column | str) -> Column:
    v = _c(a).cast("array<double>")
    n = l2_norm(v)
    return F.transform(v, lambda x: x / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a).cast("array<double>"), _c(b).cast("array<double>"), lambda x, y: (x - y) * (x - y)
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def sparse_dot(
    indices_a: Column | str,
    values_a: Column | str,
    indices_b: Column | str,
    values_b: Column | str,
) -> Column:
    """Dot product of two sparse vectors stored as (indices, values) arrays.

    Used for BM25 query-vs-stored scoring (reference storage/qdrant.py:767-780).
    Implemented as: for each index of a present in b, multiply the aligned
    values — `array_position` per element keeps it a pure expression
    (sparse vectors here are short: BM25 query terms).
    """
    ia, va = _c(indices_a), _c(values_a).cast("array<double>")
    ib, vb = _c(indices_b), _c(values_b).cast("array<double>")
    prods = F.zip_with(
        ia,
        va,
        lambda idx, val: F.when(
            F.array_position(ib, idx) > 0,
            val * F.element_at(vb, F.array_position(ib, idx).cast("int")),
        ).otherwise(F.lit(0.0)),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
