"""Manual skew mitigation: deterministic salted joins.

AQE's skew-join splitting (enabled in session.py) handles most hot-key
joins at runtime by splitting oversized shuffle partitions. It canNOT
help when the skewed operation isn't a plain shuffle join — e.g. a join
feeding a window, or a storage layout that must co-locate by key. This
operator is the manual path: spread each hot left key over `num_salts`
sub-keys and replicate the (small-per-key) right side once per salt.

Determinism: the salt is `pmod(xxhash64(all left columns), s)` — a pure
function of row content, so results (and tests/oracles) are reproducible
run to run, unlike `rand()`-based salting.

Cost model at 100 TB: left shuffle unchanged in volume but uniform in
distribution (largest partition shrinks ~s×); right shuffle volume grows
s× — so salt ONLY when the right side is small relative to the skew win,
and keep `num_salts` ≈ (hot-key rows) / (target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with deterministic key salting on the (skewed) left side.

    Supports ``inner`` and ``left`` joins — the right side is replicated
    ``num_salts`` times, which would duplicate unmatched right rows under
    right/full-outer semantics."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got: {how}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l2 = left.withColumn("__salt", salt)
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<bigint>"))
    )
    return l2.join(r2, keys + ["__salt"], how).drop("__salt")
