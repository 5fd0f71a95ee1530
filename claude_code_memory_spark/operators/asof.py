"""As-of and range joins — temporal operators Spark has no native form of.

The reference engine has no temporal joins either; these are part of the
training-data-pipeline surface (aligning event streams, joining features
computed at different cadences to sample timestamps).

`asof_join` uses the union–sort–window formulation instead of an
inequality join: tag right rows 0 and left rows 1, union, then one window
pass per key ordered by (ts, tag) carries the latest right payload
forward onto each left row.

Scale notes:
- Exactly ONE shuffle (hash partition by key) + an in-partition sort —
  identical cost shape to a sort-merge join, and it never builds the
  O(|L|·|R| per key) intermediate an inequality-join plan would.
- Skewed keys behave like any sort-merge join skew: AQE skew handling
  does not split windows, so at 100 TB pre-split hot keys by time-bucket
  salting (asof within a bucket + boundary patch-up) if one key exceeds
  an executor's partition budget.
- `range_join_pairs` keeps an equality key in the join condition so the
  planner uses a hash join with the range as a post-filter — never a
  broadcast-nested-loop over the full cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str,
    payload_cols: Sequence[str],
    right_ts_col: str | None = None,
    matched_prefix: str = "matched_",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    latest right row with ``right.ts <= left.ts`` and the same key.

    Matches DuckDB ``ASOF JOIN ... ON l.on = r.on AND l.ts >= r.ts``
    semantics (inclusive). Left rows with no earlier right row keep NULL
    payload (left-outer flavor). ``tolerance`` (same unit as ts) NULLs out
    matches older than ``left.ts - tolerance``.

    Ties: right rows sort before left rows at equal ts, so an equal-ts
    right row IS matched. Multiple right rows at the same (key, ts) are
    broken by the last payload column ordering — pass data with a unique
    (key, ts) if exact tie semantics matter.
    """
    right_ts_col = right_ts_col or ts_col
    payload = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload.alias("p")).schema[0].dataType

    left_carry = [c for c in left.columns if c not in (on,)]
    r2 = right.select(
        F.col(on),
        F.col(right_ts_col).alias(ts_col),
        F.lit(0).alias("__tag"),
        payload.alias("__r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_carry
            if c != ts_col
        ],
    )
    l2 = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(payload_type).alias("__r"),
        *[F.col(c) for c in left_carry if c != ts_col],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    if tolerance is not None:
        # carry ts inside the payload comparison: rebuild the match as NULL
        # when it is too old. The matched ts is recoverable only if caller
        # included it in payload_cols; enforce that.
        if not any(c == ts_col or c == right_ts_col for c in payload_cols):
            raise ValueError("tolerance requires the ts column in payload_cols")
        age = F.col(ts_col) - F.col("__m")[right_ts_col if right_ts_col in payload_cols else ts_col]
        matched = matched.withColumn(
            "__m", F.when(age <= tolerance, F.col("__m"))
        )
    out_cols = [F.col(on), F.col(ts_col)] + [F.col(c) for c in left_carry if c != ts_col]
    out_cols += [
        F.col("__m")[c].alias(f"{matched_prefix}{c}") for c in payload_cols
    ]
    return matched.select(*out_cols)


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str,
    max_gap: int | float,
    left_cols: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    lsuffix: str = "_a",
    rsuffix: str = "_b",
) -> DataFrame:
    """Interval join: (left, right) pairs with the same key where
    ``left.ts <= right.ts <= left.ts + max_gap``.

    The equality key keeps this a hash/sort-merge join (the range is a
    residual filter); without an equality key Spark would fall back to a
    broadcast-nested-loop join, which does not survive scale."""
    lt = F.col(f"l.{ts_col}")
    rt = F.col(f"r.{ts_col}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}")) & (rt >= lt) & (rt <= lt + max_gap)
    )
    out = left.alias("l").join(right.alias("r"), cond)
    sel = [F.col(f"l.{on}").alias(on), lt.alias(f"{ts_col}{lsuffix}"), rt.alias(f"{ts_col}{rsuffix}")]
    sel += [F.col(f"l.{c}").alias(f"{c}{lsuffix}") for c in left_cols]
    sel += [F.col(f"r.{c}").alias(f"{c}{rsuffix}") for c in right_cols]
    return out.select(*sel)
