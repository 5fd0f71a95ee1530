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
  salting — `asof_join_salted` implements exactly that (asof within a
  (key, bucket) partition + a metadata-sized carry-in patch-up for
  matches that live in an earlier bucket) when one key exceeds an
  executor's partition budget.
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


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str,
    payload_cols: Sequence[str],
    bucket_width: int,
    matched_prefix: str = "matched_",
    tolerance: int | float | None = None,
) -> DataFrame:
    """`asof_join` with time-bucket salting — the documented skew
    mitigation for hot keys (see module docstring): one user with
    millions of events no longer lands in a single window partition.

    Construction (result provably equals the unsalted join):

    1. both sides get ``__b = floor(ts / bucket_width)``; the window key
       becomes ``(on, __b)``, so a hot key's rows split across its
       time buckets;
    2. a left row's match may live in an EARLIER bucket, so each left
       bucket receives one carry-in row: the latest right row from any
       strictly earlier bucket. Carry-ins are derived from the last
       right row per (key, bucket) — at most |keys|·|buckets| rows, a
       metadata-sized frame — forward-filled across the left side's
       bucket grid with one tiny window;
    3. the carry-in keeps its original (earlier) timestamp, so inside
       the target bucket it sorts before every in-bucket right row and
       wins only when no in-bucket row precedes the left row — exactly
       the unsalted semantics, tolerance included.

    The data-sized stages shuffle on (key, bucket): max partition size
    is bounded by events-per-key-per-bucket, tunable via
    ``bucket_width`` regardless of key skew. Ties at equal (key, ts)
    follow the same caveat as `asof_join`.
    """
    bexpr = F.expr(f"CAST(FLOOR({ts_col} / {bucket_width}) AS BIGINT)")
    r_b = right.withColumn("__b", bexpr)
    right_payload_src = [c for c in right.columns]  # original right schema

    # -- step 2: last right row per (key, bucket), metadata-sized --
    wlast = Window.partitionBy(on, "__b").orderBy(F.desc(ts_col))
    r_last = (
        r_b.withColumn("__rn", F.row_number().over(wlast))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    rrow = F.struct(*[F.col(c) for c in right_payload_src if c != on])
    rrow_type = r_last.select(rrow.alias("p")).schema[0].dataType
    # a bucket-b right row becomes available to buckets >= b+1
    avail = r_last.select(
        F.col(on),
        (F.col("__b") + 1).alias("__sortb"),
        F.lit(0).alias("__mtag"),
        rrow.alias("__rrow"),
    )
    left_buckets = (
        left.withColumn("__b", bexpr).select(on, "__b").distinct()
    )
    markers = left_buckets.select(
        F.col(on),
        F.col("__b").alias("__sortb"),
        F.lit(1).alias("__mtag"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    wcarry = (
        Window.partitionBy(on)
        .orderBy("__sortb", "__mtag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = (
        avail.unionByName(markers)
        .withColumn("__c", F.last("__rrow", ignorenulls=True).over(wcarry))
        .filter((F.col("__mtag") == 1) & F.col("__c").isNotNull())
        .select(
            F.col(on),
            F.col("__sortb").alias("__b"),
            *[
                F.col("__c")[c].alias(c)
                for c in right_payload_src
                if c != on
            ],
        )
    )

    # -- step 3: salted asof within (key, bucket) --
    key = F.concat_ws(
        "\x1f", F.col(on).cast("string"), F.col("__b").cast("string")
    )
    right_aug = r_b.unionByName(carry.select(*r_b.columns)).withColumn(
        "__k", key
    )
    left_aug = left.withColumn("__b", bexpr).withColumn("__k", key)
    out = asof_join(
        left_aug,
        right_aug,
        on="__k",
        ts_col=ts_col,
        payload_cols=payload_cols,
        matched_prefix=matched_prefix,
        tolerance=tolerance,
    )
    left_out = [on, ts_col] + [c for c in left.columns if c not in (on, ts_col)]
    return out.select(
        *left_out, *[f"{matched_prefix}{c}" for c in payload_cols]
    )


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
