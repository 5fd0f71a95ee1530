"""Collection statistics (reference utils/qdrant_stats.py:93-229, A2/A3).

The reference walks every point with Counters; here each report is one
hash aggregation, and the multi-dimensional report is a `cube` — partial
(map-side) aggregation makes these cheap at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def counts_by(df: DataFrame, *cols: str) -> DataFrame:
    return df.groupBy(*cols).agg(F.count("*").alias("n"))


def multi_dim_report(df: DataFrame, *cols: str) -> DataFrame:
    """All-subsets count report (the reference's several Counters in one pass)."""
    return df.cube(*cols).agg(F.count("*").alias("n"))


def usage_rollup(
    df: DataFrame, *, group_col: str, token_col: str, cost_per_1k: float = 0.02
) -> DataFrame:
    """A3: token/cost accounting per group (content_processor.py:225-256)."""
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_requests"),
        F.sum(token_col).alias("total_tokens"),
        F.round(F.sum(token_col) / 1000.0 * cost_per_1k, 6).alias("cost_usd"),
    )


def profile_table(df: DataFrame) -> DataFrame:
    """Single-pass column profile: (column, n_nulls, approx_distinct,
    min_repr, max_repr) for every column — the data-profiling summary a
    pipeline prints before trusting a new table.

    ONE aggregate over one scan regardless of column count (each column
    contributes four counters to the same HashAggregate; HLL partials
    merge map-side), then a stack() to long form — never a per-column
    job. Min/max are string representations so heterogeneous column
    types fit one report schema."""
    from pyspark.sql import functions as F

    aggs = []
    for c in df.columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"),
            F.approx_count_distinct(c).alias(f"__d_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `__n_{c}`, `__d_{c}`, `__mn_{c}`, `__mx_{c}`" for c in df.columns
    )
    return row.selectExpr(
        f"stack({len(df.columns)}, {pairs})"
        " AS (column, n_nulls, approx_distinct, min_repr, max_repr)"
    )
