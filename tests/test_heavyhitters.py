"""Misra-Gries heavy hitters (operators/heavyhitters.py): exactness of
the final set, partition invariance, and the candidate-capacity bound —
with a key space LARGER than the sketch capacity so the decrement path
actually runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.heavyhitters import (
    heavy_hitters,
    misra_gries_partition_sketch,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 3 hot keys (600 + 400 + 300 occurrences) + 1000 singletons:
    # n = 2300, capacity 10 -> threshold 230 -> exactly the hot keys.
    rows = (
        [("hot_a",)] * 600
        + [("hot_b",)] * 400
        + [("hot_c",)] * 300
        + [(f"cold_{i}",) for i in range(1000)]
    )
    return spark.createDataFrame(rows, "item string")


def _hits(df):
    return {r["item"]: r["n_occurrences"] for r in df.collect()}


def test_exact_heavy_hitter_set(skewed):
    got = _hits(heavy_hitters(skewed, capacity=10))
    assert got == {"hot_a": 600, "hot_b": 400, "hot_c": 300}


def test_partition_invariant(skewed):
    base = _hits(heavy_hitters(skewed, capacity=10))
    # adversarial layouts: few fat partitions, many slivers, hash-scattered
    for layout in (skewed.repartition(2), skewed.repartition(37),
                   skewed.repartition(8, "item")):
        assert _hits(heavy_hitters(layout, capacity=10)) == base


def test_candidate_rows_bounded_by_capacity(skewed):
    parts = skewed.repartition(5)
    sketch = misra_gries_partition_sketch(parts, capacity=10)
    per_part = (
        sketch.filter(F.col("item").isNotNull())
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
    )
    assert all(r["n"] <= 10 for r in per_part.collect())
    # the piggybacked totals sum to the stream's non-null row count
    total = sketch.filter(F.col("item").isNull()).agg(F.sum("est_count")).first()[0]
    assert total == 2300


def test_threshold_is_strict(spark):
    # item at EXACTLY n/capacity must be excluded (strict >): 10 of 100
    # with capacity 10 -> 10 * 10 = 100 is not > 100
    rows = [("edge",)] * 10 + [(f"x{i}",) for i in range(90)]
    df = spark.createDataFrame(rows, "item string")
    assert _hits(heavy_hitters(df, capacity=10)) == {}


def test_nulls_ignored(spark):
    rows = [("a",)] * 9 + [(None,)] * 20
    df = spark.createDataFrame(rows, "item string")
    # n_total counts non-null only (F.count on the column): 9 * 10 > 9
    assert _hits(heavy_hitters(df, capacity=10)) == {"a": 9}


def test_non_string_items_rejected_at_call_time(spark):
    df = spark.createDataFrame([(1,), (2,)], "item long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="string item column"):
        heavy_hitters(df, capacity=10)
