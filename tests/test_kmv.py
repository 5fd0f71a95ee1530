"""KMV bottom-k sketches (operators/kmv.py): exact merge law, estimator
accuracy when the sketch saturates, and Jaccard estimation."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_code_memory_spark.operators.kmv import (
    kmv_estimate,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
)


def _groups(spark, spec):
    rows = [(g, v) for g, lo, hi in spec for v in range(lo, hi)]
    return spark.createDataFrame(rows, "g string, v long")


def test_merge_law_exact(spark):
    df = _groups(spark, [("a", 0, 500), ("b", 300, 900), ("c", 850, 1000)])
    per = kmv_sketch(df, "g", "v", k=64)
    merged = kmv_merge(per, k=64).first()["sketch"]
    direct = kmv_sketch(df.withColumn("__g", F.lit(1)), "__g", "v", k=64).first()[
        "sketch"
    ]
    assert merged == direct  # hash-for-hash, no approximation in merge


def test_estimator_exact_below_k_and_bounded_above(spark):
    small = _groups(spark, [("a", 0, 100)])
    est = kmv_estimate(kmv_sketch(small, "g", "v", k=256), k=256).first()
    assert est["est_distinct"] == 100.0  # not full → exact
    big = _groups(spark, [("a", 0, 20_000)])
    est2 = kmv_estimate(kmv_sketch(big, "g", "v", k=256), k=256).first()
    rel = abs(est2["est_distinct"] - 20_000) / 20_000
    assert rel < 0.2, rel  # ~1/sqrt(k-1) regime


def test_jaccard_estimate(spark):
    # |A|=1000, |B|=1000, |A∩B|=500 → J = 500/1500 = 1/3
    a = kmv_sketch(_groups(spark, [("a", 0, 1000)]), "g", "v", k=256)
    b = kmv_sketch(_groups(spark, [("b", 500, 1500)]), "g", "v", k=256)
    j = kmv_jaccard(a, b, k=256)
    assert abs(j - 1 / 3) < 0.1, j


def test_disjoint_jaccard_zero_ish(spark):
    a = kmv_sketch(_groups(spark, [("a", 0, 300)]), "g", "v", k=128)
    b = kmv_sketch(_groups(spark, [("b", 10_000, 10_300)]), "g", "v", k=128)
    assert kmv_jaccard(a, b, k=128) == 0.0
