"""Plan-shape regression guards.

The scale properties PLANS.md documents are invariants, not accidents:
these tests pin the shuffle count / top-k strategy of representative
queries so a refactor that silently introduces an extra Exchange (or
degrades TakeOrderedAndProject into a global Sort) fails CI instead of
fleet-wide at 100 TB.
"""

from __future__ import annotations

import pytest


from claude_code_memory_spark.queries.base import REGISTRY


def plan_of(spark, name, sf_dir) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def count_shuffles(plan: str) -> int:
    # each physical shuffle prints as an "Exchange hashpartitioning/..." or
    # rangepartitioning/SinglePartition node; broadcasts print as
    # "BroadcastExchange" and are not shuffles
    return sum(
        1
        for line in plan.splitlines()
        if line.lstrip().startswith("(") and " Exchange " not in line and
        line.split(") ", 1)[-1].startswith("Exchange")
    )


def test_q6_single_shuffle(spark, sf_dir):
    # pure filter+agg: the only exchange is the 1-row final aggregate
    plan = plan_of(spark, "q6_revenue_delta", sf_dir)
    assert count_shuffles(plan) == 1
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_dense_topk_no_shuffle(spark, sf_dir):
    # brute-force top-k must be scan → project → TakeOrderedAndProject:
    # zero shuffles, per-partition heaps merged on the driver
    plan = plan_of(spark, "dense_topk", sf_dir)
    assert count_shuffles(plan) == 0
    assert "TakeOrderedAndProject" in plan


def test_q1_group_agg_shape(spark, sf_dir):
    # partial agg → exchange on group keys → final agg (+ tiny result sort)
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    assert count_shuffles(plan) <= 2
    assert "HashAggregate" in plan


def test_q18_topk_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, "q18_large_volume_customers", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_sessionize_single_shuffle(spark, sf_dir):
    # order-dependent session logic: exactly one exchange (user key);
    # sort happens within partitions
    plan = plan_of(spark, "sessionize_events", sf_dir)
    assert count_shuffles(plan) == 1


def test_q20_threshold_shuffles_only_aggregated_data(spark, sf_dir):
    # exactly ONE exchange touches corpus-sized data (the (part, supplier)
    # aggregation); the window re-partition, distinct, and output sort all
    # move post-aggregation rows. 4 exchanges total, first one big.
    plan = plan_of(spark, "q20_dominant_supplier", sf_dir)
    assert count_shuffles(plan) <= 4
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q11_threshold_is_broadcast_not_collect(spark, sf_dir):
    # the global-total threshold must ride a BroadcastExchange (1-row
    # cross join), never a driver-side collect-then-literal
    plan = plan_of(spark, "q11_important_stock", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pii_redaction_no_shuffle(spark, sf_dir):
    # a pure per-row scrub must be map-only: zero exchanges
    plan = plan_of(spark, "text_pii_redaction", sf_dir)
    assert count_shuffles(plan) == 0


def test_knn_per_label_no_global_sort(spark, sf_dir):
    # the global rank must come from the broadcast count-of-better pass,
    # never an unpartitioned window (= Exchange SinglePartition + full
    # corpus sort through one task)
    plan = plan_of(spark, "knn_per_label", sf_dir)
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastExchange" in plan


@pytest.mark.slow
def test_no_unbounded_single_partition_window_anywhere(spark, sf_dir):
    """Catalog-wide scale invariant: a Window fed by Exchange
    SinglePartition is only acceptable when a Limit/TakeOrdered upstream
    has already bounded the input (e.g. RRF ranks over an over-fetched
    top-k); over unbounded input it serializes the whole table through
    one task at 100×."""
    offenders = []
    for name in REGISTRY:
        try:
            plan = plan_of(spark, name, sf_dir)
        except Exception:
            continue  # analysis failures are the canary test's job
        if "Window" not in plan:
            continue
        if "Exchange SinglePartition" not in plan:
            continue
        bounded = any(
            marker in plan
            for marker in ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit")
        )
        if not bounded:
            offenders.append(name)
    assert not offenders, f"unbounded single-partition windows: {offenders}"


def test_runtime_bloom_filter_injected_on_selective_shuffle_join(spark, tmp_path):
    """Runtime-filter pushdown — the third pruning lever after column and
    partition pruning: when a shuffle join's build side carries a
    selective filter, Spark injects a bloom filter ahead of the probe
    side's shuffle (`bloom_filter_might_contain`), so non-joining fact
    rows are dropped at the scan instead of being shuffled. At 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the ~matching slice. Pinned here (with thresholds lowered
    to fixture scale) so a conf/regression can't silently turn it off."""
    fact = spark.range(0, 200_000).selectExpr(
        "id % 10000 AS k", "id AS v", "repeat('x', 24) AS pad"
    )
    dim = spark.range(0, 10_000).selectExpr("id AS k", "id % 97 AS attr")
    fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    confs = {
        # force a shuffle join (broadcast path doesn't need the filter) and
        # drop the size floors that gate injection at production scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim")).filter("attr = 13")
        joined = f.join(d, "k").groupBy("attr").count()
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized[:2000]
        # and it must still produce the right answer with the filter active
        rows = joined.collect()
        assert len(rows) == 1 and rows[0]["count"] == 103 * 20
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
