"""Plan-shape regression guards.

The scale properties PLANS.md documents are invariants, not accidents:
these tests pin the shuffle count / top-k strategy of representative
queries so a refactor that silently introduces an extra Exchange (or
degrades TakeOrderedAndProject into a global Sort) fails CI instead of
fleet-wide at 100 TB.
"""

from __future__ import annotations


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
