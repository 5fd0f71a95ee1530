"""Bucketed-table co-located joins: the write-once-shuffle-never path.

Proves (by inspecting the physical plan) that two tables bucketed on the
same key with the same bucket count join and aggregate with no shuffle
exchange at all — the property that makes repeated fact↔fact joins
affordable at 100 TB.
"""

from __future__ import annotations

import pytest

from claude_code_memory_spark.io import load, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    # explicit paths → external tables; no warehouse-dir dependency
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, path=str(base / "li"))
    write_bucketed(o, "o_bucketed", "o_orderkey", 8, path=str(base / "o"))
    yield spark.table("li_bucketed"), spark.table("o_bucketed"), li, o
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    lib, ob, li, o = bucketed_pair
    # disable broadcast so the join must be sort-merge: the honest test of
    # bucket co-location (broadcast would hide the shuffle by replication)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lib.join(ob, lib.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "o_orderstatus", "l_quantity"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        # bucket-sorted writes also make the per-bucket Sort unnecessary
        # (Spark still shows a Sort node only if bucket sort info is unusable)
        unbucketed = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderstatus", "l_quantity"
        )
        assert "Exchange hashpartitioning" in _plan(unbucketed)
        # same rows either way
        assert joined.count() == unbucketed.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_shuffle(bucketed_pair):
    lib, *_ = bucketed_pair
    from pyspark.sql import functions as F

    agg = lib.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    assert "Exchange hashpartitioning" not in _plan(agg)
