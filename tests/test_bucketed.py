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


def test_semantic_dedup_self_join_colocated_when_bucketed(
    spark, sf_dir, tmp_path_factory
):
    """The SemDeDup docstring's scale claim, made concrete: writing the
    k-means assignment bucketed by cell makes the pairwise self-join
    co-located — the cluster_id hash exchanges disappear from the plan
    and the verdicts are unchanged."""
    from pyspark.sql import functions as F

    from claude_code_memory_spark.operators.clustering import (
        kmeans_lloyd,
        semantic_dedup,
    )

    base = tmp_path_factory.mktemp("sem_bucketed")
    emb = load(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_lloyd(emb, k=4, iters=1)
    write_bucketed(
        assigned, "sem_bucketed", "cluster_id", 4, path=str(base / "sem")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = semantic_dedup(spark.table("sem_bucketed"), threshold=0.4)
        plain = semantic_dedup(assigned, threshold=0.4)
        n_b = _plan(bucketed).count("Exchange hashpartitioning")
        n_p = _plan(plain).count("Exchange hashpartitioning")
        # both cluster_id exchanges under the self-join vanish; the
        # verdict join on vec_id legitimately still shuffles
        assert n_b <= n_p - 2, (n_b, n_p)
        rows = lambda df: {  # noqa: E731
            (r["vec_id"], r["cluster_id"], r["removed"]) for r in df.collect()
        }
        assert rows(bucketed) == rows(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS sem_bucketed")
