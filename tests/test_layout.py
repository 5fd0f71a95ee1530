"""Data-layout scan pruning: range-clustered writes vs shuffled writes.

Reads the FileSourceScan's own `numOutputRows` metric after execution —
the ground truth of how many rows parquet actually surrendered — to prove
that `io.write_clustered` turns a range predicate into row-group skips,
and to pin the two silent failure modes (INT96 timestamps, TIMESTAMP_NTZ
pushdown) documented in io.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.io import write_clustered


def scan_rows(df) -> int:
    """Rows emitted by the leaf scan (post row-group pruning, pre Filter)."""
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return leaf.metrics().apply("numOutputRows").value()


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_clustered_layout_prunes_row_groups(spark, lineitem, tmp_path):
    total = lineitem.count()
    write_clustered(lineitem, str(tmp_path / "clustered"), "l_orderkey", num_files=8)
    lineitem.repartition(8).write.mode("overwrite").parquet(str(tmp_path / "shuffled"))

    cutoff = lineitem.agg(F.expr("percentile(l_orderkey, 0.2)")).collect()[0][0]
    pred = F.col("l_orderkey") < F.lit(int(cutoff))
    clustered = scan_rows(
        spark.read.parquet(str(tmp_path / "clustered")).filter(pred).select("l_quantity")
    )
    shuffled = scan_rows(
        spark.read.parquet(str(tmp_path / "shuffled")).filter(pred).select("l_quantity")
    )
    # shuffled layout: every file overlaps the range → full scan
    assert shuffled == total
    # clustered: only the files whose range intersects the predicate are
    # decoded (~20% of rows + one boundary file)
    assert clustered < 0.45 * total


def test_timestamp_micros_prunes_int96_does_not(spark, lineitem, tmp_path):
    """The session writes TIMESTAMP_MICROS (session.py) so LTZ range
    scans prune; the INT96 default would scan everything."""
    total = lineitem.count()
    ltz = lineitem.withColumn("ship_ltz", F.col("l_shipdate").cast("timestamp"))
    write_clustered(ltz, str(tmp_path / "ltz"), "ship_ltz", num_files=8)
    pred = F.col("ship_ltz") < F.lit("1996-01-01").cast("timestamp")
    pruned = scan_rows(
        spark.read.parquet(str(tmp_path / "ltz")).filter(pred).select("l_quantity")
    )
    assert pruned < 0.5 * total

    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        write_clustered(ltz, str(tmp_path / "int96"), "ship_ltz", num_files=8)
        unpruned = scan_rows(
            spark.read.parquet(str(tmp_path / "int96")).filter(pred).select("l_quantity")
        )
        assert unpruned == total  # INT96 stats unusable → no skipping
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)


def test_ntz_predicates_do_not_prune(spark, lineitem, tmp_path):
    """Documented caveat: TIMESTAMP_NTZ predicates never reach parquet
    row-group stats (Spark skips parquet-filter conversion for NTZ), so
    clustering on an NTZ column buys nothing — if this test ever fails,
    Spark fixed it and io.py's guidance should be relaxed."""
    total = lineitem.count()
    write_clustered(lineitem, str(tmp_path / "ntz"), "l_shipdate", num_files=8)
    pred = F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    rows = scan_rows(
        spark.read.parquet(str(tmp_path / "ntz")).filter(pred).select("l_quantity")
    )
    assert rows == total


def test_ivf_store_partition_pruning(spark, sf_dir, tmp_path):
    """The IVF serving layout claim from operators/similarity.py made
    concrete: persist the assignment partitioned by ivf_cluster and a
    probe becomes directory-level partition pruning — the scan's
    PartitionFilters carry the cluster predicate and only the probed
    subdirectories are read; results equal the in-memory probe."""
    from pyspark.sql import functions as F

    from claude_code_memory_spark.operators.similarity import (
        ivf_seeded_build,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    indexed, centers = ivf_seeded_build(emb, n_centroids=4)
    path = str(tmp_path / "ivf_store")
    indexed.write.partitionBy("ivf_cluster").parquet(path)
    stored = spark.read.parquet(path)

    q = [float(x) for x in emb.filter(F.col("vec_id") == 9).first()["embedding"]]
    topk_stored = ivf_topk(stored, centers, q, k=5, nprobe=2)
    plan = topk_stored._jdf.queryExecution().executedPlan().toString()
    # the probe predicate must reach the scan as a PARTITION filter
    # (directory pruning), not a data filter: the scan line reads
    # "PartitionFilters: [ivf_cluster#N IN (...)], PushedFilters: []"
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "PartitionFilters: [ivf_cluster" in scan[0], plan[:2000]
    assert "PushedFilters: []" in scan[0], scan[0]
    # identical results to the unpartitioned probe
    mem = [(r["vec_id"], r["score"]) for r in ivf_topk(indexed, centers, q, k=5, nprobe=2).collect()]
    ondisk = [(r["vec_id"], r["score"]) for r in topk_stored.collect()]
    assert mem == ondisk


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """A Z-ordered layout must prune a 2-D box predicate, and prune BOTH
    single-dimension predicates — range clustering on one column can
    never do the latter for the other column."""
    from claude_code_memory_spark.io import write_zordered, zorder_key

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("x", F.col("o_custkey") % 65536)
        .withColumn(
            "y", F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")) % 65536
        )
    )
    total = orders.count()
    write_zordered(orders, str(tmp_path / "zordered"), "x", "y", num_files=16)
    orders.repartition(16).write.mode("overwrite").parquet(str(tmp_path / "shuffled"))

    xmin, xmax, ymin, ymax = orders.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    xcut = int(xmin + (xmax - xmin) * 0.25)
    ycut = int(ymin + (ymax - ymin) * 0.25)
    box = (F.col("x") < xcut) & (F.col("y") < ycut)

    z_scan = scan_rows(
        spark.read.parquet(str(tmp_path / "zordered")).filter(box).select("o_orderkey")
    )
    s_scan = scan_rows(
        spark.read.parquet(str(tmp_path / "shuffled")).filter(box).select("o_orderkey")
    )
    assert s_scan == total  # shuffled layout cannot skip anything
    assert z_scan < 0.5 * total  # the 2-D tile layout skips most row groups

    # single-dimension predicates each prune too (the z property)
    for pred in (F.col("x") < xcut, F.col("y") < ycut):
        one_dim = scan_rows(
            spark.read.parquet(str(tmp_path / "zordered")).filter(pred).select("o_orderkey")
        )
        assert one_dim < 0.75 * total


def test_zorder_key_matches_sql_twin(spark):
    """zorder_key (Column algebra) and zorder_key_sql (oracle string) must
    agree bit-for-bit on adversarial inputs."""
    from claude_code_memory_spark.io import zorder_key, zorder_key_sql

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (2, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    df.createOrReplaceTempView("zk_probe")
    via_col = [r["z"] for r in
               df.select(zorder_key("x", "y", 16).alias("z")).collect()]
    sql = zorder_key_sql("x", "y", 16).replace("::BIGINT", "")
    via_sql = [r["z"] for r in
               spark.sql(f"SELECT {sql} AS z FROM zk_probe").collect()]
    assert via_col == via_sql
    assert via_col[0] == 0 and via_col[1] == 1 and via_col[2] == 2
    assert via_col[3] == (1 << 32) - 1  # full 16+16 bits interleave to 2^32-1


def test_parquet_aggregate_pushdown(spark, sf_dir, tmp_path):
    """With spark.sql.parquet.aggregatePushdown, MIN/MAX/COUNT over a
    parquet table are answered from footer statistics — the scan shows
    PushedAggregation and reads no data pages. The free-metadata path
    every 100 TB 'how big is this table' query should take."""
    # pushdown requires no predicate and no nested schema: write a flat copy
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "flat"))
    old = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    # aggregate pushdown is a DataSource V2 capability; the default V1
    # parquet reader ignores it entirely
    spark.conf.set(
        "spark.sql.sources.useV1SourceList",
        ",".join(s for s in old_v1.split(",") if s and s != "parquet"),
    )
    try:
        agg = spark.read.parquet(str(tmp_path / "flat")).agg(
            F.min("o_orderkey"), F.max("o_orderkey"), F.count("*")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]" in plan, plan
        row = agg.first()
        exact = orders.agg(F.min("o_orderkey"), F.max("o_orderkey"), F.count("*")).first()
        assert tuple(row) == tuple(exact)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", old)
        spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)


def test_zorder_key_n_matches_pure_reference(spark):
    from claude_code_memory_spark.io import zorder_key_n, zorder_value_n

    rows = [(1, 2, 3), (255, 0, 128), (7, 7, 7), (0, 0, 0)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = [r["z"] for r in
           df.select(zorder_key_n(["a", "b", "c"], 8).alias("z")).collect()]
    assert got == [zorder_value_n(list(r), 8) for r in rows]
