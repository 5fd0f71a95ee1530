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
