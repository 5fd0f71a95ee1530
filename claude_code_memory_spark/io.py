"""Table loading helpers for the driver-generated testdata layout.

Each scale-factor directory holds one parquet file per table
(TESTDATA.md). Parquet gives us predicate pushdown + column pruning for
free once the query is declarative — verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for the SQL API)."""
    for t in TPCH_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def write_clustered(
    df: DataFrame,
    path: str,
    cols: str | list[str],
    num_files: int = 32,
) -> None:
    """Range-cluster a table on its hot filter column(s) before writing.

    `repartitionByRange` gives each output file a disjoint key range, so
    every file's parquet footer carries tight min/max stats and a range
    predicate skips whole row groups at scan time — the difference
    between reading 100 TB and reading the one date-slice a query wants.
    `sortWithinPartitions` additionally orders pages inside each file
    (page-level stats + better compression on the clustered column).

    Caveats that silently disable the pruning this buys (measured in
    tests/test_layout.py):
    - timestamps must be written as TIMESTAMP_MICROS (session.py sets
      it); the INT96 default has no comparable stats;
    - TIMESTAMP_NTZ predicates are NOT pushed to parquet row-group stats
      by Spark even with micros storage — cluster on a TIMESTAMP(_LTZ)
      or epoch BIGINT column instead when scans must prune."""
    keys = [cols] if isinstance(cols, str) else list(cols)
    (
        df.repartitionByRange(num_files, *keys)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and bucket-sorted) on its join key.

    This is the co-located-join primitive for 100 TB deployments: two
    tables bucketed on the same key with the same bucket count join with
    ZERO shuffle — each task reads bucket i of both sides. Same for
    groupBy on the bucket key. The shuffle happens once at write time and
    is amortized over every subsequent join/agg (the fact↔fact joins this
    engine repeats every incremental run: chunks⋈vectors on point_id,
    relations⟂entities on entity name, lineitem⋈orders on orderkey).

    `sort=True` also orders rows within each bucket file so the
    sort-merge join skips its Sort step (plan shows SortMergeJoin with
    neither Exchange nor Sort above the scans).

    Bucket-count sizing: pick so one bucket of the larger table ≈
    100-200 MB (fits an executor's task comfortably); bucket counts of
    joined tables must be equal (or integer multiples with
    spark.sql.bucketing.coalesceBucketsInJoin.enabled)."""
    keys = [key] if isinstance(key, str) else key
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
