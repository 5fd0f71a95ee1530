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
