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
