"""Query registry shared by __spark_entry__, bench.py and the tests.

Each entry: name -> (callable(spark, sf_dir) -> DataFrame, oracle SQL or
None). The oracle SQL runs in DuckDB against views named after the
testdata tables. Column names/aliases MUST match between the two sides —
the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = CatalogEntry(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}


def prep(spark: SparkSession) -> SparkSession:
    """Session confs required for oracle-comparable reads: nanos timestamps
    surface as LONG (events table), timezone pinned UTC."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
