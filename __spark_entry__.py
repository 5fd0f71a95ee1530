"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid-RRF search (dense cosine +
BM25 keyword fused with reciprocal-rank fusion — the reference's core
query, storage/qdrant.py:888-1044) on sf0.001.

``queries()`` / ``oracle_sql()`` expose the full operator catalog from
claude_code_memory_spark.queries — one entry per implemented operator of
SURVEY.md §2, each with DuckDB oracle SQL where ANSI SQL can express it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from claude_code_memory_spark.queries import REGISTRY, oracle_sql_map, query_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["hybrid_rrf_search"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops)."""
    return oracle_sql_map()
