"""Index bloat / storage-efficiency report (reference bloat_analysis.py).

The reference scrolls every point out of Qdrant into driver memory and
counts with Python Counters (bloat_analysis.py:14-286) — O(collection) on
one machine. Here each section is a Spark aggregation over the stored
tables, unioned into one long-format (section, metric, value) frame: the
scans are distributed, only the tiny report rows reach the driver, and the
whole report is a handful of single-pass group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kv(df: DataFrame, section: str) -> DataFrame:
    return df.select(
        F.lit(section).alias("section"),
        F.col("metric").cast("string"),
        F.col("value").cast("double"),
    )


def bloat_report(chunks: DataFrame, relations: DataFrame | None = None) -> DataFrame:
    """Long-format report: (section, metric, value).

    Sections mirror the reference's analyses:
    - chunk_types: distribution (bloat_analysis.py:64-98)
    - entity_types: per-type chunk counts (:100-138)
    - ratio: metadata:implementation ratio (:117-138)
    - files: top-10 files by chunk count (:152-240)
    - content: length stats, empties, duplicate content (:286-466)
    - relations: totals + relations per entity (:516-646)
    """
    parts: list[DataFrame] = []

    parts.append(_kv(
        chunks.groupBy(F.col("chunk_type").alias("metric")).agg(
            F.count("*").alias("value")
        ),
        "chunk_types",
    ))
    parts.append(_kv(
        chunks.groupBy(F.col("entity_type").alias("metric")).agg(
            F.count("*").alias("value")
        ),
        "entity_types",
    ))
    ratio = chunks.agg(
        (
            F.sum(F.when(F.col("chunk_type") == "metadata", 1).otherwise(0))
            / F.greatest(
                F.sum(F.when(F.col("chunk_type") == "implementation", 1).otherwise(0)),
                F.lit(1),
            )
        ).alias("value")
    ).select(F.lit("metadata_to_impl").alias("metric"), "value")
    parts.append(_kv(ratio, "ratio"))

    top_files = (
        chunks.filter(F.col("file_path").isNotNull())
        .groupBy(F.col("file_path").alias("metric"))
        .agg(F.count("*").alias("value"))
        .orderBy(F.desc("value"), F.asc("metric"))
        .limit(10)
    )
    parts.append(_kv(top_files, "files_top10"))

    content = chunks.agg(
        F.round(F.avg(F.length("content")), 1).alias("avg_content_len"),
        F.max(F.length("content")).cast("double").alias("max_content_len"),
        F.sum(
            F.when(F.coalesce(F.length("content"), F.lit(0)) == 0, 1).otherwise(0)
        ).cast("double").alias("empty_content"),
        (F.count("*") - F.countDistinct("content_hash")).cast("double").alias(
            "duplicate_content_rows"
        ),
    )
    melted = content.selectExpr(
        "stack(4, 'avg_content_len', avg_content_len, 'max_content_len', max_content_len, "
        "'empty_content', empty_content, 'duplicate_content_rows', duplicate_content_rows) "
        "AS (metric, value)"
    )
    parts.append(_kv(melted, "content"))

    if relations is not None:
        rel = relations.agg(F.count("*").cast("double").alias("n_relations"))
        ents = chunks.filter(F.col("chunk_type") == "metadata").agg(
            F.countDistinct("entity_name").cast("double").alias("n_entities")
        )
        both = rel.crossJoin(ents)
        rel_stats = both.selectExpr(
            "stack(3, 'n_relations', n_relations, 'n_entities', n_entities, "
            "'relations_per_entity', round(n_relations / greatest(n_entities, 1.0), 2)) "
            "AS (metric, value)"
        )
        parts.append(_kv(rel_stats, "relations"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
