"""The reference's six join shapes, as first-class DataFrame operators.

Reference semantics (SURVEY.md §2.3):
- J2 orphan relation cleanup      storage/qdrant.py:1937-2323  (anti join)
- J3 phantom call detection       storage/qdrant.py:2325-2381  (semi join + contains)
- J4 pre-storage orphan filter    indexer.py:1132-1210         (broadcast semi join)
- J5 entity replacement diff      processing/processors.py:64-153 (full outer join)
- J6 content-hash dedup probe     processing/content_processor.py:45-61 (left anti)
- J7 smart relation filtering     storage/diff_layers.py:80-110 (semi join vs changed set)

The reference hand-rolls each of these with O(1) lookup dicts and batch
indices (its 66x/221x claims); on Spark every one is a single shuffle-or-
broadcast join that Catalyst plans — the entity-name universe is small
relative to relations, so J2/J4/J7 broadcast the name side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_relations(
    relations: DataFrame,
    entities: DataFrame,
    *,
    from_col: str = "from_entity",
    to_col: str = "to_entity",
    name_col: str = "entity_name",
) -> DataFrame:
    """J2: relations whose endpoint no longer exists in the entity set."""
    names = F.broadcast(entities.select(F.col(name_col).alias("__n")).distinct())
    missing_to = relations.join(names, relations[to_col] == F.col("__n"), "left_anti")
    missing_from = relations.join(names, relations[from_col] == F.col("__n"), "left_anti")
    return missing_to.unionByName(missing_from).distinct()


def valid_relations(
    relations: DataFrame,
    entities: DataFrame,
    *,
    from_col: str = "from_entity",
    to_col: str = "to_entity",
    name_col: str = "entity_name",
) -> DataFrame:
    """J4: keep only relations whose both endpoints exist (pre-storage filter).

    Reference filters before embedding to avoid wasted $ — here it is a
    broadcast double semi-join, which Catalyst collapses into two
    BroadcastHashJoins with no shuffle of the big side."""
    names = F.broadcast(entities.select(F.col(name_col).alias("__n")).distinct())
    out = relations.join(names, relations[to_col] == F.col("__n"), "left_semi")
    return out.join(names, out[from_col] == F.col("__n"), "left_semi")


def phantom_calls(
    relations: DataFrame,
    impl_chunks: DataFrame,
    *,
    from_col: str = "from_entity",
    to_col: str = "to_entity",
    type_col: str = "relation_type",
    entity_col: str = "entity_name",
    content_col: str = "content",
) -> DataFrame:
    """J3: 'calls' relations whose callee no longer appears as `callee(` in
    the caller's implementation content."""
    calls = relations.filter(F.col(type_col) == "calls")
    impl = impl_chunks.select(
        F.col(entity_col).alias("__caller"), F.col(content_col).alias("__content")
    )
    joined = calls.join(impl, calls[from_col] == F.col("__caller"), "inner")
    return joined.filter(
        ~F.col("__content").contains(F.concat(F.col(to_col), F.lit("(")))
    ).drop("__caller", "__content")


def replacement_diff(
    stored: DataFrame,
    parsed: DataFrame,
    *,
    keys: tuple[str, ...] = ("file_path", "entity_name"),
    hash_col: str = "content_hash",
) -> DataFrame:
    """J5: full-outer diff of stored vs freshly-parsed entities.

    Classifies every key as added / deleted / changed / unchanged — the
    DiffSketch of reference storage/diff_layers.py:31-77."""
    s = stored.select(*keys, F.col(hash_col).alias("__old_hash"))
    p = parsed.select(*keys, F.col(hash_col).alias("__new_hash"))
    joined = s.join(p, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("__old_hash").isNull(), F.lit("added"))
        .when(F.col("__new_hash").isNull(), F.lit("deleted"))
        .when(F.col("__old_hash") != F.col("__new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*keys, status.alias("status"))


def dedup_new_content(
    chunks: DataFrame,
    existing: DataFrame,
    *,
    hash_col: str = "content_hash",
) -> DataFrame:
    """J6: drop chunks whose content hash is already stored (skip re-embedding).

    The reference's single biggest cost saver; as a left-anti join the
    existing-hash side is typically the smaller delta and broadcastable."""
    return chunks.join(existing.select(hash_col).distinct(), on=hash_col, how="left_anti")


def relations_touching(
    relations: DataFrame,
    changed_entities: DataFrame,
    *,
    from_col: str = "from_entity",
    to_col: str = "to_entity",
    name_col: str = "entity_name",
) -> DataFrame:
    """J7: relations touching any changed entity (either endpoint)."""
    ch = F.broadcast(changed_entities.select(F.col(name_col).alias("__n")).distinct())
    from_hit = relations.join(ch, relations[from_col] == F.col("__n"), "left_semi")
    to_hit = relations.join(ch, relations[to_col] == F.col("__n"), "left_semi")
    return from_hit.unionByName(to_hit).distinct()
