"""Project file scan + changed-file detection.

Reference semantics:
- S1 project scan: include globs, exclude patterns, max-file-size filter
  (indexer.py:820-878)
- S2 changed-file scan: SHA256 diff vs stored state, deletions via key
  set-difference (indexer.py:954-987; mtime pruning :898-952)

Spark-first: `binaryFile` source lists + reads in parallel with
partition-sized tasks; exclude patterns are column predicates evaluated
before content ever reaches Python; change detection is a full-outer join
against the `file_state` table — at 100 TB both sides are just parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_EXCLUDES = (".git", "__pycache__", "node_modules", ".venv", "venv", ".claude")
LANGUAGE_BY_EXT = {
    "py": "py",
    "js": "js",
    "jsx": "js",
    "mjs": "js",
    "cjs": "js",
    "ts": "ts",
    "tsx": "ts",
    "md": "md",
    "json": "json",
    "yaml": "yaml",
    "yml": "yaml",
    "html": "html",
    "css": "css",
    "txt": "txt",
    "csv": "csv",
    "ini": "ini",
    "toml": "toml",
}


def scan_project(
    spark: SparkSession,
    project_dir: str,
    *,
    include_glob: str = "*",
    excludes: tuple[str, ...] = DEFAULT_EXCLUDES,
    max_file_size: int = 1_048_576,
) -> DataFrame:
    """S1: scan a project tree into the `source_files` schema.

    Reads via the binaryFile source (parallel listing + reading), decodes
    UTF-8 lossily, filters exclude dirs and oversized files *before*
    decoding so the predicate prunes at the listing level.

    Note: zero-byte files are skipped by the binaryFile listing — they
    carry no indexable content, so this matches the engine's needs (the
    parser itself still handles empty strings gracefully)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", include_glob)
        .option("recursiveFileLookup", "true")
        .load(project_dir)
    )
    for pat in excludes:
        raw = raw.filter(~F.col("path").contains(f"/{pat}/"))
    raw = raw.filter(F.col("length") <= max_file_size)
    prefix_len = len(project_dir.rstrip("/")) + 2  # substring() is 1-based
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    lang = F.create_map(
        *[F.lit(x) for kv in LANGUAGE_BY_EXT.items() for x in kv]
    )[ext]
    return raw.select(
        F.regexp_replace(F.col("path"), "^file:", "").alias("file_path"),
        F.substring(F.regexp_replace(F.col("path"), "^file:", ""), prefix_len, 1_000_000).alias(
            "relative_path"
        ),
        F.decode(F.col("content"), "UTF-8").alias("content"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mtime"),
        F.sha2(F.col("content"), 256).alias("sha256"),
        lang.alias("language"),
    )


def diff_against_state(
    current: DataFrame, state: DataFrame | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S2/U1: (added_or_changed, deleted, unchanged) vs the file_state table.

    Full-outer join on relative_path; hash mismatch → changed. With no
    prior state everything is new (full-index mode, indexer.py:374-393)."""
    if state is None:
        return current, current.limit(0), current.limit(0)
    st = state.select(
        F.col("relative_path").alias("__rp"), F.col("sha256").alias("__old_sha")
    )
    joined = current.join(st, current["relative_path"] == F.col("__rp"), "full_outer")
    changed = joined.filter(
        F.col("__rp").isNull() | (F.col("relative_path").isNotNull() & (F.col("sha256") != F.col("__old_sha")))
    ).drop("__rp", "__old_sha")
    deleted = st.join(
        current, st["__rp"] == current["relative_path"], "left_anti"
    ).select(F.col("__rp").alias("relative_path"))
    unchanged = current.join(
        st,
        (current["relative_path"] == F.col("__rp")) & (current["sha256"] == F.col("__old_sha")),
        "left_semi",
    )
    return changed, deleted, unchanged


def to_file_state(files: DataFrame) -> DataFrame:
    """K4: project the columns persisted in the file_state table."""
    return files.select("relative_path", "sha256", "size", "mtime")
