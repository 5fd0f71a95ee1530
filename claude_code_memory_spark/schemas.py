"""Engine table schemas (FIXTURES.md; reference data model SURVEY.md §1).

The reference stores row-oriented Python dataclasses (analysis/entities.py:
346-437) in Qdrant; here each abstraction is a columnar table. Non-null
constraints mirror the dataclass __post_init__ validations.
"""

from __future__ import annotations

from pyspark.sql import types as T

ENTITY_TYPES = (
    # analysis/entities.py:10-26 (14 values)
    "project directory file class interface function method variable import "
    "module constant documentation test chat_history"
).split()

RELATION_TYPES = (
    # analysis/entities.py:29-41 (10 values)
    "contains imports inherits calls uses implements extends documents tests references"
).split()

CHUNK_TYPES = ("metadata", "implementation", "relation", "chat_summary", "chat_detail")

SOURCE_FILES = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("relative_path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime", T.TimestampType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("language", T.StringType(), True),
    ]
)

ENTITIES = T.StructType(
    [
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("line_number", T.IntegerType(), True),
        T.StructField("end_line_number", T.IntegerType(), True),
        T.StructField("observations", T.ArrayType(T.StringType()), False),
        T.StructField("signature", T.StringType(), True),
        T.StructField("docstring", T.StringType(), True),
    ]
)

RELATIONS = T.StructType(
    [
        T.StructField("from_entity", T.StringType(), False),
        T.StructField("to_entity", T.StringType(), False),
        T.StructField("relation_type", T.StringType(), False),
        T.StructField("context", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("import_type", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
    ]
)

CHUNKS = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("point_id", T.LongType(), False),
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("chunk_type", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("content_bm25", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("has_implementation", T.BooleanType(), False),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("line_number", T.IntegerType(), True),
        T.StructField("end_line_number", T.IntegerType(), True),
    ]
)

VECTORS = T.StructType(
    [
        T.StructField("point_id", T.LongType(), False),
        T.StructField("dense", T.ArrayType(T.FloatType()), False),
        T.StructField("sparse_indices", T.ArrayType(T.IntegerType()), True),
        T.StructField("sparse_values", T.ArrayType(T.FloatType()), True),
        T.StructField("entity_name", T.StringType(), True),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("chunk_type", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)

FILE_STATE = T.StructType(
    [
        T.StructField("relative_path", T.StringType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),  # created|modified|deleted|moved
        T.StructField("file_path", T.StringType(), False),
        T.StructField("sha256", T.StringType(), True),
    ]
)
