"""Chat JSONL source + sessionization + summarizer stage.

Reference semantics:
- S11 ChatParser.parse_jsonl (chat/parser.py:78-304): conversation
  metadata (duration :47-50, inactivity completion ≥1h :52-56), language
  detection (:253-271)
- ST8 session windows by inactivity (chat/parser.py:272-288)
- UD7 LLM summarizer (chat/summarizer.py:55-404): GPT-backed category +
  observations — here a deterministic keyword-scoring stage with the same
  output schema (category taxonomy from chat/html_report.py:867-930); the
  real LLM call slots in as a scalar-iterator pandas UDF.

Spark-first: JSONL is native `spark.read.json`; sessionization is the
shared lag/cumsum operator; categorization is explode+join+max_by — all
shuffles on small keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.text import detect_language, tokenize
from claude_code_memory_spark.operators.sessions import sessionize

CHAT_SCHEMA = "chat_id string, ts timestamp, role string, content string"

# category taxonomy (chat/html_report.py:867-930)
CATEGORY_KEYWORDS = {
    "debugging": ["error", "bug", "fix", "traceback", "crash", "fail"],
    "implementation": ["implement", "add", "create", "build", "feature", "write"],
    "refactoring": ["refactor", "clean", "rename", "simplify", "restructure"],
    "architecture": ["design", "architecture", "pattern", "structure", "schema"],
    "documentation": ["document", "readme", "docstring", "comment", "explain"],
}


def read_chat_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CHAT_SCHEMA).json(path)


def conversations(messages: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Messages → one row per conversation: a chat splits into a new
    conversation after ≥1h inactivity; carries duration, counts, text."""
    with_ts = messages.withColumn("ts_sec", F.col("ts").cast("double"))
    s = sessionize(with_ts, gap_seconds, user_col="chat_id", ts_col="ts_sec")
    return s.groupBy("chat_id", "session_id").agg(
        F.count("*").alias("n_messages"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.round(F.max("ts_sec") - F.min("ts_sec"), 3).alias("duration_sec"),
        F.min("ts").alias("started_at"),
        F.concat_ws("\n", F.collect_list("content")).alias("full_text"),
    )


def categorize(convs: DataFrame, *, text_col: str = "full_text") -> DataFrame:
    """UD7 stub: keyword-count category scoring + argmax (A8), plus
    language detection — same output columns as the LLM summarizer."""
    def kw_matcher(kws: tuple[str, ...]):
        # single-arg closure (PySpark derives HOF arity from the signature)
        return lambda t: t.isin(*kws)

    scores = [
        F.size(F.filter(tokenize(text_col), kw_matcher(tuple(kws)))).alias(f"score_{cat}")
        for cat, kws in CATEGORY_KEYWORDS.items()
    ]
    scored = convs.select("*", *scores)
    ranked = F.array(
        *[
            F.struct(
                F.col(f"score_{cat}").alias("score"),
                F.lit(-i).alias("tie"),
                F.lit(cat).alias("cat"),
            )
            for i, cat in enumerate(sorted(CATEGORY_KEYWORDS))
        ]
    )
    best = F.array_max(ranked)
    return scored.withColumn(
        "category", F.when(best["score"] > 0, best["cat"]).otherwise(F.lit("general"))
    ).withColumn("language", detect_language(F.col(text_col)))


def chat_chunks(convs: DataFrame) -> DataFrame:
    """ChatChunk rows (entities.py:309-343): chat::{id}::chat_summary with
    deterministic point ids — ready for the vectors table."""
    from claude_code_memory_spark.functions.hashing import content_hash, point_id

    chunk_id = F.concat_ws(
        "::", F.lit("chat"), F.col("chat_id"), F.col("session_id").cast("string"),
        F.lit("chat_summary"),
    )
    summary = F.concat_ws(
        " | ",
        F.col("category"),
        F.col("language"),
        F.substring(F.col("full_text"), 1, 400),
    )
    return convs.select(
        chunk_id.alias("chunk_id"),
        point_id(chunk_id).alias("point_id"),
        F.col("chat_id").alias("entity_name"),
        F.lit("chat_history").alias("entity_type"),
        F.lit("chat_summary").alias("chunk_type"),
        summary.alias("content"),
        F.lit(None).cast("string").alias("content_bm25"),
        content_hash(summary).alias("content_hash"),
        F.lit(False).alias("has_implementation"),
        F.lit(None).cast("string").alias("file_path"),
        F.lit(None).cast("int").alias("line_number"),
        F.lit(None).cast("int").alias("end_line_number"),
    )
