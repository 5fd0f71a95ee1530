"""Document-level text-analysis pipelines (training-data prep surface).

DataFrame-level wrappers over functions/text.py: language ID, quality
scoring, token counting, fingerprinting — each a single narrow projection
(no shuffle, fully codegen'd) so they compose with scans at 100 TB for
free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.text import (
    approx_token_count,
    detect_language,
    fingerprint,
    punctuation_ratio,
    quality_score,
    regex_token_count,
    stopword_ratio,
    whitespace_token_count,
)


def language_id(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        id_col,
        detect_language(text_col).alias("pred_lang"),
        F.round(stopword_ratio(text_col, "en"), 6).alias("en_stopword_ratio"),
    )


def quality_scores(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        id_col,
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(punctuation_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col, "en"), 6).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
    )


def token_counts(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        id_col,
        whitespace_token_count(text_col).alias("ws_tokens"),
        regex_token_count(text_col).alias("bpe_ish_tokens"),
        approx_token_count(text_col).alias("approx_llm_tokens"),
    )


def fingerprints(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(id_col, fingerprint(text_col).alias("fingerprint"))
