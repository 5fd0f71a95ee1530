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


#: The Gopher paper's "must contain 2 of" word list (Rae et al. 2021,
#: public). Matched case-insensitively against whitespace tokens.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher repetition/quality document filter as one narrow projection.

    Implements the public rule set from the Gopher paper (Rae et al. 2021
    §A1.1.1) — word-count bounds, mean word length in [3, 10], symbol-to-
    word ratio (``#``/``...``) < 0.1, < 90% of lines bullet-led, < 30% of
    lines ellipsis-terminated, ≥ 80% of words containing an alphabetic
    character, ≥ 2 of the eight required stopwords. Pure column algebra:
    no shuffle, no UDF, composes with the corpus scan at any scale.
    Counterpart of the reference's progressive-disclosure content gating
    (plans/chunks gating) applied corpus-wide.
    """
    words = F.expr(f"filter(split({text_col}, '\\\\s+'), w -> length(w) > 0)")
    lines = F.expr(f"filter(split({text_col}, '\\n'), l -> length(trim(l)) > 0)")
    required = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    n_words = F.size(words)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_wl = F.expr(
        f"aggregate(filter(split({text_col}, '\\\\s+'), w -> length(w) > 0),"
        " 0L, (a, w) -> a + length(w))"
    ) / F.greatest(n_words, F.lit(1)).cast("double")
    symbol_ratio = (
        F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\.")).cast("double")
        / F.greatest(n_words, F.lit(1))
    )
    bullet_ratio = F.size(
        F.expr(f"filter(split({text_col}, '\\n'), l -> trim(l) rlike '^[-*•]')")
    ).cast("double") / n_lines
    ellipsis_ratio = F.size(
        F.expr(f"filter(split({text_col}, '\\n'), l -> trim(l) rlike '\\\\.\\\\.\\\\.$')")
    ).cast("double") / n_lines
    alpha_ratio = F.size(
        F.expr(f"filter(split({text_col}, '\\\\s+'), w -> w rlike '[A-Za-z]')")
    ).cast("double") / F.greatest(n_words, F.lit(1))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")),
            required,
        )
    )
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "ok_symbol_ratio": symbol_ratio < 0.1,
        "ok_bullet_lines": bullet_ratio < 0.9,
        "ok_ellipsis_lines": ellipsis_ratio < 0.3,
        "ok_alpha_words": alpha_ratio >= 0.8,
        "ok_stop_words": stop_hits >= 2,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    return docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.cast("long").alias("required_word_hits"),
        *[c.alias(n) for n, c in flags.items()],
        passes.alias("passes_gopher"),
    )
