"""Text analysis as pure column expressions.

Reference semantics (SURVEY.md §2.8): BM25 tokenizer (X7,
embeddings/bm25.py:163-175), camelCase/underscore spacing (X4,
entities.py:156-159), complexity scoring (X12, parser.py:1175-1181),
token counting with char/4 fallback (X13, embeddings/base.py:44-94),
plus the training-data-pipeline extensions (language ID, quality score,
fingerprinting) this engine adds as first-class columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.hashing import content_hash


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """X7: lowercase, split on non-alphanumerics, drop tokens of len <= 1.

    Matches the reference tokenizer ``\\b[a-zA-Z0-9]+\\b`` + len>1 filter
    (embeddings/bm25.py:163-175).
    """
    toks = F.split(F.lower(_c(col)), "[^a-z0-9]+")
    return F.filter(toks, lambda t: F.length(t) > 1)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles of a text column (for MinHash/Jaccard).

    The token array is bound once via a single-element `transform` lambda
    (Catalyst does not CSE the tokenize subtree across the size/index/
    element_at consumers — inlining it re-evaluates the regex split up to
    2n times per row, ~1.7x slower end-to-end). Shingles are built by
    index (`element_at` is O(1)); the `when` guard keeps `sequence` from
    producing a descending [1,0,...] range for texts with fewer than n
    tokens — those yield an empty array.

    r12: when ``col`` is a column NAME the identical tree is built as one
    F.expr string (the nested-lambda form costs ~70 py4j round-trips per
    use; the SQL parses JVM-side to the same expressions — guide §7.3)."""
    if isinstance(col, str):
        cw = ", ".join(
            f"element_at(t, i + {k})" if k else "element_at(t, i)" for k in range(n)
        )
        return F.expr(
            f"element_at(transform(array(filter(split(lower({col}), '[^a-z0-9]+'), "
            f"t -> length(t) > 1)), t -> CASE WHEN size(t) >= {n} THEN "
            f"array_distinct(transform(sequence(1, size(t) - {n - 1}), "
            f"i -> concat_ws(' ', {cw}))) "
            f"ELSE cast(array() as array<string>) END), 1)"
        )

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + k) for k in range(n)])
        )
        return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(tokenize(col)), build), 1)


def camel_to_spaced(col: Column | str) -> Column:
    """X4: CamelCase / snake_case name → lowercase spaced words."""
    c = _c(col)
    spaced = F.regexp_replace(c, "([a-z0-9])([A-Z])", r"$1 $2")
    spaced = F.regexp_replace(spaced, "_", " ")
    return F.lower(spaced)


def complexity_score(col: Column | str) -> Column:
    """X12: cyclomatic-ish complexity = 1 + count of control keywords.

    Reference counts if/elif/else/for/while/try/except/with/and/or/case
    occurrences (parser.py:1175-1181, observation_extractor.py:737-759).
    """
    c = _c(col)
    kw = r"\b(if|elif|else|for|while|try|except|with|and|or|case)\b"
    return (F.lit(1) + F.size(F.regexp_extract_all(c, F.lit(kw), 0))).alias("complexity")


def approx_token_count(col: Column | str) -> Column:
    """X13 fallback path: ceil(len/4) approximate LLM token count."""
    return F.ceil(F.length(_c(col)) / F.lit(4.0)).cast("long")


def exact_token_count_udf():
    """X13 exact path: Arrow-batched token counter that uses tiktoken's
    cl100k_base when the library is importable on the worker (reference
    TiktokenMixin, embeddings/base.py:44-94) and the reference's
    max(1, len//4) character fallback otherwise. Scalar-iterator form:
    the encoder is built once per worker task, rows stream through in
    Arrow batches — one pandas_udf stage, no per-row Python round trip."""
    from collections.abc import Iterator

    import pandas as pd  # noqa: F401 (resolves the UDF type hints)
    from pyspark.sql.functions import pandas_udf

    def count_tokens(batches):
        try:
            import tiktoken

            enc = tiktoken.get_encoding("cl100k_base")
        except Exception:
            enc = None
        for s in batches:
            if enc is not None:
                yield s.fillna("").map(lambda t: max(1, len(enc.encode(t))))
            else:
                yield s.fillna("").map(lambda t: max(1, len(t) // 4))

    count_tokens.__annotations__ = {
        "batches": Iterator[pd.Series], "return": Iterator[pd.Series]
    }
    return pandas_udf(count_tokens, "long")


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: words, numbers, and punctuation runs each count."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return F.size(F.regexp_extract_all(_c(col), F.lit(pat), 0)).cast("long")


def whitespace_token_count(col: Column | str) -> Column:
    toks = F.filter(F.split(_c(col), r"\s+"), lambda t: F.length(t) > 0)
    return F.size(toks).cast("long")


# --- training-data quality / language heuristics -------------------------

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "que", "pour"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im"],
}


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = tokenize(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def language_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-overlap score per language — argmax gives the language ID."""
    return {lang: stopword_ratio(col, lang) for lang in STOPWORDS}


def detect_language(col: Column | str, default: str = "und") -> Column:
    """Heuristic language ID: language with max stopword ratio, ties broken
    by language code ascending; 'und' when no stopwords hit at all.

    r12 (guide §1.2 per-task work): the token array and the ranked-max
    struct are each bound ONCE via the transform-over-one-element-array
    trick (the `word_shingles` pattern) instead of re-tokenizing the
    text per language — the old tree evaluated `tokenize` 4x and the
    argmax 2x per row in interpreted HOF evaluation (no codegen CSE
    there), measured ~2x of this whole operator. The per-language
    ratio, the (score, tie, lang) struct ordering, and the final
    when/otherwise are node-for-node the old expressions over the same
    values, so results are identical (the language-ID oracles pin it)."""

    def _ratio(toks: Column, lang: str) -> Column:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")

    def _best(toks: Column) -> Column:
        # struct max compares fields in order: score first, then the
        # negated alphabetical rank — ties break to the smaller code.
        ranked = F.array(
            *[
                F.struct(
                    _ratio(toks, lang).alias("score"),
                    F.lit(-i).alias("tie"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(sorted(STOPWORDS))
            ]
        )
        return F.array_max(ranked)

    return F.element_at(
        F.transform(
            F.array(tokenize(col)),
            lambda toks: F.element_at(
                F.transform(
                    F.array(_best(toks)),
                    lambda b: F.when(b["score"] > 0, b["lang"]).otherwise(
                        F.lit(default)
                    ),
                ),
                1,
            ),
        ),
        1,
    )


def punctuation_ratio(col: Column | str) -> Column:
    c = _c(col)
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    return punct / F.greatest(F.length(c), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length, punctuation, stopword signals.

    Mirrors standard pretraining-corpus heuristics (C4/Gopher-style):
    reasonable length, some stopwords, not punctuation-soup.
    """
    c = _c(col)
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(c, "en")
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - punctuation_ratio(c) * 5.0, F.lit(0.0))
    q = len_score * 0.4 + sw_score * 0.3 + punct_penalty * 0.3
    # floor(x*1e6+0.5)/1e6 instead of round(): the components are often
    # terminating decimals, so the true value can sit exactly on a round-6
    # midpoint where Spark's and DuckDB's round() disagree; floor of the
    # bit-identical double is deterministic in both engines.
    return (F.floor(q * 1e6 + 0.5) / 1e6).alias("quality")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token multiset.

    Order-insensitive → catches shuffled/near-identical boilerplate that
    exact content hashing misses."""
    toks = F.array_sort(F.array_distinct(tokenize(col)))
    return F.md5(F.concat_ws(" ", toks))


def weighted_content(name: Column | str, observations: Column | str) -> Column:
    """X5: field-weighted content assembly — entity name repeated 3×, first
    observation 2×, the rest 1× (reference entities.py:99-119)."""
    n, obs = _c(name), _c(observations)
    first = F.coalesce(F.element_at(obs, 1), F.lit(""))
    rest = F.concat_ws(" ", F.slice(obs, 2, F.greatest(F.size(obs) - 1, F.lit(0))))
    return F.concat_ws(
        " ",
        F.concat_ws(" ", F.array_repeat(n, 3)),
        F.concat_ws(" ", F.array_repeat(first, 2)),
        rest,
    )


def normalized_fingerprint_hash(col: Column | str) -> Column:
    """Exact-dedup key: sha256 of whitespace-normalized lowercase text."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))
    return content_hash(norm)


# --- PII redaction (training-data scrubbing) ------------------------------

# Patterns chosen to evaluate identically under Java regex (Spark) and RE2
# (DuckDB): plain character classes, bounded quantifiers, \b anchors — no
# backreferences or lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


def redact_pii(col: Column | str) -> Column:
    """Replace emails/IPv4s/phone numbers with typed placeholder tokens —
    the standard pre-training scrub. Order matters: emails first (an
    email can contain digit runs a phone pattern would shred)."""
    c = _c(col)
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4, "<IP>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    return c


# --- C4-style line filtering ----------------------------------------------


def c4_keep_lines(col: Column | str) -> Column:
    """C4/Gopher-style line filter: keep lines with >= 3 words that end in
    terminal punctuation and are not boilerplate (javascript / cookie /
    lorem ipsum markers). Pure array algebra over split lines — stays in
    codegen, no UDF, and the same lambda runs in DuckDB's list_filter for
    the oracle."""
    lines = F.split(_c(col), "\n")

    def keep(line):
        words = F.size(F.split(F.trim(line), " "))
        ends_ok = line.rlike('[.!?"]\\s*$')
        boiler = F.lower(line).rlike("javascript|cookie|lorem ipsum")
        return (words >= 3) & ends_ok & ~boiler

    return F.array_join(F.filter(lines, keep), "\n")
