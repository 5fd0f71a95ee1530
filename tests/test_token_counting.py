"""X13 token counting: tiktoken-when-available with the reference's
char/4 fallback (embeddings/base.py:44-94)."""

import pytest

from claude_code_memory_spark.functions.text import exact_token_count_udf
from claude_code_memory_spark.sources.markdown_parser import approx_tokens


def _tiktoken_available():
    try:
        import tiktoken  # noqa: F401

        return True
    except ImportError:
        return False


def test_markdown_counter_fallback_contract():
    if _tiktoken_available():
        import tiktoken

        enc = tiktoken.get_encoding("cl100k_base")
        assert approx_tokens("hello world") == max(1, len(enc.encode("hello world")))
    else:
        assert approx_tokens("x" * 10) == 3  # ceil(10/4)
        assert approx_tokens("") == 1


def test_exact_token_count_udf(spark):
    df = spark.createDataFrame(
        [(1, "hello world, this is a test"), (2, "xy"), (3, None)],
        "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select(
        "id", exact_token_count_udf()("text").alias("n")
    ).collect()}
    if _tiktoken_available():
        import tiktoken

        enc = tiktoken.get_encoding("cl100k_base")
        assert out[1] == len(enc.encode("hello world, this is a test"))
    else:
        assert out[1] == len("hello world, this is a test") // 4
    assert out[2] == 1  # max(1, ...) floor
    assert out[3] == 1  # null-safe


@pytest.mark.skipif(_tiktoken_available(), reason="fallback-only check")
def test_fallback_matches_reference_formula(spark):
    texts = ["a", "abcd", "abcdefgh", "abc def ghi jkl"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["n"] for r in df.select(exact_token_count_udf()("text").alias("n")).collect()]
    assert got == [max(1, len(t) // 4) for t in texts]
