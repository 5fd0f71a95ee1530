"""Unit tests: hashing, vector math, text functions."""

import hashlib
import math

from pyspark.sql import functions as F

from claude_code_memory_spark.functions.hashing import content_hash, md5_8, point_id
from claude_code_memory_spark.functions.text import (
    complexity_score,
    detect_language,
    tokenize,
    word_shingles,
)
from claude_code_memory_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    sparse_dot,
    vector_lit,
)


def test_point_id_matches_reference_semantics(spark):
    # reference storage/qdrant.py:1423-1430: int(sha256(content)[:16], 16)
    texts = ["hello", "world", "Claude-code-memory", ""]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {r["s"]: r["pid"] for r in df.select("s", point_id("s").alias("pid")).collect()}
    for t in texts:
        expected = int(hashlib.sha256(t.encode()).hexdigest()[:16], 16)
        if expected >= 1 << 63:
            expected -= 1 << 64
        assert got[t] == expected, t


def test_content_hash_and_md5_8(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    row = df.select(content_hash("s").alias("h"), md5_8("s").alias("m")).collect()[0]
    assert row["h"] == hashlib.sha256(b"abc").hexdigest()
    assert row["m"] == hashlib.md5(b"abc").hexdigest()[:8]


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 4.0, 4.0])], "a array<double>, b array<double>")
    row = df.select(
        dot("a", "b").alias("dot"),
        l2_norm("a").alias("norm"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    assert row["dot"] == 18.0
    assert row["norm"] == 3.0
    assert abs(row["cos"] - 1.0) < 1e-12

    n = df.select(l2_normalize("a").alias("n")).collect()[0]["n"]
    assert abs(math.fsum(x * x for x in n) - 1.0) < 1e-12


def test_sparse_dot(spark):
    df = spark.createDataFrame(
        [([1, 3, 7], [1.0, 2.0, 3.0], [3, 7, 9], [10.0, 5.0, 1.0])],
        "ia array<int>, va array<double>, ib array<int>, vb array<double>",
    )
    row = df.select(sparse_dot("ia", "va", "ib", "vb").alias("d")).collect()[0]
    assert row["d"] == 2.0 * 10.0 + 3.0 * 5.0


def test_tokenize_and_shingles(spark):
    df = spark.createDataFrame([("The quick-brown fox, a 1x speedster!",)], "t string")
    toks = df.select(tokenize("t").alias("x")).collect()[0]["x"]
    assert toks == ["the", "quick", "brown", "fox", "1x", "speedster"]
    sh = df.select(word_shingles("t", 3).alias("x")).collect()[0]["x"]
    assert "the quick brown" in sh and len(sh) == 4


def test_complexity_and_language(spark):
    df = spark.createDataFrame(
        [("if x and y: pass else for while", "the cat and the dog of it")],
        "code string, en string",
    )
    row = df.select(
        complexity_score("code").alias("c"), detect_language("en").alias("lang")
    ).collect()[0]
    assert row["c"] == 1 + 5  # if, and, else, for, while
    assert row["lang"] == "en"


def test_redact_pii(spark):
    from claude_code_memory_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            ("mail alice.smith+dev@sub.example.co.uk now",),
            ("server at 192.168.1.254 responded",),
            ("call 555-867-5309 or +01 555 123 4567",),
            ("no pii here",),
            (None,),
        ],
        ["t"],
    )
    out = [r[0] for r in df.select(redact_pii("t")).collect()]
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "server at <IP> responded"
    assert "<PHONE>" in out[2] and "555-867" not in out[2]
    assert out[3] == "no pii here"
    assert out[4] is None


def test_c4_keep_lines(spark):
    from claude_code_memory_spark.functions.text import c4_keep_lines

    text = "\n".join(
        [
            "This line is a proper sentence.",   # kept
            "too short.",                         # dropped: < 3 words
            "no terminal punctuation here",       # dropped: no ./!/?
            'He said "stop".',                    # kept
            "Enable javascript to view this page.",  # dropped: boilerplate
            "Accept our cookie policy please.",   # dropped: boilerplate
        ]
    )
    df = spark.createDataFrame([(text,), ("",)], ["t"])
    out = [r[0] for r in df.select(c4_keep_lines("t")).collect()]
    assert out[0] == 'This line is a proper sentence.\nHe said "stop".'
    assert out[1] == ""
