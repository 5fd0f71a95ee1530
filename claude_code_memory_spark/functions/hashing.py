"""Deterministic content hashing and point-id derivation.

Reference semantics (SURVEY.md §2.8):
- X1  SHA256 content hash            — reference storage/qdrant.py:55-58
- X2  64-bit point id from hash      — reference storage/qdrant.py:1423-1430
       ``int(sha256(content)[:16], 16)`` — we reproduce the exact value
       (two's-complement wrapped into a signed BIGINT).
- X3  MD5 8-char chunk-id suffix     — reference analysis/entities.py:121-127

All pure column expressions → whole-stage codegen, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_hash(col: Column | str) -> Column:
    """X1: sha256 hex digest of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def point_id(col: Column | str) -> Column:
    """X2: deterministic signed 64-bit id = int(sha256(content)[:16], 16).

    ``conv(hex, 16, 10)`` yields the unsigned decimal string; casting the
    full 16-hex-digit value straight to LONG would overflow for values
    ≥ 2^63, so we split high/low 8 hex digits and recombine with wrapping
    arithmetic — bit-exact with Python's two's-complement interpretation.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.sha2(c, 256)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")  # 32 bits, no overflow
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # Two's-complement fold done overflow-free (Spark 4 runs ANSI mode by
    # default, so a plain hi*2^32 would raise on values ≥ 2^63).
    two32 = F.lit(4294967296).cast("long")
    signed_hi = F.when(hi >= F.lit(2147483648), hi - two32).otherwise(hi)
    return (signed_hi * two32 + lo).alias("point_id")


def md5_8(col: Column | str) -> Column:
    """X3: first 8 hex chars of md5 — chunk-id collision suffix."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c), 1, 8)


def pseudonymize(col: Column | str, salt: str) -> Column:
    """Deterministic salted pseudonym: SHA-256 over salt || value.

    Join-preserving privacy for identifier columns — the same input maps
    to the same pseudonym on every table and every run (so user-keyed
    joins, sessionization, and retention still work), while the original
    id never leaves the cluster. The salt must be managed as a secret:
    with it, pseudonyms are re-linkable by design (GDPR pseudonymization,
    not anonymization). Pure column expression; DuckDB's sha256 replays
    it, so pseudonymized pipelines stay oracle-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(salt), c.cast("string")), 256)
