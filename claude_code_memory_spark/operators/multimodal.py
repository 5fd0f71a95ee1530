"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas functions.

The decode step itself is STUBBED (no image/audio libraries in this
container — see `decode_image_stub`): it raises NotImplementedError unless
`fake=True`, in which case it produces a deterministic fake decode so the
Spark-side plumbing (schema, batching, partitioning) is real and tested.

At 100 TB: binary payloads ride in their own column so column pruning
keeps metadata-only queries from ever reading the bytes; processing is
`mapInPandas` (one Arrow batch of binaries at a time — bounded memory),
and `spark.sql.files.maxPartitionBytes` bounds the per-task byte volume.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for testing the plumbing."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8  # 256 bytes
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}", payload, 64, 48, 1000 * (i + 1)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_stub(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decoding needs Pillow/libvips (not installed). With
    fake=True returns a deterministic pseudo-image seeded by the payload
    hash, so downstream feature extraction is testable."""
    if not fake:
        raise NotImplementedError("image decoding requires Pillow — not in this container")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)


def image_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Per-image feature extraction via mapInPandas: mean channel values +
    a 16-byte perceptual-hash-style digest of the decoded array."""
    out_schema = (
        "media_id long, n_bytes long, mean_r double, mean_g double, mean_b double, phash string"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image_stub(bytes(payload), fake=fake_decode)
                means = arr.reshape(-1, 3).mean(axis=0)
                small = arr[::8, ::8].mean(axis=2)
                bits = (small > small.mean()).flatten()
                phash = hashlib.md5(np.packbits(bits).tobytes()).hexdigest()[:16]
                recs.append(
                    (
                        int(mid),
                        len(payload),
                        round(float(means[0]), 4),
                        round(float(means[1]), 4),
                        round(float(means[2]), 4),
                        phash,
                    )
                )
            yield pd.DataFrame(
                recs, columns=["media_id", "n_bytes", "mean_r", "mean_g", "mean_b", "phash"]
            )

    return media.mapInPandas(extract, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video row into the frame
    timestamps a decoder would extract (the decode itself is stubbed).
    Shows the explode-side plumbing: one row per (media_id, frame_ts)."""
    frames = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Demonstrates column pruning: payload is never read (check
    `.explain('formatted')` ReadSchema excludes `payload`)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce(F.col("duration_ms"), F.lit(0))).alias("total_duration_ms"),
    )
