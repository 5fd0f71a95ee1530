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


def decode_audio_stub(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a mono float32 waveform in [-1, 1].

    STUB: real decoding needs soundfile/ffmpeg (not installed). With
    fake=True returns a deterministic pseudo-waveform seeded by the
    payload hash (1600 samples ≈ 100 ms @ 16 kHz), so the feature stage
    is testable."""
    if not fake:
        raise NotImplementedError("audio decoding requires soundfile/ffmpeg — not in this container")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(1600) * 0.25).clip(-1, 1).astype(np.float32)


def audio_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Per-clip audio features via mapInPandas: RMS level, peak, and
    zero-crossing rate — the standard cheap quality/silence signals a
    training pipeline filters on before paying for transcription."""
    out_schema = "media_id long, n_samples long, rms double, peak double, zcr double"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wave = decode_audio_stub(bytes(payload), fake=fake_decode)
                rms = float(np.sqrt(np.mean(wave**2)))
                peak = float(np.abs(wave).max())
                zcr = float(np.mean(np.signbit(wave[:-1]) != np.signbit(wave[1:])))
                recs.append((int(mid), len(wave), round(rms, 6), round(peak, 6), round(zcr, 6)))
            yield pd.DataFrame(recs, columns=["media_id", "n_samples", "rms", "peak", "zcr"])

    return media.mapInPandas(extract, schema=out_schema)


def resize_images(
    media: DataFrame, *, width: int = 32, height: int = 24, fake_decode: bool = True
) -> DataFrame:
    """Schema-preserving image resize: payload bytes in → re-encoded
    payload bytes out with updated width/height metadata. The decode and
    re-encode are the stubbed steps (a real deployment swaps in
    Pillow.thumbnail); the batching, binary round trip, and metadata
    update are the real Spark plumbing. Non-image rows pass through
    untouched — the stage composes with mixed media tables."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            for idx in pdf.index[pdf["kind"] == "image"]:
                arr = decode_image_stub(bytes(pdf.at[idx, "payload"]), fake=fake_decode)
                ys = np.linspace(0, arr.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, arr.shape[1] - 1, width).astype(int)
                small = arr[np.ix_(ys, xs)]
                pdf.at[idx, "payload"] = small.tobytes()  # stub re-encode: raw RGB
                pdf.at[idx, "width"] = width
                pdf.at[idx, "height"] = height
            yield pdf

    return media.mapInPandas(resize, schema=media.schema)


def phash_near_dup(media: DataFrame, *, bands: int = 4, fake_decode: bool = True) -> DataFrame:
    """Image near-duplicate candidates by banded perceptual hash — the
    multimodal twin of MinHash-LSH text dedup (operators/dedup.py):
    split the 64-bit phash into ``bands`` sub-keys, self-join per band,
    emit distinct candidate pairs. Identical/near-identical images share
    all/most bands; the band join prunes the O(n²) pair space to
    per-bucket pairs, which is the 100 TB-safe formulation."""
    feats = image_features(media, fake_decode=fake_decode).select("media_id", "phash")
    # phash is 16 hex chars; spread any remainder across the bands so every
    # nibble lands in exactly one band (16 // bands alone would orphan the
    # tail nibbles when bands doesn't divide 16, silently losing recall)
    bounds = [i * 16 // bands for i in range(bands + 1)]
    banded = feats.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}:"),
                        F.substring(
                            F.col("phash"), bounds[b] + 1, bounds[b + 1] - bounds[b]
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("left_id"), F.col("b.media_id").alias("right_id")
        )
        .distinct()
    )


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Demonstrates column pruning: payload is never read (check
    `.explain('formatted')` ReadSchema excludes `payload`)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce(F.col("duration_ms"), F.lit(0))).alias("total_duration_ms"),
    )
