"""Product quantization (operators/quantize.py PQ section): encode
invariants, partition invariance, and ADC top-k recall vs exact search.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.quantize import (
    pq_encode,
    pq_seeded_codebook,
    pq_split,
    pq_topk,
)
from claude_code_memory_spark.operators.similarity import brute_force_topk

DIM, M, KC = 64, 8, 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_pq_split_shapes(emb):
    n = emb.count()
    subs = pq_split(emb, DIM, M)
    assert subs.count() == n * M
    row = subs.first()
    assert len(row["sv"]) == DIM // M
    with pytest.raises(ValueError):
        pq_split(emb, DIM, 7)


def test_pq_encode_invariants(emb):
    cb = pq_seeded_codebook(emb, DIM, M, KC)
    assert cb.count() == M * KC
    codes = pq_encode(emb, cb, DIM, M)
    n = emb.count()
    assert codes.count() == n * M  # one code per (vector, subspace)
    rng = codes.agg(
        F.min("code_id"), F.max("code_id"), F.min("sub_err"), F.max("sub_idx")
    ).first()
    assert 0 <= rng[0] and rng[1] < KC and rng[2] >= 0.0 and rng[3] == M - 1
    # seed vectors reconstruct themselves exactly: error 0 on every subspace
    self_err = codes.filter(F.col("vec_id") < KC).agg(F.max("sub_err")).first()[0]
    assert self_err == 0.0


def test_pq_encode_partition_invariant(emb):
    cb = pq_seeded_codebook(emb, DIM, M, KC)
    c1 = pq_encode(emb, cb, DIM, M).collect()
    c2 = pq_encode(emb.repartition(17, "label"), cb, DIM, M).collect()
    key = lambda r: (r["vec_id"], r["sub_idx"])  # noqa: E731
    assert {key(r): (r["code_id"], r["sub_err"]) for r in c1} == {
        key(r): (r["code_id"], r["sub_err"]) for r in c2
    }


def test_pq_topk_recall_vs_exact(emb):
    """ADC top-10 must recover most of the exact cosine top-10 (the
    corpus is unit-ish random — PQ with 16 codewords is coarse, so the
    bar is recall, not equality)."""
    cb = pq_seeded_codebook(emb, DIM, M, KC)
    codes = pq_encode(emb, cb, DIM, M)
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    approx = {r["vec_id"] for r in pq_topk(codes, cb, [float(x) for x in q], k=30).collect()}
    exact = {
        r["vec_id"]
        for r in brute_force_topk(emb, [float(x) for x in q], k=10, exclude_id=3).collect()
    }
    # the true top-10 by cosine should largely appear in the ADC top-30 by L2
    assert len(exact & approx) >= 5, (sorted(exact), sorted(approx))


def test_pq_topk_exact_for_seed_query(emb):
    """A seed vector's own codes have zero error, so its ADC distance to
    itself is 0 — it must rank itself first."""
    cb = pq_seeded_codebook(emb, DIM, M, KC)
    codes = pq_encode(emb, cb, DIM, M)
    q = emb.filter(F.col("vec_id") == 5).first()["embedding"]
    top = pq_topk(codes, cb, [float(x) for x in q], k=1).first()
    assert top["vec_id"] == 5 and top["approx_d2"] == 0.0


def test_pq_trained_codebook_beats_seeded(emb):
    """Lloyd-trained subspace codebooks must cut average reconstruction
    error vs the seeded (iteration-0) codebook at the same size."""
    from claude_code_memory_spark.operators.quantize import pq_trained_codebook

    def avg_err(cb):
        codes = pq_encode(emb, cb, DIM, M)
        return codes.agg(F.avg("sub_err")).first()[0]

    seeded = avg_err(pq_seeded_codebook(emb, DIM, M, KC))
    trained = avg_err(pq_trained_codebook(emb, DIM, M, KC, iters=2))
    assert trained < seeded, (trained, seeded)


def test_pq_trained_codebook_partition_invariant(emb):
    from claude_code_memory_spark.operators.quantize import pq_trained_codebook

    c1 = pq_trained_codebook(emb, DIM, M, KC, iters=1).collect()
    c2 = pq_trained_codebook(
        emb.repartition(11, "label"), DIM, M, KC, iters=1
    ).collect()
    key = lambda r: (r["sub_idx"], r["code_id"])  # noqa: E731
    assert {key(r): r["cv"] for r in c1} == {key(r): r["cv"] for r in c2}
