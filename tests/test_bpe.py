"""Distributed BPE trainer (operators/bpe.py): textbook corpus check,
equivalence with the pure-Python twin, and encoder round-trip."""

from __future__ import annotations

import pytest

from claude_code_memory_spark.operators.bpe import (
    bpe_encode_expr,
    bpe_train,
    bpe_train_local,
    words_to_symbols,
)

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _words_df(spark, counts):
    return spark.createDataFrame(list(counts.items()), "word string, n long")


def test_classic_corpus_merges(spark):
    """Sennrich et al.'s running example: the first merges fuse the
    shared suffixes."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(spark, _words_df(spark, counts), 4)
    assert merges == bpe_train_local(counts, 4)
    assert merges[0][0] == "e s" and merges[0][1] == 9  # newest+widest
    assert merges[1][0] == "es t" and merges[1][1] == 9


def test_distributed_equals_local_twin(spark):
    counts = {
        "banana": 4,
        "bandana": 2,
        "an": 7,
        "nab": 1,
        "aaaaa": 3,  # repeated-symbol run: the documented replace rule
    }
    assert bpe_train(spark, _words_df(spark, counts), 6) == bpe_train_local(
        counts, 6
    )


@given(
    counts=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(1, 4),
)
@settings(max_examples=12, deadline=None)
def test_property_distributed_equals_local(spark, counts, k):
    """The distributed trainer IS the local algorithm, on arbitrary
    corpora including adversarial repeated-symbol words."""
    assert bpe_train(spark, _words_df(spark, counts), k) == bpe_train_local(
        counts, k
    )


def test_encoder_applies_merges(spark):
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(spark, _words_df(spark, counts), 4)
    enc = words_to_symbols(_words_df(spark, counts)).withColumn(
        "enc", bpe_encode_expr(merges)
    )
    got = {r["word"]: r["enc"] for r in enc.collect()}
    # 'newest' after [es, est, est</w>, l o]-style merges contains a fused token
    assert "est</w>" in got["newest"].split(" ") or "est" in got["newest"].split(" ")
    # encoding never changes the underlying characters
    for w, e in got.items():
        assert e.replace(" ", "").replace("</w>", "") == w


def test_merge_budget_exhausts_gracefully(spark):
    counts = {"ab": 1}
    merges = bpe_train(spark, _words_df(spark, counts), 10)
    # 'a b </w>' admits exactly 2 merges before no pairs remain
    assert len(merges) == 2 == len(bpe_train_local(counts, 10))


def test_quote_bearing_symbols_survive(spark):
    """Merge pairs containing quotes must not break the round (the
    replace is built from literals, not interpolated SQL)."""
    counts = {"d'n": 5, "o'er": 3, "d'no": 2}
    merges = bpe_train(spark, _words_df(spark, counts), 3)
    assert merges == bpe_train_local(counts, 3)


def test_bpe_save_load_roundtrip(spark, tmp_path):
    from claude_code_memory_spark.operators.bpe import bpe_load, bpe_save

    counts = {"low": 5, "newest": 6}
    merges = bpe_train(spark, _words_df(spark, counts), 3)
    p = str(tmp_path / "merges.json")
    bpe_save(p, merges)
    assert bpe_load(p) == merges

def test_batched_equals_sequential_on_nonchaining_text(spark):
    """merges_per_round > 1 must reproduce one-at-a-time merges when the
    top pairs don't chain (disjoint symbol sets — the documented exact
    regime). Distinct-alphabet words guarantee non-chaining batches."""
    counts = {"ab": 9, "cd": 7, "ef": 5, "gh": 3}
    seq = bpe_train(spark, _words_df(spark, counts), 4)
    for m in (2, 4):
        assert bpe_train(spark, _words_df(spark, counts), 4, merges_per_round=m) == seq


def test_batched_stops_at_chaining_pair(spark):
    """The greedy batch cuts at the first symbol-sharing pair instead of
    skipping it, so the merge ORDER always matches sequential BPE on the
    selected prefix; a chained corpus therefore still trains correctly,
    just with smaller effective batches."""
    counts = {"aaab": 6, "ab": 4}  # 'a a' and 'a b' share 'a' → chain
    seq = bpe_train_local(counts, 5)
    got = bpe_train(spark, _words_df(spark, counts), 5, merges_per_round=4)
    assert got == seq


def test_select_batch_unit():
    from claude_code_memory_spark.operators.bpe import _select_batch

    ranked = [("a b", 9), ("c d", 8), ("b x", 7), ("e f", 6)]
    # 'b x' chains on 'b' → batch cuts there even though 'e f' is free
    assert _select_batch(ranked, 4) == [("a b", 9), ("c d", 8)]
    assert _select_batch(ranked, 1) == [("a b", 9)]
    assert _select_batch([], 4) == []
