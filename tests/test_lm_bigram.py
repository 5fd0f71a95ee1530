"""min_count pruning of the bigram-LM count table (verdict r5 item 5):
pruned bigrams must fall back to the unseen probability, never drop from
a document's bigram count — and min_count<=1 must be byte-identical to
the unpruned oracle-checked path.
"""

from __future__ import annotations

from claude_code_memory_spark.queries.textopsq import lm_bigram_doc_scores


def _by_doc(df):
    return {r["doc_id"]: (r["n_bigrams"], r["avg_logp"]) for r in df.collect()}


def test_min_count_1_is_identity(spark, sf_dir):
    base = _by_doc(lm_bigram_doc_scores(spark, sf_dir))
    pruned = _by_doc(lm_bigram_doc_scores(spark, sf_dir, min_count=1))
    assert base == pruned


def test_min_count_preserves_bigram_counts_and_lowers_scores(spark, sf_dir):
    base = _by_doc(lm_bigram_doc_scores(spark, sf_dir))
    pruned = _by_doc(lm_bigram_doc_scores(spark, sf_dir, min_count=3))
    assert set(base) == set(pruned)
    for doc_id, (n, score) in base.items():
        n_p, score_p = pruned[doc_id]
        # a pruned bigram scores as unseen (c2=0), it never disappears
        assert n_p == n, doc_id
        # unseen probability <= smoothed seen probability, so scores
        # can only go down (or stay, for docs with no pruned bigrams)
        assert score_p <= score + 1e-9, doc_id
    # at this corpus size some hapax bigrams must exist, so pruning bites
    assert any(pruned[d][1] < base[d][1] for d in base)
