"""Distributed BPE tokenizer training — byte-pair-encoding merges
(Sennrich et al. 2016) learned as iterative DataFrame algebra.

The key scale observation (same as every published BPE trainer): after
the first pass the corpus never participates again — training runs on
the WORD-FREQUENCY table (vocabulary-sized, Zipf-bounded), not the
corpus. The one corpus-sized stage is the initial tokenize + word
count, which is the `token_frequency_top50` aggregate shape: map-side
combined, shuffle carries one row per distinct word per partition.

Each merge round over the vocab table:
  1. adjacent symbol pairs per word, weighted by word frequency
     (a generated `transform` over the symbol array — no UDF);
  2. the argmax pair by (total weight desc, pair asc) — a 1-row
     aggregate, broadcast back;
  3. leftmost-non-overlapping replace of that pair in every word's
     symbol string (JVM `replace`).

Words are represented as space-joined symbol strings with an
end-of-word marker (the classic formulation), so `replace(' a b ',
...)` respects symbol boundaries. Merge semantics caveat: leftmost-
NON-OVERLAPPING replace differs from the reuse-greedy scan of
reference BPE only inside runs of one repeated symbol ('a a a a a'
merges as [aa, a, aa] instead of [aa, aa, a]) — irrelevant for natural-
language pair statistics, and the trainer, the encoder expression, and
the local twin all share the exact same rule. Every round's argmax is
deterministic (integer weights, lexicographic tie-break), making the
whole merge sequence partition-order-invariant — pinned against a
pure-Python reference implementation (`bpe_train_local`, the property-
test twin) on arbitrary corpora.

At 100 TB: round cost is O(|vocab|) with a vocab-keyed shuffle per
round; the vocab table is persisted once and each round's plan is a
broadcast of one 1-row frame onto it — the pagerank/Lloyd iteration
shape (edges never move, the rank vector does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"


def words_to_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """word → space-joined character symbols + end-of-word marker:
    'low' → 'l o w </w>'."""
    sym = F.concat_ws(
        " ",
        F.concat(
            F.split(F.col(word_col), ""),  # chars (Spark split on '' = chars)
            F.array(F.lit(EOW)),
        ),
    )
    return words.withColumn("syms", sym)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol strings."""
    # zip the symbol list against its own tail (slice handles the
    # fully-merged single-symbol word: slice(l, 1, 0) = [] — a
    # sequence(1, size-1) formulation would COUNT DOWN there)
    pairs = F.expr(
        "zip_with("
        "slice(split(syms, ' '), 1, size(split(syms, ' ')) - 1), "
        "slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1), "
        "(a, b) -> concat(a, ' ', b))"
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), F.col("n"))
        .groupBy("pair")
        .agg(F.sum("n").alias("w"))
    )


def _select_batch(
    ranked: list[tuple[str, int]], max_batch: int
) -> list[tuple[str, int]]:
    """Greedy prefix of the ranked pair list whose pairs share no
    symbols: merging one such pair cannot create, destroy, or re-weight
    instances of another, so applying the whole batch in one pass equals
    applying each sequentially with a recount in between — except that a
    pair CREATED by an earlier merge (containing the new merged symbol)
    could, in true one-at-a-time BPE, outrank a later batch member. The
    selection stops at the first chaining pair, bounding that deviation
    to chained text (see bpe_train's merges_per_round note)."""
    used: set[str] = set()
    batch: list[tuple[str, int]] = []
    for pair, w in ranked:
        a, b = pair.split(" ")
        if a in used or b in used:
            break  # stop, don't skip: skipping would reorder the merge list
        batch.append((pair, w))
        used.update((a, b))
        if len(batch) >= max_batch:
            break
    return batch


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    num_merges: int,
    *,
    word_col: str = "word",
    count_col: str = "n",
    merges_per_round: int = 1,
) -> list[tuple[str, int]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    Returns [(merged_pair, weight)] in merge order, e.g.
    [('e s', 120), ('es t', 97), ...]. The vocab table is persisted
    once; each round runs one vocab-sized aggregate + a driver fetch of
    the top rows (the same per-round scalar action as Lloyd's centroid
    collect).

    ``merges_per_round`` batches the driver round-trips: each Spark job
    takes up to that many top pairs whose symbols are pairwise disjoint
    (a greedy prefix of the ranked list, cut at the first chaining
    pair) and applies them in one chained replace. Disjoint-symbol
    merges commute, so a batch equals one-at-a-time merges EXCEPT when
    a merge creates a new pair that true sequential BPE would have
    ranked above a later batch member — impossible on text where pairs
    don't chain (test-pinned), and the standard throughput trade in
    fast BPE trainers otherwise. With the default 1 the trainer is
    textbook-exact; a production 30k-merge vocabulary at
    merges_per_round=64 costs ~500 Spark jobs instead of 30k, turning
    a scheduling-bound loop into a data-bound one."""
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    vocab = (
        words_to_symbols(
            words.select(F.col(word_col), F.col(count_col).alias("n")), word_col
        )
        .select("syms", "n")
        .persist()
    )
    vocab.count()
    merges: list[tuple[str, int]] = []
    while len(merges) < num_merges:
        want = min(merges_per_round, num_merges - len(merges))
        # over-fetch: the greedy disjoint filter may cut the prefix early
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("w"), F.asc("pair"))
            .limit(max(want * 4, want))
            .collect()
        )
        ranked = [(r["pair"], int(r["w"])) for r in top if int(r["w"]) > 0]
        batch = _select_batch(ranked, want)
        if not batch:
            break
        merges.extend(batch)
        # pad with spaces so boundary symbols match whole symbols.
        # F.lit (not an interpolated F.expr string): corpus symbols
        # can contain quotes/backslashes — "d'n" would otherwise
        # break the round's SQL
        expr = F.concat(F.lit(" "), F.col("syms"), F.lit(" "))
        for pair, _w in batch:
            expr = F.replace(expr, F.lit(f" {pair} "), F.lit(f" {pair.replace(' ', '')} "))
        nxt = vocab.withColumn("syms", F.trim(expr)).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def bpe_train_local(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, int]]:
    """Pure-Python reference with identical semantics (argmax by weight
    then lexicographic pair; leftmost-non-overlapping merge) — the
    property-test twin proving the distributed trainer computes
    textbook BPE."""
    vocab = {
        " ".join(list(w) + [EOW]): n for w, n in word_counts.items()
    }
    merges: list[tuple[str, int]] = []
    for _ in range(num_merges):
        counts: dict[str, int] = {}
        for syms, n in vocab.items():
            parts = syms.split(" ")
            for a, b in zip(parts, parts[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + n
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((pair, counts[pair]))
        merged = pair.replace(" ", "")
        new_vocab: dict[str, int] = {}
        for syms, n in vocab.items():
            s = f" {syms} ".replace(f" {pair} ", f" {merged} ").strip()
            new_vocab[s] = new_vocab.get(s, 0) + n
        vocab = new_vocab
    return merges


def bpe_encode_expr(merges: list[tuple[str, int]], col: str = "syms"):
    """Column expression applying a learned merge list to a space-joined
    symbol string — chained JVM replaces, no UDF; usable to tokenize a
    corpus with the trained vocabulary in one narrow pass."""
    expr = F.concat(F.lit(" "), F.col(col), F.lit(" "))
    for pair, _w in merges:
        merged = pair.replace(" ", "")
        expr = F.replace(expr, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return F.trim(expr)


def bpe_save(path: str, merges: list[tuple[str, int]]) -> None:
    """Persist a learned merge list (atomic tmp+rename) — the trained
    tokenizer artifact `bpe_encode_expr` replays at serving time."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump([[p, w] for p, w in merges], fh)
    os.replace(tmp, path)


def bpe_load(path: str) -> list[tuple[str, int]]:
    import json

    with open(path) as fh:
        return [(p, int(w)) for p, w in json.load(fh)]
