"""Deduplication operators for training-data pipelines.

Extends the reference's exact content-hash dedup (J6,
processing/content_processor.py:45-61) with the near-duplicate family a
100 TB corpus needs: n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. All deterministic (md5-derived hash families)
so results are bit-reproducible and oracle-checkable.

Scale notes:
- exact dedup: one hash-shuffle on the digest — optimal.
- ngram_jaccard_pairs: inverted-index join; cost ∝ sum of squared posting
  lengths. At 100 TB, cap posting length (`max_shingle_freq`) to drop
  stop-shingles — standard practice (they only ever connect boilerplate).
- MinHash-LSH: linear signature pass + band-bucket self-join; candidates
  ≪ N² by design. This is THE scalable path; Jaccard verify runs only on
  candidates.
- SimHash: linear pass, near-dup = equal 16-bit band prefix buckets then
  hamming filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.text import (
    normalized_fingerprint_hash,
    tokenize,
    word_shingles,
)


def exact_duplicate_groups(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exact duplicates (normalized text hash, count > 1)."""
    hashed = docs.select(id_col, normalized_fingerprint_hash(text_col).alias("dup_hash"))
    return (
        hashed.groupBy("dup_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate class.

    Window-free formulation (min-id per hash, semi-joined back) so the
    whole thing is two hash aggregations — no global sort, scales linearly."""
    hashed = docs.withColumn("__h", normalized_fingerprint_hash(text_col))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, on=["__h", id_col], how="left_semi").drop("__h")


def shingle_docs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingles ARRAY<STRING>) with empty-shingle docs dropped."""
    return docs.select(id_col, word_shingles(text_col, n).alias("shingles")).filter(
        F.size("shingles") > 0
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_freq: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via inverted shingle index.

    explode(shingles) → self-join on shingle → |A∩B| per pair →
    jaccard = inter / (|A| + |B| - inter). `max_shingle_freq` drops
    shingles appearing in more than that many docs BEFORE the self-join:
    posting lists are otherwise unbounded and the join is quadratic in
    posting length, so one boilerplate shingle shared by 1M docs would
    emit 10^12 pairs. The finite default makes the scale-safe path the
    default path (capped shingles shrink the intersection count only —
    an underestimate of jaccard for boilerplate-heavy pairs, the standard
    trade); pass None for the exact all-postings variant."""
    sh = shingle_docs(docs, id_col=id_col, text_col=text_col, n=n)
    sizes = sh.select(F.col(id_col).alias("__sid"), F.size("shingles").alias("__size"))
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq)
        inv = inv.join(freq.select("shingle"), "shingle", "left_semi")
    a = inv.select(F.col(id_col).alias("id_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("__sid", "id_a"), "id_a")
        .withColumnRenamed("__size", "size_a")
        .join(sizes.withColumnRenamed("__sid", "id_b"), "id_b")
        .withColumnRenamed("__size", "size_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6
            ),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


MINHASH_PRIME = 2147483647  # 2^31 - 1: (p-1)^2 < 2^62, no BIGINT overflow


def minhash_params(num_hashes: int = 16, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficients for the h_i(x) = (a*x+b) mod p
    universal hash family — literals shared by the Spark plan and the
    DuckDB oracle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_PRIME, num_hashes, dtype=np.int64)
    b = rng.integers(0, MINHASH_PRIME, num_hashes, dtype=np.int64)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def minhash_signature(shingles: Column, num_hashes: int = 16, seed: int = 42) -> Column:
    """MinHash signature as ARRAY<BIGINT> over the (a*x+b) mod p family,
    where x = first-8-hex of md5(shingle) reduced mod p.

    One md5 per shingle (not per shingle*per hash): the base hash is
    computed once and the 16 permutations are two integer ops each —
    ~10x cheaper than an md5-per-function family at equal quality."""
    return minhash_signature_from_base(minhash_base(shingles), num_hashes, seed)


def minhash_base(shingles: Column) -> Column:
    """Base integer hash per shingle: first-8-hex of md5, reduced mod p.

    Materialize this as its own column before building the signature —
    embedded directly in all `num_hashes` sub-expressions it would be
    re-evaluated per hash function (16x the md5 work; Catalyst does not
    CSE across array-lambda boundaries)."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % MINHASH_PRIME,
    )


def minhash_signature_from_base(
    base: Column | str, num_hashes: int = 16, seed: int = 42
) -> Column:
    # One `array_min(transform(...))` lambda per hash function. The
    # seemingly-smaller tree variants measured SLOWER end-to-end at sf0.1:
    # nested transform-over-index with element_at coefficient lookups 2.1x,
    # aggregate+zip_with accumulator 1.9x — flat literal lambdas are what
    # the interpreter executes cheapest, and 16 of them is still a small
    # tree.
    #
    # r12: when ``base`` is a column NAME the identical tree is built as
    # ONE F.expr string (the 16 lambda closures cost ~90 py4j round-trips
    # per query build; the SQL string parses JVM-side to the same flat
    # `(a*x + b) % p` lambdas — guide §7.3 driver-side work).
    if isinstance(base, str):
        arms = ",".join(
            f"array_min(transform({base}, x -> ({a}L * x + {b}L) % {MINHASH_PRIME}L))"
            for a, b in minhash_params(num_hashes, seed)
        )
        return F.expr(f"array({arms})")

    def perm(a: int, b: int):
        # single-arg closure: PySpark derives HOF arity from the signature
        return lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_PRIME

    return F.array(
        *[F.array_min(F.transform(base, perm(a, b))) for a, b in minhash_params(num_hashes, seed)]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verified.

    shingle → 16-hash MinHash signature → 4 bands of 4 → band-bucket
    self-join for candidates → verify with exact Jaccard on the shingle
    sets → keep pairs ≥ threshold. Returns (id_a, id_b, jaccard)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # the shingle table feeds three consumers (signatures + both sides of
    # the Jaccard verify) — cache it or the tokenize/shingle expression
    # tree executes three times. Keeping shingles and band keys as TWO
    # small caches measured 2x faster end-to-end than one combined
    # (id, shingles, bands) cache: the combined table is scanned four
    # times (two join sides each for bands and verify) and its rows carry
    # the wide shingle arrays into the band join.
    sh = shingle_docs(docs, id_col=id_col, text_col=text_col, n=n).cache()
    sig = sh.withColumn("base", minhash_base(F.col("shingles"))).withColumn(
        "sig", minhash_signature_from_base("base", num_hashes)
    )
    # one F.expr string for the whole band array (r12): the per-band
    # md5/concat_ws/transform/slice lambda chain is identical, built with
    # one JVM-side SQL parse instead of ~15 py4j round-trips per band
    band_arr = F.expr(
        "array("
        + ",".join(
            f"md5(concat_ws('|', transform(slice(sig, {j * rows_per_band + 1}, "
            f"{rows_per_band}), x -> cast(x as string))))"
            for j in range(bands)
        )
        + ")"
    )
    # cache: the band table is self-joined — without materialization the
    # whole md5+signature pipeline executes twice (once per join side)
    banded = sig.select(
        id_col,
        F.posexplode(band_arr).alias("band_idx", "band_key"),
    ).cache()
    left = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    right = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    candidates = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def minhash_lsh_pairs_delta(
    corpus: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup: every pair >= ``threshold`` with
    AT LEAST ONE side in ``new_docs`` — the continuous-ingestion shape.

    A full re-dedup on append recomputes all-bands x all-bands; here the
    band join is new-bands x (corpus ∪ new)-bands, so the cost scales
    with the batch, not the corpus: |new| x bucket-mates instead of
    |corpus|^2 candidates. At 100 TB the corpus's banded signatures are
    materialized once (partitioned by band key) and each append batch
    joins against them — the same amortization `TableStore.append` gives
    writes. Exactly equals `minhash_lsh_pairs(corpus ∪ new)` restricted
    to pairs touching a new id (test-pinned), because band keys are a
    pure function of each document alone.

    Returns (id_a, id_b, jaccard) with id_a < id_b; old-old pairs never
    appear. ``corpus`` must not contain ``new_docs``' ids."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    def banded_of(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        sh = shingle_docs(docs, id_col=id_col, text_col=text_col, n=n).cache()
        sig = sh.withColumn("base", minhash_base(F.col("shingles"))).withColumn(
            "sig", minhash_signature_from_base("base", num_hashes)
        )
        band_arr = F.expr(  # same one-string build as minhash_lsh_pairs
            "array("
            + ",".join(
                f"md5(concat_ws('|', transform(slice(sig, {j * rows_per_band + 1}, "
                f"{rows_per_band}), x -> cast(x as string))))"
                for j in range(bands)
            )
            + ")"
        )
        banded = sig.select(
            id_col, F.posexplode(band_arr).alias("band_idx", "band_key")
        ).cache()
        return sh, banded

    sh_old, banded_old = banded_of(corpus)
    sh_new, banded_new = banded_of(new_docs)
    all_banded = banded_old.unionByName(banded_new)
    left = banded_new.select(F.col(id_col).alias("id_x"), "band_idx", "band_key")
    right = all_banded.select(F.col(id_col).alias("id_y"), "band_idx", "band_key")
    candidates = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )
    sh_all = sh_old.unionByName(sh_new)
    sh_a = sh_all.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh_all.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash32_table(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash BIGINT in [0, 2^32)) — 32-bit SimHash of the token multiset.

    Per distinct token: 32-bit hash = first 8 hex chars of md5(token);
    bit b votes +count / -count; simhash bit b = 1 iff vote > 0.
    Relational formulation (explode tokens × 32 bit positions → two hash
    aggregations): every step is a plain shuffle, so it scales linearly and
    the DuckDB oracle replays it verbatim with unnest + range(32)."""
    tok = docs.select(id_col, F.explode(tokenize(text_col)).alias("token"))
    tokw = tok.groupBy(id_col, "token").agg(F.count("*").alias("w"))
    tokh = tokw.withColumn(
        "h", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    )
    bits = tokh.select(
        id_col, "w", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b")
    )
    bit_set = (F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("b"))).cast("long") % 2) == 1
    votes = bits.groupBy(id_col, "b").agg(
        F.sum(F.when(bit_set, F.col("w")).otherwise(-F.col("w"))).alias("v")
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("b")).cast("long")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the high
    16 bits (two docs within small hamming distance of a 32-bit hash
    usually share the high half; at scale use the standard multi-table
    bit-permutation trick to make blocking exact)."""
    hs = simhash32_table(docs, id_col=id_col, text_col=text_col)
    hs = hs.withColumn("block", F.floor(F.col("simhash") / F.lit(65536)).cast("long"))
    a = hs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block")
    b = hs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block")
    pairs = a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def contaminated_docs(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Decontamination probe: training docs sharing any n-gram shingle with
    a benchmark/eval set — the standard pretraining hygiene check (an
    n-gram-overlap variant of J6's dedup probe, applied across corpora).

    Inverted-index left-semi join: benchmark shingles are the (small)
    build side and broadcast; cost ∝ postings of benchmark shingles, not
    |train| x |benchmark|. Returns (id, n_hits) per contaminated doc.
    """
    tr = shingle_docs(train, id_col=id_col, text_col=text_col, n=n).select(
        id_col, F.explode("shingles").alias("shingle")
    )
    bench = (
        shingle_docs(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    return (
        tr.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def cross_substring_overlaps(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap_tokens: int = 10,
    max_gram_docs: int = 20,
) -> DataFrame:
    """Cross-document EXACT substring overlap detection — the fingerprint
    formulation of exact-substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499; the
    suffix-array step re-expressed as positional n-gram alignment, which
    is the join-friendly shape):

    1. position-indexed word ``n``-grams per document (narrow explode);
    2. doc-frequency cap on grams (``max_gram_docs``) so boilerplate
       grams cannot create a quadratic hot key — the same guard as the
       shingle caps in `ngram_jaccard_pairs`;
    3. equi-join on the gram, lower id on the left;
    4. aligned-run detection: within a (doc_a, doc_b) pair, matches that
       advance in BOTH documents share a constant position offset, so
       grouping by ``pos_a - pos_b`` and islanding consecutive ``pos_a``
       values (pos - row_number) finds every maximal shared run;
    5. the longest run of ``r`` consecutive grams covers ``r + n - 1``
       tokens of verbatim shared text.

    Returns (doc_a, doc_b, overlap_tokens) for pairs sharing at least
    ``min_overlap_tokens`` consecutive tokens. Every stage is a bounded
    equi-join or a windowed aggregate over matched grams only — never a
    pairwise document scan.
    """
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> length(x) > 1)"
    )
    grams = docs.select(
        F.col(id_col).alias("__doc"), toks.alias("__t")
    ).filter(F.size("__t") >= n).select(
        "__doc",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(__t) - {n}),"
                f" i -> struct(i AS pos, array_join(slice(__t, i + 1, {n}), ' ') AS gram))"
            )
        ).alias("__g"),
    ).select("__doc", F.col("__g.pos").alias("__pos"), F.col("__g.gram").alias("__gram"))

    keep = (
        grams.groupBy("__gram")
        .agg(F.count_distinct("__doc").alias("__df"))
        .filter(F.col("__df") <= max_gram_docs)
        .select("__gram")
    )
    capped = grams.join(keep, "__gram")

    a = capped.select(
        F.col("__gram"), F.col("__doc").alias("doc_a"), F.col("__pos").alias("__pa")
    )
    b = capped.select(
        F.col("__gram"), F.col("__doc").alias("doc_b"), F.col("__pos").alias("__pb")
    )
    # no distinct needed: a gram occupies ONE position per doc, so each
    # (doc_a, doc_b, pa, diff) combination arises from exactly one join row
    matches = (
        a.join(b, "__gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "__pa", (F.col("__pa") - F.col("__pb")).alias("__diff"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "__diff").orderBy("__pa")
    runs = (
        matches.withColumn("__isl", F.col("__pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "__diff", "__isl")
        .agg(F.count("*").alias("__run"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg((F.max("__run") + (n - 1)).cast("long").alias("overlap_tokens"))
        .filter(F.col("overlap_tokens") >= min_overlap_tokens)
    )
