"""Deduplication query catalog (training-data pipeline surface):
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup —
each oracle-checked where SQL can express the identical pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_code_memory_spark.operators import dedup as D
from claude_code_memory_spark.queries.base import register, spread, table

# Shared DuckDB fragments ---------------------------------------------------

_DD_TOKENIZE = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 1)"
)

# distinct 3-gram shingles, duckdb: tokens t -> list of concat slices
_DD_SHINGLES = f"""
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingles
  FROM (SELECT doc_id, {_DD_TOKENIZE} AS toks FROM documents)
  WHERE len(toks) >= 3
"""


@register(
    "dedup_exact_kept",
    oracle="""
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents e
      WHERE e.doc_id < d.doc_id
        AND md5(trim(regexp_replace(lower(e.text), '\\s+', ' ', 'g')))
          = md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
    )
    """,
)
def dedup_exact_kept(spark, sf_dir):
    """Exact dedup: ids kept after normalizing + hashing (min-id wins)."""
    d = table(spark, sf_dir, "documents")
    return D.exact_dedup(d).select("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    -- replay the operator's default posting-list cap (max_shingle_freq):
    -- shingles in more than 10000 docs are dropped before the self-join
    inv AS (
      SELECT doc_id, shingle FROM inv0
      QUALIFY count(*) OVER (PARTITION BY shingle) <= 10000),
    sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs >= 0.2 via inverted shingle index,
    with the scale-safe default posting cap active (the oracle replays
    the cap)."""
    d = spread(spark, table(spark, sf_dir, "documents"))
    return D.ngram_jaccard_pairs(d, threshold=0.2, n=3)


def _minhash_oracle(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    from claude_code_memory_spark.operators.dedup import MINHASH_PRIME, minhash_params

    r = num_hashes // bands
    p = MINHASH_PRIME
    sig_elems = ", ".join(
        f"list_aggregate(list_transform(base, x -> ({a}::BIGINT * x + {b}) % {p}), 'min')"
        for a, b in minhash_params(num_hashes)
    )
    band_elems = ", ".join(
        f"md5(array_to_string(list_transform(sig[{j * r + 1}:{j * r + r}], v -> v::VARCHAR), '|'))"
        for j in range(bands)
    )
    return f"""
    WITH sh AS ({_DD_SHINGLES}),
    based AS (
      SELECT doc_id, shingles,
             list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 8))::UBIGINT::BIGINT % {p}) AS base
      FROM sh),
    sig AS (SELECT doc_id, [{sig_elems}] AS sig, shingles FROM based),
    banded AS (
      SELECT doc_id, i - 1 AS band_idx, bandv[i] AS band_key
      FROM (SELECT doc_id, [{band_elems}] AS bandv FROM sig), range(1, {bands} + 1) t(i)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    verified AS (
      SELECT id_a, id_b,
             len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS jac
      FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, round(jac, 6) AS jaccard FROM verified
    WHERE round(jac, 6) >= {threshold}
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), headline=True)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + LSH(4 bands) candidates, exact-Jaccard verified >= 0.5."""
    d = spread(spark, table(spark, sf_dir, "documents"))
    return D.minhash_lsh_pairs(d, threshold=0.5, n=3, num_hashes=16, bands=4)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tokw AS (
      SELECT doc_id, token, count(*) AS w FROM (
        SELECT doc_id, unnest({_DD_TOKENIZE}) AS token FROM documents)
      GROUP BY doc_id, token),
    tokh AS (
      SELECT doc_id, w,
             ('0x' || substr(md5(token), 1, 8))::UBIGINT::BIGINT AS h
      FROM tokw),
    votes AS (
      SELECT doc_id, b,
             sum(CASE WHEN (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1 THEN w ELSE -w END) AS v
      FROM tokh, range(0, 32) t(b) GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """Per-document 32-bit SimHash (md5 hash family) — BIGINT column."""
    d = spread(spark, table(spark, sf_dir, "documents"))
    return D.simhash32_table(d)


@register(
    "dedup_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.4
    """,
)
def dedup_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cos >= 0.4), blocked by label.

    Label blocking stands in for the LSH/IVF bucketing used at scale —
    the self-join never goes N x N. Scoring is the blocked-matmul
    verifier (one Arrow group per block, chunked BLAS), not a pair
    join: the expression form materialized ~43 M candidate pairs at sf1
    to keep 98 k (76.6 s → ~4 s, round-9 sf1 evidence)."""
    from claude_code_memory_spark.operators.similarity import blocked_cosine_pairs

    emb = table(spark, sf_dir, "embeddings")
    return blocked_cosine_pairs(emb, 0.4)


@register(
    "dedup_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node
    )
    SELECT node AS doc_id, min(comp) AS component
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_duplicate_clusters(spark, sf_dir):
    """MinHash-LSH pairs (>= 0.5 Jaccard) grouped into duplicate clusters
    via min-label connected components (operators/components.py) — the
    pairs → clusters step every production dedup pass needs. The oracle
    computes the same fixpoint with a recursive CTE; the Spark side is
    O(diameter) iterative joins with checkpointed lineage."""
    from claude_code_memory_spark.operators.components import connected_components

    d = spread(spark, table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(d, threshold=0.5, n=3, num_hashes=16, bands=4)
    return (
        connected_components(pairs, src="id_a", dst="id_b")
        .select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
        .orderBy("doc_id")
    )


@register(
    "dedup_edit_distance",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.text, b.text) AS lev
    FROM documents a JOIN documents b
      ON a.lang = b.lang
     AND (a.n_chars // 100) = (b.n_chars // 100)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.text, b.text) <= 40
    """,
)
def dedup_edit_distance(spark, sf_dir):
    """Fuzzy near-dup pairs by Levenshtein distance <= 40, blocked by
    (lang, n_chars // 100) — the character-level member of the dedup
    family (catches small in-place edits that shift every shingle, which
    token-level MinHash under-scores). Blocking caps the candidate set at
    sum-of-block^2, never N x N, and the JVM `levenshtein(l, r, 40)`
    early-exits above the bound so the verify cost is O(threshold * len)
    per pair. Length-straddling pairs across bucket edges are out of
    contract (same documented trade as the shingle-frequency cap); the
    oracle replays the blocking exactly."""
    # r12 (guide §2.5 input skew): the probe side MUST be spread — the
    # one-file fixture reads as a single partition, the blocked join
    # broadcasts the build side into that same single task, and the
    # banded Levenshtein DP over the ~600k candidate pairs ran there
    # alone: measured 22 s wall at 1.2-core utilization (23 CPU-s of
    # actual work). Spreading the probe scan puts the join + DP in every
    # scan task; a real corpus takes spread()'s no-op branch. (A
    # repartition of the PAIRS was tried first and did nothing —
    # Catalyst pushes the deterministic projection below the exchange,
    # so the DP stayed on the single map task.)
    d = table(spark, sf_dir, "documents")
    a = spread(spark, d).select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("ta"),
        "lang",
        F.floor(F.col("n_chars") / 100).alias("blk"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("tb"),
        "lang",
        F.floor(F.col("n_chars") / 100).alias("blk"),
    )
    pairs = a.join(b, ["lang", "blk"]).filter(F.col("id_a") < F.col("id_b"))
    lev = F.levenshtein(F.col("ta"), F.col("tb"), 40)
    return (
        pairs.withColumn("lev", lev)
        .filter(F.col("lev") >= 0)
        .select("id_a", "id_b", "lev")
    )


@register(
    "dedup_minhash_delta",
    oracle=f"""
    WITH cutoff AS (SELECT 0.9 * max(doc_id) AS c FROM documents),
    full_pairs AS ({_minhash_oracle()})
    SELECT id_a, id_b, jaccard FROM full_pairs, cutoff
    WHERE id_a >= c OR id_b >= c
    """,
)
def dedup_minhash_delta(spark, sf_dir):
    """Incremental near-dup on append (operators/dedup.py
    `minhash_lsh_pairs_delta`): the newest ~10% of docs (id >= 0.9*max)
    are the append batch; the band join is batch x corpus instead of
    corpus x corpus, so re-dedup cost scales with the batch. The oracle
    is the FULL MinHash pipeline restricted to pairs touching a new id —
    passing proves the delta path loses nothing vs a full recompute."""
    from claude_code_memory_spark.operators.dedup import minhash_lsh_pairs_delta

    d = table(spark, sf_dir, "documents")
    cutoff = d.agg((F.lit(0.9) * F.max("doc_id")).alias("c")).first()["c"]
    return minhash_lsh_pairs_delta(
        d.filter(F.col("doc_id") < cutoff),
        d.filter(F.col("doc_id") >= cutoff),
        threshold=0.5,
    )


@register(
    "dedup_cross_substring",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> length(x) > 1) AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest([i - 1 FOR i IN range(1, greatest(len(t) - 7, 0) + 1)]) AS pos,
             unnest([array_to_string(t[i:i + 7], ' ')
                     FOR i IN range(1, greatest(len(t) - 7, 0) + 1)]) AS gram
      FROM toks
      WHERE len(t) >= 8),
    keep AS (
      SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
      WHERE df <= 20),
    matches AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, a.pos - b.pos AS diff
      FROM g a JOIN keep USING (gram) JOIN g b USING (gram)
      WHERE a.doc_id < b.doc_id),
    runs AS (
      SELECT doc_a, doc_b, diff,
             pa - row_number() OVER (PARTITION BY doc_a, doc_b, diff
                                     ORDER BY pa) AS isl
      FROM matches),
    islands AS (
      SELECT doc_a, doc_b, count(*) AS run
      FROM runs GROUP BY doc_a, doc_b, diff, isl)
    SELECT doc_a, doc_b, CAST(max(run) + 7 AS BIGINT) AS overlap_tokens
    FROM islands GROUP BY doc_a, doc_b
    HAVING max(run) + 7 >= 10
    """,
)
def dedup_cross_substring(spark, sf_dir):
    """Exact-substring dedup pairs (Lee et al. 2021, arXiv:2107.06499):
    documents sharing a verbatim run of >= 10 consecutive tokens, found
    by positional 8-gram alignment — the suffix-array result via joins
    a cluster can execute. Doc-frequency-capped gram join, then islands
    over the constant (pos_a - pos_b) offset; never a pairwise doc scan.
    Completes the dedup family: exact (hash), near (MinHash/SimHash/
    Jaccard/embedding), and now verbatim-span."""
    from claude_code_memory_spark.operators.dedup import cross_substring_overlaps

    d = spread(spark, table(spark, sf_dir, "documents"))
    return cross_substring_overlaps(
        d, n=8, min_overlap_tokens=10, max_gram_docs=20
    )


@register(
    "dedup_clusters_star",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node
    )
    SELECT node AS doc_id, min(comp) AS component
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_clusters_star(spark, sf_dir):
    """`dedup_duplicate_clusters` computed by the LARGE-STAR/SMALL-STAR
    algorithm (Kiveris et al. SoCC'14) instead of min-label propagation:
    O(log² n) rounds independent of component diameter — the variant for
    graphs whose structure is unknown. The component labeling is
    algorithm-invariant (min reachable id), so the SAME recursive-CTE
    oracle checks both implementations — a cross-algorithm consistency
    gate, not just a twin."""
    from claude_code_memory_spark.operators.components import (
        connected_components_star,
    )

    d = spread(spark, table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(d, threshold=0.5, n=3, num_hashes=16, bands=4)
    return (
        connected_components_star(pairs, src="id_a", dst="id_b")
        .select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
        .orderBy("doc_id")
    )


@register(
    "dedup_keep_best_per_cluster",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node
    ),
    comps AS (SELECT node AS doc_id, min(comp) AS component
              FROM reach GROUP BY node),
    ranked AS (
      SELECT c.doc_id, c.component, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
      FROM comps c JOIN documents d USING (doc_id))
    SELECT doc_id, component, n_chars, CAST(rn = 1 AS INT) AS kept
    FROM ranked ORDER BY component, doc_id
    """,
)
def dedup_keep_best_per_cluster(spark, sf_dir):
    """The dedup pipeline's END STATE: near-dup pairs → connected
    components → ONE representative kept per cluster (longest document,
    ties to the smallest id — the C4 keep-longest rule; swap the order
    key for a model quality score and the plan is unchanged). Output is
    every clustered doc with its component and a kept flag, so the
    training-set filter is one semi-join against kept=1.

    Scale: the pairs/components steps are the audited banded-LSH and
    min-label shapes; the new work is one entity-scale join onto the
    documents' (doc_id, n_chars) projection plus a per-component window
    — components are near-dup clusters, bounded small, so the window
    partitions are skew-free."""
    from pyspark.sql import Window

    from claude_code_memory_spark.operators.components import connected_components

    d = spread(spark, table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(d, threshold=0.5, n=3, num_hashes=16, bands=4)
    comps = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        comps.join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "component",
            "n_chars",
            (F.col("rn") == 1).cast("int").alias("kept"),
        )
        .orderBy("component", "doc_id")
    )


@register(
    "dedup_ngram_exposure",
    oracle="""
    WITH sh AS (
      SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ')
                                    FOR i IN range(1, greatest(len(toks) - 4, 0) + 1)]) AS grams
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> length(x) > 1) AS toks
            FROM documents)
      WHERE len(toks) >= 5),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    gs AS (SELECT gram, count(*) AS n_docs FROM inv GROUP BY gram)
    SELECT inv.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN gs.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(sum(CASE WHEN gs.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS shared_frac
    FROM inv JOIN gs USING (gram)
    GROUP BY inv.doc_id
    """,
)
def dedup_ngram_exposure(spark, sf_dir):
    """Per-document duplication EXPOSURE: the fraction of a document's
    distinct token 5-grams that appear in at least one other document —
    the doc-level novelty score the Lee et al. span-dedup family implies
    but the corpus-level views (`dedup_repeated_ngrams`: which grams;
    `dedup_cross_substring`: which pairs) don't provide. High
    shared_frac flags near-boilerplate documents for removal or
    down-weighting even when no single pair crosses a MinHash threshold.

    Plan: one shingle pass (distinct grams per doc), one gram-keyed
    count with map-side combine, one partitioned equi-join back onto the
    inverted list, one doc-keyed aggregate — two shuffles total, both on
    uniform keys (gram, doc_id); no pairwise work anywhere, so the cost
    is corpus-linear at any scale."""
    from claude_code_memory_spark.functions.text import word_shingles

    d = spread(spark, table(spark, sf_dir, "documents"))
    inv = (
        d.select("doc_id", word_shingles("text", 5).alias("grams"))
        .filter(F.size("grams") > 0)
        .select("doc_id", F.explode("grams").alias("gram"))
        .persist()  # two consumers: gram counts and the scoring join
    )
    gs = inv.groupBy("gram").agg(F.count("*").alias("n_docs"))
    shared = F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
    return (
        inv.join(gs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            shared.cast("long").alias("n_shared"),
            F.round(shared * 1.0 / F.count("*"), 6).alias("shared_frac"),
        )
    )


@register(
    "dedup_prefix_boilerplate",
    oracle="""
    SELECT md5(lower(substr(text, 1, 64))) AS prefix_hash,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keeper_doc_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM documents
    GROUP BY prefix_hash
    HAVING count(*) > 1
    """,
)
def dedup_prefix_boilerplate(spark, sf_dir):
    """Leading-span (boilerplate-prefix) dedup: documents sharing the
    same case-folded 64-char prefix are template/boilerplate duplicates
    even when their tails diverge — the header/license/nav-chrome class
    exact-hash dedup misses (the fixture has 0 exact duplicates but 23
    shared-prefix docs, exactly this situation). Canonical key =
    md5(lower(first 64 chars)); one map-side-combined groupBy at any
    corpus size, min-doc_id keeper, only n>1 clusters emitted. The
    production variant widens the span or adds a suffix key — same
    single-aggregate shape."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(
            F.md5(F.lower(F.substring("text", 1, 64))).alias("prefix_hash")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            (F.count("*") - 1).cast("long").alias("n_dropped"),
        )
        .filter(F.col("n_docs") > 1)
    )
