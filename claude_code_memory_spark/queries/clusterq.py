"""Clustering + corpus-mixture query catalog: deterministic k-means,
SemDeDup-style cell-blocked semantic dedup, repeated n-gram detection,
and temperature-scaled domain-mixture sampling — the corpus-curation
surface a training-data pipeline runs over the `documents`/`embeddings`
tables. Every entry is DuckDB-oracle-checked end to end, including the
full Lloyd iteration chain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_code_memory_spark.functions.text import word_shingles
from claude_code_memory_spark.functions.vector import dot
from claude_code_memory_spark.operators.clustering import kmeans_lloyd, semantic_dedup
from claude_code_memory_spark.operators.sampling import hash_bucket
from claude_code_memory_spark.queries.base import register, table, table_rowcount
from claude_code_memory_spark.queries.base import spread as _spread


_DD_DOT = "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def _dd_d2(a: str, b: str) -> str:
    return (
        f"({_DD_DOT.format(a=a, b=a)} - 2 * {_DD_DOT.format(a=a, b=b)}"
        f" + {_DD_DOT.format(a=b, b=b)})"
    )


def _dd_cos(a: str, b: str) -> str:
    return (
        f"round({_DD_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DD_DOT.format(a=a, b=a)}) * sqrt({_DD_DOT.format(a=b, b=b)})), 6)"
    )


def _kmeans_ctes(k: int | str = 8, iters: int = 2) -> str:
    """CTE chain replaying `kmeans_lloyd` exactly: seeded init, argmin
    assignment via the dot identity, DECIMAL(38,12) per-dimension means
    rounded to 6 dp. Terminal CTEs: ``af`` (final assignment: vec_id, v,
    cluster_id) and ``cent{iters}`` (cluster_id, cvec).

    ``k`` may be an int literal or a SQL scalar expression (e.g. a
    subquery deriving k from corpus size) — the seeding predicate only
    compares ids against it."""
    parts = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"cent0 AS (SELECT vec_id::INT AS cluster_id, v AS cvec FROM emb"
        f" WHERE vec_id < ({k}))",
    ]

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, v, cluster_id FROM (
        SELECT e.vec_id, e.v, c.cluster_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_dd_d2("e.v", "c.cvec")}, c.cluster_id) AS rn
        FROM emb e CROSS JOIN {cent} c) t
      WHERE rn = 1)"""

    for i in range(1, iters + 1):
        parts.append(assign(f"a{i}", f"cent{i - 1}"))
        parts.append(
            f"""m{i} AS (
      SELECT cluster_id, pos,
             round(sum(val::DECIMAL(38,12))::DOUBLE / count(*), 6) AS m
      FROM (SELECT cluster_id, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM a{i}) t
      GROUP BY cluster_id, pos)"""
        )
        parts.append(
            f"cent{i} AS (SELECT cluster_id, list(m ORDER BY pos) AS cvec"
            f" FROM m{i} GROUP BY cluster_id)"
        )
    parts.append(assign("af", f"cent{iters}"))
    return ",\n    ".join(parts)


@register(
    "cluster_kmeans_sizes",
    oracle=f"""
    WITH {_kmeans_ctes(k=8, iters=2)}
    SELECT s.cluster_id, s.n_members,
           round(sqrt({_DD_DOT.format(a="c.cvec", b="c.cvec")}), 6) AS centroid_norm
    FROM (SELECT cluster_id, count(*) AS n_members FROM af GROUP BY cluster_id) s
    JOIN cent2 c USING (cluster_id)
    """,
)
def cluster_kmeans_sizes(spark, sf_dir):
    """Deterministic Lloyd k-means (k=8, 2 iterations) over the embedding
    corpus: per-cluster member count + centroid L2 norm. The entire
    iteration chain — seeded init, dot-identity argmin, decimal-mean
    update — is replayed by the DuckDB oracle, so assignment flips would
    hash-mismatch. At 100 TB each iteration is a broadcast-k cross join
    (no row shuffle) plus a k x dim-key aggregate; see
    operators/clustering.py for the cost model. Reference parity:
    reproducible collection partitioning (storage/qdrant.py collection
    management)."""
    # same iterative-input persist as dedup_semantic_cells below
    emb = _spread(spark, table(spark, sf_dir, "embeddings")).persist()
    assigned, cent = kmeans_lloyd(emb, k=8, iters=2)
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    norms = cent.select(
        "cluster_id",
        F.round(F.sqrt(dot("__cvec", "__cvec")), 6).alias("centroid_norm"),
    )
    return sizes.join(norms, "cluster_id")


# SemDeDup cell count scales with corpus size so per-cell cost stays
# bounded: k = max(8, n_vectors // TARGET_CELL_SIZE) keeps the expected
# cell at ~256 vectors, making the pairwise scan O(N * cell) — linear in
# N at fixed cell size — instead of the Θ(N²) a constant k degenerates
# to at 100×. SemDeDup's own recipe scales k with N (arXiv:2303.09540).
# The oracle derives the same k via a scalar subquery, so any sf replays.
_SEMDEDUP_CELL_SIZE = 256
_SEMDEDUP_K_SQL = f"SELECT greatest(8, count(*) // {_SEMDEDUP_CELL_SIZE}) FROM embeddings"


def _semdedup_k(n_vectors: int) -> int:
    return max(8, n_vectors // _SEMDEDUP_CELL_SIZE)


@register(
    "dedup_semantic_cells",
    headline=True,
    oracle=f"""
    WITH {_kmeans_ctes(k=_SEMDEDUP_K_SQL, iters=2)},
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM af a JOIN af b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {_dd_cos("a.v", "b.v")} >= 0.4),
    rem AS (SELECT DISTINCT ib FROM pairs)
    SELECT af.vec_id, af.cluster_id, (rem.ib IS NOT NULL) AS removed
    FROM af LEFT JOIN rem ON af.vec_id = rem.ib
    """,
)
def dedup_semantic_cells(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic near-dup removal blocked by
    k-means cells instead of labels — the variant that works when no
    labels exist. One verdict row per vector: its cell and whether a
    lower-id cell-mate within cosine 0.4 removes it. The cell equi-join
    keeps the pairwise scan at (n/k)^2 per cell — never N x N — and k
    scales with corpus size (k = max(8, N // 256)) so total pair cost is
    O(N * cell_size), linear in N; at scale the assignment is stored
    partitioned by cell so the self-join is co-located. Complements `dedup_embedding_neardup` (label-blocked)
    with the unsupervised blocking a real corpus needs."""
    # k derives from corpus size so cell size stays ~256 as N grows.
    # r12: the count comes from the parquet FOOTER driver-side (the same
    # row-group metadata a zero-column count(*) job reads) — one fewer
    # blocking Spark action (~0.2 s of scheduler floor); re-read every
    # call, falls back to a real count() job on any surprise.
    k = _semdedup_k(table_rowcount(spark, sf_dir, "embeddings"))
    # persist the spread input: Lloyd re-reads it iters+2 times (two
    # assignment passes, the final assignment, and the seeding take) and
    # each replay re-runs the scan + repartition lineage — measured 3.3x
    # of the whole query at sf0.1. The iterative-input cache is the
    # standard Lloyd-on-Spark move (MLlib persists its training input the
    # same way); at cluster scale MEMORY_AND_DISK spills; the seeding
    # collect materializes it.
    emb = _spread(spark, table(spark, sf_dir, "embeddings")).persist()
    assigned, _ = kmeans_lloyd(emb, k=k, iters=2)
    # three consumers (both self-join sides + the verdict join) — persist
    # so the assignment computes once; at scale this is the write-
    # partitioned-by-cell materialization the docstring describes.
    # Salt the pairwise join only while cells < the parallelism actually
    # available (identical pair set; see semantic_dedup's strategy
    # note): with dynamic k the salt shrinks as cells multiply, hitting
    # n_salt=1 (the bucketed co-located regime) once k alone saturates
    # the cores. r12: the salt target derives from defaultParallelism
    # (2x, the same oversubscription the old constant encoded at
    # local[32]) instead of a hard-coded 64, so a lower-core bench run
    # replicates fewer build-side copies — scale-adaptive, per the
    # optimization brief; the pair set (and thus the result) is
    # salt-invariant.
    n_salt = max(1, -(-(2 * spark.sparkContext.defaultParallelism) // k))
    return semantic_dedup(assigned.persist(), threshold=0.4, n_salt=n_salt)


# DuckDB twin of functions.text.word_shingles(n=5): lowercase alnum
# tokens (len > 1), consecutive 5-token windows, distinct per doc.
_DD_TOKENIZE = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 1)"
)
_DD_5GRAMS = f"""
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ')
                                FOR i IN range(1, greatest(len(toks) - 4, 0) + 1)]) AS grams
  FROM (SELECT doc_id, {_DD_TOKENIZE} AS toks FROM documents)
  WHERE len(toks) >= 5
"""


@register(
    "dedup_repeated_ngrams",
    oracle=f"""
    WITH sh AS ({_DD_5GRAMS}),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    rep AS (
      SELECT gram, count(*) AS n_docs, min(doc_id) AS first_doc
      FROM inv GROUP BY gram HAVING count(*) >= 2)
    SELECT gram, n_docs, first_doc FROM rep
    ORDER BY n_docs DESC, gram ASC LIMIT 20
    """,
)
def dedup_repeated_ngrams(spark, sf_dir):
    """Cross-document repeated 5-gram spans (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better'): the top
    20 token 5-grams appearing in the most distinct documents. Pure
    explode + groupBy — one shuffle keyed by gram, no join, so hot grams
    cost one combiner-side partial aggregate rather than a skewed join;
    memorization-prone boilerplate surfaces without any pairwise work."""
    d = table(spark, sf_dir, "documents")
    sh = d.select("doc_id", word_shingles("text", 5).alias("grams")).filter(
        F.size("grams") > 0
    )
    inv = sh.select("doc_id", F.explode("grams").alias("gram"))
    rep = (
        inv.groupBy("gram")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") >= 2)
    )
    return rep.orderBy(F.desc("n_docs"), F.asc("gram")).limit(20)


_DD_BUCKET = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT::BIGINT % 10000"


@register(
    "sample_domain_mixture",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    w AS (SELECT lang, n_docs, round(sqrt(n_docs), 6) AS wgt FROM counts),
    tot AS (SELECT sum(wgt::DECIMAL(18,6)) AS tot FROM w),
    rates AS (
      SELECT lang, n_docs,
             least(1.0::DOUBLE,
                   round(250 * wgt::DOUBLE / tot::DOUBLE / n_docs, 6)) AS rate
      FROM w CROSS JOIN tot),
    kept AS (
      SELECT d.lang FROM documents d JOIN rates r USING (lang)
      WHERE {_DD_BUCKET} < CAST(floor(r.rate * 10000) AS INT)),
    k2 AS (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang)
    SELECT r.lang, r.n_docs, coalesce(k2.n_kept, 0) AS n_kept, r.rate
    FROM rates r LEFT JOIN k2 USING (lang)
    """,
)
def sample_domain_mixture(spark, sf_dir):
    """Temperature-scaled domain mixture (alpha = 0.5, the multilingual
    rebalancing rule from the XLM-R / mT5 recipes): per-language keep
    rate proportional to sqrt(n)/n, targeting ~250 docs total, applied
    as a deterministic hash-bucket filter so the sample is identical on
    any cluster/partitioning. sqrt (IEEE correctly-rounded, unlike pow)
    and a decimal weight sum keep every arithmetic step replayable.
    Plan: two tiny aggregates + one broadcast join of 5 rate rows onto
    the corpus scan — at 100 TB the corpus is read once, map-side only."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = counts.withColumn("wgt", F.round(F.sqrt(F.col("n_docs")), 6))
    tot = w.agg(F.sum(F.col("wgt").cast("decimal(18,6)")).alias("tot"))
    rates = w.crossJoin(F.broadcast(tot)).withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            F.round(
                F.lit(250) * F.col("wgt").cast("double") / F.col("tot").cast("double")
                / F.col("n_docs"),
                6,
            ),
        ),
    )
    kept = d.join(F.broadcast(rates.select("lang", "rate")), "lang").filter(
        hash_bucket("doc_id") < F.floor(F.col("rate") * 10000).cast("int")
    )
    k2 = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        rates.join(k2, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            "rate",
        )
    )
