"""Vector / keyword / hybrid search queries (SURVEY.md §2.6 T1-T4, §2.4 A1,
§2.3 J1/J8) over the `embeddings` and `documents` tables — oracle-checked
against DuckDB's list functions.

The query vector is always embeddings[vec_id=0], joined in relationally
(no driver-side literals) so the Spark plan and the oracle see bit-equal
inputs. Cosine is computed in float64 on both sides and rounded to 6
decimals before ranking — float32 storage + float64 math is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.vector import cosine_similarity
from claude_code_memory_spark.queries.base import register, table

# DuckDB fragment: cosine(a,b) in float64 with explicit casts.
_DD_COS = (
    "round(list_dot_product(a.embedding::DOUBLE[], q.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6)"
)

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_TERMS = ("spark", "join", "filter", "window")


def _query_vec_join(spark, sf_dir):
    """embeddings crossed with the single query-vector row (broadcast)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    return emb.crossJoin(F.broadcast(q))


@register(
    "dense_topk",
    oracle=f"""
    SELECT a.vec_id, {_DD_COS} AS score
    FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE a.vec_id <> 0
    ORDER BY score DESC, a.vec_id ASC
    LIMIT 10
    """,
    headline=True,
)
def dense_topk(spark, sf_dir):
    # T1: dense semantic top-k (storage/qdrant.py:827-886)
    scored = (
        _query_vec_join(spark, sf_dir)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(10)


@register(
    "dense_topk_filtered",
    oracle=f"""
    SELECT a.vec_id, a.label, {_DD_COS} AS score
    FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE a.vec_id <> 0 AND a.label IN (2, 5, 7) AND {_DD_COS} >= 0.0
    ORDER BY score DESC, a.vec_id ASC
    LIMIT 10
    """,
)
def dense_topk_filtered(spark, sf_dir):
    # T1+F2/F3: payload filter (label) + score threshold before top-k
    scored = (
        _query_vec_join(spark, sf_dir)
        .filter((F.col("vec_id") != 0) & F.col("label").isin(2, 5, 7))
        .select(
            "vec_id",
            "label",
            F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6).alias("score"),
        )
        .filter(F.col("score") >= 0.0)
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(10)


@register(
    "knn_per_label",
    oracle=f"""
    SELECT * FROM (
      SELECT a.label, a.vec_id, {_DD_COS} AS score,
             row_number() OVER (ORDER BY {_DD_COS} DESC, a.vec_id ASC) AS rn_all
      FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE a.vec_id <> 0)
    QUALIFY row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id ASC) <= 3
    """,
)
def knn_per_label(spark, sf_dir):
    # W1-style grouped top-k over vector scores. The global rank is NOT a
    # global window (`Window.orderBy` with no partition = the whole scored
    # corpus through one task — the WindowExec warning, and a single-node
    # sort at 100×): the bounded per-label top-3 comes first from the
    # partitioned window, then each of the ≤ 3·|labels| survivors gets its
    # exact global rank as 1 + count of corpus rows ranking above it — one
    # map-side broadcast theta-join pass, no global sort anywhere.
    scored = (
        _query_vec_join(spark, sf_dir)
        .filter(F.col("vec_id") != 0)
        .select(
            "label",
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6).alias("score"),
        )
    )
    w_grp = Window.partitionBy("label").orderBy(F.desc("score"), F.asc("vec_id"))
    surv = (
        scored.withColumn("rnk", F.row_number().over(w_grp))
        .filter(F.col("rnk") <= 3)
        .drop("rnk")
    )
    s, c = surv.alias("s"), scored.alias("c")
    ranks_above = (F.col("c.score") > F.col("s.score")) | (
        (F.col("c.score") == F.col("s.score")) & (F.col("c.vec_id") < F.col("s.vec_id"))
    )
    n_better = (
        c.join(F.broadcast(s.select("vec_id", "score")), ranks_above, "inner")
        .groupBy(F.col("s.vec_id").alias("vec_id"))
        .agg(F.count("*").alias("__n_better"))
    )
    return (
        surv.join(n_better, "vec_id", "left")
        .withColumn(
            "rn_all", (F.coalesce(F.col("__n_better"), F.lit(0)) + 1).cast("int")
        )
        .drop("__n_better")
        .select("label", "vec_id", "score", "rn_all")
    )


def _bm25_scores_spark(spark, sf_dir, terms):
    """BM25 (robertson idf, k1=1.2 b=0.75) of fixed query terms over
    documents — A1 corpus fit + T2 scoring as ONE declarative plan.

    Corpus stats (n_docs, avgdl) ride along as a broadcast 1-row cross
    join instead of driver-side count()/collect() actions — the whole
    score is a single Spark job."""
    d = table(spark, sf_dir, "documents")
    term_list = list(terms)
    # ZERO-shuffle per-doc stats: doc length and the tf of every query
    # term are array expressions over ONE tokenize pass — `size(toks)`
    # and `size(filter(toks, x -> x = term))` — entirely inside the scan
    # stage's codegen. The previous formulation exploded the corpus into
    # token rows (~500x the documents) and hash-aggregated them back;
    # the explode+combine cost dominated the BM25 branch and dragged
    # hybrid_rrf_search to 4.4x dense (verdict r9 item 6). Same rows out
    # (a doc with dl=0 simply carries zero tfs, which the tf>0 /
    # avgdl dl>0 filters below drop exactly as the groupBy form did).
    # r12: the whole per-doc projection is built from F.expr strings —
    # the lambda/HOF form cost ~1,550 py4j round-trips per query build
    # (measured 0.47-0.58 s, paid by bm25_keyword_topk AND the hybrid
    # query's sparse arm); the SQL strings parse JVM-side to the same
    # expressions (split/lower/filter == tokenize(); x = 'term' ==
    # x == lit(term)). Terms are fixed alphanumeric constants.
    _tok_sql = "filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 1)"
    per_doc = d.select("doc_id", F.expr(_tok_sql).alias("__toks")).select(
        "doc_id",
        F.expr("size(__toks)").alias("dl"),
        *[
            F.expr(f"size(filter(__toks, x -> x = '{t}'))").alias(f"__tf_{i}")
            for i, t in enumerate(term_list)
        ],
    )
    # per_doc fans into two consumers (the 1-row corpus aggregate and
    # the tf unpivot) and — being pure map work — has no exchange
    # boundary of its own, so each consumer would re-tokenize the
    # corpus. The explicit doc_id repartition gives both an IDENTICAL
    # exchange subtree that (AQE) exchange reuse collapses at runtime:
    # the corpus is read and tokenized once, and what shuffles is one
    # narrow stats row per document — never exploded tokens (the old
    # explode+hash-agg form shuffled ~500x the rows and dragged
    # hybrid_rrf_search to 4.4x dense, verdict r9 item 6).
    per_doc = per_doc.repartition("doc_id")
    # ONE global aggregate carries n_docs, avgdl AND every term's
    # document frequency — all mergeable, map-side combined. idf then
    # computes INLINE from the broadcast df columns (a |terms|-arm CASE
    # on the token), so there is no df shuffle and no idf join.
    g = F.broadcast(
        per_doc.agg(
            # n_docs counts ALL documents (oracle parity — every doc has
            # a per_doc row in this formulation, zero-token docs
            # included); avgdl averages docs that produced tokens (avg
            # ignores the NULLed rest)
            F.expr("cast(count(*) as double)").alias("n_docs"),
            F.expr("avg(CASE WHEN dl > 0 THEN dl END)").alias("avgdl"),
            *[
                F.expr(f"sum(cast(__tf_{i} > 0 as bigint))").alias(f"__df_{i}")
                for i in range(len(term_list))
            ],
        )
    )
    # named_struct array == arrays_zip(array(terms) as token, array(tfs)
    # as tf): same (token, tf) pairs in the same order, same field names
    token_tf = F.expr(
        "explode(array("
        + ",".join(
            f"named_struct('token', '{t}', 'tf', __tf_{i})"
            for i, t in enumerate(term_list)
        )
        + "))"
    )
    tf = (
        per_doc.select("doc_id", "dl", token_tf.alias("z"))
        .select("doc_id", "dl", F.col("z.token").alias("token"), F.col("z.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    # same float expression tree as the joined-idf form: ln((n_docs - df
    # + 0.5) / (df + 0.5)) with df a bigint count, n_docs double. The
    # double literals carry the D suffix so SQL parses them as DOUBLE
    # (bare 0.5 would be DECIMAL and change the arithmetic).
    idf_sql = "cast(null as double)"
    for i, t in reversed(list(enumerate(term_list))):
        idf_sql = (
            f"CASE WHEN token = '{t}' THEN "
            f"ln((n_docs - __df_{i} + 0.5D) / (__df_{i} + 0.5D)) "
            f"ELSE {idf_sql} END"
        )
    from claude_code_memory_spark.functions.vector import double_sql_literal as _dl

    k1p1, k1, one_minus_b, b = (
        _dl(BM25_K1 + 1), _dl(BM25_K1), _dl(1 - BM25_B), _dl(BM25_B)
    )
    scored = tf.crossJoin(g).withColumn(
        "term_score",
        F.expr(
            f"{idf_sql} * (tf * {k1p1}) / "
            f"(tf + {k1} * ({one_minus_b} + {b} * dl / avgdl))"
        ),
    )
    return scored.groupBy("doc_id").agg(F.round(F.sum("term_score"), 6).alias("score"))


def _bm25_oracle(terms, limit_clause=""):
    quoted = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                        x -> length(x) > 1)) AS token
      FROM documents),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                     (SELECT avg(dl) FROM doclen) AS avgdl),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
           WHERE token IN ({quoted}) GROUP BY doc_id, token),
    idf AS (SELECT token, ln((stats.n_docs - df + 0.5) / (df + 0.5)) AS idf
            FROM (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token), stats),
    scored AS (
      SELECT tf.doc_id,
             idf.idf * (tf.tf * ({BM25_K1} + 1)) /
               (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * doclen.dl / stats.avgdl)) AS ts
      FROM tf JOIN idf USING (token) JOIN doclen USING (doc_id), stats)
    SELECT doc_id, round(sum(ts), 6) AS score FROM scored GROUP BY doc_id
    {limit_clause}
    """


@register(
    "bm25_keyword_topk",
    oracle=_bm25_oracle(
        BM25_QUERY_TERMS, "ORDER BY score DESC, doc_id ASC LIMIT 10"
    ),
    headline=True,
)
def bm25_keyword_topk(spark, sf_dir):
    # T2/A1: sparse keyword search with the reference's BM25 (robertson)
    scores = _bm25_scores_spark(spark, sf_dir, BM25_QUERY_TERMS)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


@register(
    "hybrid_rrf_search",
    oracle=f"""
    WITH dense_scored AS (
      SELECT a.vec_id AS doc_id, {_DD_COS} AS score
      FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ),
    dense AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS dense_rank
      FROM dense_scored ORDER BY score DESC, doc_id ASC LIMIT 30
    ),
    bm25 AS ({_bm25_oracle(BM25_QUERY_TERMS)}),
    sparse AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS sparse_rank
      FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 30
    )
    SELECT coalesce(d.doc_id, s.doc_id) AS doc_id,
           round(coalesce(0.5 / (60 + d.dense_rank), 0)
               + coalesce(0.5 / (60 + s.sparse_rank), 0), 6) AS rrf_score
    FROM dense d FULL OUTER JOIN sparse s ON d.doc_id = s.doc_id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 10
    """,
    headline=True,
)
def hybrid_rrf_search(spark, sf_dir):
    # T3/J1: the reference's flagship — hybrid search fusing dense cosine
    # and BM25 keyword rankings with RRF (k=60, alpha=0.5, 3x over-fetch).
    # documents.doc_id and embeddings.vec_id are aligned 1:1.
    from claude_code_memory_spark.operators.topk import rrf_fuse

    dense = (
        _query_vec_join(spark, sf_dir)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(30)
    )
    sparse = (
        _bm25_scores_spark(spark, sf_dir, BM25_QUERY_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(30)
    )
    return rrf_fuse(dense, sparse, k=10, id_col="doc_id").select("doc_id", "rrf_score")


@register(
    "knn_join_queries",
    oracle=f"""
    SELECT * FROM (
      SELECT qv.vec_id AS q_id, a.vec_id,
             {_DD_COS} AS score,
             row_number() OVER (PARTITION BY qv.vec_id
                                ORDER BY {_DD_COS} DESC, a.vec_id ASC) AS rnk
      FROM embeddings a,
           (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) qv(vec_id, embedding),
           LATERAL (SELECT qv.embedding AS embedding) q
      WHERE a.vec_id <> qv.vec_id)
    WHERE rnk <= 5
    """,
)
def knn_join_queries(spark, sf_dir):
    # J8: brute-force k-NN join — 5 query vectors vs the whole corpus
    from claude_code_memory_spark.operators.similarity import knn_join_sql

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return knn_join_sql(queries, emb, k=5).select("q_id", "vec_id", "score", "rnk")


@register(
    "vector_quantization_error",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_min(embedding)::DOUBLE AS mn,
             (list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE) / 255.0 AS step,
             embedding
      FROM embeddings),
    rec AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> abs(x::DOUBLE - (mn + round((x::DOUBLE - mn) / step) * step))) AS errs
      FROM q)
    SELECT vec_id, round(list_max(errs), 6) AS max_abs_err, len(errs) AS dim
    FROM rec
    ORDER BY vec_id
    """,
)
def vector_quantization_error(spark, sf_dir):
    """8-bit scalar quantization round-trip error per vector
    (operators/quantize.py): proves |x - dequantize(quantize(x))| <= step/2
    on real data, with the whole quantize/reconstruct pipeline in pure
    column expressions (JVM-side, no UDF). The ~4x byte shrink is the IO
    lever for 100 TB ANN scans."""
    from claude_code_memory_spark.operators.quantize import dequantize_vector, quantize_vector

    emb = table(spark, sf_dir, "embeddings")
    e2 = emb.select("vec_id", "embedding", quantize_vector("embedding").alias("q"))
    errs = F.zip_with(
        F.col("embedding"),
        dequantize_vector("q"),
        lambda a, b: F.abs(a.cast("double") - b),
    )
    return e2.select(
        "vec_id",
        F.round(F.array_max(errs), 6).alias("max_abs_err"),
        F.size("embedding").alias("dim"),
    ).orderBy("vec_id")


_DD_DOT = "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def _dd_d2(a: str, b: str) -> str:
    """Squared L2 via the dot identity — same float evaluation order as the
    Spark side (three sequential dot products)."""
    return (
        f"({_DD_DOT.format(a=a, b=a)} - 2 * {_DD_DOT.format(a=a, b=b)}"
        f" + {_DD_DOT.format(a=b, b=b)})"
    )


@register(
    "ann_ivf_probe",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id = 0),
    assigned AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT a.vec_id, a.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_dd_d2("a.embedding", "c.cvec")}, c.cid) AS rn
        FROM embeddings a CROSS JOIN cent c) t
      WHERE rn = 1),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (
                 ORDER BY {_dd_d2("c.cvec", "q.qvec")}, c.cid) AS rn
        FROM cent c CROSS JOIN q) t
      WHERE rn <= 2)
    SELECT a.vec_id,
           {_DD_COS} AS score
    FROM assigned a
    JOIN probe p ON a.cid = p.cid
    CROSS JOIN (SELECT qvec AS embedding FROM q) q
    WHERE a.vec_id <> 0
    ORDER BY score DESC, a.vec_id ASC
    LIMIT 10
    """,
)
def ann_ivf_probe(spark, sf_dir):
    """IVF ANN, deterministic-centroid variant (oracle-checked twin of the
    KMeans ivf_build path): centroids = first 8 vectors, assignment =
    argmin squared-L2 over a broadcast cross join, probe = 2 nearest
    clusters, exact cosine top-10 inside the probed clusters only. At
    100 TB the assignment is written partitioned by cluster id and the
    probe filter becomes partition pruning (operators/similarity.py)."""
    from claude_code_memory_spark.operators.similarity import ivf_seeded_topk

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return ivf_seeded_topk(emb, q, k=10, n_centroids=8, nprobe=2)


@register(
    "ivf_knn_join_batch",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    q AS (SELECT vec_id AS q_id, embedding AS qvec FROM embeddings WHERE vec_id < 25),
    assigned AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT a.vec_id, a.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_dd_d2("a.embedding", "c.cvec")}, c.cid) AS rn
        FROM embeddings a CROSS JOIN cent c) t
      WHERE rn = 1),
    probes AS (
      SELECT q_id, qvec, cid FROM (
        SELECT q.q_id, q.qvec, c.cid,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY {_dd_d2("q.qvec", "c.cvec")}, c.cid) AS rn
        FROM q CROSS JOIN cent c) t
      WHERE rn <= 2),
    scored AS (
      SELECT p.q_id, a.vec_id,
             round(list_dot_product(a.embedding::DOUBLE[], p.qvec::DOUBLE[]) /
                   (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(p.qvec::DOUBLE[], p.qvec::DOUBLE[]))), 6) AS score
      FROM assigned a JOIN probes p ON a.cid = p.cid
      WHERE a.vec_id <> p.q_id)
    SELECT q_id, vec_id, score, rnk FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rnk
      FROM scored) t
    WHERE rnk <= 3
    """,
)
def ivf_knn_join_batch(spark, sf_dir):
    """Batch ANN join, BOTH sides large (operators/similarity.py
    `ivf_knn_join`): 25 query vectors x the whole corpus through the
    shared-IVF-cell equi-join — each query probes its 2 nearest of 8
    deterministic centroids (first vectors by id, `ivf_seeded_build`),
    scoring touches only same-cell pairs. This is the 100 TB shape for
    corpus-vs-corpus kNN (dedup candidate generation, cross-encoder
    shortlist): cost Q x nprobe x N / n_centroids instead of Q x N, and
    the corpus side can be stored partitioned by `ivf_cluster` so only
    queries shuffle. Reference parity: batch search over the HNSW store
    (storage/qdrant.py:827-886), re-expressed as a relational join."""
    from claude_code_memory_spark.operators.similarity import (
        ivf_knn_join,
        ivf_seeded_build,
    )

    emb = table(spark, sf_dir, "embeddings")
    indexed, centers = ivf_seeded_build(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_knn_join(indexed, centers, queries, k=3, nprobe=2).select(
        "q_id", "vec_id", "score", "rnk"
    )


@register(
    "vector_pq_error",
    oracle=f"""
    WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    subs AS (
      SELECT vec_id, label, i AS sub_idx, v[(i*8+1):(i*8+8)] AS sv
      FROM emb, range(0, 8) t(i)),
    cb AS (
      SELECT i AS sub_idx, vec_id::INT AS code_id, v[(i*8+1):(i*8+8)] AS cv
      FROM emb, range(0, 8) t(i) WHERE vec_id < 16),
    best AS (
      SELECT s.vec_id, s.label, s.sub_idx,
             min(round({_dd_d2("s.sv", "c.cv")}, 6)) AS sub_err
      FROM subs s JOIN cb c USING (sub_idx)
      GROUP BY s.vec_id, s.label, s.sub_idx),
    pv AS (SELECT vec_id, label, sum(sub_err::DECIMAL(18,6)) AS e
           FROM best GROUP BY vec_id, label)
    SELECT label, count(*) AS n_vecs,
           round(sum(e)::DOUBLE / count(*), 6) AS avg_pq_err
    FROM pv GROUP BY label
    """,
)
def vector_pq_error(spark, sf_dir):
    """Product-quantization reconstruction error by label
    (operators/quantize.py `pq_seeded_codebook`/`pq_encode`): 64-dim
    vectors split into 8 subspaces, coded against a 16-codeword seeded
    codebook — 8 bytes/vector, the FAISS `PQ8` layout and the next
    compression rung after SQ8's 4x. Per-subspace squared errors are
    rounded before the argmin (code choice is partition/engine
    invariant) and summed as DECIMAL, so the whole encode pipeline is
    replayed exactly by the oracle. Average total squared error per
    label quantifies the recall/bytes trade the ADC scan (`pq_topk`)
    rides at 100 TB."""
    from claude_code_memory_spark.operators.quantize import (
        pq_encode,
        pq_seeded_codebook,
    )

    from claude_code_memory_spark.queries.base import spread

    emb = table(spark, sf_dir, "embeddings")
    # dim=64 matches the fixture; pq_split raises loudly on a mismatch
    cb = pq_seeded_codebook(emb, dim=64, m=8, k_codes=16)
    # r12 (guide §2.5): spread the encode input — the m x k argmin per
    # row ran in the fixture's single scan partition otherwise
    codes = pq_encode(spread(spark, emb), cb, dim=64, m=8, keep=("vec_id", "label"))
    per_vec = codes.groupBy("vec_id", "label").agg(
        F.sum(F.col("sub_err").cast("decimal(18,6)")).alias("e")
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.sum(F.col("e")).cast("double") / F.count("*"), 6).alias("avg_pq_err"),
    )


def _pq_kmeans_ctes(iters: int = 2) -> str:
    """CTE chain replaying `pq_trained_codebook` (kmeans_lloyd_grouped
    over 8 subspaces, 16 codes): seeded init (fixture ids are dense from
    0, so first-16-per-group == vec_id < 16), raw-d2 argmin, decimal
    means rounded to 6 dp. Terminal CTE: ``cb{iters}``."""
    parts = [
        "emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)",
        """subs AS (
      SELECT vec_id, label, i AS sub_idx, v[(i*8+1):(i*8+8)] AS sv
      FROM emb, range(0, 8) t(i))""",
        "cb0 AS (SELECT sub_idx, vec_id::INT AS code_id, sv AS cv"
        " FROM subs WHERE vec_id < 16)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""ga{i} AS (
      SELECT sub_idx, vec_id, sv, code_id FROM (
        SELECT s.sub_idx, s.vec_id, s.sv, c.code_id,
               row_number() OVER (PARTITION BY s.sub_idx, s.vec_id
                 ORDER BY {_dd_d2("s.sv", "c.cv")}, c.code_id) AS rn
        FROM subs s JOIN cb{i - 1} c USING (sub_idx)) t
      WHERE rn = 1)"""
        )
        parts.append(
            f"""gm{i} AS (
      SELECT sub_idx, code_id, pos,
             round(sum(val::DECIMAL(38,12))::DOUBLE / count(*), 6) AS m
      FROM (SELECT sub_idx, code_id, unnest(sv) AS val,
                   generate_subscripts(sv, 1) AS pos FROM ga{i}) t
      GROUP BY 1, 2, 3)"""
        )
        parts.append(
            f"cb{i} AS (SELECT sub_idx, code_id, list(m ORDER BY pos) AS cv"
            f" FROM gm{i} GROUP BY 1, 2)"
        )
    return ",\n    ".join(parts)


@register(
    "vector_pq_trained_error",
    oracle=f"""
    WITH {_pq_kmeans_ctes(iters=2)},
    best AS (
      SELECT s.vec_id, s.label, s.sub_idx,
             min(round({_dd_d2("s.sv", "c.cv")}, 6)) AS sub_err
      FROM subs s JOIN cb2 c USING (sub_idx)
      GROUP BY s.vec_id, s.label, s.sub_idx),
    pv AS (SELECT vec_id, label, sum(sub_err::DECIMAL(18,6)) AS e
           FROM best GROUP BY vec_id, label)
    SELECT label, count(*) AS n_vecs,
           round(sum(e)::DOUBLE / count(*), 6) AS avg_pq_err
    FROM pv GROUP BY label
    """,
)
def vector_pq_trained_error(spark, sf_dir):
    """PQ reconstruction error with Lloyd-TRAINED subspace codebooks
    (operators/quantize.py `pq_trained_codebook` →
    clustering.py `kmeans_lloyd_grouped`): all 8 subspace k-means runs
    execute as one grouped plan (assignment joins on sub_idx with the
    m x k codebook broadcast; updates aggregate by (sub_idx, code,
    dim)). Error is strictly below the seeded codebook's at the same
    8-byte code size (tests pin the inequality); the entire two-round
    training chain replays in the oracle, proving the grouped trainer
    partition-invariant end to end."""
    from claude_code_memory_spark.operators.quantize import (
        pq_encode,
        pq_trained_codebook,
    )

    from claude_code_memory_spark.queries.base import spread

    # r12 (guide §2.5 input skew): spread — the one-file fixture scans
    # as a single partition, and both the Lloyd iteration jobs and the
    # m x k-candidate argmin encode ran in that one task (measured
    # ~2.6-core utilization). A real corpus takes spread's no-op branch.
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    cb = pq_trained_codebook(emb, dim=64, m=8, k_codes=16, iters=2)
    codes = pq_encode(emb, cb, dim=64, m=8, keep=("vec_id", "label"))
    per_vec = codes.groupBy("vec_id", "label").agg(
        F.sum(F.col("sub_err").cast("decimal(18,6)")).alias("e")
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.sum(F.col("e")).cast("double") / F.count("*"), 6).alias("avg_pq_err"),
    )


@register(
    "vector_pq_adc_topk",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM emb WHERE vec_id = 3),
    subs AS (
      SELECT vec_id, i AS sub_idx, v[(i*8+1):(i*8+8)] AS sv
      FROM emb, range(0, 8) t(i)),
    cb AS (
      SELECT i AS sub_idx, vec_id::INT AS code_id, v[(i*8+1):(i*8+8)] AS cv
      FROM emb, range(0, 8) t(i) WHERE vec_id < 16),
    codes AS (
      SELECT vec_id, sub_idx, code_id FROM (
        SELECT s.vec_id, s.sub_idx, c.code_id,
               row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
                 ORDER BY round({_dd_d2("s.sv", "c.cv")}, 6), c.code_id) AS rn
        FROM subs s JOIN cb c USING (sub_idx)) t
      WHERE rn = 1),
    dtable AS (
      SELECT c.sub_idx, c.code_id,
             round({_dd_d2("q.qsv", "c.cv")}, 6) AS qd2
      FROM (SELECT i AS sub_idx, qv[(i*8+1):(i*8+8)] AS qsv
            FROM q, range(0, 8) t(i)) q
      JOIN cb c USING (sub_idx)),
    dists AS (
      SELECT k.vec_id,
             round(sum(d.qd2::DECIMAL(18,6))::DOUBLE, 6) AS approx_d2
      FROM codes k JOIN dtable d USING (sub_idx, code_id)
      GROUP BY k.vec_id)
    SELECT vec_id, approx_d2 FROM dists
    ORDER BY approx_d2 ASC, vec_id ASC LIMIT 10
    """,
)
def vector_pq_adc_topk(spark, sf_dir):
    """The PQ asymmetric-distance scan itself, oracle-checked
    (operators/quantize.py `pq_topk`): query = vector 3, seeded PQ8x16
    codebook, approximate distance = sum of 8 per-subspace table entries
    (rounded then DECIMAL-summed — rank order is partition/engine
    invariant, ties broken by id). The scan's per-vector cost is 8
    lookups over 8-byte codes; the oracle replays codebook, encoding,
    distance table, and the final ranking end to end, completing oracle
    coverage of the ANN family (brute/LSH/IVF/IVF-join/SQ8/PQ)."""
    from claude_code_memory_spark.operators.quantize import (
        pq_encode,
        pq_seeded_codebook,
        pq_topk,
    )

    from claude_code_memory_spark.queries.base import spread

    emb = table(spark, sf_dir, "embeddings")
    cb = pq_seeded_codebook(emb, dim=64, m=8, k_codes=16)
    # r12 (guide §2.5): spread the encode input (single-split fixture
    # scan); the query-vector fetch stays on the raw scan
    codes = pq_encode(spread(spark, emb), cb, dim=64, m=8)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    return pq_topk(codes, cb, q, k=10)


@register(
    "vector_ivfpq_adc_topk",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cvec FROM emb WHERE vec_id < 8),
    q AS (SELECT v AS qv FROM emb WHERE vec_id = 3),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_dd_d2("a.v", "c.cvec")}, c.cid) AS rn
        FROM emb a CROSS JOIN cent c) t
      WHERE rn = 1),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (
                 ORDER BY {_dd_d2("c.cvec", "q.qv")}, c.cid) AS rn
        FROM cent c CROSS JOIN q) t
      WHERE rn <= 2),
    subs AS (
      SELECT vec_id, i AS sub_idx, v[(i*8+1):(i*8+8)] AS sv
      FROM emb, range(0, 8) t(i)),
    cb AS (
      SELECT i AS sub_idx, vec_id::INT AS code_id, v[(i*8+1):(i*8+8)] AS cv
      FROM emb, range(0, 8) t(i) WHERE vec_id < 16),
    codes AS (
      SELECT vec_id, sub_idx, code_id FROM (
        SELECT s.vec_id, s.sub_idx, c.code_id,
               row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
                 ORDER BY round({_dd_d2("s.sv", "c.cv")}, 6), c.code_id) AS rn
        FROM subs s JOIN cb c USING (sub_idx)) t
      WHERE rn = 1),
    cell_codes AS (
      SELECT k.vec_id, k.sub_idx, k.code_id
      FROM codes k JOIN assigned a USING (vec_id)
      JOIN probe p ON a.cid = p.cid),
    dtable AS (
      SELECT c.sub_idx, c.code_id,
             round({_dd_d2("qs.qsv", "c.cv")}, 6) AS qd2
      FROM (SELECT i AS sub_idx, qv[(i*8+1):(i*8+8)] AS qsv
            FROM q, range(0, 8) t(i)) qs
      JOIN cb c USING (sub_idx)),
    dists AS (
      SELECT k.vec_id,
             round(sum(d.qd2::DECIMAL(18,6))::DOUBLE, 6) AS approx_d2
      FROM cell_codes k JOIN dtable d USING (sub_idx, code_id)
      GROUP BY k.vec_id)
    SELECT vec_id, approx_d2 FROM dists
    ORDER BY approx_d2 ASC, vec_id ASC LIMIT 10
    """,
)
def vector_ivfpq_adc_topk(spark, sf_dir):
    """The full IVF,PQ composite, driver-checkable end to end: seeded
    IVF cells (centroids = first 8 vectors, dot-identity argmin), probe
    = the query's 2 nearest cells computed IN-PLAN (same expression /
    tie-break as the oracle — a driver-side numpy argsort could break
    float ties differently), seeded PQ8x16 codebook, and the ADC scan
    restricted to the probed cells' codes. DuckDB replays centroid
    assignment, probe selection, codebook, encoding, distance table,
    and the final ranking — closing the last oracle gap in the ANN
    family (the trained/Lloyd variants are pinned by pytest recall and
    error-inequality tests; this is the replayable twin)."""
    from claude_code_memory_spark.functions.vector import dot
    from claude_code_memory_spark.operators.quantize import (
        pq_encode,
        pq_seeded_codebook,
        pq_topk,
    )
    from claude_code_memory_spark.operators.similarity import ivf_seeded_build

    from claude_code_memory_spark.queries.base import spread

    emb = table(spark, sf_dir, "embeddings")
    # r12 (guide §2.5): spread the IVF-assignment + PQ-encode input —
    # argmin over centroids plus the m x k encode ran in the fixture's
    # single scan partition otherwise
    assigned, _centers = ivf_seeded_build(spread(spark, emb), 8)
    cb = pq_seeded_codebook(emb, dim=64, m=8, k_codes=16)
    codes = pq_encode(assigned, cb, dim=64, m=8, keep=("vec_id", "ivf_cluster"))
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    qdf = emb.filter(F.col("vec_id") == 3).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    d2 = (
        dot(F.col("cvec"), F.col("cvec"))
        - 2 * dot(F.col("cvec"), F.col("qv"))
        + dot(F.col("qv"), F.col("qv"))
    )
    probe = (
        cent.crossJoin(F.broadcast(qdf))
        .withColumn("__d2", d2)
        .orderBy("__d2", "cid")
        .limit(2)
        .select("cid")
    )
    cell_codes = codes.join(
        F.broadcast(probe), codes["ivf_cluster"] == F.col("cid")
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    return pq_topk(cell_codes, cb, qvec, k=10)


@register(
    "ann_hard_negatives",
    oracle=f"""
    SELECT * FROM (
      SELECT qv.vec_id AS q_id, qv.label AS q_label,
             a.vec_id, a.label, {_DD_COS} AS score,
             row_number() OVER (PARTITION BY qv.vec_id
                                ORDER BY {_DD_COS} DESC, a.vec_id ASC) AS rnk
      FROM embeddings a,
           (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 8)
             qv(vec_id, label, embedding),
           LATERAL (SELECT qv.embedding AS embedding) q
      WHERE a.vec_id <> qv.vec_id AND a.label <> qv.label)
    WHERE rnk <= 3
    """,
)
def ann_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive / embedding training (the
    sentence-transformers ANCE/RocketQA recipe): for each of 8 anchor
    vectors, the 3 most-similar corpus vectors carrying a DIFFERENT
    label — the near-miss negatives that make a contrastive batch
    informative, as opposed to random negatives the model already
    separates.

    Plan shape = the `knn_join_queries` broadcast kNN join with the
    label-mismatch predicate fused into the scoring pass: anchors (a
    handful of rows) broadcast onto the corpus scan, same-label pairs
    drop BEFORE the per-anchor top-k window, so the shuffled window
    input is the scored survivors only. At production scale the anchor
    set is a training batch (10^2-10^4 rows) — still broadcast-sized —
    and the window key space matches the anchor count, so parallelism
    scales with the batch, never the corpus. Reference parity: scored
    similarity search with payload filtering (storage/qdrant.py
    search + filter facade), repurposed as a training-data miner."""
    emb = table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter((F.col("vec_id") != F.col("q_id")) & (F.col("label") != F.col("q_label")))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
