"""Distributed classifier training as DataFrame algebra — the quality-
classifier piece of a training-data pipeline (GPT-3/LLaMA-style corpora
train a linear model to score documents against a 'high-quality'
reference; CCNet uses an LM, `lm_bigram_doc_scores` covers that arm).

Logistic regression by full-batch gradient descent, every iteration a
single map-side-combined aggregate over the corpus: the model (3
weights) broadcasts into the row expression, per-row gradient
contributions round to 8 dp and sum as DECIMAL (partition-order-
invariant — the k-means/PageRank determinism recipe), and the weight
update is one driver round-trip per iteration (bounded: 3 iterations,
the Lloyd/PageRank shape — the corpus never moves, the model does).
The DuckDB oracle replays the ENTIRE training loop — features, sigmoid,
gradient sums, weight updates — so a drifting iteration breaks the
driver hash, exactly like the Lloyd CTE chain in clusterq.py.

At 100 TB: per iteration one scan + a 3-number aggregate; nothing else
shuffles. exp() agrees cross-engine at 6-dp-rounded inputs (the BM25
ln precedent), and every intermediate is re-rounded before reuse so no
accumulated ulp can flip a hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from claude_code_memory_spark.queries.base import register, spread, table

_LR = 1.0
_ITERS = 3

# features (replayed verbatim in the oracle):
#   x1 = round(least(n_chars / 500, 2), 6)      — length signal
#   x2 = round(least(ws_tokens / 100, 2), 6)    — token-count signal
# label y = (lang = 'en')
_DD_X1 = "round(least(length(text) / 500.0, 2.0), 6)"
_DD_X2 = (
    "round(least(len(list_filter(string_split_regex(text, '\\s+'),"
    " t -> length(t) > 0)) / 100.0, 2.0), 6)"
)


def _logreg_oracle(iters: int = _ITERS, lr: float = _LR) -> str:
    parts = [
        f"""feats AS (
      SELECT {_DD_X1} AS x1, {_DD_X2} AS x2,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents)""",
        "w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2)",
    ]
    for i in range(1, iters + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""g{i} AS (
      SELECT count(*) AS n,
             sum(CAST(round((f.y - round(1.0 / (1.0 + exp(-round(w.b + w.w1 * f.x1 + w.w2 * f.x2, 6))), 8)) * 1.0, 8) AS DECIMAL(28,8))) AS gb,
             sum(CAST(round((f.y - round(1.0 / (1.0 + exp(-round(w.b + w.w1 * f.x1 + w.w2 * f.x2, 6))), 8)) * f.x1, 8) AS DECIMAL(28,8))) AS g1,
             sum(CAST(round((f.y - round(1.0 / (1.0 + exp(-round(w.b + w.w1 * f.x1 + w.w2 * f.x2, 6))), 8)) * f.x2, 8) AS DECIMAL(28,8))) AS g2
      FROM feats f CROSS JOIN {prev} w)""",
        )
        parts.append(
            f"""w{i} AS (
      SELECT round(w.b + {lr} * (g.gb::DOUBLE / g.n), 6) AS b,
             round(w.w1 + {lr} * (g.g1::DOUBLE / g.n), 6) AS w1,
             round(w.w2 + {lr} * (g.g2::DOUBLE / g.n), 6) AS w2
      FROM {prev} w CROSS JOIN g{i} g)""",
        )
    final = f"w{iters}"
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT w.b, w.w1, w.w2,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(CASE WHEN (round(1.0 / (1.0 + exp(-round(w.b + w.w1 * f.x1 + w.w2 * f.x2, 6))), 8) >= 0.5) = (f.y = 1.0)
                          THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS train_accuracy
    FROM feats f CROSS JOIN {final} w
    GROUP BY w.b, w.w1, w.w2
    """


@register("ml_logreg_quality", oracle=_logreg_oracle())
def ml_logreg_quality(spark, sf_dir):
    """Train a 3-weight logistic classifier (is-English from length +
    token-count signals) by 3 full-batch GD steps, then report the
    weights and training accuracy. See the module docstring for the
    determinism and scale contracts; the oracle replays every step."""
    from claude_code_memory_spark.functions.text import whitespace_token_count

    d = spread(spark, table(spark, sf_dir, "documents"))
    feats = d.select(
        F.round(F.least(F.length("text") / 500.0, F.lit(2.0)), 6).alias("x1"),
        F.round(
            F.least(whitespace_token_count("text") / 100.0, F.lit(2.0)), 6
        ).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).persist()

    def p_of(b: float, w1: float, w2: float):
        z = F.round(
            F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2"), 6
        )
        return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 8)

    def _round6(x: float) -> float:
        # SQL ROUND semantics (half away from zero) — Python's built-in
        # round() is banker's and could flip a hash at a .5 boundary
        import math

        s = -1.0 if x < 0 else 1.0
        return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6

    b = w1 = w2 = 0.0
    for _ in range(_ITERS):
        p = p_of(b, w1, w2)
        resid = F.col("y") - p
        row = feats.agg(
            F.count("*").alias("n"),
            F.sum(F.round(resid * 1.0, 8).cast("decimal(28,8)")).alias("gb"),
            F.sum(F.round(resid * F.col("x1"), 8).cast("decimal(28,8)")).alias("g1"),
            F.sum(F.round(resid * F.col("x2"), 8).cast("decimal(28,8)")).alias("g2"),
        ).first()
        n = row["n"]
        b = _round6(b + _LR * (float(row["gb"]) / n))
        w1 = _round6(w1 + _LR * (float(row["g1"]) / n))
        w2 = _round6(w2 + _LR * (float(row["g2"]) / n))

    p = p_of(b, w1, w2)
    correct = ((p >= 0.5) == (F.col("y") == 1.0)).cast("long")
    out = feats.agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum(correct) / F.count("*").cast("double"), 4).alias(
            "train_accuracy"
        ),
    ).select(
        F.lit(b).alias("b"),
        F.lit(w1).alias("w1"),
        F.lit(w2).alias("w2"),
        "n_docs",
        "train_accuracy",
    )
    feats.unpersist()
    return out


@register(
    "mixture_domain_weights",
    oracle="""
    WITH tok AS (
      SELECT lang,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> length(x) > 0)) AS toks
      FROM documents),
    dom AS (SELECT lang, count(*) AS n_docs,
                   CAST(sum(toks) AS BIGINT) AS tokens
            FROM tok GROUP BY lang),
    tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS all_toks FROM dom),
    raw AS (SELECT lang, n_docs, tokens,
                   round(tokens / (1.0 * all_toks), 6) AS token_share,
                   round(pow(tokens / (1.0 * all_toks), 0.5), 6) AS w_raw
            FROM dom, tot),
    norm AS (SELECT round(sum(w_raw), 6) AS z FROM raw)
    SELECT lang, n_docs, tokens, token_share,
           round(w_raw / z, 6) AS weight
    FROM raw, norm ORDER BY lang
    """,
)
def mixture_domain_weights(spark, sf_dir):
    """Temperature-scaled domain mixture weights — the multilingual-
    training sampling recipe (mBERT/XLM-R alpha-sampling; DoReMi learns
    the same vector iteratively): per language, its token share is
    raised to tau=0.5 and renormalized, up-sampling tail domains so the
    mixture doesn't collapse onto the head. Two map-side-combined
    aggregates (domain rollup, then the normalizer as a broadcast
    1-row cross join — domains are few even at 100 TB, so nothing here
    is data-sized after the first rollup). Intermediates round to 6 dp
    before reuse so the weights hash identically cross-engine."""
    from claude_code_memory_spark.functions.text import whitespace_token_count

    d = table(spark, sf_dir, "documents")
    dom = (
        d.select("lang", whitespace_token_count("text").alias("toks"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("tokens"))
    )
    tot = F.broadcast(dom.agg(F.sum("tokens").alias("all_toks")))
    raw = dom.crossJoin(tot).select(
        "lang",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / F.col("all_toks"), 6).alias("token_share"),
        F.round(F.pow(F.col("tokens") / F.col("all_toks"), 0.5), 6).alias("w_raw"),
    )
    z = F.broadcast(raw.agg(F.round(F.sum("w_raw"), 6).alias("z")))
    return (
        raw.crossJoin(z)
        .select(
            "lang",
            "n_docs",
            "tokens",
            "token_share",
            F.round(F.col("w_raw") / F.col("z"), 6).alias("weight"),
        )
        .orderBy("lang")
    )


# -- DSIR: hashed-n-gram importance weights for targeted data selection --
#
# B buckets keep the feature table at a FIXED size regardless of corpus
# or vocabulary scale — that is the whole point of the hashing trick in
# DSIR (Xie et al. 2023, arXiv:2302.03169): the target/raw count table is
# B rows, broadcastable at ANY corpus size, so scoring never shuffles the
# corpus by token.
_DSIR_B = 1024
# portable 32-bit token hash (the md5-prefix idiom every dedup oracle uses)
_DD_DSIR_TOK = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 1)"
)


@register(
    "sample_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(t.tk), 1, 8))::UBIGINT::BIGINT % {_DSIR_B} AS b
      FROM (SELECT doc_id, lang, unnest({_DD_DSIR_TOK}) AS tk FROM documents) t),
    cnt AS (
      SELECT b, count(*) AS n_raw,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
      FROM tok GROUP BY b),
    tot AS (
      SELECT CAST(sum(n_raw) AS BIGINT) AS tot_raw,
             CAST(sum(n_tgt) AS BIGINT) AS tot_tgt
      FROM cnt),
    lr AS (
      SELECT b,
             round(ln(round(((n_tgt + 1.0) * (tot_raw + {_DSIR_B})) /
                            ((n_raw + 1.0) * (tot_tgt + {_DSIR_B})), 6)), 6) AS lr
      FROM cnt CROSS JOIN tot),
    scored AS (
      SELECT t.doc_id, t.lang,
             round(sum(CAST(lr.lr AS DECIMAL(38,12)))::DOUBLE, 6) AS dsir_weight
      FROM tok t JOIN lr ON t.b = lr.b
      GROUP BY t.doc_id, t.lang)
    SELECT doc_id, lang, dsir_weight FROM scored
    ORDER BY dsir_weight DESC, doc_id ASC LIMIT 50
    """,
)
def sample_dsir_importance(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score every
    document by how much its hashed-unigram distribution looks like a
    target domain (here lang='en') versus the raw corpus, as the sum of
    per-token log-likelihood ratios under add-1-smoothed bucket
    distributions; return the top 50 candidates for the training mix.

    The hashing trick is the scale contract: tokens map to B=1024 md5
    buckets, so the target/raw count table is B rows — broadcast to the
    scoring join at ANY corpus size (a raw-vocab variant would be a
    billions-row table needing a corpus-wide token shuffle; see the
    lm_bigram scale note). Plan: one tokenize+explode of the corpus
    (persisted across its two consumers), one map-side-combined B-key
    aggregate, a 1-row totals broadcast, then the broadcast scoring join
    and one doc-keyed aggregate — the corpus shuffles exactly once (by
    doc_id) and the top-50 is TakeOrderedAndProject, never a global sort.
    The log-ratio rounds to 6 dp before the decimal sum so the per-doc
    weight is partition-order invariant (the k-means determinism recipe).
    Complements `mixture_domain_weights` (per-DOMAIN sampling rates):
    DSIR picks individual documents, the mixture weights pick domains.
    Reference parity: progressive-disclosure relevance ranking
    (storage/qdrant.py search facade) re-expressed as corpus curation."""
    from claude_code_memory_spark.functions.text import tokenize

    d = spread(spark, table(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", "lang", F.explode(tokenize("text")).alias("tk"))
        .select(
            "doc_id",
            "lang",
            (F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long") % _DSIR_B).alias("b"),
        )
        .persist()
    )
    cnt = tok.groupBy("b").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_tgt"),
    )
    tot = F.broadcast(
        cnt.agg(
            F.sum("n_raw").cast("long").alias("tot_raw"),
            F.sum("n_tgt").cast("long").alias("tot_tgt"),
        )
    )
    lr = cnt.crossJoin(tot).select(
        "b",
        F.round(
            F.log(
                F.round(
                    ((F.col("n_tgt") + 1.0) * (F.col("tot_raw") + _DSIR_B))
                    / ((F.col("n_raw") + 1.0) * (F.col("tot_tgt") + _DSIR_B)),
                    6,
                )
            ),
            6,
        ).alias("lr"),
    )
    scored = (
        tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.sum(F.col("lr").cast("decimal(38,12)")).cast("double"), 6
            ).alias("dsir_weight")
        )
    )
    return scored.orderBy(F.desc("dsir_weight"), F.asc("doc_id")).limit(50)


@register(
    "knn_classify_majority",
    oracle="""
    WITH scored AS (
      SELECT q.vec_id AS q_id, q.label AS true_label,
             a.vec_id AS n_id, a.label AS n_label,
             round(list_dot_product(a.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS score
      FROM embeddings a, (SELECT * FROM embeddings WHERE vec_id < 20) q
      WHERE a.vec_id >= 20),
    nn AS (
      SELECT * FROM (
        SELECT q_id, true_label, n_label, score, n_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, n_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 5),
    votes AS (
      SELECT q_id, true_label, n_label, count(*) AS v
      FROM nn GROUP BY q_id, true_label, n_label),
    pred AS (
      SELECT q_id, true_label, n_label AS pred_label
      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY v DESC, n_label ASC) AS pr
            FROM votes)
      WHERE pr = 1)
    SELECT q_id, true_label, pred_label,
           (pred_label = true_label) AS correct
    FROM pred
    """,
)
def knn_classify_majority(spark, sf_dir):
    """k-NN probe classifier (k=5, majority vote, ties to the smaller
    label): the standard embedding-quality evaluation — hold out the
    first 20 vectors as queries, classify each by its 5 nearest
    labeled neighbors in the rest of the corpus. The broadcast-query
    kNN join is the only corpus-scale stage (parallelism scales with
    the corpus, per-query cost with the 20-row broadcast); the vote is
    two aggregates over 100 rows. The same shape evaluates any learned
    embedding at 100 TB — the probe set stays broadcastable by design."""
    from claude_code_memory_spark.operators.similarity import knn_join_sql

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("true_label"),
    )
    # r12 (guide §2.5): spread — the 20 dot products per corpus row ran
    # in the fixture's single scan partition (measured 1.5-core util)
    from claude_code_memory_spark.queries.base import spread

    corpus = spread(spark, emb.filter(F.col("vec_id") >= 20))
    nn = knn_join_sql(queries, corpus, k=5).join(
        corpus.select(F.col("vec_id"), F.col("label").alias("n_label")), "vec_id"
    )
    votes = nn.groupBy("q_id", "n_label").agg(F.count("*").alias("v"))
    w = Window.partitionBy("q_id").orderBy(F.desc("v"), F.asc("n_label"))
    pred = (
        votes.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select("q_id", F.col("n_label").alias("pred_label"))
    )
    return (
        queries.select("q_id", "true_label")
        .join(pred, "q_id")
        .select(
            "q_id",
            "true_label",
            "pred_label",
            (F.col("pred_label") == F.col("true_label")).alias("correct"),
        )
    )


@register(
    "mixture_lang_source_mi",
    oracle="""
    WITH joint AS (
      SELECT lang, source, count(*)::DOUBLE AS n FROM documents GROUP BY lang, source),
    tot AS (SELECT sum(n) AS t FROM joint),
    pl AS (SELECT lang, sum(n) AS nl FROM joint GROUP BY lang),
    ps AS (SELECT source, sum(n) AS ns FROM joint GROUP BY source)
    SELECT round(sum((n / t) * ln(greatest(round((n * t) / (nl * ns), 6), 1e-6))), 6) AS mutual_information,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM joint JOIN pl USING (lang) JOIN ps USING (source) CROSS JOIN tot
    """,
)
def mixture_lang_source_mi(spark, sf_dir):
    """Mutual information between language and source over the corpus —
    the mixture-confound diagnostic: MI near 0 means language is
    balanced across sources; high MI means sources are language silos,
    so per-source sampling quotas double as (unintended) language
    quotas. Sums p(l,s)·ln(p(l,s)/(p(l)p(s))) over the joint table,
    which has |langs|×|sources| rows — contingency-table-sized at any
    corpus scale, so everything after the first count aggregate is
    broadcast-trivial. The inner ratio rounds to 6 dp before ln so the
    DuckDB replay is bit-stable, and is clamped to >= 1e-6 (the smallest
    positive 6-dp value) because a skewed cell whose ratio rounds to 0
    would otherwise diverge: Spark's log(0) is NULL (term silently
    dropped from the sum) while DuckDB's ln(0) is -inf."""
    d = table(spark, sf_dir, "documents")
    joint = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("n")
    )
    tot = F.broadcast(joint.agg(F.sum("n").alias("t")))
    pl = F.broadcast(joint.groupBy("lang").agg(F.sum("n").alias("nl")))
    ps = F.broadcast(joint.groupBy("source").agg(F.sum("n").alias("ns")))
    return (
        joint.join(pl, "lang")
        .join(ps, "source")
        .crossJoin(tot)
        .agg(
            F.round(
                F.sum(
                    (F.col("n") / F.col("t"))
                    * F.log(
                        F.greatest(
                            F.round(
                                (F.col("n") * F.col("t"))
                                / (F.col("nl") * F.col("ns")),
                                6,
                            ),
                            F.lit(1e-6),
                        )
                    )
                ),
                6,
            ).alias("mutual_information"),
            F.count("*").alias("n_cells"),
        )
    )


@register(
    "corpus_epoch_allocation",
    oracle="""
    WITH tok AS (
      SELECT lang,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> length(x) > 0)) AS toks
      FROM documents),
    dom AS (SELECT lang, CAST(sum(toks) AS BIGINT) AS tokens
            FROM tok GROUP BY lang),
    tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS all_toks FROM dom),
    raw AS (SELECT lang, tokens,
                   round(pow(tokens / (1.0 * all_toks), 0.5), 6) AS w_raw
            FROM dom, tot),
    norm AS (SELECT round(CAST(sum(CAST(w_raw AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS z FROM raw),
    w AS (SELECT lang, tokens, round(w_raw / z, 6) AS weight FROM raw, norm)
    SELECT lang, tokens, weight,
           CAST(round(1000000 * weight, 0) AS BIGINT) AS alloc_tokens,
           round(CAST(round(1000000 * weight, 0) AS BIGINT) / (1.0 * tokens), 4)
             AS epochs
    FROM w ORDER BY lang
    """,
)
def corpus_epoch_allocation(spark, sf_dir):
    """Token-budget allocation from temperature weights: given the
    tau=0.5 mixture weights (`mixture_domain_weights`' recipe) and a
    fixed training budget (1M tokens here), each language's allocation
    is budget*weight and `epochs` = allocation / available tokens — the
    number that tells you which tail language the mixture will repeat
    (epochs > 1 → upsampled past one pass, the memorization-risk
    signal data-mixture planning watches). Domain-cardinality-sized
    after the first rollup; every intermediate rounds to 6 dp (weights)
    / 4 dp (epochs) so the DuckDB replay hashes identically."""
    from claude_code_memory_spark.functions.text import whitespace_token_count

    d = table(spark, sf_dir, "documents")
    dom = d.groupBy("lang").agg(
        F.sum(whitespace_token_count(F.col("text"))).cast("long").alias("tokens")
    )
    tot = F.broadcast(dom.agg(F.sum("tokens").alias("all_toks")))
    raw = dom.crossJoin(tot).select(
        "lang",
        "tokens",
        F.round(F.pow(F.col("tokens") / F.col("all_toks"), 0.5), 6).alias("w_raw"),
    )
    # w_raw terms are 6-dp doubles but double addition is order-dependent;
    # sum exactly in decimal(38,12) (round-4 determinism recipe, PLANS.md)
    # so the normalizer is partition-order-invariant and matches DuckDB.
    norm = F.broadcast(
        raw.agg(
            F.round(F.sum(F.col("w_raw").cast("decimal(38,12)")).cast("double"), 6).alias("z")
        )
    )
    w = raw.crossJoin(norm).select(
        "lang", "tokens", F.round(F.col("w_raw") / F.col("z"), 6).alias("weight")
    )
    alloc = F.round(F.lit(1_000_000) * F.col("weight"), 0).cast("long")
    return w.select(
        "lang",
        "tokens",
        "weight",
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("tokens"), 4).alias("epochs"),
    )
