"""Training-data pipeline queries: deterministic splits, stratified
sampling, decontamination, and a 2-hop graph traversal over the driver
tables (the relational twin of api.read_graph's BFS, T7).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.dedup import contaminated_docs
from claude_code_memory_spark.operators.sampling import (
    BUCKETS,
    deterministic_split,
    stratified_sample,
)
from claude_code_memory_spark.queries.base import register, table

# DuckDB twin of sampling.hash_bucket
_DD_BUCKET = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT::BIGINT % 10000"


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN {_DD_BUCKET} < 8000 THEN 'train'
                  WHEN {_DD_BUCKET} < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    GROUP BY split
    """,
)
def split_train_val_test(spark, sf_dir):
    """80/10/10 deterministic split: pure function of doc_id, so the split
    is identical on any cluster size/partitioning (rand()-based splits are
    not) and the oracle replays it exactly."""
    d = table(spark, sf_dir, "documents")
    s = deterministic_split(
        d, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id"
    )
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT lang, count(*) AS n_docs
    FROM documents
    WHERE (lang = 'en' AND {_DD_BUCKET} < 2000)
       OR (lang = 'de' AND {_DD_BUCKET} < 5000)
    GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark, sf_dir):
    """Per-language deterministic downsampling (20% en, 50% de, drop the
    rest) — the reproducible twin of DataFrame.sampleBy for corpus
    rebalancing."""
    d = table(spark, sf_dir, "documents")
    s = stratified_sample(
        d, {"en": 0.2, "de": 0.5}, stratum_col="lang", key_col="doc_id"
    )
    return s.groupBy("lang").agg(F.count("*").alias("n_docs"))


@register(
    "decontaminate_vs_benchmark",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> length(x) > 1) AS t
      FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                           FOR i IN range(1, greatest(len(t) - 4, 0) + 1)])) AS shingle
      FROM toks WHERE len(t) >= 5),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
    train AS (SELECT * FROM sh WHERE doc_id >= 20)
    SELECT train.doc_id, count(*) AS n_hits
    FROM train JOIN bench USING (shingle)
    GROUP BY train.doc_id
    """,
)
def decontaminate_vs_benchmark(spark, sf_dir):
    """Contamination probe: training docs (id >= 20) sharing any 5-gram
    with the benchmark set (id < 20). Benchmark shingles broadcast; cost
    scales with their postings, not the corpus cross product."""
    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 20)
    train = d.filter(F.col("doc_id") >= 20)
    return contaminated_docs(train, bench, n=5)


@register(
    "graph_bfs2_brand_parts",
    oracle="""
    WITH seeds AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
    hop1 AS (
      SELECT DISTINCT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM seeds)),
    hop2 AS (
      SELECT DISTINCT l_partkey FROM lineitem
      WHERE l_suppkey IN (SELECT l_suppkey FROM hop1))
    SELECT count(*) AS n_seed_parts,
           (SELECT count(*) FROM hop1) AS n_suppliers,
           (SELECT count(*) FROM hop2) AS n_reachable_parts
    FROM seeds
    """,
)
def graph_bfs2_brand_parts(spark, sf_dir):
    """2-hop BFS over the part—supplier bipartite graph (iterative
    semi-joins — the same plan shape as api.read_graph(mode='bfs2'), T7):
    Brand#1 parts → their suppliers → every part those suppliers ship."""
    li = table(spark, sf_dir, "lineitem")
    seeds = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    hop1 = (
        li.join(seeds, li.l_partkey == seeds.p_partkey, "left_semi")
        .select("l_suppkey")
        .distinct()
    )
    hop2 = (
        li.join(hop1.select(F.col("l_suppkey").alias("__s")),
                li.l_suppkey == F.col("__s"), "left_semi")
        .select("l_partkey")
        .distinct()
    )
    return (
        seeds.agg(F.count("*").alias("n_seed_parts"))
        .crossJoin(hop1.agg(F.count("*").alias("n_suppliers")))
        .crossJoin(hop2.agg(F.count("*").alias("n_reachable_parts")))
    )


_DD_SRC_BUCKET = "('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 8))::UBIGINT::BIGINT % 10000"


@register(
    "split_group_holdout",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source,
             CASE WHEN {_DD_SRC_BUCKET} < 8000 THEN 'train'
                  WHEN {_DD_SRC_BUCKET} < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    leak AS (
      SELECT CAST(count(*) AS BIGINT) AS leaked_groups FROM (
        SELECT source FROM s GROUP BY source
        HAVING count(DISTINCT split) > 1))
    SELECT split,
           CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
           CAST(count(*) AS BIGINT) AS n_docs,
           leak.leaked_groups
    FROM s CROSS JOIN leak
    GROUP BY split, leak.leaked_groups
    """,
)
def split_group_holdout(spark, sf_dir):
    """Leakage-safe train/val/test split: the hash bucket is computed on
    the GROUP key (source), so every document of a source lands in the
    same split — the grouped-split rule that keeps near-duplicates and
    same-origin documents from straddling the train/test boundary (the
    leakage mode a per-row split like `split_train_val_test` permits).
    The output carries `leaked_groups` — the count of sources appearing
    in more than one split — computed in-query, so the oracle hash
    itself PROVES it is 0. Same deterministic_split operator, group key
    instead of row key; one aggregate over the labeled scan plus a
    group-count rollup (group-cardinality-sized, broadcast back)."""
    from claude_code_memory_spark.operators.sampling import deterministic_split

    d = table(spark, sf_dir, "documents")
    s = deterministic_split(
        d, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="source"
    )
    leak = F.broadcast(
        s.groupBy("source")
        .agg(F.count_distinct("split").alias("ns"))
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("long")
            .alias("leaked_groups")
        )
    )
    return (
        s.crossJoin(leak)
        .groupBy("split", "leaked_groups")
        .agg(
            F.count_distinct("source").cast("long").alias("n_groups"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .select("split", "n_groups", "n_docs", "leaked_groups")
    )


@register(
    "cap_docs_per_source",
    oracle="""
    SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM (
      SELECT source, n_chars, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents)
    WHERE rk <= 50
    GROUP BY source
    """,
)
def cap_docs_per_source(spark, sf_dir):
    """Per-source document quota (domain caps): keep at most 50 docs per
    source, preferring longer ones — the standard anti-domination step
    in web-corpus curation (a handful of template-heavy domains would
    otherwise dominate the mixture; Gopher §A.2 applies per-domain
    quotas the same way). One window partitioned by source, never a
    global sort; at 100 TB a hot domain skews its window partition, so
    the scale path pre-reduces per input partition first (each partition
    keeps its local top-50 per source before the shuffle — a
    cap-per-source twin of TakeOrderedAndProject) which this plan gets
    for free from AQE skew splitting plus the bounded cap."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )


@register(
    "sample_weighted_bottomk",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS chars_sampled
    FROM (
      SELECT lang, n_chars, doc_id,
             round(-ln(({_DD_BUCKET} + 0.5) / 10000.0) / n_chars, 6) AS k
      FROM documents
      ORDER BY k ASC, doc_id ASC LIMIT 100)
    GROUP BY lang
    """,
)
def sample_weighted_bottomk(spark, sf_dir):
    """Weighted sampling without replacement via the exponential race
    (Efraimidis–Spirakis 2006): each doc draws key = -ln(u)/w with
    deterministic u from its hash bucket and weight w = n_chars; the 100
    smallest keys are the weighted sample (longer docs proportionally
    likelier). orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps its local 100, the driver merges partition heads —
    so no global sort ever materializes and the same plan holds at any
    corpus size. Keys are rounded to 6 dp before ranking so the
    Spark/DuckDB ln() agree at the cut boundary; ties break by doc_id."""
    from claude_code_memory_spark.operators.sampling import hash_bucket

    d = table(spark, sf_dir, "documents")
    u = (hash_bucket("doc_id").cast("double") + F.lit(0.5)) / F.lit(10000.0)
    key = F.round(-F.log(u) / F.col("n_chars"), 6)
    return (
        d.withColumn("k", key)
        .orderBy(F.asc("k"), F.asc("doc_id"))
        .limit(100)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


# t0 / embargo for the temporal split below: the fixture's events span
# 2024-01-01..2024-01-30; the boundary sits at day 20 with a 24 h gap
_T0_US = 1_705_708_800_000_000  # 2024-01-20T00:00:00Z
_EMBARGO_US = 86_400_000_000  # 24 h


@register(
    "split_time_embargo",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    lab AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us < {_T0_US} THEN 'train'
                  WHEN ts_us >= {_T0_US + _EMBARGO_US} THEN 'test'
                  ELSE 'embargo' END AS split
      FROM e),
    tu AS (SELECT DISTINCT user_id FROM lab WHERE split = 'train'),
    su AS (SELECT DISTINCT split, user_id FROM lab),
    ov AS (SELECT split, CAST(count(*) AS BIGINT) AS n
           FROM su JOIN tu USING (user_id) GROUP BY split)
    SELECT l.split, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT l.user_id) AS BIGINT) AS n_users,
           CAST(coalesce(any_value(ov.n), 0) AS BIGINT) AS n_overlap_train_users,
           min(l.ts_us) AS min_ts_us, max(l.ts_us) AS max_ts_us
    FROM lab l LEFT JOIN ov ON l.split = ov.split
    GROUP BY l.split
    """,
)
def split_time_embargo(spark, sf_dir):
    """Leakage-safe TEMPORAL split with an embargo gap: train = events
    before t0, test = events after t0 + 24 h, the embargo bucket absorbs
    the boundary so near-boundary leakage (a label computed from a
    window that straddles t0) cannot cross — the standard time-series
    ML evaluation split (purged/embargoed walk-forward). The output
    carries `n_overlap_train_users` per split: an embargo does NOT
    de-overlap entities (that is what `split_group_holdout` does), and
    carrying the overlap count in-query makes the trade measurable
    instead of implicit. One labeled scan + a distinct-pairs rollup
    semi-joined to train users (user-cardinality-sized, broadcast);
    event-time arithmetic in epoch-µs via ts_us_col so both physical
    timestamp encodings replay bit-identically in DuckDB."""
    from claude_code_memory_spark.queries.base import ts_us_col

    e = table(spark, sf_dir, "events")
    lab = e.select(
        F.col("user_id"), ts_us_col(e).alias("ts_us")
    ).withColumn(
        "split",
        F.when(F.col("ts_us") < F.lit(_T0_US), "train")
        .when(F.col("ts_us") >= F.lit(_T0_US + _EMBARGO_US), "test")
        .otherwise("embargo"),
    )
    train_users = lab.filter(F.col("split") == "train").select("user_id").distinct()
    overlap = (
        lab.select("split", "user_id")
        .distinct()
        .join(F.broadcast(train_users), "user_id", "left_semi")
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("__ov"))
    )
    return (
        lab.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
        )
        .join(F.broadcast(overlap), "split", "left")
        .select(
            "split",
            "n_events",
            "n_users",
            F.coalesce(F.col("__ov"), F.lit(0)).cast("long").alias(
                "n_overlap_train_users"
            ),
            "min_ts_us",
            "max_ts_us",
        )
    )
