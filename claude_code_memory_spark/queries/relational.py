"""Relational core queries (SURVEY.md §2: F1-F8, J2-J7, A1-A8, W1-W4,
U1-U4, X1-X3) over the driver's TPC-H-ish tables — all oracle-checked.

Determinism rules used throughout:
- every aggregate/computed column is aliased identically on both sides;
- doubles rounded (sums to 4, ratios/avgs to 6) on both sides;
- every LIMIT is preceded by a total order with a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from claude_code_memory_spark.functions.hashing import content_hash, md5_8, point_id
from claude_code_memory_spark.operators import joins as J
from claude_code_memory_spark.queries.base import register, table, ts_us_col

# --- A: aggregations ------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation   n ON s.s_nationkey = n.n_nationkey
      JOIN region   r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
    headline=True,
)
def q5_revenue_by_nation(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total")
    )


@register(
    "agg_event_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value,
           round(avg(value), 6) AS avg_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_event_stats(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- F: filters -----------------------------------------------------------


@register(
    "filter_payload_equality",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment = 'AUTOMOBILE' AND c_nationkey = 7
    """,
)
def filter_payload_equality(spark, sf_dir):
    # F1: AND-of-equality payload filter builder (qdrant.py:1100-1109)
    c = table(spark, sf_dir, "customer")
    return c.filter((F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_nationkey") == 7)).select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "filter_must_should_not",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderstatus = 'O'
      AND NOT (o_orderpriority = '5-LOW')
      AND (o_totalprice >= 50000 OR o_orderpriority = '1-URGENT')
    """,
)
def filter_must_should_not(spark, sf_dir):
    # F4: scroll filter must / must_not / should (qdrant.py:1613-1845)
    o = table(spark, sf_dir, "orders")
    must = F.col("o_orderstatus") == "O"
    must_not = ~(F.col("o_orderpriority") == "5-LOW")
    should = (F.col("o_totalprice") >= 50000) | (F.col("o_orderpriority") == "1-URGENT")
    return o.filter(must & must_not & should).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@register(
    "filter_exclude_pattern",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name NOT LIKE '%green%' AND regexp_matches(p_type, '^(STANDARD|SMALL)')
    """,
)
def filter_exclude_pattern(spark, sf_dir):
    # F5: exclude-pattern predicates (indexer.py:841-876)
    p = table(spark, sf_dir, "part")
    return p.filter(
        (~F.col("p_name").like("%green%")) & F.col("p_type").rlike("^(STANDARD|SMALL)")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "filter_score_threshold",
    oracle="""
    SELECT event_id, value FROM events WHERE value >= 150.0
    """,
)
def filter_score_threshold(spark, sf_dir):
    # F3: score-threshold filter (qdrant.py:831-856)
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("value") >= 150.0).select("event_id", "value")


# --- J: join shapes -------------------------------------------------------


@register(
    "join_anti_customers_without_urgent",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti_customers_without_urgent(spark, sf_dir):
    # J2/U1 shape: left anti join (orphan detection)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_semi_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi_customers_with_urgent(spark, sf_dir):
    # J4 shape: broadcast semi join (pre-storage orphan filter)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_acctbal")


@register(
    "join_full_outer_diff",
    oracle="""
    WITH a AS (SELECT o_custkey, count(*) AS n FROM orders
               WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey),
         b AS (SELECT o_custkey, count(*) AS n FROM orders
               WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY o_custkey)
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           CASE WHEN a.o_custkey IS NULL THEN 'added'
                WHEN b.o_custkey IS NULL THEN 'deleted'
                WHEN a.n <> b.n THEN 'changed' ELSE 'unchanged' END AS status
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def join_full_outer_diff(spark, sf_dir):
    # J5: entity replacement diff (processors.py:64-153) — here: per-customer
    # order counts before/after a cutover date, classified added/deleted/changed.
    o = table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    a = o.filter(F.col("o_orderdate") < cutoff).groupBy("o_custkey").agg(F.count("*").alias("n_a"))
    b = o.filter(F.col("o_orderdate") >= cutoff).groupBy("o_custkey").agg(F.count("*").alias("n_b"))
    joined = a.withColumnRenamed("o_custkey", "ck_a").join(
        b.withColumnRenamed("o_custkey", "ck_b"), F.col("ck_a") == F.col("ck_b"), "full_outer"
    )
    status = (
        F.when(F.col("ck_a").isNull(), F.lit("added"))
        .when(F.col("ck_b").isNull(), F.lit("deleted"))
        .when(F.col("n_a") != F.col("n_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce("ck_a", "ck_b").alias("custkey"), status.alias("status")
    )


@register(
    "join_hash_dedup_probe",
    oracle="""
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents e
      WHERE e.doc_id < d.doc_id
        AND sha256(trim(regexp_replace(lower(e.text), '\\s+', ' ', 'g')))
          = sha256(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
    )
    """,
)
def join_hash_dedup_probe(spark, sf_dir):
    # J6: content-hash dedup probe — docs whose normalized hash is NOT
    # already present at a lower id (i.e. the kept set of exact dedup).
    from claude_code_memory_spark.operators.dedup import exact_dedup

    d = table(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id")


# --- W: windows / ranking -------------------------------------------------


@register(
    "window_top_customers_per_nation",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      FROM customer)
    WHERE rnk <= 3
    """,
)
def window_top_customers_per_nation(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


@register(
    "window_running_user_value",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS running_value
    FROM events
    """,
)
def window_running_user_value(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@register(
    "rrf_fusion_events",
    oracle="""
    WITH dense AS (
      SELECT event_id, row_number() OVER (ORDER BY value DESC, event_id ASC) AS dense_rank
      FROM events ORDER BY value DESC, event_id ASC LIMIT 30
    ), sparse AS (
      SELECT event_id, row_number() OVER (ORDER BY ts DESC, event_id ASC) AS sparse_rank
      FROM events ORDER BY ts DESC, event_id ASC LIMIT 30
    )
    SELECT coalesce(d.event_id, s.event_id) AS event_id,
           round(coalesce(0.5 / (60 + d.dense_rank), 0)
               + coalesce(0.5 / (60 + s.sparse_rank), 0), 6) AS rrf_score
    FROM dense d FULL OUTER JOIN sparse s ON d.event_id = s.event_id
    ORDER BY rrf_score DESC, event_id ASC
    LIMIT 10
    """,
)
def rrf_fusion_events(spark, sf_dir):
    # J1 exercised relationally: fuse a value-ranked and a recency-ranked
    # list with the reference RRF formula (k=60, alpha=0.5, 3x over-fetch).
    from claude_code_memory_spark.operators.topk import rrf_fuse

    e = table(spark, sf_dir, "events")
    dense = (
        e.select(F.col("event_id"), F.col("value").alias("score"))
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(30)
    )
    sparse = (
        # DuckDB sees µs timestamps, so rank on µs regardless of the physical
        # encoding — exactly representable as double (≈1.7e15 < 2^53).
        e.select(F.col("event_id"), ts_us_col(e).cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(30)
    )
    return rrf_fuse(dense, sparse, k=10, id_col="event_id").select("event_id", "rrf_score")


# --- U: set operations ----------------------------------------------------


@register(
    "set_union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct_nations(spark, sf_dir):
    # U2: entity-name universe = union + distinct
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_except_intersect",
    oracle="""
    WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'),
         h2 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
    UNION ALL
    SELECT o_custkey, 'h1_only' AS bucket FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
    """,
)
def set_except_intersect(spark, sf_dir):
    # U3: vectored-file categorization via set algebra
    o = table(spark, sf_dir, "orders")
    d1 = F.lit("1996-01-01").cast("timestamp_ntz")
    d2 = F.lit("1996-07-01").cast("timestamp_ntz")
    d3 = F.lit("1997-01-01").cast("timestamp_ntz")
    h1 = o.filter((F.col("o_orderdate") >= d1) & (F.col("o_orderdate") < d2)).select("o_custkey").distinct()
    h2 = o.filter((F.col("o_orderdate") >= d2) & (F.col("o_orderdate") < d3)).select("o_custkey").distinct()
    both = h1.intersect(h2).withColumn("bucket", F.lit("both"))
    only1 = h1.exceptAll(h2).withColumn("bucket", F.lit("h1_only"))
    return both.unionByName(only1)


# --- X: scalar/hash functions ---------------------------------------------


@register(
    "hash_ids_documents",
    oracle="""
    SELECT doc_id,
           sha256(text) AS content_sha,
           CAST(('0x' || substr(sha256(text), 1, 16))::UBIGINT::HUGEINT
                - CASE WHEN ('0x' || substr(sha256(text), 1, 16))::UBIGINT
                            >= 9223372036854775808::UBIGINT
                       THEN 18446744073709551616::HUGEINT ELSE 0 END
                AS BIGINT) AS pid,
           substr(md5(text), 1, 8) AS md5_8
    FROM documents
    """,
)
def hash_ids_documents(spark, sf_dir):
    # X1/X2/X3: content sha256, deterministic signed-64 point id, md5-8.
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        content_hash("text").alias("content_sha"),
        point_id("text").alias("pid"),
        md5_8("text").alias("md5_8"),
    )


@register(
    "scalar_regex_extract",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\b(join|scan|filter)\\b')) AS n_ops,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers
    FROM documents
    """,
)
def scalar_regex_extract(spark, sf_dir):
    # X10/X11 shape: regexp_extract_all counting
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\b(join|scan|filter)\b"), 0)).alias("n_ops"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_numbers"),
    )


@register(
    "token_frequency_top50",
    oracle="""
    SELECT t AS token, count(*) AS n FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> length(x) > 1)) AS t
      FROM documents)
    GROUP BY t
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
)
def token_frequency_top50(spark, sf_dir):
    # X7 + A1 shape: corpus tokenization + document-frequency aggregation
    from claude_code_memory_spark.functions.text import tokenize

    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@register(
    "relations_orphan_cleanup",
    oracle="""
    WITH entities AS (SELECT DISTINCT c_custkey AS entity FROM customer WHERE c_nationkey < 13),
         relations AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 100000)
    SELECT r.o_orderkey, r.o_custkey FROM relations r
    WHERE NOT EXISTS (SELECT 1 FROM entities e WHERE e.entity = r.o_custkey)
    """,
)
def relations_orphan_cleanup(spark, sf_dir):
    # J2 via the engine operator: orders as 'relations', a customer subset
    # as the entity universe; orphans = relations pointing at missing entities.
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 13)
        .select(F.col("c_custkey").alias("entity_name"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_custkey", F.col("o_custkey").alias("to_entity"),
                F.col("o_orderkey").alias("from_entity"))
    )
    # only the to-endpoint is checked here (from = orderkey is synthetic)
    orphans = o.join(
        F.broadcast(c.select(F.col("entity_name").alias("__n")).distinct()),
        F.col("to_entity") == F.col("__n"),
        "left_anti",
    )
    return orphans.select("o_orderkey", "o_custkey")
