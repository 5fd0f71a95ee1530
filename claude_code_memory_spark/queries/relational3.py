"""Third relational batch: more TPC-H-shaped coverage (q6/q10/q17 twins,
ROLLUP grouping sets) and the temporal-join surface (as-of join, range
join) built on operators/asof.py. All oracle-checked; the ASOF oracle
uses DuckDB's native ASOF JOIN, making it a genuinely independent
implementation of the same semantics.

`events.ts` may be LONG nanoseconds or a µs TIMESTAMP depending on the
fixture's physical encoding; DuckDB always sees a µs timestamp — all
event math is done in µs via `ts_us_col` (schema-adaptive), as in
sessionsq.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_code_memory_spark.operators.asof import asof_join, range_join_pairs
from claude_code_memory_spark.queries.base import register, table, ts_us_col

_5MIN_US = 300 * 1_000_000


def _typed_events_us(spark, sf_dir, event_type):
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == event_type).select(
        "event_id", "user_id", ts_us_col(e).alias("ts_us"), "value"
    )


@register(
    "q6_revenue_delta",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark, sf_dir):
    """TPC-H q6 shape: pure filter + aggregate. Every predicate is a plain
    column comparison, so all four reach the parquet scan as PushedFilters
    and row groups outside the shipdate range are skipped entirely."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           round(c.c_acctbal, 4) AS acctbal
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H q10 shape: who returned the most revenue. lineitem (largest)
    filters on returnflag before the joins; customer joins unhinted (AQE
    broadcasts it while small, shuffles at scale — it grows with sf, so
    a forced hint would not survive 100 TB) and the only big shuffle is
    lineitem⋈orders on orderkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 4).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_cut
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17 shape: correlated avg-per-part subquery, decorrelated to
    a pre-aggregated join. The per-part average aggregates map-side to one
    row per partkey before its shuffle; the brand-filtered part side is
    unhinted (AQE broadcasts it while it fits, part grows with sf)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    cut = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_cut"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(cut, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "agg_rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_orders(spark, sf_dir):
    """Grouping sets: subtotal hierarchy status → (status, priority) →
    grand total in one pass (Spark expands rollup into a single shuffle)."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


@register(
    "asof_join_events",
    oracle="""
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
               FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, epoch_us(ts) AS ts_us, value
               FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts_us, p.value,
           v.ts_us AS matched_ts_us, v.value AS matched_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    """,
)
def asof_join_events(spark, sf_dir):
    """As-of join: each purchase picks up the latest page view at or
    before it for the same user (operators/asof.py; DuckDB's native ASOF
    JOIN is the oracle — an independent implementation of the semantics)."""
    purchases = _typed_events_us(spark, sf_dir, "purchase")
    views = _typed_events_us(spark, sf_dir, "view").drop("event_id")
    return asof_join(
        purchases,
        views,
        on="user_id",
        ts_col="ts_us",
        payload_cols=("ts_us", "value"),
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.col("matched_ts_us"),
        F.col("matched_value"),
    )


@register(
    "range_join_click_to_purchase",
    oracle=f"""
    WITH c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
               WHERE event_type = 'purchase')
    SELECT c.user_id, count(*) AS n_pairs,
           round(sum(p.value), 4) AS total_value
    FROM c JOIN p
      ON p.user_id = c.user_id
     AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + {_5MIN_US}
    GROUP BY c.user_id
    """,
)
def range_join_click_to_purchase(spark, sf_dir):
    """Interval join: purchases within 5 minutes after a click by the same
    user, aggregated per user. The user_id equality keeps the plan a hash
    join with the time range as a residual filter — no nested-loop."""
    clicks = _typed_events_us(spark, sf_dir, "click").select("user_id", "ts_us")
    purchases = _typed_events_us(spark, sf_dir, "purchase").select(
        "user_id", "ts_us", "value"
    )
    pairs = range_join_pairs(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts_us",
        max_gap=_5MIN_US,
        right_cols=("value",),
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum("value_b"), 4).alias("total_value"),
    )


@register(
    "join_salted_status_revenue",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n_items,
           round(sum(l.l_extendedprice), 4) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_salted_status_revenue(spark, sf_dir):
    """Fact-fact join executed through the deterministic salted-join
    operator (operators/skew.py) — same result as the plain join (the
    oracle), with the left shuffle spread over 16 sub-keys per key. The
    manual path for skew that AQE's shuffle-split can't reach."""
    from claude_code_memory_spark.operators.skew import salted_join

    from claude_code_memory_spark.queries.base import spread

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    # r12 (guide §2.5): spread the REPLICATED side only — the 16x salt
    # explode ran inside the one-file fixture's single scan task,
    # serializing the build-side production (measured 4% core util).
    # Interleaved A/B at sf0.1: unspread 2.43 s, spread-orders 1.16 s;
    # spreading the probe side too flips the plan against the broadcast
    # and measured WORSE (2.35 s) — left alone. Multi-split corpora
    # no-op.
    o = spread(
        spark,
        table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
        ),
    )
    return (
        salted_join(li, o, "l_orderkey", num_salts=16)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H q4 shape: EXISTS decorrelated to a left-semi join. The
    lineitem side filters on returnflag before the semi join, and the
    orders date range is pushed to the scan."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "multimodal_binary_stats",
    oracle="""
    SELECT source AS modality,
           count(*) AS n_payloads,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(sha256(text)) AS min_digest
    FROM documents
    GROUP BY source
    """,
)
def multimodal_binary_stats(spark, sf_dir):
    """Multimodal-column pattern on oracle-checkable data: treat each
    document's bytes as an opaque binary payload keyed by a modality
    column, and aggregate size/digest metadata WITHOUT decoding payloads
    (the pruned-metadata-scan shape of operators/multimodal.py — at
    100 TB the scan reads only the modality + length columns, never the
    blobs)."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select(
        F.col("source").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return payloads.groupBy("modality").agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.sha2("payload", 256)).alias("min_digest"),
    )


@register(
    "q19_disjunctive_filter",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#3' AND p.p_size <= 20 AND l.l_quantity >= 20)
       OR (p.p_brand = 'Brand#5' AND p.p_size <= 30 AND l.l_quantity >= 5)
    """,
)
def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H q19 shape: OR-of-ANDs across both join sides. Catalyst
    derives the common supersets (brand IN (...), size <= 30) as pushable
    conjuncts for the scans while the full disjunction stays a post-join
    residual — exactly what you want at scale."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#5") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 5))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "quality_constraint_report",
    oracle="""
    SELECT 'not_null(o_custkey)' AS rule,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus)',
           CAST(sum(CASE WHEN o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice)',
           CAST(sum(CASE WHEN o_totalprice IS NULL
                      OR o_totalprice < 0 OR o_totalprice > 1000000
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'references(o_custkey)', count(*)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def quality_constraint_report(spark, sf_dir):
    """Deequ/dbt-style constraint report over orders: three row-local
    rules fold into ONE conditional-aggregation scan (adding a rule adds
    a counter, not a pass), uniqueness is one key aggregate, referential
    integrity one anti-join — the validation shape that must ride the
    ingest scan when the table is 100 TB. All-zero violations on the
    fixture is itself the assertion: the oracle recomputes each rule
    independently, so a false zero (or a miscounted violation) breaks the
    hash."""
    from claude_code_memory_spark.operators import constraints as C

    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return C.constraint_report(
        o,
        [
            C.not_null("o_custkey"),
            C.accepted_values("o_orderstatus", ["O", "F", "P"]),
            C.in_range("o_totalprice", 0, 1_000_000),
        ],
        unique=["o_orderkey"],
        references=("o_custkey", cust, "c_custkey"),
    )
