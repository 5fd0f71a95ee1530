"""Fourth relational batch: the remaining TPC-H query shapes, adapted to
the driver's schema (which has no partsupp table and no ship-mode /
commit-date columns — q2/q11/q12/q20/q21/q22 are re-expressed over the
columns that exist, keeping each query's *shape*: the join topology,
subquery kind, and aggregate structure that make it interesting).

Scale notes apply to every query here:
- `nation`/`region` carry explicit broadcast hints — their cardinality
  is bounded (25/5 rows) at every scale factor, so the hint is always
  safe and saves AQE a decision.
- `supplier`/`part`/`customer` grow linearly with sf (1k/200k/150k·sf
  rows), so they get NO hint: a forced broadcast cannot be demoted by
  AQE and would OOM the driver at 100 TB. AQE promotes them to
  broadcast at runtime whenever their post-filter size is under the
  threshold (always true at test sf), and falls back to a shuffled
  join — or bucketed co-location in a real deployment — at scale.
- `lineitem`/`orders` filters are plain column predicates placed before
  joins so they reach the parquet scan as PushedFilters.

All queries oracle-checked against DuckDB (tools/selfcheck.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from claude_code_memory_spark.queries.base import register, table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@register(
    "q2_top_supplier_per_part",
    oracle="""
    WITH shippers AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             row_number() OVER (PARTITION BY p.p_partkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey ASC) AS rn
      FROM part p
      JOIN shippers sh ON sh.l_partkey = p.p_partkey
      JOIN supplier s  ON s.s_suppkey  = sh.l_suppkey
      WHERE p.p_size < 5 AND p.p_type = 'SMALL'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, round(s_acctbal, 4) AS acctbal
    FROM cand WHERE rn = 1
    ORDER BY acctbal DESC, p_partkey ASC
    """,
)
def q2_top_supplier_per_part(spark, sf_dir):
    """TPC-H q2 shape (min-cost supplier → here: best-balance supplier per
    part, supplycost not in schema). Correlated-min subquery expressed as a
    per-group window rank with a deterministic tie-break. The window
    partitions by p_partkey, so it shuffles only the filtered candidate
    set, never all of lineitem; `shippers` dedups (part, supp) pairs
    map-side before the dimension joins."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter((F.col("p_size") < 5) & (F.col("p_type") == "SMALL"))
    s = table(spark, sf_dir, "supplier")
    shippers = li.select("l_partkey", "l_suppkey").distinct()
    cand = shippers.join(p, shippers.l_partkey == p.p_partkey).join(
        s, shippers.l_suppkey == s.s_suppkey
    )
    w = Window.partitionBy("p_partkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 4).alias("acctbal"),
        )
        .orderBy(F.desc("acctbal"), F.asc("p_partkey"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H q7: bilateral trade volume between two nations by year. The
    nation pair predicate lands after the broadcast joins; the only large
    shuffle is lineitem⋈orders on orderkey. The shipdate window prunes
    lineitem at the scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_3'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H q8: one nation's share of a region's revenue for one part
    type, by year. The share is a conditional-sum / sum ratio inside one
    aggregate — one pass, no self-join. part and customer are filtered
    before their joins so the probe side shrinks early (AQE broadcasts
    the filtered sides while they fit)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = n.select("n_nationkey", "n_regionkey")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == cn.n_nationkey)
        .join(F.broadcast(r), cn.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS amount
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H q9 shape (profit by supplier nation × year; supplycost not in
    schema, so amount = net revenue). The p_name LIKE filter shrinks part
    before its join; grouping is (nation, year) — 25·7 groups,
    so the final agg is tiny and partial aggregation does all the work."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    o = table(spark, sf_dir, "orders")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "amount"
            )
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H q12 shape (ship-mode → returnflag, the schema's analogous
    low-cardinality lineitem attribute): conditional counts of high/low
    priority lines. Two CASE sums in one aggregate — single scan, single
    shuffle on the 3-value group key after partial agg."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H q13: order-count histogram over customers, keeping zero-order
    customers via LEFT join (count(o_orderkey) skips the null). The join
    predicate filters orders *before* the join, not in a WHERE (which
    would turn the left join inner). Double aggregation: the second
    groupBy is over ≤ a few dozen distinct counts — trivially small."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H q14: promo revenue percentage for one month. The one-month
    shipdate window is the scan filter (row-group pruning does the heavy
    lifting); the month of lineitem is small enough that AQE broadcasts
    it INTO part if part is larger — either direction beats a hinted
    plan; ratio-of-conditional-sums in a single aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey).agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H q15: supplier(s) with the quarter's max revenue. The scalar
    max is a 1-row aggregate cross-joined (broadcast) back onto the
    per-supplier revenue — no global window, so nothing funnels through a
    single partition even when rev has millions of rows."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'BRAND_1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 40
    """,
)
def q16_supplier_count_by_part(spark, sf_dir):
    """TPC-H q16 shape (partsupp → lineitem as the part↔supplier link):
    distinct-supplier counts per (brand, type, size) with NOT-filters and
    an IN-list. countDistinct expands to a two-phase agg (dedup then
    count) — Spark plans that natively; the part-side filters cut the
    build side before the join (AQE broadcasts it while it fits)."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 4) AS totalprice,
           sum(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 180
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H q18: customers with orders above a total-quantity threshold.
    The HAVING subquery is a groupBy + filter semi-joined back onto
    orders; both aggregations shuffle on l_orderkey, so AQE can reuse the
    exchange. The final top-20 is orderBy+limit = TakeOrderedAndProject,
    never a full sort."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("totalprice"),
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_sole_returning_supplier(spark, sf_dir):
    """TPC-H q21 shape (waiting supplier → sole returning supplier; the
    schema has no receipt/commit dates, returnflag plays the "at fault"
    role): EXISTS (another supplier on the order) + NOT EXISTS (another
    supplier also returned). Both correlated subqueries become aggregated
    per-order facts joined once — counting other-supplier lines per order
    beats two extra self-joins of lineitem, and every shuffle here keys on
    l_orderkey so AQE reuses one exchange layout."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    # per (orderkey, suppkey): does any OTHER supplier exist / return on
    # this order?  distinct-count per order vs per (order, flag) answers
    # both EXISTS predicates without correlated execution.
    # r12 (guide §2.3): two different-column countDistincts force an
    # Expand that triples the lineitem rows through the shuffle; the
    # two-level aggregate — per-(order, supplier) has-a-returned-line
    # flag, then per-order count/sum — computes the identical longs
    # (countDistinct(suppkey) == count of per-(order,supp) rows;
    # countDistinct(R-cased suppkey) == sum of the has_r flags, both
    # ignoring the same nulls) with map-side combine at each level and
    # no row multiplication. Measured 1.84 -> 1.31 s median
    # (interleaved, identical results).
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("__has_r")
    )
    order_facts = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"),
        F.sum("__has_r").alias("n_ret_supps"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(order_facts, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1))
        .join(s, l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H q22 shape (phone-prefix → mktsegment; "no orders" → "no
    urgent orders" since every customer here has orders): scalar-avg
    subquery as a broadcast 1-row cross join, NOT EXISTS as a left-anti
    join against the filtered orders side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__avg_bal"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 4).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nat AS (
      SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS val
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'),
    grouped AS (SELECT l_partkey, sum(val) AS v FROM nat GROUP BY l_partkey)
    SELECT l_partkey AS partkey, round(v, 4) AS value
    FROM grouped WHERE v > (SELECT 0.001 * sum(v) FROM grouped)
    ORDER BY value DESC, partkey ASC
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H q11 shape (partsupp supply value → shipped line value, the
    schema's supply fact): per-part value from one nation's suppliers,
    kept when above a fraction of that nation's total — the
    aggregate-vs-global-scalar-subquery shape. The global total rides as
    a broadcast 1-row cross join off the SAME grouped frame (one scan,
    reused exchange), never a driver-side collect."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select(F.col("n_nationkey").alias("sn_key"))
    )
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    grouped = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("v"))
    )
    total = grouped.agg((F.sum("v") * 0.001).alias("__thresh"))
    return (
        grouped.join(F.broadcast(total))
        .filter(F.col("v") > F.col("__thresh"))
        .select(
            F.col("l_partkey").alias("partkey"), F.round(F.col("v"), 4).alias("value")
        )
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH ps AS (
      SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey),
    tot AS (SELECT l_partkey, sum(qty) AS part_qty FROM ps GROUP BY l_partkey)
    SELECT DISTINCT s.s_name AS s_name, n.n_name AS n_name
    FROM ps
    JOIN tot USING (l_partkey)
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE ps.qty > 0.5 * tot.part_qty
    ORDER BY s_name, n_name
    """,
)
def q20_dominant_supplier(spark, sf_dir):
    """TPC-H q20 shape (availqty > half shipped → supplier ships more
    than half a part's volume; 'forest%' → 'red%'): nested aggregation
    with a correlated half-of-total threshold. Spark side uses a window
    sum over the already-aggregated (part, supplier) frame instead of the
    oracle's self-join — the window runs on the agg's existing hash
    partitioning by l_partkey, so the threshold costs NO extra shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    ps = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = ps.withColumn("part_qty", F.sum("qty").over(w)).filter(
        F.col("qty") > 0.5 * F.col("part_qty")
    )
    return (
        dominant.join(s, dominant.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name", "n_name")
    )


from claude_code_memory_spark.io import zorder_key_sql as _zorder_key_sql  # noqa: E402


@register(
    "layout_zorder_tiles",
    oracle=f"""
    WITH dims AS (
      SELECT (o_custkey % 65536) AS x,
             (date_diff('day', DATE '1992-01-01', o_orderdate::DATE) % 65536) AS y
      FROM orders),
    keyed AS (SELECT x, y, {_zorder_key_sql("x", "y", 16)} AS z FROM dims)
    SELECT (z >> 18) AS tile,
           count(*) AS n_orders,
           CAST(max(x) - min(x) AS BIGINT) AS custkey_span,
           CAST(max(y) - min(y) AS BIGINT) AS day_span
    FROM keyed GROUP BY 1
    """,
)
def layout_zorder_tiles(spark, sf_dir):
    """Z-order (Morton) tiling of orders over (custkey, order-day): per-
    tile row counts and the span of BOTH dimensions inside each tile.
    Tight spans in both columns simultaneously are the property that
    makes a Z-ordered file layout prune 2-D box predicates (the public
    Delta/Iceberg OPTIMIZE ZORDER effect — `io.write_zordered` applies
    it physically; `tests/test_layout.py` measures the row-group skips).
    The interleave is pure integer shift/mask algebra, so the oracle
    replays the exact key, not an approximation."""
    from claude_code_memory_spark.io import zorder_key

    o = table(spark, sf_dir, "orders")
    dims = o.select(
        (F.col("o_custkey") % 65536).alias("x"),
        (F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")) % 65536).alias("y"),
    )
    keyed = dims.withColumn("z", zorder_key("x", "y", bits=16))
    return keyed.groupBy(F.shiftright("z", 18).alias("tile")).agg(
        F.count("*").alias("n_orders"),
        (F.max("x") - F.min("x")).cast("long").alias("custkey_span"),
        (F.max("y") - F.min("y")).cast("long").alias("day_span"),
    )
