"""Second catalog batch: analytics window functions, percentiles, pivot,
pagination (T5), greedy chunk packing (A7), weighted content (X5),
datetime parts (X16), and sign-LSH bucketed ANN — all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from claude_code_memory_spark.queries.base import (
    events_us as _events_us,
)
from claude_code_memory_spark.queries.base import register, table, ts_us_col  # noqa: F401


@register(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(min(value), 4) AS vmin,
           round(max(value), 4) AS vmax
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`) — the exact path; approx_percentile is the scale path."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 4) AS delta_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_rank_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_rank_ntile(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4) AS open_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    """Pivot expressed as conditional aggregation (same plan Spark's
    .pivot() lowers to, but with deterministic column names)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.round(F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 4).alias(
            "open_total"
        ),
    )


@register(
    "scroll_pagination",
    oracle="""
    SELECT event_id, value FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 50 OFFSET 100
    """,
)
def scroll_pagination(spark, sf_dir):
    """T5: scroll/offset pagination (storage/qdrant.py:1204-1301) — page 3
    of 50. orderBy().limit(offset+size) compiles to TakeOrderedAndProject
    (distributed partial top-k, no full-table single-partition window); the
    row_number then runs over just those 150 rows. At scale prefer keyset
    pagination (WHERE (value,id) < last_seen) to avoid the deep-offset skip."""
    e = table(spark, sf_dir, "events")
    top = e.select("event_id", "value").orderBy(F.desc("value"), F.asc("event_id")).limit(150)
    w = Window.orderBy(F.desc("value"), F.asc("event_id"))
    return (
        top.select("event_id", "value", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") > 100)
        .drop("__rn")
    )


@register(
    "chunk_pack_running_budget",
    oracle="""
    WITH sized AS (
      SELECT doc_id, source, CAST(ceil(length(text) / 4.0) AS BIGINT) AS tokens
      FROM documents),
    packed AS (
      SELECT doc_id, source, tokens,
             sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM sized)
    SELECT source, CAST((cum - tokens) // 800 AS BIGINT) AS chunk_id,
           count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS chunk_tokens
    FROM packed GROUP BY source, chunk_id
    """,
)
def chunk_pack_running_budget(spark, sf_dir):
    """A7: greedy token-budget packing as a running-sum window (the
    relational twin of the markdown chunker, parser.py:1734-1798)."""
    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", F.ceil(F.length("text") / 4.0).cast("long").alias("tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = sized.withColumn("cum", F.sum("tokens").over(w))
    return packed.groupBy(
        "source", F.expr("(cum - tokens) div 800").alias("chunk_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("long").alias("chunk_tokens"),
    )


@register(
    "weighted_content_assembly",
    oracle="""
    SELECT c_custkey,
           concat_ws(' ',
             concat_ws(' ', c_name, c_name, c_name),
             concat_ws(' ', c_mktsegment, c_mktsegment),
             c_name) AS weighted
    FROM customer
    """,
)
def weighted_content_assembly(spark, sf_dir):
    """X5: field-weighted content — name 3x, first observation 2x, rest 1x
    (entities.py:99-119); observations = [segment, name]."""
    from claude_code_memory_spark.functions.text import weighted_content

    c = table(spark, sf_dir, "customer")
    obs = F.array(F.col("c_mktsegment"), F.col("c_name"))
    return c.select(
        "c_custkey", weighted_content(F.col("c_name"), obs).alias("weighted")
    )


@register(
    "scalar_datetime_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INT) AS yr,
           CAST(extract(month FROM o_orderdate) AS INT) AS mon,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) AS INT) AS dow_iso,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def scalar_datetime_parts(spark, sf_dir):
    """X16 family: timestamp part extraction, ISO day-of-week alignment
    (Spark weekday()+1 == DuckDB isodow), day arithmetic."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.quarter("o_orderdate").alias("qtr"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("dow_iso"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("int")
        .alias("days_since"),
    )


def _lsh_oracle(n_planes: int = 8, dim: int = 64, seed: int = 42, k: int = 10) -> str:
    from claude_code_memory_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes, seed)
    plane_sql = ", ".join(
        "[" + ", ".join(f"{x!r}" for x in p.tolist()) + "]::DOUBLE[]" for p in planes
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(e.embedding::DOUBLE[], planes.p[{i + 1}]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    return f"""
    WITH planes AS (SELECT [{plane_sql}] AS p),
    bucketed AS (
      SELECT e.vec_id, e.embedding, ({bucket_expr}) AS bucket
      FROM embeddings e, planes),
    q AS (SELECT bucket AS qb, embedding AS qv FROM bucketed WHERE vec_id = 0)
    SELECT b.vec_id,
           round(list_dot_product(b.embedding::DOUBLE[], q.qv::DOUBLE[]) /
                 (sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) AS score
    FROM bucketed b, q
    WHERE b.bucket = q.qb
    ORDER BY score DESC, b.vec_id ASC
    LIMIT {k}
    """


@register("ann_lsh_bucket", oracle=_lsh_oracle())
def ann_lsh_bucket(spark, sf_dir):
    """Sign-LSH bucketed ANN: deterministic seeded hyperplanes shipped as
    literals to both engines; only the query's bucket is scored. The
    approximate scale path next to `dense_topk`'s exact scan."""
    from claude_code_memory_spark.functions.vector import cosine_similarity, dot, vector_lit
    from claude_code_memory_spark.operators.similarity import random_hyperplanes

    emb = table(spark, sf_dir, "embeddings")
    planes = random_hyperplanes(64, 8, 42)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bucket = bucket + F.when(
            dot(F.col("embedding"), vector_lit(p)) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    bucketed = emb.withColumn("bucket", bucket)
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qb"), F.col("embedding").alias("qv")
    )
    return (
        bucketed.crossJoin(F.broadcast(q))
        .filter(F.col("bucket") == F.col("qb"))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("qv")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS revenue,
           CAST(grouping(o_orderstatus) AS INT) * 2
             + CAST(grouping(o_orderpriority) AS INT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP specialize):
    status x priority detail plus each one-dimension margin, with the
    grouping-id bitmask distinguishing the NULL-as-total rows from real
    NULL keys. One scan; Spark expands the sets into a single Expand +
    hash aggregate, so the cost is rows x sets map-side, never multiple
    scans — the shape that matters when the input is 100 TB and the
    report wants five margins."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS revenue,
               CAST(grouping(o_orderstatus) AS INT) * 2
                 + CAST(grouping(o_orderpriority) AS INT) AS gid
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_events_last_hour,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 4) AS DOUBLE)
             AS value_last_hour
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_frame(spark, sf_dir):
    """Trailing one-hour per-user aggregates via a RANGE window frame —
    the frame is bounded by event-TIME distance, not row count, which no
    rows-frame can express when event density varies. One hash exchange
    on user_id + an in-partition ordered scan; the decimal value sum
    keeps the hash partition-order-invariant. (RANGE frames require a
    numeric ORDER BY — epoch-µs here; a timestamp ORDER BY would need
    the interval-literal form.)"""
    e = _events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_events_last_hour"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
        .cast("double")
        .alias("value_last_hour"),
    )


@register(
    "agg_user_segments_bitmap",
    oracle="""
    WITH coded AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                             WHEN 'purchase' THEN 4 WHEN 'login' THEN 8
                             ELSE 16 END AS bit
      FROM events),
    masks AS (SELECT user_id, day, bit_or(bit) AS type_mask
              FROM coded GROUP BY user_id, day)
    SELECT CAST(type_mask AS BIGINT) AS type_mask,
           count(*) AS n_user_days
    FROM masks GROUP BY type_mask
    """,
)
def agg_user_segments_bitmap(spark, sf_dir):
    """Behavioral segmentation via presence bitmaps: each user-day's event
    types OR-folded into one integer mask, then user-days counted per
    exact mask — the bitmap-index trick that answers \"who did A and B
    but never C\" with integer ops instead of N self-joins. Two
    aggregates (user-day-keyed, then mask-keyed: <= 2^5 groups); at
    100 TB the map-side combiner collapses almost everything before the
    shuffle."""
    e = _events_us(spark, sf_dir)
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "login", 8)
        .otherwise(16)
    )
    masks = (
        e.select("user_id", F.expr("ts_us div 86400000000").alias("day"), bit.alias("bit"))
        .groupBy("user_id", "day")
        .agg(F.bit_or("bit").alias("type_mask"))
    )
    return masks.groupBy(F.col("type_mask").cast("long").alias("type_mask")).agg(
        F.count("*").alias("n_user_days")
    )
