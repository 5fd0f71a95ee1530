"""Event/session query catalog (W4/ST8 sessionization + streaming's batch
twins). `events.ts` may be LONG nanoseconds (ns parquet under nanosAsLong)
or a µs TIMESTAMP, depending on the fixture's physical encoding; DuckDB
always sees a µs timestamp — all math is done in µs via `ts_us_col`, which
adapts to the actual scanned type.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from claude_code_memory_spark.queries.base import (
    events_us as _events_us,
)
from claude_code_memory_spark.queries.base import register, table, ts_us_col  # noqa: F401

_GAP_US = 3600 * 1_000_000  # 1 hour, reference chat/parser.py:52-56
_WIN_US = 300 * 1_000_000  # 5-minute tumbling windows


@register(
    "sessionize_events",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
    flagged AS (
      SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w >= {_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sessions AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
    headline=True,
)
def sessionize_events(spark, sf_dir):
    """ST8: inactivity-gap sessionization (gap >= 1h) + per-session stats."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(prev.isNull() | (F.col("ts_us") - prev >= _GAP_US), 1).otherwise(0)
    s = e.withColumn(
        "session_id", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
        # decimal sum: associative regardless of partition order, so the
        # round-4 result (and the driver's value hash) is deterministic —
        # double sums can flip an ulp across runs near a round-4 midpoint
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("total_value"),
    )


@register(
    "tumbling_window_counts",
    oracle=f"""
    SELECT CAST(epoch_us(ts) // {_WIN_US} AS BIGINT) AS window_id,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_counts(spark, sf_dir):
    """Batch twin of the streaming tumbling-window aggregation."""
    e = _events_us(spark, sf_dir)
    return e.groupBy(
        F.expr(f"ts_us div {_WIN_US}").alias("window_id"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("total_value"),
    )


@register(
    "debounce_last_event_wins",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type, ts_us AS last_ts_us, value AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def debounce_last_event_wins(spark, sf_dir):
    """ST2's batch shape: per-key last-event-wins coalescing
    (watcher/debounce.py:149-260)."""
    e = _events_us(spark, sf_dir)
    # rank on ts_us, not raw ts: under a ns-encoded fixture raw ts would be
    # finer-grained than the oracle's µs timestamps and could pick a
    # different same-µs winner
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts_us").alias("last_ts_us"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "events_json_props",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1
    """,
)
def events_json_props(spark, sf_dir):
    """Semi-structured payload: JSON property extraction + aggregation
    (the reference stores nested metadata dicts in every payload)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod")
    ).agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH per AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v
      FROM events GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS c
      FROM events e JOIN per USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > per.v
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS p
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c
      GROUP BY e.user_id)
    SELECT count(per.v) AS n_view,
           count(c.c) AS n_click_after_view,
           count(p.p) AS n_purchase_after_click
    FROM per LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    WHERE per.v IS NOT NULL
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel: users whose first view precedes a
    click that precedes a purchase. The Spark plan is ONE hash exchange
    by user_id — three chained window aggregates over the same
    partitioning (Catalyst reuses the exchange) compute first-view,
    first-click-after-view, first-purchase-after-click per user, then a
    per-user rollup and a single global count row. The oracle expresses
    the identical semantics as sequential correlated aggregations. At
    100 TB the funnel costs the same as one sessionization pass — the
    event table shuffles once, everything else is map-side."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id")
    v = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    staged = e.withColumn("__v", v)
    c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("__v")),
            F.col("ts_us"),
        )
    ).over(w)
    staged = staged.withColumn("__c", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("__c")),
            F.col("ts_us"),
        )
    ).over(w)
    staged = staged.withColumn("__p", p)
    per_user = staged.groupBy("user_id").agg(
        F.first("__v").alias("v"), F.first("__c").alias("c"), F.first("__p").alias("p")
    )
    return per_user.filter(F.col("v").isNotNull()).agg(
        F.count("v").alias("n_view"),
        F.count("c").alias("n_click_after_view"),
        F.count("p").alias("n_purchase_after_click"),
    )


@register(
    "sessionize_builtin_window",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
    flagged AS (
      SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w >= {_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sessions AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           CAST(min(ts_us) AS BIGINT) AS session_start_us,
           count(*) AS n_events,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_builtin_window(spark, sf_dir):
    """Sessionization via Spark's NATIVE `session_window` operator — the
    same physical operator Structured Streaming uses for stateful session
    aggregation — pinned against the gaps-and-islands oracle to prove the
    two formulations agree event-for-event (merge iff inter-event gap
    < 1h). In batch this is one hash exchange on user_id + the session-
    merge aggregate, no analytic windows at all; in streaming the exact
    same expression runs incrementally with watermark-driven state
    eviction, which is why the engine can promote this query to a stream
    without rewriting it (streaming/pipeline.py). Decimal value sums keep
    the hash partition-order-invariant."""
    e = _events_us(spark, sf_dir)
    evt = e.withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))
    return (
        evt.groupBy("user_id", F.session_window("ts_ts", "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
            F.min("ts_us").cast("long").alias("session_start_us"),
        )
        .select(
            "user_id", "session_start_us", "n_events", "duration_us", "total_value"
        )
    )


_WEEK_US = 7 * 24 * 3600 * 1_000_000


@register(
    "retention_cohorts",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events),
    first_seen AS (SELECT user_id, min(week) AS cohort FROM e GROUP BY user_id),
    activity AS (
      SELECT DISTINCT f.cohort, e.week - f.cohort AS week_offset, e.user_id
      FROM e JOIN first_seen f USING (user_id)),
    sizes AS (SELECT cohort, count(*) AS cohort_size FROM first_seen GROUP BY cohort)
    SELECT a.cohort AS cohort_week,
           CAST(a.week_offset AS BIGINT) AS week_offset,
           count(*) AS active_users,
           s.cohort_size,
           round(count(*)::DOUBLE / s.cohort_size, 6) AS retention
    FROM activity a JOIN sizes s ON a.cohort = s.cohort
    GROUP BY a.cohort, a.week_offset, s.cohort_size
    """,
)
def retention_cohorts(spark, sf_dir):
    """Classic cohort-retention matrix: users grouped by first-seen week,
    tracked by distinct activity in each later week, normalized by cohort
    size. Three shuffles total, all keyed on bounded domains (user_id,
    then (cohort, offset)); the first-seen table is user-cardinality and
    joins back on the same user_id partitioning the groupBy produced, so
    Catalyst reuses the exchange. At 100 TB this is the shape BI engines
    run daily over event logs — integer week math end to end, no float
    until the final normalized ratio."""
    e = _events_us(spark, sf_dir)
    weeks = e.select("user_id", F.expr(f"ts_us div {_WEEK_US}").alias("week"))
    first_seen = weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    activity = (
        weeks.join(first_seen, "user_id")
        .select("cohort", (F.col("week") - F.col("cohort")).alias("week_offset"), "user_id")
        .distinct()
    )
    sizes = first_seen.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return (
        activity.groupBy("cohort", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .join(sizes, "cohort")
        .select(
            F.col("cohort").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


_SLIDE_US = 300 * 1_000_000  # 5-minute slide, 10-minute length (2 windows/event)


@register(
    "sliding_window_counts",
    oracle=f"""
    WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
    w AS (
      SELECT unnest([(ts_us // {_SLIDE_US} - 1) * {_SLIDE_US},
                     (ts_us // {_SLIDE_US}) * {_SLIDE_US}]) AS window_start_us,
             event_type, value
      FROM e)
    SELECT CAST(window_start_us AS BIGINT) AS window_start_us, event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def sliding_window_counts(spark, sf_dir):
    """Overlapping (hopping) window aggregation via Spark's NATIVE
    `window(ts, '10 minutes', '5 minutes')` operator — every event lands
    in exactly two epoch-aligned windows; the oracle replays the
    assignment arithmetically. Same expression runs incrementally under
    Structured Streaming with a watermark; in batch it is one explode
    (x2 fan-out, narrow) + one hash aggregate. Decimal value sums keep
    the hash partition-order-invariant. Completes the window-family
    trio: tumbling / sliding / session."""
    e = _events_us(spark, sf_dir)
    evt = e.withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))
    return (
        evt.groupBy(F.window("ts_ts", "10 minutes", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "transition_matrix_events",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(n) AS total FROM pairs GROUP BY 1)
    SELECT p.event_type, p.next_type, p.n,
           round(p.n / t.total, 6) AS p
    FROM pairs p JOIN tot t USING (event_type)
    """,
)
def transition_matrix_events(spark, sf_dir):
    """First-order Markov transition matrix of user behavior: P(next
    event type | current), from per-user event sequences. One exchange
    (hash by user_id) feeds the lead window; the pair aggregate is
    bounded by |types|² with map-side combine, and the row-conditional
    probabilities are exact-integer divisions (deterministic cross-
    engine). The product-analytics primitive behind funnel discovery
    and next-action prediction baselines."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    pairs = seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    tot = pairs.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("p"),
        )
    )


@register(
    "scd2_user_state_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    changes AS (
      SELECT user_id, event_type AS state, ts_us AS valid_from
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type),
    intervals AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from) AS valid_to
      FROM changes)
    SELECT user_id, state, valid_from,
           coalesce(valid_to, 9223372036854775807) AS valid_to,
           valid_to IS NULL AS is_current
    FROM intervals
    """,
)
def scd2_user_state_intervals(spark, sf_dir):
    """Type-2 slowly-changing-dimension build from an event stream: each
    user's state (last event type) becomes [valid_from, valid_to)
    intervals — consecutive same-state events collapse, the open
    interval is flagged current. Two windows over ONE user_id exchange
    (change detection, then lead for the closing edge); the interval
    table is bounded by state CHANGES, not events — the compression
    that makes point-in-time joins cheap at scale. The warehouse
    primitive behind dimension history and as-of attribute lookups
    (pair with operators/asof.py to resolve an attribute at event
    time)."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    changes = seq.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    iv = changes.withColumn("valid_to", F.lead("valid_from").over(w2))
    return iv.select(
        "user_id",
        "state",
        "valid_from",
        F.coalesce("valid_to", F.lit(9223372036854775807)).alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "stickiness_dau_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             user_id
      FROM events),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    wau AS (
      SELECT d.day, count(DISTINCT u.user_id) AS wau
      FROM days d JOIN du u
        ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day)
    SELECT d.day, dau.dau, wau.wau,
           round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    """,
)
def stickiness_dau_wau(spark, sf_dir):
    """DAU/WAU stickiness per day — the engagement ratio every product
    dashboard tracks. Distinct (day, user) pairs are reduced FIRST (the
    only corpus-sized stage, map-side combined); the trailing-7-day
    distinct count is a range join over that reduced table (each pair
    feeds <= 7 anchor days, so the join is 7x |day-user pairs|, never
    events x days), and the ratio is exact-integer division. A
    sliding `window()` can't express cross-window DISTINCT — this
    day-grid range join is the scalable formulation (HLL sketches per
    day + union-merge is the approximate one: sketch_hll_mergeable)."""
    e = _events_us(spark, sf_dir)
    du = e.select(
        F.expr("ts_us div 86400000000").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    d = days.alias("d")
    u = du.alias("u")
    wau = (
        d.join(
            u,
            (F.col("u.day") >= F.col("d.day") - 6)
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("u.user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )
