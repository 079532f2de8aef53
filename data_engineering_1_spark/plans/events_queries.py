"""Events / streaming-surface declared queries (SURVEY.md §2.9 batch twins,
§2.6 J7 as-of join).

Structured Streaming semantics (tumbling/sliding/session windows, dedup,
as-of) expressed as batch DataFrame plans over the ``events`` fixture so
the DuckDB oracle can hash-check them; the true ``readStream`` versions of
the same operators live in ``data_engineering_1_spark/streaming/`` and are
covered by rows-only tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ._discipline import dec, o_sum_dec, sum_dec
from .registry import declared_query


@declared_query(
    "events_tumbling_10m",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {o_sum_dec('value')} AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def events_tumbling_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 tumbling window aggregate (batch twin of
    ``groupBy(F.window('ts','10 minutes'))``). Spark window starts are
    epoch-aligned, matching DuckDB time_bucket for divisor-of-hour widths."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_dec("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


@declared_query(
    "events_sliding_10m_5m",
    oracle="""
    WITH hopped AS (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts)
                           - INTERVAL 5 MINUTE]) AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM hopped
    GROUP BY window_start, event_type
    """,
)
def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 sliding window (10-minute length, 5-minute hop): every event
    lands in exactly two windows. Spark: native F.window(…, slide);
    oracle: explicit two-hop expansion."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


@declared_query(
    "sessionize_users",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
        SELECT user_id, ts, event_id, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {o_sum_dec('value')} AS sum_value
    FROM tagged
    GROUP BY user_id, session_seq
    """,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 batch sessionization: 30-minute-gap sessions via lag + running
    sum of session-start flags (the classic two-window pattern; the
    streaming twin is F.session_window in streaming/windows.py). One
    shuffle on user_id serves both windows and the final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(new_session).over(wsum).cast("bigint").alias("session_seq"),
    )
    return tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        sum_dec("value").alias("sum_value"),
    )


@declared_query(
    "dedup_first_event",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) t
    WHERE rn = 1
    """,
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 batch twin of streaming dedup: first event per (user_id,
    event_type), deterministic keep-first ordering (dropDuplicates is
    nondeterministic about which row survives; row_number pins it)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@declared_query(
    "asof_click_before_purchase",
    oracle="""
    SELECT event_id, user_id, ts, click_event_id, click_ts
    FROM (
        SELECT p.event_id, p.user_id, p.ts,
               c.event_id AS click_event_id, c.ts AS click_ts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    ) t
    WHERE rn = 1
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of join: for every purchase, the latest click by the same user
    at-or-before its timestamp (tie-break: latest ts, then largest
    event_id).

    Implemented as the scalable merge pattern — union both sides, one sort
    per user, carry the last-seen click forward with last(ignorenulls) —
    instead of the naive inequality join, which explodes to
    |purchases|x|clicks| per user before pruning. One shuffle on user_id,
    linear work per partition; this is the plan that survives 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id")).alias(
            "click_info"
        ),
        F.lit(0).alias("is_purchase"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None)
        .cast("struct<ts:timestamp,event_id:bigint>")
        .alias("click_info"),
        F.lit(1).alias("is_purchase"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_last = merged.withColumn(
        "last_click", F.last("click_info", ignorenulls=True).over(w)
    )
    return with_last.filter(F.col("is_purchase") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_click.event_id").alias("click_event_id"),
        F.col("last_click.ts").alias("click_ts"),
    )


@declared_query(
    "event_type_daily_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events
    GROUP BY day
    """,
)
def event_type_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily counts per event type as columns (explicit value list so
    the plan needs no discovery pass and column order is stable)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, subset=types)


@declared_query("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 approximate distinct (HLL++). No SQL oracle — approximation is
    engine-specific — so declared rows-only; the exact-count cross-check
    lives in tests/test_events.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@declared_query(
    "watermark_late_events",
    oracle="""
    WITH arr AS (
        SELECT event_type, ts,
               ts + ((event_id * 2654435761) % 4294967296 % 7200)
                   * INTERVAL 1 SECOND AS arrival_ts
        FROM events
    ), batched AS (
        SELECT event_type, ts,
               CAST(floor(epoch(arrival_ts) / 600) AS BIGINT) AS batch_id
        FROM arr
    ), bmax AS (
        SELECT batch_id, max(ts) AS batch_max_ts FROM batched GROUP BY batch_id
    ), wm AS (
        SELECT batch_id,
               max(batch_max_ts) OVER (
                   ORDER BY batch_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 - INTERVAL 1 HOUR AS wm_ts
        FROM bmax
    )
    SELECT b.event_type,
           CAST(COUNT(CASE WHEN w.wm_ts IS NULL OR b.ts >= w.wm_ts
                           THEN 1 END) AS BIGINT) AS n_kept,
           CAST(COUNT(CASE WHEN w.wm_ts IS NOT NULL AND b.ts < w.wm_ts
                           THEN 1 END) AS BIGINT) AS n_late_dropped
    FROM batched b JOIN wm w USING (batch_id)
    GROUP BY b.event_type
    ORDER BY b.event_type
    """,
)
def watermark_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch twin: watermark late-data classification, simulated at
    micro-batch granularity exactly the way Structured Streaming advances
    watermarks (at batch boundaries, from the previous batches' max event
    time minus the delay).

    The fixture's events arrive perfectly time-ordered (measured: running
    max(ts) over event_id never exceeds ts), so real lateness is simulated
    deterministically: arrival_ts = ts + Knuth-multiplicative-hash(event_id)
    mod 2h of network jitter; arrival micro-batches are 10-minute buckets of
    arrival time; the watermark for batch n is max event ts over batches
    < n, minus 1 hour. An event is dropped iff its event time is behind its
    arrival batch's watermark — at sf0.01 that keeps ~73% and drops ~27%.

    Scale shape: one narrow shuffle for the per-batch max, a prefix-max
    window over the tiny per-batch table (O(#batches), not O(rows)), and a
    broadcast equi-join back on batch_id — no row-level sequential pass, so
    the plan survives 100 TB (the per-row work is embarrassingly parallel;
    only the micro-batch skeleton is ordered, and it is thousands of rows,
    not billions).
    """
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "event_type",
        "ts",
        F.expr(
            "ts + ((event_id * 2654435761) % 4294967296 % 7200)"
            " * INTERVAL 1 SECOND"
        ).alias("arrival_ts"),
    )
    batched = arr.select(
        "event_type",
        "ts",
        F.expr("CAST(floor(unix_timestamp(arrival_ts) / 600) AS BIGINT)").alias(
            "batch_id"
        ),
    )
    bmax = batched.groupBy("batch_id").agg(F.max("ts").alias("batch_max_ts"))
    prefix = Window.orderBy("batch_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = bmax.select(
        "batch_id",
        (
            F.max("batch_max_ts").over(prefix) - F.expr("INTERVAL 1 HOUR")
        ).alias("wm_ts"),
    )
    late = F.col("wm_ts").isNotNull() & (F.col("ts") < F.col("wm_ts"))
    return (
        batched.join(F.broadcast(wm), "batch_id")
        .groupBy("event_type")
        .agg(
            F.count(F.when(~late, F.lit(1))).alias("n_kept"),
            F.count(F.when(late, F.lit(1))).alias("n_late_dropped"),
        )
        .orderBy("event_type")
    )


@declared_query(
    "events_by_segment",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {o_sum_dec('value')} AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def events_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, batch twin: events joined to the customer
    dimension (user_id -> c_custkey) and aggregated per market segment.
    The dim is broadcast — the fact stream/table never shuffles for the
    join; the only exchange is the tiny per-segment aggregate. The true
    streaming leg (broadcast stream-static join, stateless) is
    streaming/pipelines.py::segment_counts_stream, pinned to this result
    by tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("user_id"), "c_mktsegment"
                )
            ),
            "user_id",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_dec("value").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


@declared_query(
    "conversion_funnel_12h",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e
        JOIN v ON e.user_id = v.user_id
               AND e.ts >= v.t_view
               AND e.ts <= v.t_view + INTERVAL 12 HOUR
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e
        JOIN c ON e.user_id = c.user_id
               AND e.ts >= c.t_click
               AND e.ts <= c.t_click + INTERVAL 12 HOUR
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased
    """,
)
def conversion_funnel_12h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: first view -> first click within 12h of
    that view -> first purchase within 12h of that click, counted as
    users surviving each stage (at sf0.01: 150 -> 37 -> 7).

    Scale shape: three aggregations and two joins, ALL keyed on user_id —
    one hash partitioning serves every stage (the per-stage min-aggs are
    map-side combinable; the time bounds ride the equi-joins as
    residuals). No window over the full event stream, no self-join
    blow-up: each stage's input shrinks to one row per surviving user."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") >= F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 12 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") >= F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 12 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


@declared_query(
    "retention_cohorts_weekly",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INTEGER)
               AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    ORDER BY f.cohort_week, week_offset
    """,
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted in each later week they remain active (the classic cohort
    retention triangle). Both engines truncate weeks to ISO Monday, so
    offsets are exact multiples of 7 days.

    Scale shape: first-week agg, distinct active weeks, and the join all
    key on user_id — one partitioning, reused; the final regroup is over
    the tiny (cohort, offset) table."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            "cohort_week",
            F.expr("CAST(datediff(wk, cohort_week) div 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )
