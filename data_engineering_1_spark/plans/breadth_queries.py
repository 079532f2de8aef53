"""Breadth declared queries: unpivot/melt, regex family, date-spine
gap-fill, per-group top-k terms, statistical aggregates, ordered string
aggregation, and embedding quantization (SURVEY.md §2.8, §2.12 breadth).

Scale notes: every query here is a single declarative plan — the date
spine is generated from a broadcast 1-row bounds aggregate (never a
driver-side loop), the top-terms window rides the same shuffle as its
groupBy, and the quantization pass is one scan with in-row lambda
arithmetic (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import tokens
from ._discipline import dec, o_avg6, o_sum_dec
from .registry import declared_query
from .text_queries import _O_TOK


@declared_query(
    "unpivot_part_metrics",
    oracle=f"""
    WITH up AS (
        SELECT p_brand, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_brand, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
        FROM part
    )
    SELECT p_brand, metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_avg6('value')} AS avg_value
    FROM up GROUP BY 1, 2
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (DataFrame.unpivot / SQL UNPIVOT): two part
    metrics melted into (metric, value) rows, then re-aggregated per
    brand. Spark's unpivot is a zero-shuffle Expand node — the oracle's
    UNION ALL twin double-scans instead, which is exactly the cost the
    operator avoids at scale."""
    pa = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    up = pa.unpivot(
        ids=["p_brand"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return up.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(dec("value")).cast("double") / F.count("value"), 6).alias(
            "avg_value"
        ),
    )


@declared_query(
    "regex_text_features",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+ing)', 1) AS first_ing,
           CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
                AS BIGINT) AS n_vowels,
           CAST(CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END
                AS INT) AS has_digit,
           CAST(length(regexp_replace(text, '[^ ]', '', 'g')) + 1 AS BIGINT)
               AS n_space_words
    FROM documents
    """,
)
def regex_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family (§2.8): regexp_extract (first '-ing' word),
    vowel count via replace-all length delta, rlike digit flag, and a
    space-count word estimate. All JVM-side codegen expressions; both
    engines' regexes stay in the shared POSIX-class subset (DuckDB is
    RE2, Spark is java.util.regex — fancy lookarounds would diverge)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+ing)", 1).alias("first_ing"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[aeiou]", ""))
        ).cast("bigint").alias("n_vowels"),
        F.col("text").rlike("[0-9]").cast("int").alias("has_digit"),
        (F.length(F.regexp_replace("text", "[^ ]", "")) + 1)
        .cast("bigint")
        .alias("n_space_words"),
    )


@declared_query(
    "gapfill_daily_big_events",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS lo,
               CAST(max(date_trunc('day', ts)) AS TIMESTAMP) AS hi
        FROM events
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                    AS TIMESTAMP) AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events WHERE value > 300.0 GROUP BY 1, 2
    )
    SELECT s.day, t.event_type, COALESCE(d.n_events, 0) AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
    """,
)
def gapfill_daily_big_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: a day spine from a broadcast 1-row min/max
    bounds aggregate (sequence + explode — no driver loop, no literal
    dates), crossed with the distinct event types, left-joined to the
    sparse daily counts (high-value events only), zeros filled. The spine
    side is tiny -> broadcast; the fact side aggregates before joining."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    bounds = ev.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = (
        ev.filter(F.col("value") > 300.0)
        .groupBy(day.alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    grid = spine.crossJoin(types)
    return grid.join(
        F.broadcast(daily),
        ["day", "event_type"],
        "left",
    ).select(
        "day",
        "event_type",
        F.coalesce("__n", F.lit(0)).alias("n_events"),
    )


@declared_query(
    "top_terms_per_lang",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest({_O_TOK}) AS word FROM documents
    ),
    counts AS (
        SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE word <> '' GROUP BY 1, 2
    )
    SELECT lang, word, n, CAST(rk AS INT) AS rk FROM (
        SELECT lang, word, n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, word) AS rk
        FROM counts
    ) WHERE rk <= 3
    """,
)
def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k terms: tokenize, count per (lang, word) with
    map-side partial combine, then a row_number window that reuses the
    groupBy's hash partitioning on lang — one shuffle total for the
    window (ties break on word for determinism)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "word")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("lang", "word", "n", "rk")
    )


@declared_query(
    "lineitem_stat_moments",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(corr(l_quantity, l_extendedprice), 6) AS DOUBLE)
               AS qty_price_corr,
           CAST(ROUND(covar_pop(l_quantity, l_extendedprice), 6) AS DOUBLE)
               AS qty_price_covar,
           CAST(ROUND(stddev_samp(l_quantity), 6) AS DOUBLE) AS qty_stddev,
           CAST(ROUND(var_pop(l_extendedprice), 6) AS DOUBLE) AS price_var
    FROM lineitem GROUP BY 1
    """,
)
def lineitem_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (corr / covar_pop / stddev_samp /
    var_pop) per return flag — single partial-aggregated pass; both
    engines use numerically-stable co-moment merging, and round(6)
    absorbs the last-ulp merge-order difference."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_pop("l_extendedprice"), 6).alias("price_var"),
    )


@declared_query(
    "nation_segment_listagg",
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
               AS segments,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer GROUP BY 1
    """,
)
def nation_segment_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG semantics): per-nation sorted
    distinct market segments as one CSV string. Spark shape:
    collect_set -> array_sort -> array_join — the sort happens per
    group (bounded cardinality), never globally."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.groupBy("c_nationkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("c_mktsegment")), ","
        ).alias("segments"),
        F.size(F.collect_set("c_mktsegment")).cast("bigint").alias(
            "n_segments"
        ),
    )


@declared_query(
    "embedding_quantize_int8",
    oracle="""
    SELECT vec_id,
           CAST(ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS DOUBLE)
               AS qmin,
           CAST(ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS DOUBLE)
               AS qmax,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor((CAST(x AS DOUBLE)
                                 - CAST(list_min(embedding) AS DOUBLE))
                                * 255.0
                                / (CAST(list_max(embedding) AS DOUBLE)
                                   - CAST(list_min(embedding) AS DOUBLE)))
                          AS BIGINT))) AS BIGINT) AS qsum
    FROM embeddings
    WHERE CAST(list_max(embedding) AS DOUBLE)
          <> CAST(list_min(embedding) AS DOUBLE)
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings (the storage-shrink step
    before ANN at 100 TB): per-vector min/max range, each element mapped
    to floor((x-min)*255/range). Emitted as a checksum (qsum) plus the
    rounded range so the driver hash stays scalar-typed. floor() on
    identical doubles is bit-deterministic across engines — no
    round-half ambiguity. Constant vectors are excluded on both sides
    (zero range)."""
    emb = load_table(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    q = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.floor((x.cast("double") - mn) * 255.0 / (mx - mn)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        emb.filter(mx != mn)
        .select(
            "vec_id",
            F.round(mn, 6).alias("qmin"),
            F.round(mx, 6).alias("qmax"),
            q.alias("qsum"),
        )
    )


@declared_query(
    "clicks_before_purchase_1h",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks_prev_hour
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    GROUP BY 1, 2
    """,
)
def clicks_before_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join (operators/rangejoin.py): clicks within the
    hour before each purchase, counted per purchase. The oracle runs the
    naive inequality join; the Spark side joins on (user_id, time_bucket)
    equi keys with the inequality as residual — shuffle-partitionable,
    bounded 2x fan-out, no BroadcastNestedLoop. test_plan_shapes pins the
    no-BNLJ guarantee."""
    from ..operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    # click_ts in [purchase_ts - 3600s, purchase_ts] <=>
    # right_ts in [left_ts + lower, left_ts + upper], lower=-3600, upper=0
    joined = interval_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        lower_s=-3600,
        upper_s=0,
    )
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks_prev_hour")
    )


@declared_query(
    "customer_7day_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS spend_7d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
)
def customer_7day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 rangeBetween on event time: per customer, total spend and order
    count over the trailing 7 calendar days (value-based frame over epoch
    seconds — peer rows at the same timestamp aggregate together, unlike
    rowsBetween). One shuffle on custkey; the frame scan is linear per
    partition. Decimal sum keeps the window aggregate exact."""
    od = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    )


@declared_query("approx_value_quantiles")  # rows-only: approx sketch
def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6-family approximate quantiles (KLL-style sketch behind
    approx_percentile): p50/p90/p99 of event value per event_type. No
    oracle by design — the sketch's rank error is implementation-defined;
    tests/test_events.py::test_approx_quantiles_within_tolerance pins it
    against the exact interpolated percentile instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5, 1000).alias("p50"),
        F.approx_percentile("value", 0.9, 1000).alias("p90"),
        F.approx_percentile("value", 0.99, 1000).alias("p99"),
    )


@declared_query(
    "exact_value_percentiles",
    oracle="""
    SELECT event_type,
           CAST(ROUND(quantile_cont(value, 0.25), 6) AS DOUBLE) AS p25,
           CAST(ROUND(quantile_cont(value, 0.50), 6) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(value, 0.75), 6) AS DOUBLE) AS p75,
           CAST(COUNT(value) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def exact_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (the oracle-checkable complement of
    approx_value_quantiles): p25/p50/p75 of value per event_type. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear
    interpolation convention on DOUBLE input (probed: both give 1.75 at
    q=.25 over [1,2,3,10]); ROUND(..,6) on both sides absorbs last-ulp
    arithmetic-order skew.

    Scale note: exact percentiles require the full value multiset per
    group — one shuffle on event_type, per-group state O(values). That is
    the honest cost of exactness; the sketch path (approx_value_quantiles)
    is the 100 TB default and this query is the auditing tool (run on a
    sampled or single-group slice at scale)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
            F.count("value").alias("n"),
        )
        .orderBy("event_type")
    )


@declared_query(
    "user_daily_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grouped AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        FROM days
    ), streaks AS (
        SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak_len
        FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days via the
    classic day - row_number() island key (consecutive days share a
    constant difference), then streak stats per user.

    Scale shape: the distinct, the window, and both aggregations all key
    on user_id — one hash partitioning serves the entire plan (the window
    and the groupBys reuse the same exchange), and per-group state is
    O(active days), never O(events)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    rn = Window.partitionBy("user_id").orderBy("day")
    grouped = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(rn)).alias("grp"),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").alias("n_active_days"),
            F.max("streak_len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


@declared_query(
    "order_price_histogram",
    oracle="""
    WITH b AS (
        SELECT LEAST(GREATEST(CAST(floor(o_totalprice / 5000) AS BIGINT),
                              0), 19) AS bucket,
               o_totalprice
        FROM orders
    )
    SELECT bucket,
           CAST(bucket * 5000 AS DOUBLE) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM b
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (5000-wide buckets, clamped
    to [0,19] so outliers land in the edge buckets — the width_bucket
    contract, spelled out as floor arithmetic because DuckDB 1.0 lacks
    width_bucket). In-row bucketing then one tiny aggregate: the
    map-side partial combine reduces each partition to <=20 rows, so the
    exchange is negligible at any scale."""
    od = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(
            F.floor(F.col("o_totalprice") / 5000).cast("bigint"), F.lit(0)
        ),
        F.lit(19),
    )
    return (
        od.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 5000).cast("double").alias("bucket_lo"),
            "n_orders",
            "min_price",
            "max_price",
        )
        .orderBy("bucket")
    )


@declared_query(
    "bool_bit_aggs_events",
    oracle="""
    SELECT event_type,
           bool_and(value IS NOT NULL) AS all_valued,
           bool_or(value > 990) AS any_huge,
           CAST(bit_and(user_id) AS BIGINT) AS users_bit_and,
           CAST(bit_or(user_id) AS BIGINT) AS users_bit_or,
           CAST(bit_xor(user_id) AS BIGINT) AS users_bit_xor
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def bool_bit_aggs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregate family (every_and/any_or, bit_and/
    bit_or/bit_xor) — all order-independent, single-shuffle, fully
    combinable map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value").isNotNull()).alias("all_valued"),
            F.bool_or(F.col("value") > 990).alias("any_huge"),
            F.bit_and("user_id").alias("users_bit_and"),
            F.bit_or("user_id").alias("users_bit_or"),
            F.bit_xor("user_id").alias("users_bit_xor"),
        )
        .orderBy("event_type")
    )


@declared_query(
    "sql_api_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS gross_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-API surface demo: the engine's tables registered as temp
    views and the query issued through spark.sql — same Catalyst plan as
    the DataFrame API (the two front-ends meet at the logical plan), so
    everything the plan pins guarantee (pushdown, broadcast selection,
    partial aggregation) applies identically. The oracle is literally the
    same SQL modulo the decimal-discipline casts."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS gross_revenue,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )


@declared_query(
    "salted_user_totals",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py::salted_aggregate)
    made oracle-visible: per-user totals computed by first grouping on
    (user_id, random salt) — a hot user's rows spread across 16 reducers
    instead of one straggler — then merging partials per user.

    The salt is rand() yet the query is oracle-pairable: only re-aggregable
    functions are allowed (sum/count here), so the merged result is
    bit-identical to the plain groupBy no matter how the salt scattered
    the rows — the point the DuckDB hash-match proves. The summed column
    is DECIMAL-cast before phase 1 so partial merge order can't perturb a
    double sum."""
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_aggregate(ev, ["user_id"], {"value_dec": "sum", "*": "count"})
    return out.select(
        "user_id",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        F.col("count").cast("bigint").alias("n_events"),
    ).orderBy("user_id")


@declared_query(
    "ntile_price_quartiles",
    oracle="""
    WITH q AS (
        SELECT o_orderpriority,
               CAST(ntile(4) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile,
               o_totalprice
        FROM orders
    )
    SELECT o_orderpriority, quartile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi_price
    FROM q
    GROUP BY o_orderpriority, quartile
    ORDER BY o_orderpriority, quartile
    """,
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1's ntile: equal-frequency quartiles of order value within each
    priority (tie-broken by orderkey so bucket membership is total-order
    deterministic), summarized per bucket. The bucketing window and the
    aggregate share the o_orderpriority partitioning."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        od.select(
            "o_orderpriority",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            "o_totalprice",
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo_price"),
            F.max("o_totalprice").cast("double").alias("hi_price"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@declared_query(
    "rollup_grouping_id_orders",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) * 2
                + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY gid, priority, status
    """,
)
def rollup_grouping_id_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5's grouping introspection: GROUPING() flags and GROUPING_ID()
    distinguish real NULL group values from rollup subtotal rows — the
    standard way downstream consumers route detail vs subtotal vs grand
    total without string sentinels (the coalesce here is only for the
    oracle's display columns)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "g_priority",
            "g_status",
            "gid",
            "n_orders",
        )
        .orderBy("gid", "priority", "status")
    )


@declared_query(
    "lateral_top2_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """,
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer top-2 orders by value),
    issued through the SQL front-end — both engines decorrelate the
    per-row ORDER BY/LIMIT into a ranked join, so the plan is the same
    window-over-one-shuffle shape as the DataFrame top-k-per-group
    (top_orders_per_customer), not a per-row re-scan. Declared through
    spark.sql to pin the LATERAL surface itself."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )


@declared_query(
    "forward_fill_values",
    oracle="""
    WITH masked AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END
                   AS reading
        FROM events
    )
    SELECT event_id, user_id,
           CAST(last_value(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS filled_value
    FROM masked
    """,
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF — last observation carried forward): sensor
    readings drop out on 'error' events (the fixture has no natural
    NULLs, so dropout is synthesized deterministically) and each gap
    takes the user's most recent non-null reading via
    last_value(IGNORE NULLS) over a running frame — the canonical
    time-series imputation. One shuffle on user_id; the running frame is
    streaming-friendly state (current last value per partition)."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("reading"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        F.last("reading", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("filled_value"),
    )


@declared_query(
    "recursive_month_spine_orders",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT CAST(date_trunc('MONTH', MIN(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('MONTH', MAX(o_orderdate)) AS DATE) AS hi
        FROM orders
    ), spine(m, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi
        FROM spine WHERE m < hi
    ), agg AS (
        SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders GROUP BY 1
    )
    SELECT s.m AS month_start,
           COALESCE(a.n_orders, 0) AS n_orders,
           CAST(COALESCE(a.total_price, 0.0) AS DOUBLE) AS total_price
    FROM spine s LEFT JOIN agg a ON a.m = s.m
    """,
)
def recursive_month_spine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 WITH RECURSIVE surface (the SQL-standard iteration
    primitive, new in Spark 4.x): a month spine generated by a monotone
    recursion from min to max order month (terminating by construction —
    Spark's recursive CTEs support UNION ALL members only, so cyclic
    shapes still belong to operators/components.py's iterative loop),
    left-joined to per-month order aggregates with zero-fill — the
    recursive twin of the X5 sequence+explode gapfill. The recursion
    depth is the month span (~80 levels), far under Spark's recursion
    limit; the bounds row is carried THROUGH the recursion so the member
    only references the spine itself."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT CAST(date_trunc('MONTH', MIN(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('MONTH', MAX(o_orderdate)) AS DATE) AS hi
            FROM orders
        ), spine(m, hi) AS (
            SELECT lo, hi FROM bounds
            UNION ALL
            SELECT add_months(m, 1), hi FROM spine WHERE m < hi
        ), agg AS (
            SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_price
            FROM orders GROUP BY 1
        )
        SELECT s.m AS month_start,
               COALESCE(a.n_orders, 0) AS n_orders,
               CAST(COALESCE(a.total_price, 0.0) AS DOUBLE) AS total_price
        FROM spine s LEFT JOIN agg a ON a.m = s.m
        """
    )


@declared_query(
    "fuzzy_name_pairs_part",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER)
               AS edit_distance,
           CAST(ROUND(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
                      / greatest(length(a.p_name), length(b.p_name)), 6)
                AS DOUBLE) AS name_sim
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 5
    """,
)
def fuzzy_name_pairs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution by edit distance: candidate part pairs
    BLOCKED on (brand, size) — the equi-join blocking key that bounds the
    quadratic pair space, same discipline as the LSH dedup family — then
    scored with levenshtein (identical classic edit-distance definition
    on both engines) and a length-normalized similarity; pairs within
    distance 5 survive. At 100 TB the blocking key is what keeps this a
    narrow shuffle instead of an n^2 scan; the scorer is a JVM built-in,
    not a UDF.

    Per-pair cost is bounded two ways, both EXACT for the <= 5 gate:
    a length prefilter (levenshtein(a, b) >= abs(len(a) - len(b)), so
    |dlen| > 5 pairs are rejected before any DP cells are touched —
    the And short-circuits in codegen) and the THRESHOLDED levenshtein
    (banded O(k*n) DP, returns -1 above the threshold and the exact
    distance otherwise, so survivors' edit_distance/name_sim values
    are bit-identical to the unbounded scorer the oracle runs). The
    block cross-product is the quadratic term blocking cannot remove;
    these bounds keep the per-candidate constant flat as blocks grow
    (10x stacked-fixture probe: 53 s -> ~14 s for 100x pair space)."""
    p = load_table(spark, sf_dir, "part")
    # The part fixture scans as ~1 small file, so without an explicit
    # spread the block join (and every per-candidate levenshtein) runs
    # on ONE task. Repartition the probe side on the blocking key —
    # partitioning-neutral (it is the equi-join key) and what a real
    # cluster's scan parallelism would give for free.
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        "p_brand",
        "p_size",
        F.col("p_name").alias("name_a"),
    ).repartition(F.col("p_brand"), F.col("p_size"))
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_size").alias("size_b"),
        F.col("p_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b", 5)
    return (
        a.join(
            b,
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("p_size") == F.col("size_b"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .filter(
            (F.abs(F.length("name_a") - F.length("name_b")) <= 5)
            & (dist >= 0)
        )
        .select(
            "part_a",
            "part_b",
            "p_brand",
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_distance"),
            F.round(
                F.lit(1.0)
                - dist.cast("double")
                / F.greatest(F.length("name_a"), F.length("name_b")),
                6,
            ).alias("name_sim"),
        )
    )
