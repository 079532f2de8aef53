"""Inventory-planning / treasury-ops declared queries (round 6,
twenty-third batch — [north-star] scope): the operations-research
layer — stocking policies, cash-curve risk, and fulfillment SLAs.

  * ``safety_stock_reorder`` (X239) — per-part safety stock and
    reorder point from daily-demand moments over the FULL calendar
    spine — zero-demand days enter the variance analytically (zero
    terms add nothing to the power sums), so no densification is
    ever materialized.
  * ``eoq_parts`` (X240) — economic order quantity
    sqrt(2·K·D/h) with integer-rational cost constants — the
    classic lot-size policy.
  * ``newsvendor_stock`` (X241) — critical-ratio (5/7) quantile of
    the daily-demand distribution INCLUDING implicit zero days —
    the order statistic read from the sorted positive-demand array
    with an explicit zero-mass offset.
  * ``vwap_daily`` (X242) — daily and rolling-7-day volume-weighted
    average price — each VWAP is ONE division of two exact integer
    sums (never an average of averages).
  * ``max_drawdown_segments`` (X243) — per-segment maximum drawdown
    of the cumulative-revenue curve via the running-max identity
    (X169's prefix machinery; no fold, no self-join).
  * ``fulfillment_latency_sla`` (X244) — order→first-ship latency:
    SLA attainment and exact interpolated p50/p90/p99 computed by
    the CROSSING RULE over the bounded latency-day histogram —
    never a per-group sort of raw rows.

Determinism: demand, cents, latency days, and histogram counts are
exact integers; variances ride DECIMAL(38,0) power sums; each
emitted statistic is one division (or one sqrt of an exact integer
expression) rounded 6; interpolation weights are exact small
rationals evaluated identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# Per-part daily demand (sum of quantities shipped that day) and the
# global calendar-spine bounds, shared by X239/X240/X241.
_O_DEMAND = """
    daily AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), spine AS (
        SELECT CAST(date_diff('day', MIN(d), MAX(d)) + 1 AS BIGINT)
            AS n_days
        FROM daily
    )
"""


def _spark_daily_spine(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    spine = daily.agg(
        (F.datediff(F.max("d"), F.min("d")) + 1)
        .cast("bigint")
        .alias("n_days")
    )
    return daily, spine


# ---- X239: safety stock + reorder point -----------------------------------


@declared_query(
    "safety_stock_reorder",
    oracle=f"""
    WITH {_O_DEMAND}, per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS present_days,
               CAST(SUM(q) AS BIGINT) AS s1,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * q) AS DECIMAL(38,0))
                   AS s2
        FROM daily GROUP BY 1
    )
    SELECT l_partkey, present_days, s1 AS total_qty,
           CAST(ROUND(CAST(s1 AS DOUBLE) / sp.n_days, 6) AS DOUBLE)
               AS mean_daily,
           CAST(ROUND(1.645 * sqrt(7.0 * CAST(
                    sp.n_days * s2 - CAST(s1 AS DECIMAL(19,0)) * s1
                    AS DOUBLE)) / sp.n_days, 6) AS DOUBLE)
               AS safety_stock,
           CAST(ROUND(7.0 * CAST(s1 AS DOUBLE) / sp.n_days
                      + 1.645 * sqrt(7.0 * CAST(
                    sp.n_days * s2 - CAST(s1 AS DECIMAL(19,0)) * s1
                    AS DOUBLE)) / sp.n_days, 6) AS DOUBLE)
               AS reorder_point
    FROM per_part CROSS JOIN spine sp
    ORDER BY s1 DESC, l_partkey
    LIMIT 30
    """,
)
def safety_stock_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X239: the stocking policy — per part, safety stock
    z·sigma_d·sqrt(L) and reorder point mean_d·L + safety stock at
    z = 1.645 (95% cycle service) and lead time L = 7 days, over
    DAILY demand on the full calendar spine. The key trick is that
    zero-demand days — which dominate intermittent SKUs and without
    which the variance is badly understated — enter ANALYTICALLY:
    sigma² = (N·S2 − S1²)/N² over the N-day spine needs only the
    power sums of PRESENT days, because zero terms contribute
    nothing to S1 or S2. No |parts|×|days| densification is ever
    materialized (the X208 sparse-grid lesson, solved the opposite
    way).

    Exactness: S1/S2/N are exact BIGINT/DECIMAL; safety stock is
    1.645·sqrt(7·(N·S2−S1²))/N — ONE sqrt of an exact integer,
    scaled by exact rationals — rounded 6. Scale: one combinable
    aggregate per (part, day), one per part; the 1-row spine
    broadcasts (whitelisted cross); top-30 by exact total."""
    daily, spine = _spark_daily_spine(spark, sf_dir)
    per_part = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("present_days"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.col("q").cast("decimal(19,0)") * F.col("q"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    j = per_part.crossJoin(F.broadcast(spine))
    var_num = (
        F.col("n_days") * F.col("s2")
        - F.col("s1").cast("decimal(19,0)") * F.col("s1")
    ).cast("double")
    nd = F.col("n_days").cast("double")
    ss = 1.645 * F.sqrt(7.0 * var_num) / nd
    return (
        j.select(
            "l_partkey",
            "present_days",
            F.col("s1").alias("total_qty"),
            F.round(F.col("s1").cast("double") / nd, 6).alias(
                "mean_daily"
            ),
            F.round(ss, 6).alias("safety_stock"),
            F.round(
                7.0 * F.col("s1").cast("double") / nd + ss, 6
            ).alias("reorder_point"),
        )
        .orderBy(F.desc("total_qty"), "l_partkey")
        .limit(30)
    )


# ---- X240: economic order quantity ----------------------------------------


@declared_query(
    "eoq_parts",
    oracle=f"""
    WITH {_O_DEMAND}, per_part AS (
        SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS total_qty
        FROM daily GROUP BY 1
    )
    SELECT pp.l_partkey, pp.total_qty,
           CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_cents,
           CAST(ROUND(sqrt(CAST(36500000 * pp.total_qty AS DOUBLE)
                           / (sp.n_days
                              * CAST(ROUND(p.p_retailprice * 100)
                                     AS BIGINT))), 6) AS DOUBLE)
               AS eoq_units,
           CAST(ROUND(CAST(365 * pp.total_qty AS DOUBLE) / sp.n_days
                      / sqrt(CAST(36500000 * pp.total_qty AS DOUBLE)
                             / (sp.n_days
                                * CAST(ROUND(p.p_retailprice * 100)
                                       AS BIGINT))), 6) AS DOUBLE)
               AS orders_per_year
    FROM per_part pp
    JOIN part p ON pp.l_partkey = p.p_partkey
    CROSS JOIN spine sp
    ORDER BY pp.total_qty DESC, pp.l_partkey
    LIMIT 30
    """,
)
def eoq_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X240: the classic lot-size policy — EOQ = sqrt(2·K·D/h) with
    ordering cost K = $100 and holding cost h = 20% of the retail
    price per unit-year; D is the observed demand annualized over
    the calendar spine. The whole radicand reduces to the exact
    rational 36 500 000·total_qty / (span_days·price_cents)
    (2·10000·365·5 = 36.5M — the cost constants folded into one
    integer), so both engines evaluate ONE division and ONE sqrt on
    identical exact operands. Orders/year = D/EOQ rides the same
    radicand.

    Scale: one per-part aggregate, a broadcast-sized part join, the
    1-row spine crossed in (whitelisted); top-30 by exact demand."""
    daily, spine = _spark_daily_spine(spark, sf_dir)
    per_part = daily.groupBy("l_partkey").agg(
        F.sum("q").cast("bigint").alias("total_qty")
    )
    p = load_table(spark, sf_dir, "part")
    j = (
        per_part.join(
            F.broadcast(
                p.select(
                    "p_partkey",
                    F.round(F.col("p_retailprice") * 100, 0)
                    .cast("bigint")
                    .alias("price_cents"),
                )
            ),
            per_part["l_partkey"] == F.col("p_partkey"),
        )
        .crossJoin(F.broadcast(spine))
    )
    radicand = (36500000 * F.col("total_qty")).cast("double") / (
        F.col("n_days") * F.col("price_cents")
    )
    eoq = F.sqrt(radicand)
    return (
        j.select(
            "l_partkey",
            "total_qty",
            "price_cents",
            F.round(eoq, 6).alias("eoq_units"),
            F.round(
                (365 * F.col("total_qty")).cast("double")
                / F.col("n_days")
                / eoq,
                6,
            ).alias("orders_per_year"),
        )
        .orderBy(F.desc("total_qty"), "l_partkey")
        .limit(30)
    )


# ---- X241: newsvendor critical-ratio quantile -----------------------------


@declared_query(
    "newsvendor_stock",
    oracle=f"""
    WITH {_O_DEMAND}, arrs AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS present_days,
               CAST(SUM(q) AS BIGINT) AS total_qty,
               list_sort(list(q)) AS qs
        FROM daily GROUP BY 1
    ), pos AS (
        SELECT a.*, sp.n_days,
               sp.n_days - a.present_days AS zero_days,
               (sp.n_days - 1) * 5 // 7 AS lo,
               LEAST((sp.n_days - 1) * 5 // 7 + 1, sp.n_days - 1)
                   AS hi,
               CAST(((sp.n_days - 1) * 5 % 7) AS DOUBLE) / 7 AS frac
        FROM arrs a CROSS JOIN spine sp
    )
    SELECT l_partkey, present_days, total_qty,
           CAST(zero_days AS BIGINT) AS zero_days,
           CAST(ROUND(
               CASE WHEN lo < zero_days THEN 0
                    ELSE CAST(qs[CAST(lo - zero_days + 1 AS INTEGER)]
                              AS DOUBLE) END
               + frac * (
                 CASE WHEN hi < zero_days THEN 0
                      ELSE CAST(qs[CAST(hi - zero_days + 1 AS INTEGER)]
                                AS DOUBLE) END
                 - CASE WHEN lo < zero_days THEN 0
                        ELSE CAST(qs[CAST(lo - zero_days + 1
                                          AS INTEGER)] AS DOUBLE) END
               ), 6) AS DOUBLE) AS optimal_stock
    FROM pos
    ORDER BY total_qty DESC, l_partkey
    LIMIT 30
    """,
)
def newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X241: the newsvendor policy — stock at the critical-ratio
    quantile cu/(cu+co) of daily demand. With underage cost 25% and
    overage cost 10% of price the ratio is the constant exact
    rational 5/7, and the quantile MUST be taken over the full
    calendar spine: for an intermittent SKU most days sell zero,
    and a quantile over present days only would systematically
    overstock. The zero mass is handled by INDEX ARITHMETIC — the
    sorted positive-demand array plus an explicit zero_days offset
    — never by materializing zero rows (the analytic-zeros
    complement to X239's variance trick).

    Exactness: the 0-based position (N−1)·5/7 splits into an exact
    integer lo = (N−1)·5 DIV 7 and an exact rational weight
    ((N−1)·5 mod 7)/7; array lookups are exact; the single
    interpolation runs on identical operands both engines, rounded
    6. Scale: the per-part array is bounded by the calendar span
    (never row count); the 1-row spine broadcasts (whitelisted)."""
    daily, spine = _spark_daily_spine(spark, sf_dir)
    arrs = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("present_days"),
        F.sum("q").cast("bigint").alias("total_qty"),
        F.sort_array(F.collect_list("q")).alias("qs"),
    )
    pos = arrs.crossJoin(F.broadcast(spine)).select(
        "*",
        (F.col("n_days") - F.col("present_days")).alias("zero_days"),
        F.expr("(n_days - 1) * 5 DIV 7").alias("lo"),
        F.least(
            F.expr("(n_days - 1) * 5 DIV 7 + 1"), F.col("n_days") - 1
        ).alias("hi"),
        (
            ((F.col("n_days") - 1) * 5 % 7).cast("double") / 7
        ).alias("frac"),
    )

    def val_at(idx):
        return F.when(F.col(idx) < F.col("zero_days"), F.lit(0.0)).otherwise(
            F.element_at(
                "qs", (F.col(idx) - F.col("zero_days") + 1).cast("int")
            ).cast("double")
        )

    v_lo = val_at("lo")
    v_hi = val_at("hi")
    return (
        pos.select(
            "l_partkey",
            "present_days",
            "total_qty",
            F.col("zero_days").cast("bigint").alias("zero_days"),
            F.round(v_lo + F.col("frac") * (v_hi - v_lo), 6).alias(
                "optimal_stock"
            ),
        )
        .orderBy(F.desc("total_qty"), "l_partkey")
        .limit(30)
    )


# ---- X242: daily + rolling VWAP -------------------------------------------


@declared_query(
    "vwap_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1
    )
    SELECT d, cents, qty,
           CAST(ROUND(CAST(cents AS DOUBLE) / (100.0 * qty), 6)
                AS DOUBLE) AS vwap,
           CAST(ROUND(CAST(SUM(cents) OVER w AS DOUBLE)
                      / (100.0 * SUM(qty) OVER w), 6) AS DOUBLE)
               AS vwap_7d
    FROM daily
    WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                 AND CURRENT ROW)
    ORDER BY d
    """,
)
def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X242: daily and trailing-7-day volume-weighted average price.
    Every VWAP is ONE division of two exact integer sums — total
    cents over total units — never an average of per-line prices
    (the classic VWAP bug weights a 1-unit line like a 1000-unit
    line). The rolling leg divides the two 7-day RANGE-window sums,
    so it is exactly the 7-day VWAP, not a mean of daily VWAPs.

    Exactness: cents/qty exact BIGINT; each output one division
    rounded 6. Scale: one (day) aggregate; the rolling window runs
    over the bounded |days| series (whitelisted global)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    w = (
        Window.orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "d",
        "cents",
        "qty",
        F.round(
            F.col("cents").cast("double") / (100.0 * F.col("qty")), 6
        ).alias("vwap"),
        F.round(
            F.sum("cents").over(w).cast("double")
            / (100.0 * F.sum("qty").over(w)),
            6,
        ).alias("vwap_7d"),
    ).orderBy("d")


# ---- X243: maximum drawdown -----------------------------------------------


@declared_query(
    "max_drawdown_segments",
    oracle="""
    WITH daily AS (
        SELECT c.c_mktsegment AS segment,
               CAST(o.o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                        * CASE WHEN o.o_orderstatus = 'F'
                               THEN 1 ELSE -1 END) AS BIGINT) AS net
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), curve AS (
        SELECT segment, d,
               SUM(net) OVER (PARTITION BY segment ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS equity
        FROM daily
    ), dd AS (
        SELECT segment, d, equity,
               MAX(equity) OVER (PARTITION BY segment ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS peak,
               MAX(equity) OVER (PARTITION BY segment ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) - equity
                   AS drawdown
        FROM curve
    ), worst AS (
        SELECT * FROM (
            SELECT dd.*,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY drawdown DESC, d)
                       AS rn
            FROM dd
        ) WHERE rn = 1
    )
    SELECT segment, CAST(drawdown AS BIGINT) AS max_drawdown_cents,
           CAST(peak AS BIGINT) AS peak_cents,
           d AS trough_day,
           CAST(ROUND(CAST(drawdown AS DOUBLE) / peak, 6) AS DOUBLE)
               AS drawdown_frac
    FROM worst ORDER BY segment
    """,
)
def max_drawdown_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X243: per-segment maximum drawdown of the cumulative net
    revenue curve (fulfilled orders credit, others debit — a signed
    cash proxy with real dips). Drawdown is the running-max identity
    dd_t = max_{k<=t}(E_k) − E_t, so the whole statistic is two
    stacked partitioned windows + one argmax — X169's prefix
    machinery; the naive formulation is an O(n²) self-join per
    segment. Trough day ties break earliest.

    Exactness: equity/peak/drawdown are exact BIGINT cents; the
    fraction is one division rounded 6. Scale: both windows and the
    argmax partition BY SEGMENT over the |segment|×|days| daily
    aggregate, never raw orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                * F.when(F.col("o_orderstatus") == "F", 1).otherwise(-1)
            )
            .cast("bigint")
            .alias("net")
        )
    )
    wcum = (
        Window.partitionBy("segment")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.select(
        "segment",
        "d",
        F.sum("net").over(wcum).alias("equity"),
    ).select(
        "segment",
        "d",
        "equity",
        F.max("equity").over(wcum).alias("peak"),
        (F.max("equity").over(wcum) - F.col("equity")).alias("drawdown"),
    )
    wr = Window.partitionBy("segment").orderBy(
        F.desc("drawdown"), F.asc("d")
    )
    return (
        dd.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "segment",
            F.col("drawdown").cast("bigint").alias("max_drawdown_cents"),
            F.col("peak").cast("bigint").alias("peak_cents"),
            F.col("d").alias("trough_day"),
            F.round(
                F.col("drawdown").cast("double") / F.col("peak"), 6
            ).alias("drawdown_frac"),
        )
        .orderBy("segment")
    )


# ---- X244: fulfillment latency SLA ----------------------------------------


def _crossing(idx_expr: str) -> str:
    """Smallest latency whose cumulative count exceeds the 0-based
    index (DuckDB side)."""
    return (
        f"MIN(CASE WHEN cum >= {idx_expr} + 1 THEN lat END)"
    )


@declared_query(
    "fulfillment_latency_sla",
    oracle=f"""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                    MIN(CAST(l.l_shipdate AS DATE))) AS BIGINT)
                   AS lat
        FROM orders o JOIN lineitem l
          ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ), hist AS (
        SELECT priority, lat, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lat GROUP BY 1, 2
    ), cume AS (
        SELECT priority, lat, cnt,
               SUM(cnt) OVER (PARTITION BY priority ORDER BY lat
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY priority) AS n
        FROM hist
    ), ns AS (
        SELECT priority, MAX(n) AS n,
               (MAX(n) - 1) * 1 // 2 AS lo50,
               LEAST((MAX(n) - 1) * 1 // 2 + 1, MAX(n) - 1) AS hi50,
               CAST((MAX(n) - 1) % 2 AS DOUBLE) / 2 AS f50,
               (MAX(n) - 1) * 9 // 10 AS lo90,
               LEAST((MAX(n) - 1) * 9 // 10 + 1, MAX(n) - 1) AS hi90,
               CAST((MAX(n) - 1) * 9 % 10 AS DOUBLE) / 10 AS f90,
               (MAX(n) - 1) * 99 // 100 AS lo99,
               LEAST((MAX(n) - 1) * 99 // 100 + 1, MAX(n) - 1) AS hi99,
               CAST((MAX(n) - 1) * 99 % 100 AS DOUBLE) / 100 AS f99
        FROM cume GROUP BY priority
    ), stats AS (
        SELECT c.priority, MAX(s.n) AS n,
               CAST(SUM(CASE WHEN c.lat <= 7 THEN c.cnt ELSE 0 END)
                    AS BIGINT) AS within_7d,
               {_crossing("s.lo50")} AS p50_lo,
               {_crossing("s.hi50")} AS p50_hi,
               MAX(s.f50) AS f50,
               {_crossing("s.lo90")} AS p90_lo,
               {_crossing("s.hi90")} AS p90_hi,
               MAX(s.f90) AS f90,
               {_crossing("s.lo99")} AS p99_lo,
               {_crossing("s.hi99")} AS p99_hi,
               MAX(s.f99) AS f99
        FROM cume c JOIN ns s ON c.priority = s.priority
        GROUP BY c.priority
    )
    SELECT priority, CAST(n AS BIGINT) AS n_orders, within_7d,
           CAST(ROUND(CAST(within_7d AS DOUBLE) / n, 6) AS DOUBLE)
               AS sla_7d_share,
           CAST(ROUND(p50_lo + f50 * (p50_hi - p50_lo), 6) AS DOUBLE)
               AS p50_days,
           CAST(ROUND(p90_lo + f90 * (p90_hi - p90_lo), 6) AS DOUBLE)
               AS p90_days,
           CAST(ROUND(p99_lo + f99 * (p99_hi - p99_lo), 6) AS DOUBLE)
               AS p99_days
    FROM stats ORDER BY priority
    """,
)
def fulfillment_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X244: the fulfillment SLA report — per order priority: share
    of orders first-shipped within 7 days, and exact interpolated
    p50/p90/p99 of order→first-ship latency. Percentiles are read by
    the CROSSING RULE over the bounded latency-day histogram
    (latency spans ~a hundred distinct integers regardless of row
    count): the 0-based position (n−1)·p splits into an exact
    integer index (n−1)·num DIV den and an exact rational weight
    ((n−1)·num mod den)/den, and each order statistic is "the
    smallest latency whose cumulative count exceeds the index" — a
    conditional MIN over the histogram, never a per-group sort of
    raw orders (the X136 crossing discipline; percentile()/
    quantile_cont at p = 0.9 is a cross-engine ulp hazard because
    0.9 has no exact binary representation).

    Exactness: latencies, counts, cumulative counts, and indices
    are exact integers; each percentile is one interpolation on
    exact operands rounded 6. Scale: histogram + windows partition
    by priority over the bounded (priority, latency) grid."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(F.to_date("l_shipdate")).alias("first_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("first_ship"), F.to_date("o_orderdate")
            )
            .cast("bigint")
            .alias("lat"),
        )
    )
    hist = lat.groupBy("priority", "lat").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("lat")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cume = hist.select(
        "priority",
        "lat",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("priority")).alias("n"),
    )

    # The conditional-MIN crossing needs per-row cum against a
    # per-GROUP constant index, so indices are computed on the tiny
    # per-priority n relation and broadcast-joined back.
    ns = cume.groupBy("priority").agg(F.max("n").alias("n"))

    def idx_cols(num, den):
        lo = F.expr(f"(n - 1) * {num} DIV {den}")
        hi = F.least(lo + 1, F.col("n") - 1)
        frac = (((F.col("n") - 1) * num) % den).cast("double") / den
        return lo, hi, frac

    lo50, hi50, f50 = idx_cols(1, 2)
    lo90, hi90, f90 = idx_cols(9, 10)
    lo99, hi99, f99 = idx_cols(99, 100)
    idx = F.broadcast(
        ns.select(
            "priority",
            lo50.alias("lo50"),
            hi50.alias("hi50"),
            f50.alias("f50"),
            lo90.alias("lo90"),
            hi90.alias("hi90"),
            f90.alias("f90"),
            lo99.alias("lo99"),
            hi99.alias("hi99"),
            f99.alias("f99"),
        )
    )
    j = cume.join(idx, "priority")

    def cross_at(col):
        return F.min(
            F.when(F.col("cum") >= F.col(col) + 1, F.col("lat"))
        ).cast("double")

    stats = j.groupBy("priority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("lat") <= 7, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("within_7d"),
        cross_at("lo50").alias("p50_lo"),
        cross_at("hi50").alias("p50_hi"),
        F.max("f50").alias("f50"),
        cross_at("lo90").alias("p90_lo"),
        cross_at("hi90").alias("p90_hi"),
        F.max("f90").alias("f90"),
        cross_at("lo99").alias("p99_lo"),
        cross_at("hi99").alias("p99_hi"),
        F.max("f99").alias("f99"),
    )
    return stats.select(
        "priority",
        "n_orders",
        "within_7d",
        F.round(
            F.col("within_7d").cast("double") / F.col("n_orders"), 6
        ).alias("sla_7d_share"),
        F.round(
            F.col("p50_lo")
            + F.col("f50") * (F.col("p50_hi") - F.col("p50_lo")),
            6,
        ).alias("p50_days"),
        F.round(
            F.col("p90_lo")
            + F.col("f90") * (F.col("p90_hi") - F.col("p90_lo")),
            6,
        ).alias("p90_days"),
        F.round(
            F.col("p99_lo")
            + F.col("f99") * (F.col("p99_hi") - F.col("p99_lo")),
            6,
        ).alias("p99_days"),
    ).orderBy("priority")
