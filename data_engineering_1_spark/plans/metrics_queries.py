"""Operational-metrics / exact-numerics declared queries (round 6,
twenty-ninth batch — [north-star] scope): hazard estimation,
calendar-aware SLAs, budgeted selection, engine-neutral calendar
rollups, multivariate outliers, and composite KPIs.

  * ``nelson_aalen_hazard`` (X275) — the Nelson-Aalen cumulative
    hazard Σ d_i/n_i over the signup→first-purchase durations with
    right-censoring — the hazard-scale sibling of X140's
    Kaplan-Meier survival (same data, the other canonical
    estimator; H ≈ −ln S).
  * ``business_days_latency`` (X276) — order→first-ship latency in
    BUSINESS days via a CLOSED-FORM weekday count on the Spark side
    and brute-force day enumeration in the oracle — agreement IS
    the proof of the closed form.
  * ``greedy_knapsack_parts`` (X277) — budgeted selection by
    value/cost ratio greedy with a FIXED-POINT integer ratio key
    (no float ratio ever ordered) and cumulative-cost admission.
  * ``iso_week_revenue`` (X278) — ISO-8601 week rollup computed
    from EPOCH-DAY INTEGER ARITHMETIC (the Thursday rule), not the
    engines' week functions — week-numbering conventions are a
    classic cross-engine hazard.
  * ``mahalanobis_2d_outliers`` (X279) — top-30 multivariate
    outliers of (order value, line count) by Mahalanobis distance
    with the 2×2 covariance inverse in closed form from exact
    power sums — catches the covariance-aware outliers X52's
    per-axis z-scores miss.
  * ``perfect_order_rate_monthly`` (X280) — the composite
    perfect-order KPI (shipped ≤ 7 days AND fulfilled) per month —
    conjunctive KPIs drop faster than their worst component, which
    is the point of measuring them jointly.

Determinism: durations/weekday counts/ratio keys/ISO weeks are
exact integers; hazard steps stage d/n round-9 into DECIMAL before
the exact cumulative sum; Mahalanobis ranks on the round-9 staged
distance; every emitted rate divides once, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

_KNAP_BUDGET = 5000  # total p_size budget
_RATIO_FP = 1_000_000


# ---- X275: Nelson-Aalen cumulative hazard -----------------------------------


@declared_query(
    "nelson_aalen_hazard",
    oracle="""
    WITH study AS (SELECT MAX(ts) AS study_end FROM events),
    signup AS (
        SELECT user_id, MIN(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), first_purchase AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN signup s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
        GROUP BY e.user_id
    ), durations AS (
        SELECT CASE WHEN p.p_ts IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(p.p_ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST((SELECT study_end FROM study)
                                        AS DATE))
               END AS dur_day,
               CAST(p.p_ts IS NOT NULL AS BIGINT) AS observed
        FROM signup s LEFT JOIN first_purchase p
          ON s.user_id = p.user_id
    ), grid AS (
        SELECT dur_day,
               CAST(SUM(observed) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS leaving
        FROM durations GROUP BY dur_day
    ), risk AS (
        SELECT dur_day, d,
               CAST(SUM(leaving) OVER (ORDER BY dur_day DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
        FROM grid
    ), steps AS (
        SELECT dur_day, d, n_at_risk,
               CAST(ROUND(CAST(d AS DOUBLE) / n_at_risk, 9)
                    AS DECIMAL(18,9)) AS h_step9
        FROM risk WHERE d > 0
    )
    SELECT dur_day, d AS n_events, n_at_risk,
           CAST(h_step9 AS DOUBLE) AS hazard_step,
           CAST(ROUND(CAST(SUM(h_step9) OVER (ORDER BY dur_day
                ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS DOUBLE)
               AS cum_hazard
    FROM steps ORDER BY dur_day
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X275: the Nelson-Aalen cumulative hazard estimator
    H(t) = Σ_{t_i ≤ t} d_i/n_i over signup→first-purchase durations
    with right-censoring at study end — the hazard-scale sibling of
    X140's Kaplan-Meier (same at-risk construction; where KM
    multiplies survival factors, NA sums hazard increments, and
    exp(−H) ≥ KM-S always — pinned). The hazard scale is what
    rate-regression consumes, and the NA sum is the more stable
    estimator deep in the tail where KM's product has tiny factors.

    Exactness: event/at-risk counts exact (at-risk via the exact
    reverse cumulative, X140's discipline); each step d/n stages
    ROUND(.., 9) into DECIMAL(18,9) so the cumulative sum is exact
    decimal, rounded 6 only at emission. Scale: users reduce to one
    row per duration day; windows run over the bounded duration-DAY
    grid (whitelisted global — the kaplan_meier shape)."""
    events = load_table(spark, sf_dir, "events")
    study_end = events.agg(F.max("ts").alias("study_end"))
    signup = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purch = (
        events.join(signup, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("s_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    durations = (
        signup.join(purch, "user_id", "left")
        .crossJoin(F.broadcast(study_end))
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(
                    F.col("p_ts").cast("date"),
                    F.col("s_ts").cast("date"),
                ),
            )
            .otherwise(
                F.datediff(
                    F.col("study_end").cast("date"),
                    F.col("s_ts").cast("date"),
                )
            )
            .alias("dur_day"),
            F.col("p_ts").isNotNull().cast("bigint").alias("observed"),
        )
    )
    grid = durations.groupBy("dur_day").agg(
        F.sum("observed").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w_rev = (
        Window.orderBy(F.desc("dur_day"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = grid.select(
        "dur_day",
        "d",
        F.sum("leaving").over(w_rev).cast("bigint").alias("n_at_risk"),
    )
    steps = risk.where(F.col("d") > 0).select(
        "dur_day",
        "d",
        "n_at_risk",
        F.round(F.col("d").cast("double") / F.col("n_at_risk"), 9)
        .cast("decimal(18,9)")
        .alias("h_step9"),
    )
    w_cum = (
        Window.orderBy("dur_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return steps.select(
        "dur_day",
        F.col("d").alias("n_events"),
        "n_at_risk",
        F.col("h_step9").cast("double").alias("hazard_step"),
        F.round(
            F.sum("h_step9").over(w_cum).cast("double"), 6
        ).alias("cum_hazard"),
    ).orderBy("dur_day")


# ---- X276: business-day latency ----------------------------------------------


# Closed-form weekday count W(n) = weekdays in epoch days [0, n):
# epoch day 0 (1970-01-01) is a Thursday, so day k is a weekday iff
# ((k + 3) mod 7) < 5 with Monday = 0. See w_of() inside the query.


@declared_query(
    "business_days_latency",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS e1,
               date_diff('day', DATE '1970-01-01',
                         MIN(CAST(l.l_shipdate AS DATE))) AS e2
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ), counted AS (
        -- truth by ENUMERATION: count weekdays in (e1, e2]
        SELECT priority, e1, e2,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT unnest(generate_series(
                          CAST(l.e1 + 1 AS BIGINT),
                          CAST(l.e2 AS BIGINT))) AS k) s
                WHERE (s.k + 3) % 7 < 5) AS bdays
        FROM lat l
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(ROUND(CAST(SUM(bdays) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS avg_bdays,
           CAST(MAX(bdays) AS BIGINT) AS max_bdays
    FROM counted GROUP BY priority ORDER BY priority
    """,
)
def business_days_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X276: order→first-ship latency in BUSINESS days (weekdays) —
    the SLA currency ops teams actually quote. The Spark side uses
    the CLOSED FORM W(n) = 5·(n div 7) + min(n mod 7 pieces) for
    "weekdays in [0, n)" (epoch day 0 is a Thursday, so day k is a
    weekday iff (k+3) mod 7 < 5) and takes W(e2+1) − W(e1+1) for
    the window (e1, e2]; the oracle counts by BRUTE-FORCE day
    enumeration. The hash match between the O(1) formula and the
    O(days) enumeration IS the proof of the closed form — the
    enumeration would be the bug at 100 TB (a generate_series per
    row), the formula is free. The fixture generates ship dates
    independently of order dates (the X212 reconciliation finding),
    so negative spans occur — both sides agree on the empty-window
    convention: 0 business days, clamped, never negative.

    Exactness: pure integer arithmetic end to end; the only double
    is the one average division, rounded 6."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(F.to_date("l_shipdate")).alias("first_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.unix_date(F.to_date("o_orderdate")).cast("bigint").alias("e1"),
            F.unix_date(F.col("first_ship")).cast("bigint").alias("e2"),
        )
    )

    def w_of(col):
        # W(n): 5 per full week + weekdays among the r = n mod 7
        # leading days of a week starting at weekday (3 = Thursday):
        # those r days cover weekday indices {3, 4, 5, 6, 0, 1, ...}
        # → weekday (index < 5) count = min(r, 2) + max(0, r - 4)
        n = F.col(col) + 1  # window (e1, e2] → W(e+1) terms
        full = F.expr(f"({col} + 1) DIV 7") * 5
        r = n % 7
        partial = F.least(r, F.lit(2)) + F.greatest(
            r - 4, F.lit(0)
        )
        return (full + partial).cast("bigint")

    # the fixture generates ship dates independently of order dates,
    # so e2 < e1 happens; the enumeration over an empty range counts
    # 0 and the closed form must clamp to match (an empty window has
    # no weekdays, not negative ones)
    bd = lat.select(
        "priority",
        F.greatest(w_of("e2") - w_of("e1"), F.lit(0)).alias("bdays"),
    )
    return (
        bd.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("bdays").cast("bigint").alias("total_bdays"),
            F.round(
                F.sum("bdays").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_bdays"),
            F.max("bdays").cast("bigint").alias("max_bdays"),
        )
        .orderBy("priority")
    )


# ---- X277: greedy knapsack selection -------------------------------------------


@declared_query(
    "greedy_knapsack_parts",
    oracle=f"""
    WITH items AS (
        SELECT p_partkey,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS value_c,
               CAST(p_size AS BIGINT) AS cost,
               CAST(ROUND(p_retailprice * 100) AS BIGINT)
                   * {_RATIO_FP} // p_size AS ratio_fp
        FROM part
    ), ranked AS (
        SELECT *, SUM(cost) OVER (ORDER BY ratio_fp DESC,
                       value_c DESC, p_partkey
                       ROWS UNBOUNDED PRECEDING) AS cum_cost,
               row_number() OVER (ORDER BY ratio_fp DESC,
                       value_c DESC, p_partkey) AS rn
        FROM items
    )
    SELECT rn, p_partkey, value_c, cost,
           CAST(ratio_fp AS BIGINT) AS ratio_fp,
           CAST(cum_cost AS BIGINT) AS cum_cost
    FROM ranked WHERE cum_cost <= {_KNAP_BUDGET}
    ORDER BY rn
    """,
)
def greedy_knapsack_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X277: budgeted greedy selection — fill a 5000-unit size
    budget with parts in descending value-per-size order (the
    classic knapsack LP-relaxation greedy; within one removed item
    of optimal, and THE shape of every "pick the best items under
    a budget" curation pass — sample selection under a token
    budget, cache admission under a byte budget). The ratio key is
    the FIXED-POINT integer cents·1e6 DIV size — ordering by a
    float ratio would put greedy MEMBERSHIP on an ulp boundary;
    the integer key plus (value, partkey) tie-breaks make the
    prefix deterministic, and admission is an exact integer
    cumulative-cost test.

    Scale: the sort and cumsum run over the PART DIMENSION
    (catalog-bounded, whitelisted global — the abc_classification
    shape); at a fact-table scale the X155/X269 two-phase cumsum
    replaces the single window."""
    p = load_table(spark, sf_dir, "part")
    items = p.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("value_c"),
        F.col("p_size").cast("bigint").alias("cost"),
    ).withColumn(
        "ratio_fp", F.expr(f"value_c * {_RATIO_FP} DIV cost")
    )
    w = Window.orderBy(
        F.desc("ratio_fp"), F.desc("value_c"), F.asc("p_partkey")
    )
    ranked = items.select(
        "*",
        F.sum("cost")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_cost"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        ranked.where(F.col("cum_cost") <= _KNAP_BUDGET)
        .select(
            "rn",
            "p_partkey",
            "value_c",
            "cost",
            F.col("ratio_fp").cast("bigint").alias("ratio_fp"),
            F.col("cum_cost").cast("bigint").alias("cum_cost"),
        )
        .orderBy("rn")
    )


# ---- X278: engine-neutral ISO week rollup ----------------------------------------


@declared_query(
    "iso_week_revenue",
    oracle="""
    WITH keyed AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS e
        FROM orders
    ), thu AS (
        SELECT cents,
               e - ((e + 3) % 7) + 3 AS thursday
        FROM keyed
    ), iso AS (
        SELECT cents,
               CAST(year(DATE '1970-01-01'
                    + thursday * INTERVAL 1 DAY) AS BIGINT)
                   AS iso_year,
               CAST((dayofyear(DATE '1970-01-01'
                    + thursday * INTERVAL 1 DAY) - 1) // 7 + 1
                    AS BIGINT) AS iso_week
        FROM thu
    )
    SELECT iso_year, iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM iso GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def iso_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X278: weekly revenue rolled up by ISO-8601 week computed from
    EPOCH-DAY INTEGER ARITHMETIC — the Thursday rule (a date belongs
    to the ISO week of its Thursday; iso_year = that Thursday's
    calendar year, iso_week = its day-of-year DIV 7 + 1) expressed
    as pure integer expressions. Deliberately NOT weekofyear()/
    yearweek(): week-numbering conventions (US week-starts-Sunday,
    ISO, Jan-1-based) differ across engines and locales — the X146
    hazard class — whereas epoch-day mod arithmetic plus
    convention-free year()/dayofyear() on a concrete date is
    engine-identical. Pinned against Python's date.isocalendar(),
    the reference ISO implementation.

    Exactness: everything integer; revenue exact cents. Scale: one
    scan + one combinable (year, week) aggregate."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        F.unix_date(F.to_date("o_orderdate")).cast("bigint").alias("e"),
    )
    thu = keyed.select(
        "cents",
        (F.col("e") - ((F.col("e") + 3) % 7) + 3).alias("thursday"),
    )
    thu_date = F.date_add(
        F.lit("1970-01-01").cast("date"), F.col("thursday").cast("int")
    )
    iso = thu.select(
        "cents",
        F.year(thu_date).cast("bigint").alias("iso_year"),
        (
            F.floor((F.dayofyear(thu_date) - 1) / 7) + 1
        )
        .cast("bigint")
        .alias("iso_week"),
    )
    return (
        iso.groupBy("iso_year", "iso_week")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
        )
        .orderBy("iso_year", "iso_week")
    )


# ---- X279: 2D Mahalanobis outliers --------------------------------------------------


@declared_query(
    "mahalanobis_2d_outliers",
    oracle="""
    WITH pts AS (
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x)
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * y)
                    AS DECIMAL(38,0)) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * y)
                    AS DECIMAL(38,0)) AS sxy
        FROM pts
    ), c AS (
        SELECT n,
               CAST(n * sxx - CAST(sx AS DECIMAL(19,0)) * sx
                    AS DOUBLE) AS cxx,
               CAST(n * syy - CAST(sy AS DECIMAL(19,0)) * sy
                    AS DOUBLE) AS cyy,
               CAST(n * sxy - CAST(sx AS DECIMAL(19,0)) * sy
                    AS DOUBLE) AS cxy,
               sx, sy
        FROM s
    ), scored AS (
        SELECT p.o_orderkey, p.x, p.y,
               CAST(ROUND(
                 (c.cyy * (CAST(c.n * p.x - c.sx AS DOUBLE)
                           * (c.n * p.x - c.sx))
                  - 2 * c.cxy * (CAST(c.n * p.x - c.sx AS DOUBLE)
                                 * (c.n * p.y - c.sy))
                  + c.cxx * (CAST(c.n * p.y - c.sy AS DOUBLE)
                             * (c.n * p.y - c.sy)))
                 / (c.cxx * c.cyy - c.cxy * c.cxy), 9)
                 AS DECIMAL(18,9)) AS d2_9
        FROM pts p CROSS JOIN c
    )
    SELECT o_orderkey, x AS cents, y AS n_lines,
           CAST(d2_9 AS DOUBLE) AS mahalanobis_sq
    FROM scored
    ORDER BY d2_9 DESC, o_orderkey LIMIT 30
    """,
)
def mahalanobis_2d_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X279: top-30 multivariate outliers of (order cents, line
    count) by squared Mahalanobis distance — the covariance-aware
    outlier score that catches "expensive order with suspiciously
    FEW lines" even when both coordinates are individually normal
    (X52/X188's per-axis z-scores structurally can't). The 2×2
    covariance inverse is closed-form adj/det, so
    d² = [Cyy·vx² − 2Cxy·vx·vy + Cxx·vy²] / detC with
    vx = n·x − Sx, vy = n·y − Sy (the n² scale factors of v·v and
    n²/detC cancel exactly): the central moments C and the
    lifted residuals v are EXACT integers/decimals, and only the
    final quadratic form evaluates in doubles — identical
    expressions both engines, ranked on the round-9 staged d² with
    an orderkey tie-break.

    Scale: one per-order aggregate, one 1-row moment aggregate
    (broadcast cross, whitelisted), one scan to score — no window,
    top-30 via TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("x"),
            "y",
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    c = s.select(
        "n",
        "sx",
        "sy",
        (
            F.col("n") * F.col("sxx")
            - F.col("sx").cast("decimal(19,0)") * F.col("sx")
        )
        .cast("double")
        .alias("cxx"),
        (
            F.col("n") * F.col("syy")
            - F.col("sy").cast("decimal(19,0)") * F.col("sy")
        )
        .cast("double")
        .alias("cyy"),
        (
            F.col("n") * F.col("sxy")
            - F.col("sx").cast("decimal(19,0)") * F.col("sy")
        )
        .cast("double")
        .alias("cxy"),
    )
    vx = (F.col("n") * F.col("x") - F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("y") - F.col("sy")).cast("double")
    num = (
        F.col("cyy") * (vx * vx)
        - 2 * F.col("cxy") * (vx * vy)
        + F.col("cxx") * (vy * vy)
    )
    den = (
        F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy")
    )
    scored = pts.crossJoin(F.broadcast(c)).select(
        "o_orderkey",
        "x",
        "y",
        F.round(num / den, 9).cast("decimal(18,9)").alias("d2_9"),
    )
    return (
        scored.orderBy(F.desc("d2_9"), F.asc("o_orderkey"))
        .limit(30)
        .select(
            "o_orderkey",
            F.col("x").alias("cents"),
            F.col("y").alias("n_lines"),
            F.col("d2_9").cast("double").alias("mahalanobis_sq"),
        )
    )


# ---- X280: perfect-order KPI ----------------------------------------------------------


@declared_query(
    "perfect_order_rate_monthly",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey,
               date_trunc('month', CAST(o.o_orderdate AS DATE))
                   AS month,
               CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                        MIN(CAST(l.l_shipdate AS DATE))) <= 7
                     AND o.o_orderstatus = 'F'
                    THEN 1 ELSE 0 END AS perfect
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(perfect) AS BIGINT) AS n_perfect,
           CAST(ROUND(CAST(SUM(perfect) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS perfect_rate
    FROM per_order GROUP BY month ORDER BY month
    """,
)
def perfect_order_rate_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X280: the PERFECT-ORDER KPI per month — an order counts only
    if it first-shipped within 7 days AND completed fulfilled. The
    point of a conjunctive KPI is that it degrades multiplicatively
    (95% on-time × 95% fulfilled ≈ 90% perfect), so tracking the
    components separately systematically overstates health — this
    emits the joint rate the components can't reveal, per order
    month. The simplest query of the batch by design: KPIs that
    feed dashboards should be one combinable aggregate, auditable
    at a glance.

    Exactness: the 7-day test and status flag are exact integer/
    string comparisons; the rate is one division rounded 6."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.min(F.to_date("l_shipdate")).alias("first_ship"))
        .select(
            F.date_trunc(
                "month", F.to_date("o_orderdate")
            ).alias("month"),
            F.when(
                (
                    F.datediff(
                        F.col("first_ship"), F.to_date("o_orderdate")
                    )
                    <= 7
                )
                & (F.col("o_orderstatus") == "F"),
                1,
            )
            .otherwise(0)
            .alias("perfect"),
        )
    )
    return (
        per_order.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("perfect").cast("bigint").alias("n_perfect"),
            F.round(
                F.sum("perfect").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("perfect_rate"),
        )
        .orderBy("month")
    )
