"""Decision-science declared queries (round 6, twentieth batch —
[north-star] scope): uncertainty-aware ranking, experiment planning,
distributional treatment effects, covariate balance, hierarchical
forecast reconciliation, and pricing-consistency QA.

  * ``wilson_rank_parts`` (X221) — parts ranked by the Wilson lower
    confidence bound on their fulfilled-order share — THE
    small-sample-safe ranking (a 3/3 part must not outrank a 95/100
    part; the raw share does exactly that, the Wilson bound doesn't).
  * ``ab_sample_size_plan`` (X222) — the two-proportion power
    calculation (alpha 5%, power 80%, MDE 2pp) seeded with the
    OBSERVED baseline conversion and traffic — the
    how-long-must-this-test-run planner (X128's z-test is the
    analysis half; this is the design half).
  * ``quantile_treatment_effects`` (X223) — q_treated(tau) -
    q_control(tau) at the nine deciles — the distributional effect a
    mean difference (X205) averages away.
  * ``covariate_balance_smd`` (X224) — standardized mean differences
    for pre-treatment covariates — the balance table that must be
    ~0.1 before any causal readout is believed.
  * ``forecast_reconcile_segments`` (X225) — seasonal-naive total
    forecast disaggregated to segments by trailing-28-day shares with
    largest-remainder rounding — allocations CONSERVE the total
    exactly (pinned), the hierarchical-forecast contract.
  * ``unit_price_consistency`` (X226) — per-part unit-price
    dispersion with a >5% spread flag by integer cross-multiplication
    — the catalog-pricing QA gate.

Determinism: counts, conversions, quantile grids, SMD moments,
allocations, and price spreads are exact integers/decimals; Wilson
bounds, power formulas, and SMDs compute on identical exact operands
with literal z constants and round 6; ranking membership is decided
on rounded scores with total tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X221: Wilson lower-bound ranking ------------------------------------

_WILSON_Z2 = 3.8416  # z=1.96 squared, literal on both engines


@declared_query(
    "wilson_rank_parts",
    oracle=f"""
    WITH per_part AS (
        SELECT l.l_partkey,
               CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CASE WHEN o.o_orderstatus = 'F'
                          THEN o.o_orderkey END) AS BIGINT) AS pos
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ), scored AS (
        SELECT l_partkey, n, pos,
               CAST(ROUND(CAST(pos AS DOUBLE) / n, 6) AS DOUBLE)
                   AS p_hat,
               CAST(ROUND(
                 (CAST(pos AS DOUBLE) / n + {_WILSON_Z2} / (2 * n)
                  - sqrt({_WILSON_Z2})
                    * sqrt((CAST(pos AS DOUBLE) / n)
                           * (1 - CAST(pos AS DOUBLE) / n) / n
                           + {_WILSON_Z2} / (4.0 * n * n)))
                 / (1 + {_WILSON_Z2} / n), 9) AS DOUBLE) AS wlb9
        FROM per_part
    )
    SELECT l_partkey, n, pos, p_hat,
           CAST(ROUND(wlb9, 6) AS DOUBLE) AS wilson_lb
    FROM scored
    ORDER BY wlb9 DESC, l_partkey
    LIMIT 30
    """,
)
def wilson_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X221: parts ranked by the Wilson score lower bound on their
    fulfilled-order share — the uncertainty-aware ranking every
    review/quality leaderboard should use: the raw share ranks a 3/3
    part above a 95/100 part, while the Wilson bound shrinks
    small-sample estimates toward zero exactly as much as their
    evidence warrants (the classic "how not to sort by average
    rating" construction).

    Determinism: n and pos are exact integers; the bound is computed
    once per part on identical exact operands with z^2 as a shared
    literal, rounded 9, and the top-30 membership is decided on that
    ROUNDED score with the partkey tie-break (a total order on both
    engines). Scale: one equi-join + one combinable aggregate +
    TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    per_part = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_partkey")
        .agg(
            F.countDistinct("o_orderkey").cast("bigint").alias("n"),
            F.countDistinct(
                F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))
            )
            .cast("bigint")
            .alias("pos"),
        )
    )
    p = F.col("pos").cast("double") / F.col("n")
    nz = F.col("n").cast("double")
    wlb9 = F.round(
        (
            p
            + _WILSON_Z2 / (2 * nz)
            - F.sqrt(F.lit(_WILSON_Z2))
            * F.sqrt(p * (1 - p) / nz + _WILSON_Z2 / (4 * nz * nz))
        )
        / (1 + _WILSON_Z2 / nz),
        9,
    )
    scored = per_part.select(
        "l_partkey",
        "n",
        "pos",
        F.round(p, 6).alias("p_hat"),
        wlb9.alias("wlb9"),
    )
    return (
        scored.orderBy(F.desc("wlb9"), F.asc("l_partkey"))
        .limit(30)
        .select(
            "l_partkey",
            "n",
            "pos",
            "p_hat",
            F.round(F.col("wlb9"), 6).alias("wilson_lb"),
        )
    )


# ---- X222: A/B sample-size plan -------------------------------------------

# (z_{0.025} + z_{0.2})^2 = (1.95996 + 0.84162)^2, shared literal
_POWER_Z2 = 7.8489
_MDE = 0.02


@declared_query(
    "ab_sample_size_plan",
    oracle=f"""
    WITH traffic AS (
        SELECT CAST(SUM(CAST(event_type = 'purchase' AS BIGINT))
                    AS BIGINT) AS purchases,
               CAST(SUM(CAST(event_type = 'click' AS BIGINT))
                    AS BIGINT) AS clicks,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_days
        FROM events WHERE event_type IN ('purchase', 'click')
    )
    SELECT purchases, clicks, n_days,
           CAST(ROUND(CAST(purchases AS DOUBLE)
                      / (purchases + clicks), 6) AS DOUBLE)
               AS p_baseline,
           CAST({_MDE} AS DOUBLE) AS mde_abs,
           CAST(CEIL({_POWER_Z2}
                     * 2 * (CAST(purchases AS DOUBLE)
                            / (purchases + clicks))
                     * (1 - CAST(purchases AS DOUBLE)
                            / (purchases + clicks))
                     / ({_MDE} * {_MDE})) AS BIGINT) AS n_per_arm,
           CAST(CEIL(2 * CEIL({_POWER_Z2}
                     * 2 * (CAST(purchases AS DOUBLE)
                            / (purchases + clicks))
                     * (1 - CAST(purchases AS DOUBLE)
                            / (purchases + clicks))
                     / ({_MDE} * {_MDE}))
                     / (CAST(purchases + clicks AS DOUBLE) / n_days))
                AS BIGINT) AS days_to_collect
    FROM traffic
    """,
)
def ab_sample_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X222: the experiment-design power calculation — with the
    OBSERVED baseline conversion (purchases over purchase+click
    traffic) and observed daily volume, how many units per arm does a
    two-proportion test need to detect a 2pp absolute lift at 5%
    alpha / 80% power, and how many days of traffic is that? The
    design half of the experimentation loop (X128 analyses a finished
    test; this sizes the next one), and the number product teams ask
    the platform for daily.

    Determinism: traffic counts are exact; the (z_alpha + z_beta)^2
    constant is a shared literal; the formula computes once on
    identical exact operands; CEIL of identical doubles agrees.
    Scale: one combinable aggregate over the filtered event scan."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    t = ev.agg(
        F.sum((F.col("event_type") == "purchase").cast("bigint"))
        .cast("bigint")
        .alias("purchases"),
        F.sum((F.col("event_type") == "click").cast("bigint"))
        .cast("bigint")
        .alias("clicks"),
        F.countDistinct(F.to_date("ts")).cast("bigint").alias("n_days"),
    )
    p = F.col("purchases").cast("double") / (
        F.col("purchases") + F.col("clicks")
    )
    n_arm = F.ceil(_POWER_Z2 * 2 * p * (1 - p) / (_MDE * _MDE))
    daily = (F.col("purchases") + F.col("clicks")).cast(
        "double"
    ) / F.col("n_days")
    return t.select(
        "purchases",
        "clicks",
        "n_days",
        F.round(p, 6).alias("p_baseline"),
        F.lit(_MDE).alias("mde_abs"),
        n_arm.cast("bigint").alias("n_per_arm"),
        F.ceil(2 * n_arm / daily).cast("bigint").alias(
            "days_to_collect"
        ),
    )


# ---- X223: quantile treatment effects -------------------------------------

_QTE_TAUS = [i / 10 for i in range(1, 10)]


@declared_query(
    "quantile_treatment_effects",
    oracle=f"""
    WITH tagged AS (
        SELECT CAST(c.c_mktsegment = 'BUILDING' AS BIGINT) AS treated,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), qs AS (
        SELECT treated,
               quantile_cont(cents,
                   [{", ".join(str(t) for t in _QTE_TAUS)}]) AS qarr
        FROM tagged GROUP BY treated
    ), ex AS (
        SELECT treated, s.i,
               [{", ".join(str(t) for t in _QTE_TAUS)}][s.i] AS tau,
               CAST(ROUND(qarr[s.i], 6) AS DOUBLE) AS q
        FROM qs, LATERAL (
            SELECT unnest(generate_series(1,
                {len(_QTE_TAUS)})) AS i) s
    )
    SELECT t.tau, t.q AS q_treated, c.q AS q_control,
           CAST(ROUND((t.q - c.q) / 100, 6) AS DOUBLE) AS qte_dollars
    FROM ex t JOIN ex c ON t.i = c.i
    WHERE t.treated = 1 AND c.treated = 0
    ORDER BY t.tau
    """,
)
def quantile_treatment_effects(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X223: quantile treatment effects — the treated-minus-control
    gap in order value at each of the nine deciles. A mean difference
    (X205) can read zero while the treatment compresses the low end
    and stretches the high end; the QTE curve is the distributional
    readout that shows WHERE the effect lives — the standard
    heterogeneity companion to any average effect.

    Determinism: both quantile grids come from ONE array-argument
    percentile per group (the X136 lesson: nine separate percentile
    calls each re-buffer the column) over exact cents, rounded 6;
    the effect is a subtraction of identical rounded values. Scale:
    one broadcast-dim join, two grouped percentile aggregates, a
    9-row grid."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    tagged = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        (F.col("c_mktsegment") == "BUILDING")
        .cast("bigint")
        .alias("treated"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    taus = ", ".join(str(t) for t in _QTE_TAUS)
    qs = tagged.groupBy("treated").agg(
        F.expr(f"percentile(cents, array({taus}))").alias("qarr")
    )
    exploded = qs.select(
        "treated", F.posexplode("qarr").alias("i", "q")
    ).select(
        "treated",
        F.element_at(
            F.array(*[F.lit(t) for t in _QTE_TAUS]), F.col("i") + 1
        ).alias("tau"),
        F.round(F.col("q"), 6).alias("q"),
    )
    tr = exploded.where(F.col("treated") == 1).select(
        "tau", F.col("q").alias("q_treated")
    )
    ct = exploded.where(F.col("treated") == 0).select(
        "tau", F.col("q").alias("q_control")
    )
    return (
        tr.join(ct, "tau")
        .select(
            "tau",
            "q_treated",
            "q_control",
            F.round(
                (F.col("q_treated") - F.col("q_control")) / 100, 6
            ).alias("qte_dollars"),
        )
        .orderBy("tau")
    )


# ---- X224: covariate balance (SMD) ----------------------------------------


def _o_smd(name: str, val_expr: str, from_clause: str) -> str:
    return f"""
        SELECT '{name}' AS covariate,
               CAST(ROUND((t.mu - c.mu)
                          / sqrt((t.v + c.v) / 2), 6) AS DOUBLE) AS smd,
               (ABS(ROUND((t.mu - c.mu)
                          / sqrt((t.v + c.v) / 2), 6)) < 0.1)
                   AS balanced
        FROM (
            SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu,
                   (COUNT(*) * CAST(SUM(CAST(x AS DECIMAL(19,0)) * x)
                                    AS DOUBLE)
                    - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                   / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)) AS v
            FROM ({from_clause}) b WHERE treated = 1
        ) t CROSS JOIN (
            SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu,
                   (COUNT(*) * CAST(SUM(CAST(x AS DECIMAL(19,0)) * x)
                                    AS DOUBLE)
                    - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                   / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)) AS v
            FROM ({from_clause}) b WHERE treated = 0
        ) c
    """


_O_COV_BASE = """
    SELECT CAST(c.c_mktsegment = 'BUILDING' AS BIGINT) AS treated,
           {val} AS x
    FROM customer c LEFT JOIN (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_cents
        FROM orders GROUP BY o_custkey
    ) agg ON c.c_custkey = agg.o_custkey
"""


@declared_query(
    "covariate_balance_smd",
    oracle=" UNION ALL ".join(
        [
            _o_smd(
                "n_orders",
                "",
                _O_COV_BASE.format(val="COALESCE(agg.n_orders, 0)"),
            ),
            _o_smd(
                "spend_cents",
                "",
                _O_COV_BASE.format(val="COALESCE(agg.spend_cents, 0)"),
            ),
            _o_smd(
                "acctbal_cents",
                "",
                _O_COV_BASE.format(
                    val="CAST(ROUND(c.c_acctbal * 100) AS BIGINT)"
                ),
            ),
        ]
    )
    + " ORDER BY covariate",
)
def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X224: covariate balance — standardized mean differences of
    pre-treatment covariates (order count, total spend, account
    balance) between the BUILDING "treatment" group and the rest. The
    table every observational-causal readout (X205's DiD, X182's
    reweighting) must show first: |SMD| < 0.1 is the conventional
    balance bar, and an imbalanced covariate is a confounder until
    proven otherwise.

    Determinism: covariates are exact integers (customers without
    orders count as zero — dropping them would itself be selection
    bias); means and population variances come from exact power sums;
    each SMD is ONE expression on identical operands, rounded 6, and
    the balance flag compares the ROUNDED value. Scale: one per-
    customer aggregate, then per-covariate 1-row moment aggregates
    crossed (whitelisted)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("spend_cents"),
    )
    base = c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        (F.col("c_mktsegment") == "BUILDING")
        .cast("bigint")
        .alias("treated"),
        F.coalesce(F.col("n_orders"), F.lit(0))
        .cast("bigint")
        .alias("n_orders"),
        F.coalesce(F.col("spend_cents"), F.lit(0))
        .cast("bigint")
        .alias("spend_cents"),
        F.round(F.col("c_acctbal") * 100, 0)
        .cast("bigint")
        .alias("acctbal_cents"),
    # customer-grain, consumed once per covariate (3x) — materialize the
    # orders aggregate + dimension join once (guide §2.4; 20 scans in
    # the r13-before plan, now 2)
    ).localCheckpoint()
    out = None
    for name in ("n_orders", "spend_cents", "acctbal_cents"):
        # 2 rows, read by both arms below
        moments = base.groupBy("treated").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(name).cast("bigint").alias("s1"),
            F.sum(F.col(name).cast("decimal(19,0)") * F.col(name))
            .cast("decimal(38,0)")
            .alias("s2"),
        ).localCheckpoint()
        t = moments.where(F.col("treated") == 1).select(
            (F.col("s1").cast("double") / F.col("cnt")).alias("mu_t"),
            (
                (
                    F.col("cnt") * F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1").cast("double")
                )
                / (F.col("cnt").cast("double") * F.col("cnt"))
            ).alias("v_t"),
        )
        ct = moments.where(F.col("treated") == 0).select(
            (F.col("s1").cast("double") / F.col("cnt")).alias("mu_c"),
            (
                (
                    F.col("cnt") * F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1").cast("double")
                )
                / (F.col("cnt").cast("double") * F.col("cnt"))
            ).alias("v_c"),
        )
        smd = F.round(
            (F.col("mu_t") - F.col("mu_c"))
            / F.sqrt((F.col("v_t") + F.col("v_c")) / 2),
            6,
        )
        st = t.crossJoin(F.broadcast(ct)).select(
            F.lit(name).alias("covariate"),
            smd.alias("smd"),
            (F.abs(smd) < 0.1).alias("balanced"),
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("covariate")


# ---- X225: forecast reconciliation ----------------------------------------

_RECON_TRAIL = 28


@declared_query(
    "forecast_reconcile_segments",
    oracle=f"""
    WITH ref AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_d FROM orders
    ), total_fc AS (
        -- seasonal-naive: same weekday one week before the forecast
        -- day (ref_d + 1), i.e. ref_d - 6
        SELECT CAST(COUNT(*) AS BIGINT) AS total
        FROM orders
        WHERE CAST(o_orderdate AS DATE)
              = (SELECT ref_d FROM ref) - INTERVAL 6 DAY
    ), trail AS (
        SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE CAST(o.o_orderdate AS DATE)
              > (SELECT ref_d FROM ref) - INTERVAL {_RECON_TRAIL} DAY
        GROUP BY 1
    ), alloc AS (
        SELECT seg, n,
               CAST(SUM(n) OVER () AS BIGINT) AS trail_total,
               ((SELECT total FROM total_fc) * n)
                   // CAST(SUM(n) OVER () AS BIGINT) AS fl,
               ((SELECT total FROM total_fc) * n)
                   % CAST(SUM(n) OVER () AS BIGINT) AS rem
        FROM trail
    ), ranked AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, seg) AS rr,
               (SELECT total FROM total_fc)
                   - CAST(SUM(fl) OVER () AS BIGINT) AS leftover
        FROM alloc
    )
    SELECT seg, n AS trailing_orders,
           CAST(ROUND(CAST(n AS DOUBLE) / trail_total, 6) AS DOUBLE)
               AS trailing_share,
           CAST(fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocated_forecast
    FROM ranked ORDER BY seg
    """,
)
def forecast_reconcile_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X225: top-down forecast reconciliation — the seasonal-naive
    total forecast for the next day (same weekday last week, X153's
    forecaster) disaggregated to market segments proportionally to
    their trailing-28-day order shares, with LARGEST-REMAINDER
    rounding so the segment allocations sum to the total EXACTLY
    (pinned). The hierarchical-forecasting contract: totals and
    breakdowns that don't reconcile destroy downstream trust faster
    than being wrong does; X122/X116 use the same integer-exact
    apportionment for splits and mixtures.

    Determinism: counts, floors, remainders, and the tie-broken
    remainder ranking are exact integers. Scale: two filtered
    combinable aggregates; everything after runs on |segments|
    rows (windows whitelisted at that grain)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_d"))
    ob = o.crossJoin(F.broadcast(ref))
    total_fc = ob.where(
        F.to_date("o_orderdate") == F.date_sub(F.col("ref_d"), 6)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    trail = (
        ob.where(
            F.to_date("o_orderdate")
            > F.date_sub(F.col("ref_d"), _RECON_TRAIL)
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wall = Window.partitionBy()
    alloc = trail.crossJoin(F.broadcast(total_fc)).select(
        "seg",
        "n",
        "total",
        F.sum("n").over(wall).cast("bigint").alias("trail_total"),
        F.expr("(total * n) DIV SUM(n) OVER ()").alias("fl"),
        F.expr("(total * n) % SUM(n) OVER ()").alias("rem"),
    )
    ranked = alloc.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("seg")))
        .alias("rr"),
        (F.col("total") - F.sum("fl").over(wall).cast("bigint")).alias(
            "leftover"
        ),
    )
    return ranked.select(
        "seg",
        F.col("n").alias("trailing_orders"),
        F.round(
            F.col("n").cast("double") / F.col("trail_total"), 6
        ).alias("trailing_share"),
        (
            F.col("fl")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("allocated_forecast"),
    ).orderBy("seg")


# ---- X226: unit-price consistency -----------------------------------------


@declared_query(
    "unit_price_consistency",
    oracle="""
    WITH unit AS (
        SELECT l_partkey,
               CAST(ROUND(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          / CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS unit_cents
        FROM lineitem
    ), per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(COUNT(DISTINCT unit_cents) AS BIGINT)
                   AS n_distinct_prices,
               CAST(MIN(unit_cents) AS BIGINT) AS min_unit_cents,
               CAST(MAX(unit_cents) AS BIGINT) AS max_unit_cents
        FROM unit GROUP BY 1
    )
    SELECT l_partkey, n_lines, n_distinct_prices,
           min_unit_cents, max_unit_cents,
           CAST(ROUND(CAST(max_unit_cents AS DOUBLE)
                      / min_unit_cents, 6) AS DOUBLE) AS spread_ratio
    FROM per_part
    WHERE 100 * max_unit_cents > 105 * min_unit_cents
    ORDER BY (max_unit_cents * 1000000) // min_unit_cents DESC,
             l_partkey
    LIMIT 30
    """,
)
def unit_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X226: catalog-pricing QA — per part, the realized unit price
    (extended price / quantity, half-up to whole cents) across its
    line items; parts whose max/min unit-price spread exceeds 5% are
    flagged, top 30 by spread. Inconsistent unit pricing is how
    currency bugs, stale price lists, and unauthorized discounts
    surface in order data — and the audit must run on the FACTS, not
    the catalog price, because the catalog is exactly what it cannot
    trust.

    Determinism: unit cents are exact integers (one half-up division
    per line); the 5% flag is the integer cross-multiplication
    100*max > 105*min; the top-30 ordering uses the exact integer
    ratio max*10^6 DIV-free decimal division... ordered on the exact
    rational (max*1e6/min as decimal) with the partkey tie-break.
    Scale: one combinable per-part aggregate over one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = li.select(
        "l_partkey",
        F.round(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            / F.col("l_quantity").cast("bigint"),
            0,
        )
        .cast("bigint")
        .alias("unit_cents"),
    )
    per_part = unit.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.countDistinct("unit_cents")
        .cast("bigint")
        .alias("n_distinct_prices"),
        F.min("unit_cents").cast("bigint").alias("min_unit_cents"),
        F.max("unit_cents").cast("bigint").alias("max_unit_cents"),
    )
    flagged = per_part.where(
        100 * F.col("max_unit_cents") > 105 * F.col("min_unit_cents")
    )
    order_key = F.expr(
        "(max_unit_cents * 1000000) DIV min_unit_cents"
    )
    return (
        flagged.orderBy(order_key.desc(), F.asc("l_partkey"))
        .limit(30)
        .select(
            "l_partkey",
            "n_lines",
            "n_distinct_prices",
            "min_unit_cents",
            "max_unit_cents",
            F.round(
                F.col("max_unit_cents").cast("double")
                / F.col("min_unit_cents"),
                6,
            ).alias("spread_ratio"),
        )
    )
