"""Market-structure / revenue-analytics declared queries (round 6,
twenty-fourth batch — [north-star] scope): the pricing-and-growth
layer — price indexes, market concentration, revenue bridges,
cohort revenue retention, tied rankings, and customer lifetime value.

  * ``price_index_monthly`` (X245) — matched-basket Laspeyres,
    Paasche, and Fisher price indexes per month vs the first month —
    fixed-point integer unit prices so every index is one division
    (or one sqrt) on exact operands.
  * ``hhi_brand_region`` (X246) — Herfindahl-Hirschman market
    concentration of brands per region, computed as
    Σrev² / (Σrev)² so the whole statistic is ONE division of two
    exact decimals — shares are never materialized as floats.
  * ``price_volume_mix`` (X247) — the month-over-month revenue
    bridge: price / volume / cross / new / discontinued effects in
    exact fixed-point units with an ALGEBRAIC conservation identity
    (components sum to the total change exactly, pinned).
  * ``nrr_monthly_cohorts`` (X248) — net revenue retention by
    first-order cohort month: rev(cohort, m) / rev(cohort, 0), an
    exact-cents division over the bounded cohort x month grid.
  * ``top_orders_with_ties`` (X249) — RANK-based WITH TIES top-3
    per segment over hundred-dollar price bands — the top-k
    semantics row_number() cannot express (tied rows all survive;
    groups may return more than k rows).
  * ``clv_segments`` (X250) — simple customer-lifetime-value per
    segment: AOV x frequency x 1/(1-repeat) algebraically collapsed
    to total_cents / (customers - repeat_customers) — ONE division.

Determinism: cents/quantities/counts are exact integers; fixed-point
unit prices use truncating integer division (identical DIV // on
both engines, positive operands); index products stage through
identical double expressions; every emitted ratio is one division
rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ._discipline import o_r6_fp, r6_fp
from .registry import declared_query

# Fixed-point unit-price scale: price_fp = cents * 1e6 DIV qty.
_PRICE_FP = 1_000_000

# Part-month relation shared by X245/X247: per (part, ship month),
# exact revenue cents, exact quantity, and the fixed-point unit price.
_O_PART_MONTH = f"""
    pm AS (
        SELECT l_partkey,
               date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), pmp AS (
        SELECT l_partkey, m, cents, qty,
               cents * {_PRICE_FP} // qty AS price_fp
        FROM pm
    ), base AS (
        SELECT MIN(m) AS m0 FROM pmp
    )
"""


def _spark_part_month(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey",
        F.date_trunc("month", F.to_date("l_shipdate")).alias("m"),
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    pmp = pm.select(
        "l_partkey",
        "m",
        "cents",
        "qty",
        F.expr(f"cents * {_PRICE_FP} DIV qty").alias("price_fp"),
    )
    base = pmp.agg(F.min("m").alias("m0"))
    return pmp, base


# ---- X245: Laspeyres / Paasche / Fisher price index ------------------------


@declared_query(
    "price_index_monthly",
    oracle=f"""
    WITH {_O_PART_MONTH}, p0 AS (
        SELECT p.l_partkey, p.price_fp AS p0_fp, p.qty AS q0
        FROM pmp p JOIN base b ON p.m = b.m0
    ), matched AS (
        SELECT t.m, t.l_partkey, t.price_fp AS pt_fp, t.qty AS qt,
               z.p0_fp, z.q0
        FROM pmp t JOIN p0 z ON t.l_partkey = z.l_partkey
    ), sums AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS matched_parts,
               CAST(SUM(CAST(pt_fp AS DECIMAL(19,0)) * q0)
                    AS DECIMAL(38,0)) AS nl,
               CAST(SUM(CAST(p0_fp AS DECIMAL(19,0)) * q0)
                    AS DECIMAL(38,0)) AS dl,
               CAST(SUM(CAST(pt_fp AS DECIMAL(19,0)) * qt)
                    AS DECIMAL(38,0)) AS np,
               CAST(SUM(CAST(p0_fp AS DECIMAL(19,0)) * qt)
                    AS DECIMAL(38,0)) AS dp
        FROM matched GROUP BY m
    )
    SELECT m AS month, matched_parts,
           CAST(ROUND(CAST(nl AS DOUBLE) / CAST(dl AS DOUBLE), 6)
                AS DOUBLE) AS laspeyres,
           CAST(ROUND(CAST(np AS DOUBLE) / CAST(dp AS DOUBLE), 6)
                AS DOUBLE) AS paasche,
           CAST(ROUND(sqrt((CAST(nl AS DOUBLE) / CAST(dl AS DOUBLE))
                         * (CAST(np AS DOUBLE) / CAST(dp AS DOUBLE))),
                      6) AS DOUBLE) AS fisher
    FROM sums ORDER BY m
    """,
)
def price_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X245: matched-model price indexes per ship month against the
    first month's basket — Laspeyres Σp_t·q_0/Σp_0·q_0 (base-weighted,
    overstates under substitution), Paasche Σp_t·q_t/Σp_0·q_t
    (current-weighted, understates), and their geometric mean Fisher —
    the inflation triple a pricing team tracks. Unit prices are
    FIXED-POINT integers (cents·1e6 DIV qty — truncating division is
    identical on both engines for positive operands), so all four
    index sums are exact DECIMAL(38,0) and each index is one division
    (Fisher: one sqrt of the product of the two identical double
    ratios) rounded 6. The basket is matched per month (parts present
    in both the base month and month t), with the matched count
    emitted so basket shrinkage is visible.

    Scale: one (part, month) aggregate (combinable), one equi-join to
    the |parts|-row base relation, one per-month aggregate — the
    grid is calendar x catalog bounded, never raw lineitems."""
    pmp, base = _spark_part_month(spark, sf_dir)
    p0 = (
        pmp.join(F.broadcast(base), pmp["m"] == F.col("m0"))
        .select(
            "l_partkey",
            F.col("price_fp").alias("p0_fp"),
            F.col("qty").alias("q0"),
        )
    )
    matched = pmp.join(p0, "l_partkey").select(
        "m",
        F.col("price_fp").alias("pt_fp"),
        F.col("qty").alias("qt"),
        "p0_fp",
        "q0",
    )
    sums = matched.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("matched_parts"),
        F.sum(F.col("pt_fp").cast("decimal(19,0)") * F.col("q0"))
        .cast("decimal(38,0)")
        .alias("nl"),
        F.sum(F.col("p0_fp").cast("decimal(19,0)") * F.col("q0"))
        .cast("decimal(38,0)")
        .alias("dl"),
        F.sum(F.col("pt_fp").cast("decimal(19,0)") * F.col("qt"))
        .cast("decimal(38,0)")
        .alias("np"),
        F.sum(F.col("p0_fp").cast("decimal(19,0)") * F.col("qt"))
        .cast("decimal(38,0)")
        .alias("dp"),
    )
    lasp = F.col("nl").cast("double") / F.col("dl").cast("double")
    paas = F.col("np").cast("double") / F.col("dp").cast("double")
    return sums.select(
        F.col("m").alias("month"),
        "matched_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("month")


# ---- X246: HHI market concentration ----------------------------------------


@declared_query(
    "hhi_brand_region",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, p.p_brand AS brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ), agg AS (
        SELECT region, CAST(COUNT(*) AS BIGINT) AS n_brands,
               CAST(SUM(CAST(cents AS DECIMAL(19,0)) * cents)
                    AS DECIMAL(38,0)) AS sumsq,
               CAST(SUM(cents) AS BIGINT) AS total
        FROM rev GROUP BY 1
    ), top AS (
        SELECT region, brand AS top_brand, cents AS top_cents
        FROM (
            SELECT region, brand, cents,
                   row_number() OVER (PARTITION BY region
                                      ORDER BY cents DESC, brand) AS rn
            FROM rev
        ) WHERE rn = 1
    )
    SELECT a.region, a.n_brands,
           CAST(ROUND(CAST(a.sumsq AS DOUBLE)
                      / (CAST(a.total AS DOUBLE) * a.total), 6)
                AS DOUBLE) AS hhi,
           CAST(ROUND((CAST(a.total AS DOUBLE) * a.total)
                      / CAST(a.sumsq AS DOUBLE), 6) AS DOUBLE)
               AS effective_brands,
           t.top_brand,
           CAST(ROUND(CAST(t.top_cents AS DOUBLE) / a.total, 6)
                AS DOUBLE) AS top_share
    FROM agg a JOIN top t ON a.region = t.region
    ORDER BY a.region
    """,
)
def hhi_brand_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X246: Herfindahl-Hirschman concentration of brand revenue per
    customer region — the antitrust-style market-structure statistic.
    HHI = Σs_i² with s_i = rev_i/total is computed as
    Σrev² / total² so shares are NEVER materialized as floats: both
    operands are exact (DECIMAL(38,0) sum of BIGINT squares; total²
    as one double product of the exact total), and the statistic is
    one division rounded 6. Effective brand count is its reciprocal
    total²/Σrev² — the "equivalent equal-sized competitors" reading.
    Top-brand share rides the same exact cents.

    Scale: dims broadcast; one (region, brand) aggregate (combinable)
    over the fact join; the HHI aggregate and top-1 window run over
    the |regions|x|brands| grid (bounded by catalog, never rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
        # catalog-bounded (|regions| x |brands|) grid consumed by both
        # the HHI aggregate and the top-brand window; lazy, each re-ran
        # the 6-table fact join (24 scans in the r13-before plan)
        .localCheckpoint()
    )
    agg = rev.groupBy("region").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sumsq"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    wr = Window.partitionBy("region").orderBy(
        F.desc("cents"), F.asc("brand")
    )
    top = (
        rev.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "region",
            F.col("brand").alias("top_brand"),
            F.col("cents").alias("top_cents"),
        )
    )
    totd = F.col("total").cast("double")
    return (
        agg.join(top, "region")
        .select(
            "region",
            "n_brands",
            F.round(
                F.col("sumsq").cast("double") / (totd * F.col("total")),
                6,
            ).alias("hhi"),
            F.round(
                (totd * F.col("total")) / F.col("sumsq").cast("double"),
                6,
            ).alias("effective_brands"),
            "top_brand",
            F.round(
                F.col("top_cents").cast("double") / F.col("total"), 6
            ).alias("top_share"),
        )
        .orderBy("region")
    )


# ---- X247: price-volume-mix revenue bridge ---------------------------------


def _o_fx_effect(expr: str) -> str:
    """Oracle effect dollars: exact DECIMAL(38,0) sum of the fixed-point
    effect, rounded-to-6 via the integer-exact path (o_r6_fp — the same
    discipline the Spark leg uses; ADVICE r11 replaced six hand-inlined
    copies of this stanza with the shared helper)."""
    return o_r6_fp(f"SUM(CAST({expr} AS DECIMAL(38,0)))", 100 * _PRICE_FP)


@declared_query(
    "price_volume_mix",
    oracle=f"""
    WITH {_O_PART_MONTH}, pairs AS (
        SELECT COALESCE(t.m, p.m + INTERVAL 1 MONTH) AS m,
               COALESCE(t.l_partkey, p.l_partkey) AS l_partkey,
               t.price_fp AS pt, t.qty AS qt,
               p.price_fp AS pp, p.qty AS qp
        FROM pmp t FULL OUTER JOIN pmp p
          ON t.l_partkey = p.l_partkey
         AND t.m = p.m + INTERVAL 1 MONTH
    ), fx AS (
        SELECT m,
            CASE WHEN pt IS NOT NULL AND pp IS NOT NULL THEN 1 ELSE 0
                END AS matched,
            CASE WHEN pt IS NOT NULL AND pp IS NOT NULL
                 THEN (pt - pp) * qp ELSE 0 END AS price_fx,
            CASE WHEN pt IS NOT NULL AND pp IS NOT NULL
                 THEN (qt - qp) * pp ELSE 0 END AS vol_fx,
            CASE WHEN pt IS NOT NULL AND pp IS NOT NULL
                 THEN (pt - pp) * (qt - qp) ELSE 0 END AS cross_fx,
            CASE WHEN pp IS NULL THEN pt * qt ELSE 0 END AS new_fx,
            CASE WHEN pt IS NULL THEN -(pp * qp) ELSE 0 END AS disc_fx
        FROM pairs
    )
    SELECT m AS month,
           CAST(SUM(matched) AS BIGINT) AS matched_parts,
           {_o_fx_effect("price_fx")} AS price_effect,
           {_o_fx_effect("vol_fx")} AS volume_effect,
           {_o_fx_effect("cross_fx")} AS cross_effect,
           {_o_fx_effect("new_fx")} AS new_parts_effect,
           {_o_fx_effect("disc_fx")} AS discontinued_effect,
           {_o_fx_effect("price_fx + vol_fx + cross_fx + new_fx + disc_fx")}
               AS total_change
    FROM fx
    WHERE m > (SELECT MIN(m) FROM pmp)
      AND m <= (SELECT MAX(m) FROM pmp)
    GROUP BY m ORDER BY m
    """,
)
def price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X247: the month-over-month revenue BRIDGE — for every month,
    the change in (fixed-point) revenue decomposed into price effect
    (Δp·q_prev), volume effect (Δq·p_prev), cross term (Δp·Δq), new
    parts (+p_t·q_t), and discontinued parts (−p_prev·q_prev). In
    fixed-point units the five components sum to the total change
    EXACTLY — an algebraic identity on integers, not an approximation
    — which the pin test asserts term-by-term. The part-month FULL
    OUTER self-join on (part, prev month) classifies matched / new /
    discontinued in one pass.

    Exactness: every effect is a product/difference of exact BIGINTs
    summed as DECIMAL(38,0); dollars emerge by one division by the
    constant 1e8 rounded 6. Scale: the self-join is equi on
    (part, month) over the catalog x calendar grid, never raw rows."""
    pmp, _ = _spark_part_month(spark, sf_dir)
    t = pmp.alias("t")
    p = pmp.alias("p")
    pairs = t.join(
        p,
        (F.col("t.l_partkey") == F.col("p.l_partkey"))
        & (
            F.col("t.m")
            == F.col("p.m") + F.expr("INTERVAL 1 MONTH")
        ),
        "full_outer",
    ).select(
        F.coalesce(
            F.col("t.m"), F.col("p.m") + F.expr("INTERVAL 1 MONTH")
        ).alias("m"),
        F.col("t.price_fp").alias("pt"),
        F.col("t.qty").alias("qt"),
        F.col("p.price_fp").alias("pp"),
        F.col("p.qty").alias("qp"),
    )
    both = F.col("pt").isNotNull() & F.col("pp").isNotNull()
    fx = pairs.select(
        "m",
        F.when(both, 1).otherwise(0).alias("matched"),
        F.when(both, (F.col("pt") - F.col("pp")) * F.col("qp"))
        .otherwise(0)
        .alias("price_fx"),
        F.when(both, (F.col("qt") - F.col("qp")) * F.col("pp"))
        .otherwise(0)
        .alias("vol_fx"),
        F.when(
            both,
            (F.col("pt") - F.col("pp")) * (F.col("qt") - F.col("qp")),
        )
        .otherwise(0)
        .alias("cross_fx"),
        F.when(F.col("pp").isNull(), F.col("pt") * F.col("qt"))
        .otherwise(0)
        .alias("new_fx"),
        F.when(F.col("pt").isNull(), -(F.col("pp") * F.col("qp")))
        .otherwise(0)
        .alias("disc_fx"),
    )
    bounds = pmp.agg(
        F.min("m").alias("mn"), F.max("m").alias("mx")
    )
    den = 100 * _PRICE_FP

    # Exact integer sums first (BIGINT — the 30x probe's largest is
    # ~7.8e17, far under 2^63), then round-to-6 WITHOUT ever casting
    # the huge integer to double: at 10x plain ROUND(x, 6) tie-skewed
    # by 1 ulp, and past 2^53 (30x) the int->double conversion itself
    # skews (DuckDB's int128->double composes two roundings). The
    # half-away-from-zero integer divide in _discipline.r6_fp never
    # leaves exact space — see its docstring.
    def s(col, name):
        return (
            F.sum(F.col(col).cast("decimal(38,0)"))
            .cast("bigint")
            .alias(name)
        )

    sums = (
        fx.crossJoin(F.broadcast(bounds))
        .where((F.col("m") > F.col("mn")) & (F.col("m") <= F.col("mx")))
        .groupBy("m")
        .agg(
            F.sum("matched").cast("bigint").alias("matched_parts"),
            s("price_fx", "s_price"),
            s("vol_fx", "s_vol"),
            s("cross_fx", "s_cross"),
            s("new_fx", "s_new"),
            s("disc_fx", "s_disc"),
            F.sum(
                F.col("price_fx").cast("decimal(38,0)")
                + F.col("vol_fx")
                + F.col("cross_fx")
                + F.col("new_fx")
                + F.col("disc_fx")
            )
            .cast("bigint")
            .alias("s_total"),
        )
    )
    return sums.select(
        F.col("m").alias("month"),
        "matched_parts",
        r6_fp("s_price", den).alias("price_effect"),
        r6_fp("s_vol", den).alias("volume_effect"),
        r6_fp("s_cross", den).alias("cross_effect"),
        r6_fp("s_new", den).alias("new_parts_effect"),
        r6_fp("s_disc", den).alias("discontinued_effect"),
        r6_fp("s_total", den).alias("total_change"),
    ).orderBy("month")


# ---- X248: net revenue retention cohorts -----------------------------------


@declared_query(
    "nrr_monthly_cohorts",
    oracle="""
    WITH om AS (
        SELECT o_custkey,
               (CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) * 12
                + month(CAST(o_orderdate AS DATE))) AS ym,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), firsts AS (
        SELECT o_custkey, MIN(ym) AS cohort_ym FROM om GROUP BY 1
    ), cell AS (
        SELECT f.cohort_ym, CAST(o.ym - f.cohort_ym AS BIGINT)
                   AS months_since,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
                   AS active_customers,
               CAST(SUM(o.cents) AS BIGINT) AS rev_cents
        FROM om o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    ), base AS (
        SELECT cohort_ym, rev_cents AS rev0
        FROM cell WHERE months_since = 0
    )
    SELECT CAST(c.cohort_ym // 12 AS BIGINT) AS cohort_year,
           CAST(c.cohort_ym % 12 AS BIGINT) AS cohort_month0,
           c.months_since, c.active_customers, c.rev_cents,
           CAST(ROUND(CAST(c.rev_cents AS DOUBLE) / b.rev0, 6)
                AS DOUBLE) AS nrr
    FROM cell c JOIN base b ON c.cohort_ym = b.cohort_ym
    WHERE c.months_since <= 12
    ORDER BY c.cohort_ym, c.months_since
    """,
)
def nrr_monthly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X248: net revenue retention by acquisition cohort — for each
    first-order cohort month and months-since-acquisition m ≤ 12,
    the cohort's month-m revenue as a share of its month-0 revenue
    (the SaaS-style NRR curve; X27's retention counts users, this
    weights them by spend). Calendar months are lifted to the exact
    integer year·12+month so cohort assignment and month arithmetic
    can never ride a date-function boundary.

    Exactness: cents/counts exact; NRR is one division of exact
    cents rounded 6. Scale: one per-customer first-order aggregate,
    one (cohort, month) aggregate — the emitted grid is
    |cohorts|x13, calendar-bounded."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (
            F.year(F.to_date("o_orderdate")).cast("bigint") * 12
            + F.month(F.to_date("o_orderdate"))
        ).alias("ym"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    firsts = om.groupBy("o_custkey").agg(
        F.min("ym").alias("cohort_ym")
    )
    cell = (
        om.join(firsts, "o_custkey")
        .groupBy(
            "cohort_ym",
            (F.col("ym") - F.col("cohort_ym"))
            .cast("bigint")
            .alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey")
            .cast("bigint")
            .alias("active_customers"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
        )
    )
    base = cell.where(F.col("months_since") == 0).select(
        "cohort_ym", F.col("rev_cents").alias("rev0")
    )
    return (
        cell.join(F.broadcast(base), "cohort_ym")
        .where(F.col("months_since") <= 12)
        .select(
            F.expr("cohort_ym DIV 12").cast("bigint").alias(
                "cohort_year"
            ),
            (F.col("cohort_ym") % 12).cast("bigint").alias(
                "cohort_month0"
            ),
            "months_since",
            "active_customers",
            "rev_cents",
            F.round(
                F.col("rev_cents").cast("double") / F.col("rev0"), 6
            ).alias("nrr"),
        )
        .orderBy("cohort_year", "cohort_month0", "months_since")
    )


# ---- X249: RANK-based WITH TIES top-k --------------------------------------


@declared_query(
    "top_orders_with_ties",
    oracle="""
    WITH bands AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // 1000000
                   AS band
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), ranked AS (
        SELECT segment, o_orderkey, cents, band,
               rank() OVER (PARTITION BY segment
                            ORDER BY band DESC) AS rnk
        FROM bands
    )
    SELECT segment, CAST(band AS BIGINT) AS band_10k,
           CAST(rnk AS BIGINT) AS rnk, o_orderkey, cents
    FROM ranked WHERE rnk <= 3
    ORDER BY segment, band DESC, o_orderkey
    """,
)
def top_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X249: top-3 WITH TIES per market segment over $10,000 price
    bands — the top-k semantics ``row_number() <= k`` cannot express:
    RANK admits EVERY row tied into the top 3 band values, so a group
    legitimately returns more than 3 rows and no tied row is dropped
    by an arbitrary survivor choice (ANSI FETCH FIRST 3 ROWS WITH
    TIES). Banding to exact integer $10k buckets (cents DIV 1e6)
    makes ties real and membership exact — ranking raw cents would
    make this a row_number query in disguise.

    Exactness: bands/ranks/cents exact integers end to end — no
    floats anywhere. Scale: one partitioned window per segment;
    Spark's WindowGroupLimit pushes the rank<=3 filter below the
    full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bands = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .withColumn("band", F.expr("cents DIV 1000000"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("band"))
    return (
        bands.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "segment",
            F.col("band").cast("bigint").alias("band_10k"),
            F.col("rnk").cast("bigint").alias("rnk"),
            "o_orderkey",
            "cents",
        )
        .orderBy("segment", F.desc("band_10k"), "o_orderkey")
    )


# ---- X250: customer lifetime value -----------------------------------------


@declared_query(
    "clv_segments",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS customers,
           CAST(SUM(n_orders) AS BIGINT) AS orders,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS repeat_customers,
           CAST(ROUND(CAST(SUM(cents) AS DOUBLE)
                      / (100.0 * SUM(n_orders)), 6) AS DOUBLE)
               AS aov,
           CAST(ROUND(CAST(SUM(n_orders) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS frequency,
           CAST(ROUND(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0
                                END) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS repeat_rate,
           CAST(ROUND(CAST(SUM(cents) AS DOUBLE)
                      / (100.0 * NULLIF(COUNT(*)
                         - SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0
                               END), 0)), 6) AS DOUBLE) AS clv
    FROM per_cust GROUP BY segment ORDER BY segment
    """,
)
def clv_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X250: simple customer-lifetime-value per segment under the
    geometric repeat model — CLV = AOV · frequency · 1/(1 − repeat
    rate). The three-factor product COLLAPSES ALGEBRAICALLY to
    total_cents / (customers − repeat_customers): the expected spend
    per "one-time-equivalent" customer. Emitting the collapsed form
    means the headline number is ONE division of exact integers (no
    compounding of three rounded ratios); the three factors are also
    emitted (each its own exact one-division) for the analyst. When
    EVERY customer repeats the geometric model diverges (repeat rate
    1 → infinite horizon) and CLV is NULL on both engines (NULLIF) —
    the honest readout, not a clamp.

    Scale: one per-(segment, customer) aggregate, one per-segment
    aggregate, both combinable; customer dim broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
    )
    rep = F.sum(
        F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    ).cast("bigint")
    agg = per_cust.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("customers"),
        F.sum("n_orders").cast("bigint").alias("orders"),
        rep.alias("repeat_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    return agg.select(
        "segment",
        "customers",
        "orders",
        "repeat_customers",
        F.round(
            F.col("total_cents").cast("double")
            / (100.0 * F.col("orders")),
            6,
        ).alias("aov"),
        F.round(
            F.col("orders").cast("double") / F.col("customers"), 6
        ).alias("frequency"),
        F.round(
            F.col("repeat_customers").cast("double")
            / F.col("customers"),
            6,
        ).alias("repeat_rate"),
        F.round(
            F.col("total_cents").cast("double")
            / (
                100.0
                * F.nullif(
                    F.col("customers") - F.col("repeat_customers"),
                    F.lit(0),
                )
            ),
            6,
        ).alias("clv"),
    ).orderBy("segment")
