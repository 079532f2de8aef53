"""Corpus-gate + exact-statistics declared queries (round 6, fifth
batch — [north-star] scope): the composite quality gate and the exact
distribution statistics a data-quality/experimentation layer runs over
a corpus and its event telemetry.

  * ``gopher_rules_gate`` (X133) — Gopher-style composite quality gate
    with PER-RULE failure attribution per (lang, source): word-count
    bounds, mean-word-length bounds, stopword minimum, top-token
    dominance. Every rule decision is integer arithmetic.
  * ``ks_two_sample_values`` (X134) — exact two-sample
    Kolmogorov-Smirnov D between the click and view value
    distributions, computed on the bounded cents domain with the
    sup-difference as an exact BIGINT cross product.
  * ``gini_spend_by_region`` (X135) — per-region Gini coefficient of
    customer spend from the exact rank-weighted formula (sorted-rank
    sums in DECIMAL(38,0)).
  * ``equidepth_price_histogram`` (X136) — 10-bucket equal-frequency
    histogram of order totalprice at exact interpolated deciles (X20
    is the fixed-WIDTH twin; this is the fixed-DEPTH one).
  * ``rolling_corr_click_view`` (X137) — 14-day rolling Pearson
    correlation between the daily click and view cent sums, from
    exact decimal power sums with one sqrt per side.
  * ``cusum_changepoint_daily`` (X138) — per-type CUSUM change-point
    over daily counts: argmax_k |D*cum_k - k*T| in pure BIGINT.

Determinism: rule flags, KS sup-numerators, Gini rank sums and CUSUM
statistics are exact integer/decimal arithmetic end to end; the only
float steps (KS/Gini/corr final ratios, decile boundaries) divide or
interpolate IDENTICAL exact operands on both engines and round to 6.
Cents staging uses ROUND(value*100) — half-up equals half-away from
zero on the non-negative fixture values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import STOPWORDS, tokens
from .registry import declared_query
from .text_queries import _O_TOK

_O_EN = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"

# ---- X133: Gopher-style composite quality gate -----------------------

# Canonical Gopher-ish bounds, all decided in integer arithmetic:
#   word count in [50, 100000]; mean token length in [3, 10] (as
#   3*n <= sum_len <= 10*n); >= 2 English stopwords; no single token
#   carrying more than 30% of the doc (10*top_freq <= 3*n).
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000


@declared_query(
    "gopher_rules_gate",
    oracle=f"""
    WITH feat AS (
        SELECT lang, source,
               len(t) AS n,
               list_sum(list_transform(t, x -> length(x))) AS sum_len,
               len(list_filter(t, x -> list_contains({_O_EN}, x)))
                   AS stop_n,
               list_max(list_transform(list_distinct(t),
                        x -> len(list_filter(t, y -> y = x)))) AS top_freq
        FROM (SELECT lang, source, {_O_TOK} AS t FROM documents)
    ), flags AS (
        SELECT lang, source,
               (n BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}) AS ok_len,
               (3 * n <= sum_len AND sum_len <= 10 * n) AS ok_wordlen,
               (stop_n >= 2) AS ok_stop,
               (10 * top_freq <= 3 * n) AS ok_rep
        FROM feat
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_len,
           CAST(SUM(CASE WHEN NOT ok_wordlen THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_wordlen,
           CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_stop,
           CAST(SUM(CASE WHEN NOT ok_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_rep,
           CAST(SUM(CASE WHEN ok_len AND ok_wordlen AND ok_stop
                              AND ok_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass
    FROM flags
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def gopher_rules_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X133: Gopher-style composite quality gate with per-rule failure
    attribution — the report a corpus-curation run reads to decide
    WHICH rule is eating its data per (lang, source) slice, one level
    up from the single-signal filters (doc_quality_features reports
    raw features, doc_repetition_filter one rule; this composes four
    canonical rules and attributes failures).

    Scale: every rule is evaluated IN-ROW over the token array
    (aggregate/filter/transform HOFs — the top-token dominance scan is
    O(distinct x n) per doc, bounded by doc length), then ONE
    combinable groupBy on (lang, source). No joins, no windows; the
    scan fuses into whole-stage codegen. Rule decisions are pure
    integer comparisons (mean word length as cross-multiplied bounds,
    dominance as 10*top_freq <= 3*n), so both engines agree exactly."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    feat = docs.select(
        "lang",
        "source",
        F.size(t).alias("n"),
        F.aggregate(
            F.transform(t, lambda x: F.length(x)),
            F.lit(0),
            lambda a, b: a + b,
        ).alias("sum_len"),
        F.size(
            F.filter(t, lambda x: F.array_contains(
                F.array(*[F.lit(w) for w in STOPWORDS["en"]]), x))
        ).alias("stop_n"),
        # Longest equal-run over the SORTED token array: one O(n log n)
        # sort + one O(n) fold per doc. The obvious nested HOF
        # (transform(array_distinct(t), x -> size(filter(t, y -> y = x))))
        # is O(distinct x n) in Spark's INTERPRETED lambda evaluator and
        # measured 3.6 s over 5000 sf0.1 docs; this fold is 0.4 s. The
        # DuckDB oracle keeps the nested-HOF spelling (same semantics,
        # different engine economics).
        F.aggregate(
            F.sort_array(t),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.run + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc.best,
                    F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc.best,
        ).alias("top_freq"),
    )
    flags = feat.select(
        "lang",
        "source",
        F.col("n").between(_G_MIN_WORDS, _G_MAX_WORDS).alias("ok_len"),
        ((3 * F.col("n") <= F.col("sum_len"))
         & (F.col("sum_len") <= 10 * F.col("n"))).alias("ok_wordlen"),
        (F.col("stop_n") >= 2).alias("ok_stop"),
        (10 * F.col("top_freq") <= 3 * F.col("n")).alias("ok_rep"),
    )
    def _fails(c: str) -> F.Column:
        return F.sum((~F.col(c)).cast("int")).cast("bigint")

    return (
        flags.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            _fails("ok_len").alias("fail_len"),
            _fails("ok_wordlen").alias("fail_wordlen"),
            _fails("ok_stop").alias("fail_stop"),
            _fails("ok_rep").alias("fail_rep"),
            F.sum(
                (F.col("ok_len") & F.col("ok_wordlen") & F.col("ok_stop")
                 & F.col("ok_rep")).cast("int")
            ).cast("bigint").alias("n_pass"),
        )
        .orderBy("lang", "source")
    )


# ---- X134: exact two-sample Kolmogorov-Smirnov -----------------------


@declared_query(
    "ks_two_sample_values",
    oracle="""
    WITH cents AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cent,
               CAST(event_type = 'click' AS BIGINT) AS is_a,
               CAST(event_type = 'view' AS BIGINT) AS is_b
        FROM events WHERE event_type IN ('click', 'view')
    ), per_cent AS (
        SELECT cent, SUM(is_a) AS c_a, SUM(is_b) AS c_b
        FROM cents GROUP BY cent
    ), cum AS (
        SELECT cent,
               SUM(c_a) OVER w AS ca,
               SUM(c_b) OVER w AS cb,
               SUM(c_a) OVER () AS n_a,
               SUM(c_b) OVER () AS n_b
        FROM per_cent
        WINDOW w AS (ORDER BY cent
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), scored AS (
        SELECT cent, n_a, n_b, abs(ca * n_b - cb * n_a) AS dnum,
               MAX(abs(ca * n_b - cb * n_a)) OVER () AS dmax
        FROM cum
    )
    SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           CAST(ROUND(CAST(MAX(dmax) AS DOUBLE)
                      / (MAX(n_a) * MAX(n_b)), 6) AS DOUBLE) AS ks_d,
           CAST(ROUND(MIN(cent) / 100.0, 2) AS DOUBLE) AS ks_at_value
    FROM scored WHERE dnum = dmax
    """,
)
def ks_two_sample_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134: exact two-sample Kolmogorov-Smirnov statistic between the
    click and view value distributions — the distribution-shift test an
    experimentation/drift layer runs next to PSI (X94 bins into 10
    buckets; KS is the sup over ALL thresholds, bin-free).

    D = sup_x |F_a(x) - F_b(x)| with the sup numerator kept as the
    exact BIGINT |ca*n_b - cb*n_a| — no per-row division, so the
    argmax and the tie-break (smallest value attaining the sup) are
    integer-exact on both engines; the single float division happens
    once, on identical operands. Values are staged to the BOUNDED
    cents domain (value range is fixed by the schema, so the distinct
    relation is O(domain), never O(rows)); the global cumulative
    window runs over that bounded relation — event volume reduces in
    the combinable per-cent aggregate below it."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    per_cent = (
        ev.select(
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cent"),
            (F.col("event_type") == "click").cast("bigint").alias("is_a"),
            (F.col("event_type") == "view").cast("bigint").alias("is_b"),
        )
        .groupBy("cent")
        .agg(F.sum("is_a").alias("c_a"), F.sum("is_b").alias("c_b"))
    )
    w = Window.orderBy("cent").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_cent.select(
        "cent",
        F.sum("c_a").over(w).alias("ca"),
        F.sum("c_b").over(w).alias("cb"),
        F.sum("c_a").over(wall).alias("n_a"),
        F.sum("c_b").over(wall).alias("n_b"),
    )
    scored = cum.select(
        "cent",
        "n_a",
        "n_b",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        .alias("dnum"),
    ).withColumn("dmax", F.max("dnum").over(wall))
    return scored.where(F.col("dnum") == F.col("dmax")).agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.round(
            F.max("dmax").cast("double") / (F.max("n_a") * F.max("n_b")), 6
        ).alias("ks_d"),
        F.round(F.min("cent") / 100.0, 2).alias("ks_at_value"),
    )


# ---- X135: per-region Gini coefficient -------------------------------


@declared_query(
    "gini_spend_by_region",
    oracle="""
    WITH spend AS (
        SELECT r.r_name, c.c_custkey,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100, 0)
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, c.c_custkey
    ), ranked AS (
        SELECT r_name, cents,
               row_number() OVER (PARTITION BY r_name
                                  ORDER BY cents, c_custkey) AS i
        FROM spend
    )
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(cents) / 100.0, 2) AS DOUBLE) AS total_spend,
           CAST(ROUND(
               (2.0 * CAST(SUM(CAST(i * cents AS DECIMAL(38,0))) AS DOUBLE)
                - (COUNT(*) + 1) * CAST(SUM(cents) AS DOUBLE))
               / (COUNT(*) * CAST(SUM(cents) AS DOUBLE)), 6) AS DOUBLE)
               AS gini
    FROM ranked
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def gini_spend_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X135: Gini coefficient of customer spend per region — the
    inequality/concentration profile (the same statistic profiles
    token-frequency skew or per-domain corpus share in a training-data
    audit). Exact rank-weighted formula over ascending spend:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)).

    Spend is staged to BIGINT cents (exact decimal sum, then *100);
    the rank-weighted sum accumulates in DECIMAL(38,0) — i*x_i stays
    in BIGINT per term, but the SUM crosses 2^63 at warehouse scale
    (3M customers x ranks x 5e7 cents), and decimal sums are exact and
    order-free on both engines. The final ratio divides identical
    exact operands once, rounded to 6. One shuffle to the customer
    aggregate, one region-partitioned window over the CUSTOMER
    relation (dimension-sized, 5 partitions), one rollup. The rank
    tie-breaks on (cents, custkey) — total order, engine-identical."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "c_custkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100, 0
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    ranked = spend.select(
        "r_name",
        "cents",
        F.row_number()
        .over(Window.partitionBy("r_name").orderBy("cents", "c_custkey"))
        .alias("i"),
    )
    n = F.count(F.lit(1))
    sum_x = F.sum("cents")
    sum_ix = F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)"))
    return (
        ranked.groupBy("r_name")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(sum_x / 100.0, 2).alias("total_spend"),
            F.round(
                (2.0 * sum_ix.cast("double")
                 - (n + 1) * sum_x.cast("double"))
                / (n * sum_x.cast("double")),
                6,
            ).alias("gini"),
        )
        .orderBy("r_name")
    )


# ---- X136: equal-frequency (equi-depth) histogram --------------------

_ED_DECILES = [i / 10 for i in range(1, 10)]


@declared_query(
    "equidepth_price_histogram",
    oracle=f"""
    WITH bounds AS (
        SELECT {", ".join(
            f"quantile_cont(o_totalprice, {p}) AS q{i}"
            for i, p in enumerate(_ED_DECILES, 1))}
        FROM orders
    ), bucketed AS (
        SELECT 1 {" ".join(
            f"+ CAST(o_totalprice > (SELECT q{i} FROM bounds) AS INTEGER)"
            for i in range(1, 10))} AS bucket,
               o_totalprice
        FROM orders
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS max_price
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X136: 10-bucket EQUAL-FREQUENCY histogram of order totalprice —
    the fixed-depth twin of X20's fixed-width histogram (equi-depth
    bucket edges are what a CBO records and what a skew audit reads:
    every bucket holds ~10% of rows no matter how long the tail is).

    Same shape discipline as X120: the decile boundaries come from ONE
    exact interpolated-percentile aggregate (engine-identical
    interpolation, proven in X18), broadcast back as a 1-row table;
    the bucket id is a per-row count of exceeded boundaries (ties land
    in the lower bucket on both engines — a deliberate, documented
    edge rule), and the rollup is one combinable groupBy. No global
    sort, no ntile, fully distributed."""
    orders = load_table(spark, sf_dir, "orders")
    # ONE percentile call with the array argument — nine separate
    # percentile(col, p) aggregates each buffer the full column
    # independently (measured 3.5 s vs 0.7 s at sf0.1).
    qs = F.expr(
        "percentile(o_totalprice, array("
        + ", ".join(str(p) for p in _ED_DECILES)
        + "))"
    )
    bounds = orders.agg(
        *[qs.getItem(i - 1).alias(f"q{i}") for i in range(1, 10)]
    )
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + (F.col("o_totalprice") > F.col(f"q{i}")).cast("int")
    bucketed = orders.crossJoin(F.broadcast(bounds)).select(
        bucket.cast("int").alias("bucket"), "o_totalprice"
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bucket")
    )


# ---- X137: rolling Pearson correlation -------------------------------

_CORR_FRAME = 13  # trailing days -> 14-day window


@declared_query(
    "rolling_corr_click_view",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'click'
                   THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                   AS x,
               SUM(CASE WHEN event_type = 'view'
                   THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                   AS y
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY day
    ), sums AS (
        SELECT day,
               COUNT(*) OVER w AS n,
               SUM(CAST(x AS DECIMAL(38,0))) OVER w AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) OVER w AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                   OVER w AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                   OVER w AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                   OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {_CORR_FRAME} PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(n AS BIGINT) AS n_days,
           CAST(ROUND(CASE
               WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy
               THEN NULL
               ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                       * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END, 6) AS DOUBLE) AS corr_14d
    FROM sums
    ORDER BY day
    """,
)
def rolling_corr_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137: 14-day rolling Pearson correlation between the daily
    click and view cent sums — the co-movement monitor a metrics layer
    runs over KPI pairs (X12's frame aggregates track ONE series; this
    relates two). NOT Spark's ``corr`` aggregate: that accumulates
    free-running double co-moments whose partial-aggregation order is
    nondeterministic. Instead all five power sums accumulate in
    DECIMAL(38,0) over BIGINT cents (exact, order-free — the x*y
    cross-terms overflow BIGINT at warehouse scale, decimal(38) holds
    them), and r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) *
    sqrt(n*syy - sy^2)) is evaluated once on identical exact operands:
    IEEE sqrt/mult/div are correctly rounded, so both engines emit the
    same double, rounded to 6. Degenerate frames (either variance
    zero) emit NULL by rule, not by 0/0.

    The event volume reduces in ONE combinable daily aggregate; the
    global window runs over the TIME dimension only (|days| rows)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", cents).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "view", cents).otherwise(0)
        ).alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-_CORR_FRAME, Window.currentRow)
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    sums = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dx).over(w).alias("sx"),
        F.sum(dy).over(w).alias("sy"),
        F.sum(dx * dy).over(w).alias("sxy"),
        F.sum(dx * dx).over(w).alias("sxx"),
        F.sum(dy * dy).over(w).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (
        F.when(
            (n < 2) | (n * sxx == sx * sx) | (n * syy == sy * sy),
            F.lit(None).cast("double"),
        ).otherwise(
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        )
    )
    return sums.select(
        "day",
        n.cast("bigint").alias("n_days"),
        F.round(corr, 6).alias("corr_14d"),
    ).orderBy("day")


# ---- X138: CUSUM change-point over daily counts ----------------------


@declared_query(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, day,
               row_number() OVER wo AS k,
               SUM(c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumc,
               COUNT(*) OVER wp AS d_days,
               SUM(c) OVER wp AS total
        FROM daily
        WINDOW wo AS (PARTITION BY event_type ORDER BY day),
               wp AS (PARTITION BY event_type)
    ), scored AS (
        SELECT event_type, day, d_days, total,
               abs(d_days * cumc - k * total) AS abs_s,
               MAX(abs(d_days * cumc - k * total)) OVER (
                   PARTITION BY event_type) AS max_s
        FROM cum
    )
    SELECT event_type,
           MIN(day) AS change_day,
           CAST(MAX(max_s) AS BIGINT) AS cusum_scaled,
           CAST(MAX(d_days) AS BIGINT) AS n_days,
           CAST(MAX(total) AS BIGINT) AS n_events
    FROM scored WHERE abs_s = max_s
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X138: CUSUM change-point detection over per-type daily event
    counts — where each series' level most decisively shifts (deploy
    regressions, crawler outages, traffic-mix changes). The classic
    statistic max_k |sum_{d<=k}(c_d - mean)| is kept INTEGER by
    scaling through D (the day count): S_k = D*cum_k - k*T, so the
    argmax and tie-break (earliest day attaining the max) are exact
    BIGINT comparisons on both engines — no float enters until
    nothing is left to compute.

    Event volume reduces in one combinable daily aggregate; all
    windows are partitioned by event_type over the (type x day)
    relation — time-dimension-sized, never event volume. Emits the
    scaled statistic plus D and T so a caller can normalize any way
    it likes without losing exactness."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    wp = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("k"),
        F.sum("c").over(wcum).alias("cumc"),
        F.count(F.lit(1)).over(wp).alias("d_days"),
        F.sum("c").over(wp).alias("total"),
    )
    abs_s = F.abs(
        F.col("d_days") * F.col("cumc") - F.col("k") * F.col("total")
    )
    scored = cum.select(
        "event_type", "day", "d_days", "total", abs_s.alias("abs_s")
    ).withColumn("max_s", F.max("abs_s").over(wp))
    return (
        scored.where(F.col("abs_s") == F.col("max_s"))
        .groupBy("event_type")
        .agg(
            F.min("day").alias("change_day"),
            F.max("max_s").cast("bigint").alias("cusum_scaled"),
            F.max("d_days").cast("bigint").alias("n_days"),
            F.max("total").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type")
    )
