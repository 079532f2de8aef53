"""Statistical-inference / signal-cleaning declared queries (round 6,
seventeenth batch — [north-star] scope): deseasonalized anomaly
detection, robust time-series cleaning, causal-lite estimation,
information-theoretic feature ranking, asymmetric containment dedup,
and exact rank correlation.

  * ``stl_residual_anomalies`` (X203) — z-scores on X163's STL
    RESIDUAL (not the raw series): anomalies after trend and
    day-of-week are explained away — the production form of "is today
    weird"; the 2.5-sigma flag is an exact decimal cross-
    multiplication.
  * ``hampel_filter_daily`` (X204) — rolling-window median/MAD
    (Hampel) outlier filter over the daily click series with the
    replacement value next to the flag — THE robust despiker for
    sensor/metrics streams.
  * ``did_spend_estimate`` (X205) — difference-in-differences of mean
    order value, BUILDING segment vs rest, split at the median order
    date — the causal-lite readout (X159's CUPED reduces variance;
    DiD removes group + period effects).
  * ``feature_information_gain`` (X206) — information gain of three
    candidate features for predicting order status — the
    entropy-based feature ranking (X147's decimal-staged p·ln p
    machinery over (feature, class) crosstabs).
  * ``containment_pairs_docs`` (X207) — DIRECTIONAL near-dup:
    containment |A∩B|/|A| >= 0.7 over the LSH candidates — catches
    quote/subset duplication that symmetric Jaccard (E7) misses by
    construction; membership decided by integer cross-multiplication.
  * ``kendall_tau_qty_price`` (X208) — exact tau-b between quantity
    and bucketed price via 2D suffix sums over the bounded crosstab —
    concordant/discordant/tie counts are exact integers; one sqrt at
    emission.

Determinism: residual z and containment decisions are integer/decimal
cross-multiplications; Hampel medians share the interpolated-
percentile definition and flags compare identically-rounded values;
entropy terms stage round-12 decimals; tau-b counts are exact
DECIMAL(38,0) sums with ONE final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X203: STL residual anomalies ---------------------------------------


@declared_query(
    "stl_residual_anomalies",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), ma AS (
        SELECT d, cnt,
               CAST(SUM(cnt) OVER w AS BIGINT) AS sum7,
               CAST(COUNT(*) OVER w AS BIGINT) AS n7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING)
    ), det AS (
        SELECT d, cnt, sum7,
               CAST((date_diff('day', DATE '1970-01-01', d) + 4) % 7
                    AS INTEGER) AS dow,
               CAST(7 * cnt - sum7 AS BIGINT) AS det_num
        FROM ma WHERE n7 = 7
    ), seas AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(det_num) AS BIGINT) AS ssum
        FROM det GROUP BY dow
    ), resid AS (
        -- integer half-away-from-zero: round_half_up(a/b) = (2a+b)//2b
        -- (tie-free; the rational num/(7k) hits true .5 ties often)
        SELECT det.d, det.cnt,
               CAST(CASE WHEN det.det_num * seas.k - seas.ssum >= 0
                    THEN (2 * (det.det_num * seas.k - seas.ssum)
                          * 1000000 + 7 * seas.k) // (14 * seas.k)
                    ELSE -((2 * (seas.ssum - det.det_num * seas.k)
                          * 1000000 + 7 * seas.k) // (14 * seas.k))
                    END AS BIGINT) AS r_i
        FROM det JOIN seas ON det.dow = seas.dow
    ), st AS (
        -- tight decimal widths so every product stays <= 38 digits
        -- (DuckDB silently promotes wider products to DOUBLE): n is
        -- |days| (<= 10^4), r_i <= ~10^12, so dev <= ~10^16 fits
        -- DECIMAL(19,0) and dev^2 fits DECIMAL(38,0) exactly.
        SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
               CAST(SUM(r_i) AS DECIMAL(19,0)) AS s,
               CAST(SUM(CAST(r_i AS DECIMAL(19,0)) * r_i)
                    AS DECIMAL(28,0)) AS q
        FROM resid
    ), fl AS (
        SELECT r.d, r.cnt, r.r_i,
               CAST(st.n * CAST(r.r_i AS DECIMAL(19,0)) - st.s
                    AS DECIMAL(19,0)) AS dev,
               CAST(st.n * st.q - st.s * st.s AS DECIMAL(38,0))
                   AS var_num
        FROM resid r CROSS JOIN st
    )
    SELECT d, cnt,
           CAST(r_i / 1000000.0 AS DOUBLE) AS resid,
           CAST(ROUND(CAST(dev AS DOUBLE)
                      / sqrt(CAST(var_num AS DOUBLE)), 6) AS DOUBLE)
               AS resid_z,
           (4 * dev * dev > 25 * var_num) AS anomaly
    FROM fl
    ORDER BY d
    """,
)
def stl_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X203: anomalies on the DESEASONALIZED daily click series —
    X163's STL residual, z-scored, flagged beyond 2.5 sigma. Raw-count
    anomaly detection (X52) fires on every Sunday; scoring the
    residual after the trend and day-of-week components are removed is
    what a production monitor actually pages on.

    Exactness: residuals are X163's exact rationals rounded 6 and
    LIFTED to integers (r_i = round(resid,6)*10^6, an exact BIGINT),
    so the moments S = sum(r_i), Q = sum(r_i^2) are exact; the
    2.5-sigma flag is the cross-multiplication 4*(n*r_i - S)^2 >
    25*(n*Q - S^2) with decimal widths sized so every product stays
    within 38 digits EXACTLY on both engines (DuckDB silently
    promotes wider decimal products to DOUBLE — the trap this
    formulation avoids); the emitted rounded z never decides
    membership. Scale: events reduce to one row per day; the 1-row
    moment aggregate broadcasts (whitelisted)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("sum7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n7"),
    )
    det = ma.where(F.col("n7") == 7).select(
        "d",
        "cnt",
        (
            (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) + 4)
            % 7
        )
        .cast("int")
        .alias("dow"),
        (7 * F.col("cnt") - F.col("sum7")).cast("bigint").alias(
            "det_num"
        ),
    )
    seas = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("det_num").cast("bigint").alias("ssum"),
    )
    # r_i = round(num/(7k), 6) * 1e6 computed ENTIRELY in integer
    # space: num/(7k) is an exact rational with a small denominator,
    # so true x.xxxxxx5 ties are COMMON — at 10x two of them landed on
    # opposite sides of the engines' double ROUND (r11 sweep). Integer
    # half-away-from-zero division is tie-free by construction:
    # round_half_up(a/b) = (2a + b) DIV 2b for a, b > 0.
    resid = det.join(F.broadcast(seas), "dow").select(
        "d",
        "cnt",
        F.expr(
            "CAST(CASE WHEN det_num * k - ssum >= 0"
            " THEN (2 * (det_num * k - ssum) * 1000000 + 7 * k)"
            "      DIV (14 * k)"
            " ELSE -((2 * (ssum - det_num * k) * 1000000 + 7 * k)"
            "      DIV (14 * k)) END AS BIGINT)"
        ).alias("r_i"),
    )
    st = resid.agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("r_i").cast("decimal(19,0)").alias("s"),
        F.sum(F.col("r_i").cast("decimal(19,0)") * F.col("r_i"))
        .cast("decimal(28,0)")
        .alias("q"),
    )
    j = resid.crossJoin(F.broadcast(st))
    dev = (
        F.col("n") * F.col("r_i").cast("decimal(19,0)") - F.col("s")
    ).cast("decimal(19,0)")
    var_num = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast(
        "decimal(38,0)"
    )
    flag = 4 * dev * dev > 25 * var_num
    z = F.round(
        dev.cast("double") / F.sqrt(var_num.cast("double")), 6
    )
    return j.select(
        "d",
        "cnt",
        (F.col("r_i") / 1000000.0).cast("double").alias("resid"),
        z.alias("resid_z"),
        flag.alias("anomaly"),
    ).orderBy("d")


# ---- X204: Hampel filter -------------------------------------------------


@declared_query(
    "hampel_filter_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), nbr AS (
        SELECT a.d, a.cnt, b.cnt AS nb
        FROM daily a JOIN daily b
          ON b.d BETWEEN a.d - INTERVAL 3 DAY
                     AND a.d + INTERVAL 3 DAY
    ), med AS (
        SELECT d, cnt,
               CAST(ROUND(quantile_cont(nb, 0.5), 6) AS DECIMAL(18,6))
                   AS m,
               CAST(COUNT(*) AS BIGINT) AS n_window
        FROM nbr GROUP BY d, cnt
    ), dev AS (
        SELECT m.d, m.cnt, m.m, m.n_window, abs(b.cnt - m.m) AS ad
        FROM med m JOIN daily b
          ON b.d BETWEEN m.d - INTERVAL 3 DAY
                     AND m.d + INTERVAL 3 DAY
    ), mad AS (
        SELECT d, cnt, m, n_window,
               CAST(ROUND(quantile_cont(ad, 0.5), 6) AS DECIMAL(18,6))
                   AS mad
        FROM dev GROUP BY d, cnt, m, n_window
    )
    SELECT d, cnt, CAST(m AS DOUBLE) AS window_median,
           CAST(mad AS DOUBLE) AS window_mad,
           (CAST(abs(cnt - m) AS DECIMAL(28,10)) * 6745
            > 3 * 10000 * CAST(mad AS DECIMAL(28,10))) AS flagged,
           CASE WHEN CAST(abs(cnt - m) AS DECIMAL(28,10)) * 6745
                     > 3 * 10000 * CAST(mad AS DECIMAL(28,10))
                THEN CAST(m AS DOUBLE)
                ELSE CAST(cnt AS DOUBLE) END AS cleaned
    FROM mad
    WHERE n_window = 7
    ORDER BY d
    """,
)
def hampel_filter_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X204: Hampel filter over the daily click series — per day, the
    +/-3-day window median and MAD; a day is an outlier when
    |x - med| > 3 * 1.4826 * MAD, and `cleaned` carries the robust
    replacement (the window median). The standard despiker for
    metrics/sensor series: unlike the global X188 votes, the rolling
    window adapts to level shifts, and unlike a moving mean it never
    smears the spike into its neighbors. Edge days (short windows)
    are excluded — a production filter treats warm-up explicitly.

    Exactness: the window median/MAD share the interpolated-percentile
    definition, round 6, and stage DECIMAL(18,6); the outlier decision
    cross-multiplies decimals (|x-m|*6745 > 3*10^4*mad — the 1.4826
    consistency constant as the exact rational 14826/10^4 reduced) so
    the rounded statistics never decide via float compare. Scale: the
    neighborhood join is calendar-bounded (7 rows per day over the
    daily grid); two grouped percentile aggregates."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    nbr = a.join(
        b,
        (F.col("b.d") >= F.date_sub(F.col("a.d"), 3))
        & (F.col("b.d") <= F.date_add(F.col("a.d"), 3)),
    ).select(
        F.col("a.d").alias("d"),
        F.col("a.cnt").alias("cnt"),
        F.col("b.cnt").alias("nb"),
    )
    med = nbr.groupBy("d", "cnt").agg(
        F.round(F.expr("percentile(nb, 0.5)"), 6)
        .cast("decimal(18,6)")
        .alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_window"),
    )
    c = daily.select(
        F.col("d").alias("cd"), F.col("cnt").alias("ccnt")
    )
    dev = med.join(
        c,
        (F.col("cd") >= F.date_sub(F.col("d"), 3))
        & (F.col("cd") <= F.date_add(F.col("d"), 3)),
    ).select(
        "d",
        "cnt",
        "m",
        "n_window",
        F.abs(F.col("ccnt") - F.col("m")).alias("ad"),
    )
    mad = dev.groupBy("d", "cnt", "m", "n_window").agg(
        F.round(F.expr("percentile(ad, 0.5)"), 6)
        .cast("decimal(18,6)")
        .alias("mad")
    )
    flag = (
        F.abs(F.col("cnt") - F.col("m")).cast("decimal(28,10)") * 6745
        > 3 * 10000 * F.col("mad").cast("decimal(28,10)")
    )
    return (
        mad.where(F.col("n_window") == 7)
        .select(
            "d",
            "cnt",
            F.col("m").cast("double").alias("window_median"),
            F.col("mad").cast("double").alias("window_mad"),
            flag.alias("flagged"),
            F.when(flag, F.col("m").cast("double"))
            .otherwise(F.col("cnt").cast("double"))
            .alias("cleaned"),
        )
        .orderBy("d")
    )


# ---- X205: difference-in-differences -------------------------------------


@declared_query(
    "did_spend_estimate",
    oracle="""
    WITH split AS (
        SELECT CAST(ROUND(quantile_cont(
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)), 0.5), 6)
               AS DOUBLE) AS med_day
        FROM orders
    ), tagged AS (
        SELECT CAST(c.c_mktsegment = 'BUILDING' AS BIGINT) AS treated,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o.o_orderdate AS DATE))
                    > (SELECT med_day FROM split) AS BIGINT) AS post,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cell AS (
        SELECT treated, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100,
                          9) AS DECIMAL(28,9)) AS mean9
        FROM tagged GROUP BY treated, post
    )
    SELECT
        (SELECT n FROM cell WHERE treated = 1 AND post = 0)
            AS n_treat_pre,
        (SELECT n FROM cell WHERE treated = 1 AND post = 1)
            AS n_treat_post,
        (SELECT n FROM cell WHERE treated = 0 AND post = 0)
            AS n_ctrl_pre,
        (SELECT n FROM cell WHERE treated = 0 AND post = 1)
            AS n_ctrl_post,
        CAST(ROUND(CAST(
            ((SELECT mean9 FROM cell WHERE treated = 1 AND post = 1)
             - (SELECT mean9 FROM cell WHERE treated = 1 AND post = 0))
            - ((SELECT mean9 FROM cell WHERE treated = 0 AND post = 1)
               - (SELECT mean9 FROM cell WHERE treated = 0 AND post = 0))
            AS DOUBLE), 6) AS DOUBLE) AS did_estimate
    """,
)
def did_spend_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X205: difference-in-differences on mean order value — treated =
    BUILDING-segment customers, period split at the median order date;
    DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre). The
    causal-lite estimator that removes both the fixed group gap and
    the common time trend (X159's CUPED reduces variance within an
    RCT; DiD is what you run when assignment wasn't random). On this
    fixture the true effect is ~0 — the placebo reading IS the
    validation.

    Exactness: the median split day is the shared interpolated
    percentile (round 6); cell means are single divisions of exact
    cents rounded 9 and DECIMAL-staged, so the four-way difference is
    exact decimal arithmetic divided... emitted once, rounded 6.
    Scale: one combinable 4-cell aggregate after a broadcast-dim
    join; the 1-row median broadcasts (whitelisted)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    )
    split = o.agg(
        F.round(F.expr(
            "percentile(datediff(to_date(o_orderdate),"
            " to_date('1970-01-01')), 0.5)"
        ), 6).alias("med_day")
    )
    tagged = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(split))
        .select(
            (F.col("c_mktsegment") == "BUILDING")
            .cast("bigint")
            .alias("treated"),
            (day > F.col("med_day")).cast("bigint").alias("post"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
    )
    cell = tagged.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum("cents").cast("double") / F.count(F.lit(1)) / 100, 9
        )
        .cast("decimal(28,9)")
        .alias("mean9"),
    )
    p = cell.groupBy().pivot("treated", [0, 1]).agg(
        F.max(F.when(F.col("post") == 0, F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("post") == 1, F.col("n"))).alias("n_post"),
        F.max(F.when(F.col("post") == 0, F.col("mean9"))).alias(
            "m_pre"
        ),
        F.max(F.when(F.col("post") == 1, F.col("mean9"))).alias(
            "m_post"
        ),
    )
    did = (
        (F.col("1_m_post") - F.col("1_m_pre"))
        - (F.col("0_m_post") - F.col("0_m_pre"))
    ).cast("double")
    return p.select(
        F.col("1_n_pre").alias("n_treat_pre"),
        F.col("1_n_post").alias("n_treat_post"),
        F.col("0_n_pre").alias("n_ctrl_pre"),
        F.col("0_n_post").alias("n_ctrl_post"),
        F.round(did, 6).alias("did_estimate"),
    )


# ---- X206: information gain ----------------------------------------------

_IG_FEATURES = [
    ("o_orderpriority", "o_orderpriority"),
    ("order_dow", "CAST((date_diff('day', DATE '1970-01-01', "
     "CAST(o_orderdate AS DATE)) + 4) % 7 AS VARCHAR)"),
    ("price_decile", "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
     " // 5000000 AS VARCHAR)"),
]


def _o_ig(name: str, expr: str) -> str:
    return f"""
        SELECT '{name}' AS feature,
               CAST(COUNT(DISTINCT fv) AS BIGINT) AS n_values,
               CAST(ROUND(
                 (SELECT CAST(SUM(CAST(ROUND(
                      -(CAST(cn AS DOUBLE) / n)
                       * ln(CAST(cn AS DOUBLE) / n), 12)
                      AS DECIMAL(28,12))) AS DOUBLE)
                  FROM (SELECT o_orderstatus,
                               CAST(COUNT(*) AS BIGINT) AS cn,
                               (SELECT COUNT(*) FROM orders) AS n
                        FROM orders GROUP BY o_orderstatus) hs)
                 - CAST(SUM(CAST(ROUND(
                      -(CAST(cnt AS DOUBLE)
                        / (SELECT COUNT(*) FROM orders))
                       * ln(CAST(cnt AS DOUBLE) / fn), 12)
                      AS DECIMAL(28,12))) AS DOUBLE), 6)
                 AS DOUBLE) AS info_gain
        FROM (
            SELECT fv, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(COUNT(*)) OVER (PARTITION BY fv) AS BIGINT)
                       AS fn
            FROM (SELECT {expr} AS fv, o_orderstatus FROM orders) t
            GROUP BY fv, o_orderstatus
        ) g
    """


@declared_query(
    "feature_information_gain",
    oracle=" UNION ALL ".join(_o_ig(n, e) for n, e in _IG_FEATURES)
    + " ORDER BY feature",
)
def feature_information_gain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X206: information gain of three candidate features (priority,
    order day-of-week, price decile) for predicting order status —
    IG = H(status) - H(status | feature). The entropy-based feature
    ranking every decision-tree/feature-selection pass starts with,
    over X147's decimal-staged p·ln p machinery: each entropy term is
    computed on identical exact rationals, rounded 12, and
    DECIMAL-staged so the sums are order-free.

    Note H(status|feature) = -sum_{v,s} p(v,s) ln(p(s|v)) — the
    per-(value, status) term uses the joint count over the total and
    the conditional inside the log, both exact rationals. Scale: one
    crosstab aggregate per feature (combinable); the class-entropy
    subquery is a 3-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    ntot = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    hs_df = (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
        .crossJoin(F.broadcast(ntot))
        .select(
            F.round(
                -(F.col("cn").cast("double") / F.col("n_total"))
                * F.log(F.col("cn").cast("double") / F.col("n_total")),
                12,
            )
            .cast("decimal(28,12)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hs"))
    )
    feats = [
        ("o_orderpriority", F.col("o_orderpriority")),
        (
            "order_dow",
            (
                (
                    F.datediff(
                        F.to_date("o_orderdate"),
                        F.lit("1970-01-01").cast("date"),
                    )
                    + 4
                )
                % 7
            ).cast("string"),
        ),
        (
            "price_decile",
            F.expr(
                "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                " DIV 5000000 AS STRING)"
            ),
        ),
    ]
    out = None
    for name, expr in feats:
        g = (
            o.select(expr.alias("fv"), "o_orderstatus")
            .groupBy("fv", "o_orderstatus")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .withColumn(
                "fn",
                F.sum("cnt")
                .over(Window.partitionBy("fv"))
                .cast("bigint"),
            )
        )
        cond = g.crossJoin(F.broadcast(ntot)).select(
            F.round(
                -(F.col("cnt").cast("double") / F.col("n_total"))
                * F.log(F.col("cnt").cast("double") / F.col("fn")),
                12,
            )
            .cast("decimal(28,12)")
            .alias("t"),
            "fv",
        )
        st = cond.agg(
            F.lit(name).alias("feature"),
            F.countDistinct("fv").cast("bigint").alias("n_values"),
            F.sum("t").cast("double").alias("hcond"),
        ).crossJoin(F.broadcast(hs_df)).select(
            "feature",
            "n_values",
            F.round(F.col("hs") - F.col("hcond"), 6).alias("info_gain"),
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("feature")


# ---- X207: asymmetric containment ----------------------------------------

from .dedup_queries import _O_SIGNATURES, _O_TOK  # noqa: E402

_CONT_NUM, _CONT_DEN = 7, 10  # containment threshold 0.7


@declared_query(
    "containment_pairs_docs",
    oracle=f"""
    WITH {_O_SIGNATURES},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.minhash = b.minhash
        WHERE a.doc_id < b.doc_id
    ), dt AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_O_TOK})) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM dt GROUP BY doc_id
    ), shared AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM cand c
        JOIN dt ta ON ta.doc_id = c.doc_a
        JOIN dt tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        GROUP BY c.doc_a, c.doc_b
    ), directed AS (
        SELECT s.doc_a AS contained_doc, s.doc_b AS container_doc,
               s.n_shared, x.n_tok
        FROM shared s JOIN sizes x ON s.doc_a = x.doc_id
        UNION ALL
        SELECT s.doc_b, s.doc_a, s.n_shared, y.n_tok
        FROM shared s JOIN sizes y ON s.doc_b = y.doc_id
    )
    SELECT contained_doc, container_doc,
           CAST(ROUND(CAST(n_shared AS DOUBLE) / n_tok, 6) AS DOUBLE)
               AS containment
    FROM directed
    WHERE {_CONT_DEN} * n_shared >= {_CONT_NUM} * n_tok
    ORDER BY contained_doc, container_doc
    """,
)
def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X207: DIRECTIONAL near-dup — containment C(A in B) =
    |A intersect B| / |A| >= 0.7 over the E7 LSH candidates. Catches
    what symmetric Jaccard structurally cannot: a short document
    quoted inside a long one has high containment but low Jaccard
    (the intersection is small relative to the UNION), and
    quote/boilerplate/subset duplication is exactly the long-tail a
    training-corpus dedup misses first. Both directions are emitted
    independently — A-in-B and B-in-A are different facts.

    Exactness: token sets, intersections, and sizes are exact;
    membership is the integer cross-multiplication 10*shared >=
    7*|A|; the emitted ratio is one division rounded 6. Scale: same
    sub-quadratic candidate + inverted-index verify shape as E7."""
    from ..operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        tokens,
    )

    from ..operators.sigcache import document_signatures

    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(document_signatures(spark, sf_dir))
    dt = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokens("text"))).alias(
                "tok"
            )
        )
        .distinct()
        # tokenize once: dt feeds sizes plus BOTH inverted-index sides
        # (guide §2.4; 17 scans in the r13-before plan)
        .localCheckpoint()
    )
    sizes = dt.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    shared = (
        cand.join(dt.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            dt.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "tok"]
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    d1 = shared.join(
        sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a"
    ).select(
        F.col("doc_a").alias("contained_doc"),
        F.col("doc_b").alias("container_doc"),
        "n_shared",
        "n_tok",
    )
    d2 = shared.join(
        sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b"
    ).select(
        F.col("doc_b").alias("contained_doc"),
        F.col("doc_a").alias("container_doc"),
        "n_shared",
        "n_tok",
    )
    directed = d1.unionByName(d2)
    return (
        directed.where(
            _CONT_DEN * F.col("n_shared") >= _CONT_NUM * F.col("n_tok")
        )
        .select(
            "contained_doc",
            "container_doc",
            F.round(
                F.col("n_shared").cast("double") / F.col("n_tok"), 6
            ).alias("containment"),
        )
        .orderBy("contained_doc", "container_doc")
    )


# ---- X208: exact Kendall tau-b -------------------------------------------

_TAU_B = 20  # price buckets


@declared_query(
    "kendall_tau_qty_price",
    oracle=f"""
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), bounds AS (
        SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM base
    ), sparse AS (
        SELECT q,
               CAST(({_TAU_B} * (cents - (SELECT lo FROM bounds)))
                    // ((SELECT hi FROM bounds)
                        - (SELECT lo FROM bounds) + 1) AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY 1, 2
    ), cells AS (
        -- densify: the suffix-sum windows below index cells by the
        -- OTHER dimension's value, so missing (q, b) combinations
        -- would silently drop contributions — materialize the full
        -- |q| x |b| grid with zero counts
        SELECT qv.q, bv.b, COALESCE(s.n, CAST(0 AS BIGINT)) AS n
        FROM (SELECT DISTINCT q FROM sparse) qv
        CROSS JOIN (SELECT DISTINCT b FROM sparse) bv
        LEFT JOIN sparse s ON s.q = qv.q AND s.b = bv.b
    ), rs AS (
        SELECT q, b, n,
               CAST(COALESCE(SUM(n) OVER (PARTITION BY q ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS row_lt,
               CAST(COALESCE(SUM(n) OVER (PARTITION BY q ORDER BY b DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS row_gt
        FROM cells
    ), sfx AS (
        SELECT q, b, n,
               CAST(COALESCE(SUM(row_lt) OVER (PARTITION BY b
                   ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS conc_below,
               CAST(COALESCE(SUM(row_gt) OVER (PARTITION BY b
                   ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS disc_below
        FROM rs
    ), cd AS (
        SELECT CAST(SUM(CAST(n AS DECIMAL(19,0)) * conc_below)
                    AS DECIMAL(38,0)) AS c,
               CAST(SUM(CAST(n AS DECIMAL(19,0)) * disc_below)
                    AS DECIMAL(38,0)) AS d
        FROM sfx
    ), ties AS (
        SELECT
            (SELECT CAST(SUM(CAST(tn AS DECIMAL(19,0)) * (tn - 1))
                         AS DECIMAL(38,0)) // 2
             FROM (SELECT CAST(SUM(n) AS BIGINT) AS tn
                   FROM cells GROUP BY q) tq) AS n1,
            (SELECT CAST(SUM(CAST(tn AS DECIMAL(19,0)) * (tn - 1))
                         AS DECIMAL(38,0)) // 2
             FROM (SELECT CAST(SUM(n) AS BIGINT) AS tn
                   FROM cells GROUP BY b) tb) AS n2,
            (SELECT CAST(CAST(SUM(n) AS DECIMAL(19,0))
                         * (SUM(n) - 1) AS DECIMAL(38,0)) // 2
             FROM cells) AS n0
    )
    SELECT CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           CAST(n1 AS BIGINT) AS ties_qty,
           CAST(n2 AS BIGINT) AS ties_price,
           CAST(ROUND(CAST(c - d AS DOUBLE)
                      / sqrt(CAST(n0 - n1 AS DOUBLE)
                             * CAST(n0 - n2 AS DOUBLE)), 6) AS DOUBLE)
               AS tau_b
    FROM cd CROSS JOIN ties
    """,
)
def kendall_tau_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X208: exact Kendall tau-b between line-item quantity and the
    20-bucket price band, via 2D suffix sums over the bounded
    crosstab. Rank correlation is the monotone-dependence gauge that
    Pearson (X137) misses for non-linear relations; the crosstab
    formulation is the ONLY scalable route — naive Kendall is an
    O(n^2) pair scan, while here concordant/discordant pairs come
    from two window passes over the |qty| x |buckets| cell grid
    (bounded by the domains, never the row count).

    Exactness: cell counts are exact; concordant C = sum n_ij *
    (cells strictly greater in both dims) accumulates in
    DECIMAL(38,0) via the row-suffix-then-column-prefix double
    window; tie terms are exact integer formulas; tau-b performs ONE
    double division with a sqrt of exact operands, rounded 6. Scale:
    one combinable cell aggregate; windows run over the ~1000-row
    grid, partitioned by a dimension each."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    bounds = base.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    sparse = (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "q",
            F.expr(
                f"CAST(({_TAU_B} * (cents - lo)) DIV (hi - lo + 1)"
                " AS BIGINT)"
            ).alias("b"),
        )
        .groupBy("q", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        # |q| x |b| bounded cell table (~1000 rows), consumed by three
        # distinct subplans (grid densify x2, left join): materialize so
        # the lineitem scan + cell aggregate run ONCE (guide §2.4 — the
        # r13-before plan re-ran the scan 48 times through this subtree)
        .localCheckpoint()
    )
    # densify to the full |q| x |b| grid — the suffix-sum windows
    # below index cells by the other dimension, so a missing (q, b)
    # combination would silently drop contributions
    cells = (
        sparse.select("q")
        .distinct()
        .crossJoin(sparse.select("b").distinct())
        .join(sparse, ["q", "b"], "left")
        .select(
            "q",
            "b",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
        # dense grid, same bounded size; feeds four consumers (suffix-sum
        # pass, both tie aggregates, n0)
        .localCheckpoint()
    )
    w_lt = (
        Window.partitionBy("q")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_gt = (
        Window.partitionBy("q")
        .orderBy(F.desc("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rs = cells.select(
        "q",
        "b",
        "n",
        F.coalesce(F.sum("n").over(w_lt), F.lit(0))
        .cast("bigint")
        .alias("row_lt"),
        F.coalesce(F.sum("n").over(w_gt), F.lit(0))
        .cast("bigint")
        .alias("row_gt"),
    )
    w_qb = (
        Window.partitionBy("b")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sfx = rs.select(
        "q",
        "b",
        "n",
        F.coalesce(F.sum("row_lt").over(w_qb), F.lit(0))
        .cast("bigint")
        .alias("conc_below"),
        F.coalesce(F.sum("row_gt").over(w_qb), F.lit(0))
        .cast("bigint")
        .alias("disc_below"),
    )
    cd = sfx.agg(
        F.sum(F.col("n").cast("decimal(19,0)") * F.col("conc_below"))
        .cast("decimal(38,0)")
        .alias("c"),
        F.sum(F.col("n").cast("decimal(19,0)") * F.col("disc_below"))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    tq = (
        cells.groupBy("q")
        .agg(F.sum("n").cast("bigint").alias("tn"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(tn AS DECIMAL(19,0)) * (tn - 1))"
                " AS DECIMAL(38,0)) DIV 2"
            ).alias("n1")
        )
    )
    tb = (
        cells.groupBy("b")
        .agg(F.sum("n").cast("bigint").alias("tn"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(tn AS DECIMAL(19,0)) * (tn - 1))"
                " AS DECIMAL(38,0)) DIV 2"
            ).alias("n2")
        )
    )
    n0 = cells.agg(
        F.expr(
            "CAST(CAST(SUM(n) AS DECIMAL(19,0)) * (SUM(n) - 1)"
            " AS DECIMAL(38,0)) DIV 2"
        ).alias("n0")
    )
    return (
        cd.crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(n0))
        .select(
            F.col("c").cast("bigint").alias("concordant"),
            F.col("d").cast("bigint").alias("discordant"),
            F.col("n1").cast("bigint").alias("ties_qty"),
            F.col("n2").cast("bigint").alias("ties_price"),
            F.round(
                (F.col("c") - F.col("d")).cast("double")
                / F.sqrt(
                    (F.col("n0") - F.col("n1")).cast("double")
                    * (F.col("n0") - F.col("n2")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )
