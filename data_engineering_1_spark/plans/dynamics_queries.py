"""Dynamics/association declared queries (round 6, twenty-first batch
— [north-star] scope): the cross-series correlation matrix, rank
stability, model gains curves, cross-session behavior handoffs,
operations-research demand classification, and categorical
association strength.

  * ``type_correlation_matrix`` (X227) — full pairwise Pearson matrix
    of the five daily event-type series (X137 does one pair; planning
    needs the matrix).
  * ``weekly_rank_spearman`` (X228) — Spearman rank correlation of
    part rankings between consecutive weeks — the continuous
    rank-stability readout behind X196's top-10 churn.
  * ``gains_chart_deciles`` (X229) — cumulative gains/lift by score
    decile — the "how much of the target does the top 20% capture"
    chart every targeting model ships with (X168 asks is-the-score
    honest; this asks is-it-USEFUL).
  * ``session_handoff_matrix`` (X230) — last-event-of-session ->
    first-event-of-next-session transition counts — the
    cross-session behavior matrix (X106's Markov chain is
    within-stream; re-entry behavior is a different process).
  * ``demand_classification_parts`` (X231) — Syntetos-Boylan demand
    quadrants (smooth / intermittent / erratic / lumpy) from ADI and
    CV² with INTEGER cross-multiplied thresholds — the
    forecastability triage every inventory pipeline runs first.
  * ``cramers_v_pairs`` (X232) — Cramér's V for three categorical
    pairs — the effect-size companion to X95's chi-squared (chi2
    says "dependent"; V says "how much").

Determinism: daily counts, ranks, decile bins, handoff counts,
demand moments, and crosstab cells are exact integers; correlations
/ rho / V / lift are single divisions (or one sqrt) on exact or
round-9-staged operands, rounded 6; every classification threshold
is an integer cross-multiplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X227: event-type correlation matrix ---------------------------------


@declared_query(
    "type_correlation_matrix",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.cnt) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(b.cnt) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(CAST(a.cnt AS DECIMAL(19,0)) * b.cnt)
                    AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(a.cnt AS DECIMAL(19,0)) * a.cnt)
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(b.cnt AS DECIMAL(19,0)) * b.cnt)
                    AS DECIMAL(38,0)) AS syy
        FROM daily a JOIN daily b
          ON a.d = b.d AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n AS n_days,
           CAST(ROUND((n * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((n * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (n * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE)
                                  * CAST(sy AS DOUBLE))), 6)
                AS DOUBLE) AS pearson_r
    FROM pairs ORDER BY type_a, type_b
    """,
)
def type_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X227: the full pairwise Pearson correlation matrix of the five
    daily event-type count series (upper triangle, 10 pairs) — X137
    computes one rolling pair; capacity planning and anomaly
    correlation need the whole matrix (which series move together
    decides what can be monitored jointly).

    Exactness: X137's discipline — daily counts are exact BIGINTs,
    the five power sums accumulate in DECIMAL(38,0) per pair, and r
    is ONE double expression on identical exact operands, rounded 6.
    Scale: events reduce to one row per (type, day); the pair join is
    |types|^2-bounded over the daily grid."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = daily.select(
        F.col("event_type").alias("type_a"),
        "d",
        F.col("cnt").alias("xa"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        "d",
        F.col("cnt").alias("xb"),
    )
    pairs = (
        a.join(b, "d")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("xa").cast("decimal(38,0)").alias("sx"),
            F.sum("xb").cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("xa").cast("decimal(19,0)") * F.col("xb"))
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(F.col("xa").cast("decimal(19,0)") * F.col("xa"))
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(F.col("xb").cast("decimal(19,0)") * F.col("xb"))
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    return pairs.select(
        "type_a",
        "type_b",
        F.col("n").alias("n_days"),
        F.round(
            (
                nd * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / F.sqrt(
                (
                    nd * F.col("sxx").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sx").cast("double")
                )
                * (
                    nd * F.col("syy").cast("double")
                    - F.col("sy").cast("double")
                    * F.col("sy").cast("double")
                )
            ),
            6,
        ).alias("pearson_r"),
    ).orderBy("type_a", "type_b")


# ---- X228: weekly rank Spearman ------------------------------------------


@declared_query(
    "weekly_rank_spearman",
    oracle="""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', CAST(l_shipdate AS DATE))
                    AS DATE) AS wk,
               l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), joined AS (
        SELECT cur.wk, cur.l_partkey,
               cur.qty AS q_cur, prev.qty AS q_prev
        FROM weekly cur JOIN weekly prev
          ON prev.l_partkey = cur.l_partkey
         AND prev.wk = cur.wk - INTERVAL 7 DAY
    ), ranked AS (
        SELECT wk, l_partkey,
               row_number() OVER (PARTITION BY wk
                                  ORDER BY q_cur DESC, l_partkey)
                   AS r_cur,
               row_number() OVER (PARTITION BY wk
                                  ORDER BY q_prev DESC, l_partkey)
                   AS r_prev
        FROM joined
    ), agg AS (
        SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(CAST(r_cur - r_prev AS DECIMAL(19,0))
                        * (r_cur - r_prev)) AS DECIMAL(38,0)) AS d2
        FROM ranked GROUP BY wk
    )
    SELECT wk, n_common,
           CAST(ROUND(1 - 6.0 * CAST(d2 AS DOUBLE)
                      / (CAST(n_common AS DOUBLE)
                         * (CAST(n_common AS DOUBLE) * n_common - 1)),
                      6) AS DOUBLE) AS spearman_rho
    FROM agg WHERE n_common >= 2 ORDER BY wk
    """,
)
def weekly_rank_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X228: Spearman rank correlation of part demand rankings between
    consecutive weeks, over the parts present in both — the continuous
    rank-stability series (X196's top-10 churn is the binary view;
    rho near 1 means the whole ORDER persists, not just the podium).
    Both weeks' ranks are computed within the common-part subset with
    the (qty DESC, partkey) total tie-break, so ranks are distinct
    integers and the classic 1 - 6*sum(d^2)/(n(n^2-1)) formula is
    exact.

    Exactness: ranks and d^2 sums are exact integers (DECIMAL(38,0)
    accumulation); rho is ONE double expression rounded 6. Scale: the
    week-over-week join is an equi-join on (part, week-7d); rank
    windows partition BY WEEK."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        F.date_trunc("week", F.to_date("l_shipdate"))
        .cast("date")
        .alias("wk"),
        "l_partkey",
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty")
    )
    prev = weekly.select(
        F.date_add(F.col("wk"), 7).alias("wk"),
        "l_partkey",
        F.col("qty").alias("q_prev"),
    )
    joined = weekly.withColumnRenamed("qty", "q_cur").join(
        prev, ["wk", "l_partkey"]
    )
    r_cur = F.row_number().over(
        Window.partitionBy("wk").orderBy(
            F.desc("q_cur"), F.asc("l_partkey")
        )
    )
    r_prev = F.row_number().over(
        Window.partitionBy("wk").orderBy(
            F.desc("q_prev"), F.asc("l_partkey")
        )
    )
    ranked = joined.select(
        "wk", "l_partkey", r_cur.alias("r_cur"), r_prev.alias("r_prev")
    )
    d = F.col("r_cur") - F.col("r_prev")
    agg = ranked.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.sum(d.cast("decimal(19,0)") * d)
        .cast("decimal(38,0)")
        .alias("d2"),
    )
    n = F.col("n_common").cast("double")
    return (
        agg.where(F.col("n_common") >= 2)
        .select(
            "wk",
            "n_common",
            F.round(
                1
                - 6.0
                * F.col("d2").cast("double")
                / (n * (n * F.col("n_common") - 1)),
                6,
            ).alias("spearman_rho"),
        )
        .orderBy("wk")
    )


# ---- X229: gains chart ----------------------------------------------------


@declared_query(
    "gains_chart_deciles",
    oracle="""
    WITH scored AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
               CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders
    ), ranked AS (
        SELECT s, y,
               CAST(ROW_NUMBER() OVER (ORDER BY s DESC, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(y) OVER () AS BIGINT) AS total_pos
        FROM scored
    ), bins AS (
        SELECT CAST((10 * (rn - 1)) // n AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               MAX(total_pos) AS total_pos
        FROM ranked GROUP BY 1
    )
    SELECT decile, n_rows, n_pos,
           CAST(ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      / MAX(total_pos) OVER (), 6) AS DOUBLE)
               AS cum_capture,
           CAST(ROUND((CAST(SUM(n_pos) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                       / MAX(total_pos) OVER ())
                      * 10.0 / (decile + 1), 6) AS DOUBLE) AS lift
    FROM bins ORDER BY decile
    """,
)
def gains_chart_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X229: cumulative gains and lift by score decile — sort orders
    by the (descending) score, cut into deciles, and report what share
    of all positives the top k deciles capture and the lift over
    random targeting. The chart that turns X167's AUC into a business
    decision ("mail the top 2 deciles"); X168 asks whether the score's
    probabilities are honest, this asks whether acting on the ranking
    pays.

    Exactness: the descending rank comes from the X155 two-phase rank
    (shard monotone in the (-cents) order — no global sort over data
    rows); positives, capture shares, and lifts are exact-count
    single divisions rounded 6; the cumulative window runs over the
    10-row decile relation (whitelisted). The broadcast 1-row
    (n, total positives) aggregate crosses in (whitelisted)."""
    from ..operators.ranks import two_phase_row_number

    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("s"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    ).withColumn("s_neg", -F.col("s"))
    ranked = two_phase_row_number(
        scored,
        shard=F.expr("s_neg DIV 1048576"),
        order_cols=["s_neg", "o_orderkey"],
        out_col="rn",
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("total_pos"),
    )
    bins = (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(
            F.expr("CAST((10 * (rn - 1)) DIV n AS INT)").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.max("total_pos").alias("total_pos"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("n_pos").over(wcum).cast("double")
    return bins.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(cum / F.col("total_pos"), 6).alias("cum_capture"),
        F.round(
            cum / F.col("total_pos") * 10.0 / (F.col("decile") + 1), 6
        ).alias("lift"),
    ).orderBy("decile")


# ---- X230: session handoff matrix -----------------------------------------

_HANDOFF_GAP_MIN = 30


@declared_query(
    "session_handoff_matrix",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER w
                         > {_HANDOFF_GAP_MIN} * 60 * 1000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    ), marked AS (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts, event_id) AS rf,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts DESC, event_id DESC)
                   AS rl
        FROM sess
    ), ends AS (
        SELECT user_id, sid,
               MAX(CASE WHEN rf = 1 THEN event_type END) AS first_type,
               MAX(CASE WHEN rl = 1 THEN event_type END) AS last_type
        FROM marked GROUP BY user_id, sid
    ), handoff AS (
        SELECT last_type AS from_type,
               lead(first_type) OVER (PARTITION BY user_id
                                      ORDER BY sid) AS to_type
        FROM ends
    )
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_handoffs
    FROM handoff WHERE to_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY from_type, to_type
    """,
)
def session_handoff_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X230: the cross-session behavior matrix — how a user's session
    ENDS vs how their NEXT session BEGINS (last event type -> next
    first event type, 30-min-gap sessions). X106's Markov chain
    models within-stream transitions; re-entry is a different process
    (an 'error'-ending session whose next session starts with
    'signup' is a churn-save signal), and this matrix is where
    session-resumption products read it.

    Exactness: sessionization is X202's exact gaps-and-islands; the
    per-session first/last are argmin/argmax under the total
    (ts, event_id) order; handoffs are an exact lead over the
    per-user session sequence. Scale: everything partitions by
    user_id; the matrix is |types|^2 rows."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_s = (
        F.lag(us).over(wo).isNull()
        | ((us - F.lag(us).over(wo)) > _HANDOFF_GAP_MIN * 60 * 1000000)
    ).cast("int")
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type", new_s.alias("new_s")
    )
    sess = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_s")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    ends = sess.groupBy("user_id", "sid").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias(
            "first_type"
        ),
        F.max_by("event_type", F.struct("ts", "event_id")).alias(
            "last_type"
        ),
    )
    handoff = ends.select(
        "user_id",
        "sid",
        F.col("last_type").alias("from_type"),
        F.lead("first_type")
        .over(Window.partitionBy("user_id").orderBy("sid"))
        .alias("to_type"),
    )
    return (
        handoff.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_handoffs"))
        .orderBy("from_type", "to_type")
    )


# ---- X231: demand classification ------------------------------------------


@declared_query(
    "demand_classification_parts",
    oracle="""
    WITH wk_demand AS (
        SELECT l_partkey,
               CAST(date_trunc('week', CAST(l_shipdate AS DATE))
                    AS DATE) AS wk,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(date_diff('day', MIN(wk), MAX(wk)) AS BIGINT)
                   AS span_days,
               CAST(SUM(q) AS BIGINT) AS s1,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * q) AS DECIMAL(38,0))
                   AS s2
        FROM wk_demand GROUP BY 1
    ), classed AS (
        -- ADI = (span_days/7)/(k-1); ADI < 1.32 <=> 100*span_days
        --       < 924*(k-1). CV^2 = (k*s2 - s1^2)/s1^2; CV^2 < 0.49
        --       <=> 100*(k*s2 - s1^2) < 49*s1^2. All exact integers.
        SELECT l_partkey, k,
               CASE
                 WHEN 100 * span_days < 924 * (k - 1)
                      AND 100 * (k * s2 - CAST(s1 AS DECIMAL(19,0)) * s1)
                          < 49 * CAST(s1 AS DECIMAL(19,0)) * s1
                     THEN 'smooth'
                 WHEN 100 * span_days >= 924 * (k - 1)
                      AND 100 * (k * s2 - CAST(s1 AS DECIMAL(19,0)) * s1)
                          < 49 * CAST(s1 AS DECIMAL(19,0)) * s1
                     THEN 'intermittent'
                 WHEN 100 * span_days < 924 * (k - 1)
                     THEN 'erratic'
                 ELSE 'lumpy' END AS demand_class
        FROM per_part WHERE k >= 2
    )
    SELECT demand_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(k) AS BIGINT) AS n_demand_weeks
    FROM classed GROUP BY 1 ORDER BY demand_class
    """,
)
def demand_classification_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X231: Syntetos-Boylan demand classification — each part's
    weekly demand history reduces to ADI (average inter-demand
    interval, weeks) and CV^2 (squared coefficient of variation of
    demand sizes), and the (1.32, 0.49) quadrant boundaries sort
    parts into smooth / intermittent / erratic / lumpy. The
    forecastability triage every inventory pipeline runs FIRST: the
    quadrant decides the method (exponential smoothing vs Croston vs
    bootstrap), so misclassifying is choosing the wrong forecaster
    for thousands of SKUs at once.

    Exactness: both thresholds are integer cross-multiplications
    (100*span < 924*(k-1); 100*(k*S2 - S1^2) < 49*S1^2) on exact
    BIGINT/decimal moments — the published 1.32/0.49 constants as
    exact rationals. Scale: two combinable aggregates (part-week,
    then part), then a 4-row class rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    wk_demand = li.groupBy(
        "l_partkey",
        F.date_trunc("week", F.to_date("l_shipdate"))
        .cast("date")
        .alias("wk"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    per_part = wk_demand.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.datediff(F.max("wk"), F.min("wk"))
        .cast("bigint")
        .alias("span_days"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.col("q").cast("decimal(19,0)") * F.col("q"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    s1d = F.col("s1").cast("decimal(19,0)")
    cv2_num = 100 * (F.col("k") * F.col("s2") - s1d * F.col("s1"))
    cv2_low = cv2_num < 49 * s1d * F.col("s1")
    adi_low = 100 * F.col("span_days") < 924 * (F.col("k") - 1)
    classed = per_part.where(F.col("k") >= 2).select(
        "l_partkey",
        "k",
        F.when(adi_low & cv2_low, "smooth")
        .when((~adi_low) & cv2_low, "intermittent")
        .when(adi_low, "erratic")
        .otherwise("lumpy")
        .alias("demand_class"),
    )
    return (
        classed.groupBy("demand_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("k").cast("bigint").alias("n_demand_weeks"),
        )
        .orderBy("demand_class")
    )


# ---- X232: Cramér's V -----------------------------------------------------

_CRAMER_PAIRS = [
    ("priority_x_status", "o_orderpriority", "o_orderstatus"),
    ("segment_x_status", "c_mktsegment", "o_orderstatus"),
    ("dow_x_priority",
     "CAST((date_diff('day', DATE '1970-01-01', "
     "CAST(o_orderdate AS DATE)) + 4) % 7 AS VARCHAR)",
     "o_orderpriority"),
]


def _o_cramer(name: str, a: str, b: str) -> str:
    return f"""
        SELECT '{name}' AS pair,
               CAST(r AS BIGINT) AS n_rows_a,
               CAST(c AS BIGINT) AS n_cols_b,
               CAST(ROUND(chi2, 6) AS DOUBLE) AS chi2,
               CAST(ROUND(sqrt(chi2 / (n * LEAST(r - 1, c - 1))), 6)
                    AS DOUBLE) AS cramers_v
        FROM (
            SELECT MAX(n) AS n,
                   COUNT(DISTINCT av) AS r, COUNT(DISTINCT bv) AS c,
                   CAST(SUM(CAST(ROUND(
                       CAST(CAST(n AS DECIMAL(19,0)) * cnt
                            - CAST(ra AS DECIMAL(19,0)) * cb AS DOUBLE)
                       * CAST(CAST(n AS DECIMAL(19,0)) * cnt
                              - CAST(ra AS DECIMAL(19,0)) * cb
                              AS DOUBLE)
                       / (CAST(n AS DOUBLE) * n * ra * cb), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS chi2
            FROM (
                SELECT av, bv, cnt,
                       SUM(cnt) OVER (PARTITION BY av) AS ra,
                       SUM(cnt) OVER (PARTITION BY bv) AS cb,
                       SUM(cnt) OVER () AS n
                FROM (
                    SELECT {a} AS av, {b} AS bv,
                           CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM orders o
                    JOIN customer cu ON o.o_custkey = cu.c_custkey
                    GROUP BY 1, 2
                ) cells
            ) t
        ) s
    """


@declared_query(
    "cramers_v_pairs",
    oracle=" UNION ALL ".join(_o_cramer(*p) for p in _CRAMER_PAIRS)
    + " ORDER BY pair",
)
def cramers_v_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X232: Cramér's V for three categorical column pairs — the
    normalized effect size sqrt(chi2 / (n*min(r-1, c-1))) in [0, 1].
    X95's chi-squared answers "are these columns dependent" (which at
    scale is almost always yes — n inflates chi2 without bound); V is
    the size of the dependence, comparable across pairs and sample
    sizes, which is what an association-mining pass actually ranks
    by.

    Note chi2 here uses the cells that EXIST (zero cells contribute
    their expected mass to... the complete-grid correction matters
    when marginals are sparse; on these dense crosstabs every cell
    is present — asserted by the pin test). Exactness: cell counts
    and marginals are exact; each cell's chi2 term is (n*o - r*c)^2
    / (n^2*r*c) computed on identical exact operands, rounded 9 and
    DECIMAL-staged (X95's discipline); V is one sqrt rounded 6.
    Scale: one crosstab aggregate per pair; windows run over the
    bounded cell grid."""
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
    dow = (
        (
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            + 4
        )
        % 7
    ).cast("string")
    pairs = [
        ("priority_x_status", F.col("o_orderpriority"),
         F.col("o_orderstatus")),
        ("segment_x_status", F.col("c_mktsegment"),
         F.col("o_orderstatus")),
        ("dow_x_priority", dow, F.col("o_orderpriority")),
    ]
    out = None
    for name, av, bv in pairs:
        cells = j.groupBy(av.alias("av"), bv.alias("bv")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        t = cells.select(
            "av",
            "bv",
            "cnt",
            F.sum("cnt").over(Window.partitionBy("av")).alias("ra"),
            F.sum("cnt").over(Window.partitionBy("bv")).alias("cb"),
            F.sum("cnt").over(Window.partitionBy()).alias("n"),
        )
        dev = (
            F.col("n").cast("decimal(19,0)") * F.col("cnt")
            - F.col("ra").cast("decimal(19,0)") * F.col("cb")
        ).cast("double")
        term = F.round(
            dev
            * dev
            / (
                F.col("n").cast("double")
                * F.col("n")
                * F.col("ra")
                * F.col("cb")
            ),
            9,
        ).cast("decimal(28,9)")
        st = t.agg(
            F.lit(name).alias("pair"),
            F.countDistinct("av").cast("bigint").alias("n_rows_a"),
            F.countDistinct("bv").cast("bigint").alias("n_cols_b"),
            F.max("n").alias("_n"),
            F.countDistinct("av").alias("_r"),
            F.countDistinct("bv").alias("_c"),
            F.sum(term).cast("double").alias("_chi2"),
        ).select(
            "pair",
            "n_rows_a",
            "n_cols_b",
            F.round(F.col("_chi2"), 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("_chi2")
                    / (
                        F.col("_n")
                        * F.least(F.col("_r") - 1, F.col("_c") - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("pair")
