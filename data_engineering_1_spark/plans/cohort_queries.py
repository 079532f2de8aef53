"""Cohort/lifecycle + distribution-harmonization declared queries
(round 6, sixth batch — [north-star] scope): the customer-lifecycle
and cross-slice-alignment operators of an analytics/curation layer.

  * ``rfm_segmentation`` (X139) — RFM customer segmentation: quartile
    bins per Recency/Frequency/Monetary from ONE percentile-array
    aggregate broadcast back; bin assignment is a per-row comparison
    count (the X120/X136 no-global-sort shape).
  * ``kaplan_meier_signup_purchase`` (X140) — Kaplan-Meier
    product-limit survival of time-to-first-purchase after signup
    with right-censoring at study end; the survival product is an
    ORDERED FOLD over the bounded duration-day grid.
  * ``quantile_normalize_doclen`` (X141) — per-source quantile
    mapping of doc token counts onto the POOLED length distribution
    (percent_rank within source -> linear interpolation on a 101-point
    pooled percentile grid) — the length-distribution harmonizer for
    mixing corpus sources.
  * ``js_divergence_lang_pairs`` (X142) — pairwise Jensen-Shannon
    divergence between per-language unigram distributions over the
    bounded vocab grid, ln terms staged to DECIMAL(28,12).
  * ``dynamic_gap_sessions`` (X143) — sessionization where each EVENT
    carries its own inactivity gap (Spark's dynamic-gap
    ``session_window``), oracled by the interval-union islands
    rewrite (running max of per-event session ends).

Determinism: bin decisions and KS/KM censor counts are integer; the
survival fold and quantile interpolation evaluate identical doubles in
identical order on both engines; JSD term sums are order-free via
decimal staging; session boundaries compare exact microsecond
timestamps with half-open [start, end) semantics on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import tokens
from ._discipline import o_sum_dec, sum_dec
from .registry import declared_query
from .text_queries import _O_TOK

# ---- X139: RFM segmentation ------------------------------------------


@declared_query(
    "rfm_segmentation",
    oracle="""
    WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_day
                 FROM orders),
    rfm AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         (SELECT ref_day FROM ref)) AS rec_days,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100,
                          0) AS BIGINT) AS mon_cents
        FROM orders GROUP BY o_custkey
    ), bounds AS (
        SELECT quantile_cont(rec_days, [0.25, 0.5, 0.75]) AS qr,
               quantile_cont(freq, [0.25, 0.5, 0.75]) AS qf,
               quantile_cont(mon_cents, [0.25, 0.5, 0.75]) AS qm
        FROM rfm
    ), binned AS (
        SELECT 1 + CAST(rec_days > (SELECT qr[1] FROM bounds) AS INTEGER)
                 + CAST(rec_days > (SELECT qr[2] FROM bounds) AS INTEGER)
                 + CAST(rec_days > (SELECT qr[3] FROM bounds) AS INTEGER)
                   AS r_bin,
               1 + CAST(freq > (SELECT qf[1] FROM bounds) AS INTEGER)
                 + CAST(freq > (SELECT qf[2] FROM bounds) AS INTEGER)
                 + CAST(freq > (SELECT qf[3] FROM bounds) AS INTEGER)
                   AS f_bin,
               1 + CAST(mon_cents > (SELECT qm[1] FROM bounds) AS INTEGER)
                 + CAST(mon_cents > (SELECT qm[2] FROM bounds) AS INTEGER)
                 + CAST(mon_cents > (SELECT qm[3] FROM bounds) AS INTEGER)
                   AS m_bin,
               mon_cents
        FROM rfm
    )
    SELECT CAST(r_bin * 100 + f_bin * 10 + m_bin AS INTEGER) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(mon_cents) / 100.0, 2) AS DOUBLE)
               AS total_monetary
    FROM binned
    GROUP BY segment
    ORDER BY segment
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X139: RFM (recency/frequency/monetary) customer segmentation —
    the lifecycle-marketing partition of the customer base (the same
    three-signal quartile-binning pattern stratifies corpus sources by
    freshness/volume/quality at curation time). Bins ascend with the
    raw value (r_bin 1 = most recent buyers; the marketing convention
    that inverts recency is a relabel, not a different partition).

    Shape discipline: all three quartile boundary sets come from ONE
    percentile-array aggregate over the CUSTOMER relation (array
    argument — separate percentile calls each buffer the column,
    X136's measured lesson), broadcast back as a 1-row table; bin
    assignment is a per-row strict-exceeded-boundary count (integer),
    and the rollup is one combinable groupBy over <= 64 segments.
    Monetary stays in BIGINT cents end to end."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100, 0)
        .cast("bigint")
        .alias("mon_cents"),
    )
    ref = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("ref_day")
    )
    rfm = rfm.crossJoin(F.broadcast(ref)).select(
        F.datediff("ref_day", "last_day").alias("rec_days"),
        "freq",
        "mon_cents",
    )
    bounds = rfm.agg(
        F.expr("percentile(rec_days, array(0.25, 0.5, 0.75))").alias("qr"),
        F.expr("percentile(freq, array(0.25, 0.5, 0.75))").alias("qf"),
        F.expr("percentile(mon_cents, array(0.25, 0.5, 0.75))").alias("qm"),
    )

    def _bin(col: str, q: str) -> F.Column:
        b = F.lit(1)
        for i in range(1, 4):
            b = b + (F.col(col) > F.element_at(F.col(q), i)).cast("int")
        return b

    binned = rfm.crossJoin(F.broadcast(bounds)).select(
        (
            _bin("rec_days", "qr") * 100
            + _bin("freq", "qf") * 10
            + _bin("mon_cents", "qm")
        ).cast("int").alias("segment"),
        "mon_cents",
    )
    return (
        binned.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("mon_cents") / 100.0, 2).alias("total_monetary"),
        )
        .orderBy("segment")
    )


# ---- X140: Kaplan-Meier survival -------------------------------------


@declared_query(
    "kaplan_meier_signup_purchase",
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
        SELECT s.user_id,
               CASE WHEN p.p_ts IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(p.p_ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST((SELECT study_end FROM study)
                                        AS DATE))
               END AS dur_day,
               CAST(p.p_ts IS NOT NULL AS BIGINT) AS observed
        FROM signup s LEFT JOIN first_purchase p ON s.user_id = p.user_id
    ), grid AS (
        SELECT dur_day,
               CAST(SUM(observed) AS BIGINT) AS n_events,
               CAST(SUM(1 - observed) AS BIGINT) AS n_censored
        FROM durations GROUP BY dur_day
    ), risk AS (
        SELECT dur_day, n_events, n_censored,
               SUM(n_events + n_censored) OVER (
                   ORDER BY dur_day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_risk
        FROM grid
    ), factors AS (
        SELECT dur_day, n_events, n_censored, n_risk,
               list(1.0 - CAST(n_events AS DOUBLE) / n_risk) OVER (
                   ORDER BY dur_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS fs
        FROM risk
    )
    SELECT CAST(dur_day AS BIGINT) AS dur_day,
           CAST(n_risk AS BIGINT) AS n_risk,
           n_events, n_censored,
           CAST(ROUND(list_reduce(fs, (a, x) -> a * x), 6) AS DOUBLE)
               AS survival
    FROM factors
    ORDER BY dur_day
    """,
)
def kaplan_meier_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140: Kaplan-Meier product-limit estimator of time from signup
    to first purchase, right-censored at study end (the last event in
    the log) — the survival/conversion-lag curve a growth team reads,
    and the same estimator that models document-retention or
    crawl-revisit lifetimes. S(t) = prod_{u<=t} (1 - d_u / n_u) with
    n_u the at-risk count (computed as a REVERSE cumulative sum —
    exact integers) and d_u the observed conversions at day u.

    The survival product is an ORDERED FOLD over the cumulative
    factor list (the X121 EWMA shape): both engines build the list in
    duration-day order and fold left-to-right over identical doubles,
    so the product is bit-identical — no pow/exp-ln tricks. Event
    volume reduces in per-user MIN aggregates; every window runs over
    the bounded duration-day grid."""
    ev = load_table(spark, sf_dir, "events")
    study = ev.agg(F.max("ts").alias("study_end"))
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    durations = (
        signup.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(study))
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(
                    F.col("p_ts").cast("date"), F.col("s_ts").cast("date")
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
        F.sum("observed").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("observed")).cast("bigint").alias("n_censored"),
    )
    w_rev = Window.orderBy("dur_day").rowsBetween(
        0, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("dur_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = grid.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_rev),
    )
    factors = risk.withColumn(
        "fs",
        F.collect_list(
            1.0 - F.col("n_events").cast("double") / F.col("n_risk")
        ).over(w_cum),
    )
    survival = F.aggregate(
        F.slice(F.col("fs"), 2, F.size("fs") - 1),
        F.element_at("fs", 1),
        lambda a, x: a * x,
    )
    return factors.select(
        F.col("dur_day").cast("bigint").alias("dur_day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "n_events",
        "n_censored",
        F.round(survival, 6).alias("survival"),
    ).orderBy("dur_day")


# ---- X141: quantile normalization onto the pooled distribution -------

_QN_GRID = [i / 100 for i in range(101)]


@declared_query(
    "quantile_normalize_doclen",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, CAST(len({_O_TOK}) AS BIGINT) AS n_tok
        FROM documents
    ), grid AS (
        SELECT quantile_cont(n_tok,
               [{", ".join(str(p) for p in _QN_GRID)}]) AS g
        FROM toks
    ), ranked AS (
        SELECT doc_id, source, n_tok,
               percent_rank() OVER (PARTITION BY source
                                    ORDER BY n_tok, doc_id) AS pr
        FROM toks
    ), interp AS (
        SELECT doc_id, source, n_tok, pr,
               LEAST(CAST(floor(pr * 100) AS INTEGER), 99) AS i
        FROM ranked
    )
    SELECT doc_id, source, n_tok,
           CAST(ROUND(pr, 6) AS DOUBLE) AS pct_rank,
           CAST(ROUND(
               (SELECT g FROM grid)[i + 1] * (1.0 - (pr * 100 - i))
               + (SELECT g FROM grid)[i + 2] * (pr * 100 - i), 6)
               AS DOUBLE) AS norm_len
    FROM interp
    ORDER BY doc_id
    """,
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X141: quantile normalization of document lengths ACROSS corpus
    sources — each doc's token count is mapped to the pooled corpus
    length distribution at its within-source percent rank, so every
    source's length profile becomes comparable (the harmonization step
    before mixing sources with different length physics into one
    training mix; genomics calls the equal-size variant quantile
    normalization).

    The pooled distribution is a 101-point exact interpolated
    percentile grid from ONE array-argument aggregate, broadcast; the
    per-doc map is percent_rank (exact rational (rank-1)/(n-1), total
    (n_tok, doc_id) tie order) -> linear interpolation between
    adjacent grid points — identical double arithmetic on both
    engines, rounded to 6. The only window is partitioned by source
    over the doc relation; no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
    )
    grid = toks.agg(
        F.expr(
            "percentile(n_tok, array("
            + ", ".join(str(p) for p in _QN_GRID)
            + "))"
        ).alias("g")
    )
    ranked = toks.withColumn(
        "pr",
        F.percent_rank().over(
            Window.partitionBy("source").orderBy("n_tok", "doc_id")
        ),
    )
    i = F.least(F.floor(F.col("pr") * 100).cast("int"), F.lit(99))
    frac = F.col("pr") * 100 - i
    norm = F.element_at(F.col("g"), i + 1) * (1.0 - frac) + F.element_at(
        F.col("g"), i + 2
    ) * frac
    return (
        ranked.crossJoin(F.broadcast(grid))
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.round("pr", 6).alias("pct_rank"),
            F.round(norm, 6).alias("norm_len"),
        )
        .orderBy("doc_id")
    )


# ---- X142: pairwise Jensen-Shannon divergence ------------------------


@declared_query(
    "js_divergence_lang_pairs",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest({_O_TOK}) AS token FROM documents
    ), cnt AS (
        SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY lang, token
    ), tot AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY lang
    ), vocab AS (SELECT DISTINCT token FROM cnt),
    grid AS (
        SELECT v.token, l.lang, l.t,
               COALESCE(c.c, 0) AS c
        FROM vocab v
        CROSS JOIN tot l
        LEFT JOIN cnt c ON c.token = v.token AND c.lang = l.lang
    ), pairs AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               CAST(a.c AS DOUBLE) / a.t AS p,
               CAST(b.c AS DOUBLE) / b.t AS q
        FROM grid a JOIN grid b
          ON a.token = b.token AND a.lang < b.lang
    )
    SELECT lang_a, lang_b,
           CAST(ROUND(CAST(SUM(CAST(
               0.5 * (CASE WHEN p > 0
                           THEN p * ln(p / ((p + q) / 2)) ELSE 0 END
                    + CASE WHEN q > 0
                           THEN q * ln(q / ((p + q) / 2)) ELSE 0 END)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS jsd,
           CAST(SUM(CAST(p > 0 AND q > 0 AS INTEGER)) AS BIGINT)
               AS n_shared_tokens
    FROM pairs
    GROUP BY lang_a, lang_b
    ORDER BY lang_a, lang_b
    """,
)
def js_divergence_lang_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142: pairwise Jensen-Shannon divergence between per-language
    unigram distributions — the symmetric, bounded ([0, ln 2])
    distribution distance a corpus-mix audit uses to quantify how far
    apart two slices' token statistics are (X94's PSI bins one numeric
    column; JSD compares whole discrete distributions).

    The token stream reduces in ONE combinable (lang, token) count;
    everything after runs on the BOUNDED vocab x langs grid (vocab is
    Heaps-law sublinear; the full grid makes the tokens-missing-from-
    one-language terms explicit instead of silently dropping them in
    an inner join). Probabilities divide exact BIGINTs; each token's
    JSD contribution is staged to DECIMAL(28,12) before the order-free
    sum (the X96/X132 ln-term discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t"))
    vocab = cnt.select("token").distinct()
    grid = (
        vocab.crossJoin(F.broadcast(tot))
        .join(cnt, ["token", "lang"], "left")
        .select(
            "token", "lang", "t", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    a, b = grid.alias("a"), grid.alias("b")
    pairs = a.join(
        b,
        (F.col("a.token") == F.col("b.token"))
        & (F.col("a.lang") < F.col("b.lang")),
    ).select(
        F.col("a.lang").alias("lang_a"),
        F.col("b.lang").alias("lang_b"),
        (F.col("a.c").cast("double") / F.col("a.t")).alias("p"),
        (F.col("b.c").cast("double") / F.col("b.t")).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2
    term = (
        0.5
        * (
            F.when(p > 0, p * F.log(p / m)).otherwise(0.0)
            + F.when(q > 0, q * F.log(q / m)).otherwise(0.0)
        )
    ).cast("decimal(28,12)")
    return (
        pairs.groupBy("lang_a", "lang_b")
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("jsd"),
            F.sum(((p > 0) & (q > 0)).cast("int"))
            .cast("bigint")
            .alias("n_shared_tokens"),
        )
        .orderBy("lang_a", "lang_b")
    )


# ---- X143: dynamic-gap sessionization --------------------------------

_GAP_SHORT, _GAP_LONG = "4 hours", "12 hours"


@declared_query(
    "dynamic_gap_sessions",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, ts, value,
               ts + CASE WHEN event_type IN ('click', 'view')
                         THEN INTERVAL 4 HOUR
                         ELSE INTERVAL 12 HOUR END AS ev_end
        FROM events
    ), seq AS (
        SELECT user_id, ts, ev_end, value,
               CASE WHEN MAX(ev_end) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) IS NULL
                      OR ts >= MAX(ev_end) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
    ), tagged AS (
        SELECT user_id, ts, ev_end, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, ev_end
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
        FROM seq
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ev_end) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {o_sum_dec("value")} AS sum_value
    FROM tagged
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_start
    """,
)
def dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143: sessionization where each EVENT carries its own
    inactivity gap — engaged interaction types (click/view) time out
    after 4 hours, heavyweight ones (purchase/signup/error) hold the
    session open 12 hours. This is Spark's DYNAMIC-GAP
    ``session_window`` (the gap is a per-row column, a surface the
    fixed-gap ST3 sessionizer can't express); sessions are the
    interval-union semantics: each event spans [ts, ts+gap) and
    overlapping spans merge, so session_end = max per-event end, and
    an event landing exactly ON the running end starts a NEW session
    (half-open intervals).

    The DuckDB twin is the islands rewrite: new-session flag when ts
    >= running MAX of previous events' ends (a plain gaps-and-islands
    can only compare to the PREVIOUS ROW's end and merges differently
    when a long-gap event swallows later short-gap ones). One shuffle
    on user_id serves the window and the session rollup; values sum
    through the exact-decimal cents discipline."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("click", "view"), _GAP_SHORT
    ).otherwise(_GAP_LONG)
    return (
        ev.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            sum_dec("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )
