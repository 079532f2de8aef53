"""Statistical-profiling declared queries (round 6, seventh batch —
[north-star] scope): the audits an engine operator and a corpus
scientist run BEFORE committing to a physical plan or a training mix.

  * ``join_key_skew_audit`` (X144) — per candidate shuffle key, the
    skew report that decides salting/AQE-split: key cardinality, max
    and p99 per-key counts, top-1 share, max/mean skew ratio.
  * ``zipf_rank_frequency`` (X145) — Zipf power-law fit over the
    rank-frequency curve: least squares on (ln rank, ln freq) with
    DECIMAL-staged sufficient statistics (order-free sums).
  * ``vocab_growth_heaps`` (X146) — Heaps-law vocabulary growth curve
    at 100 corpus-prefix checkpoints (new-token first occurrences
    bucketed, then one bounded cumulative window).
  * ``markov_entropy_rate`` (X147) — per-state conditional entropy and
    stationary share of the X106 event-type Markov chain (the
    sequence-predictability profile).
  * ``lead_lag_xcorr`` (X148) — cross-correlation of daily click vs
    purchase counts at lags -7..+7 with the argmax lag flagged on the
    ROUNDED statistic (lead-lag detection).

Determinism: skew/count statistics are exact integers; both power-law
fits stage ln terms to DECIMAL before order-free sums (the X96/X132
discipline, with scales sized so decimal products stay inside
precision 38); entropy terms stage to DECIMAL(28,12); cross-
correlation uses DECIMAL(38,0) power sums over BIGINT daily counts
and flags the best lag on the rounded value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import tokens
from .registry import declared_query
from .text_queries import _O_TOK

# ---- X144: join-key skew audit ---------------------------------------


@declared_query(
    "join_key_skew_audit",
    oracle="""
    WITH keyed AS (
        SELECT 'l_orderkey' AS key_name, l_orderkey AS key FROM lineitem
        UNION ALL
        SELECT 'l_partkey', l_partkey FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', l_suppkey FROM lineitem
    ), cnt AS (
        SELECT key_name, key, CAST(COUNT(*) AS BIGINT) AS c
        FROM keyed GROUP BY key_name, key
    )
    SELECT key_name,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           CAST(ROUND(quantile_cont(c, 0.99), 6) AS DOUBLE)
               AS p99_key_rows,
           CAST(ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS DOUBLE)
               AS top1_share,
           CAST(ROUND(CAST(MAX(c) AS DOUBLE)
                      / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6) AS DOUBLE)
               AS skew_ratio
    FROM cnt
    GROUP BY key_name
    ORDER BY key_name
    """,
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X144: shuffle-key skew audit over the fact table's three join
    keys — the report that decides WHICH key needs salting (X25), an
    AQE skew split (X75), or a broadcast instead of a shuffle: per
    key, cardinality, the hottest key's row count, the p99 per-key
    count, the hottest key's share of all rows, and max/mean skew
    ratio. This is the operator-facing face of the scale story: the
    audit itself is one stack pass -> one combinable (key_name, key)
    count -> one per-key_name rollup, all exact integers until the
    two final ratios (identical operands, rounded 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.expr(
            "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, "
            "'l_suppkey', l_suppkey) AS (key_name, key)"
        )
    )
    cnt = keyed.groupBy("key_name", "key").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        cnt.groupBy("key_name")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_key_rows"),
            F.round(F.expr("percentile(c, 0.99)"), 6).alias("p99_key_rows"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "top1_share"
            ),
            F.round(
                F.max("c").cast("double")
                / (F.sum("c").cast("double") / F.count(F.lit(1))),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy("key_name")
    )


# ---- X145: Zipf rank-frequency power-law fit -------------------------


@declared_query(
    "zipf_rank_frequency",
    oracle=f"""
    WITH uni AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_O_TOK}) AS token FROM documents)
        GROUP BY token
    ), ranked AS (
        SELECT CAST(ROUND(ln(row_number() OVER
                              (ORDER BY freq DESC, token)), 9)
                    AS DECIMAL(18,9)) AS lx,
               CAST(ROUND(ln(freq), 9) AS DECIMAL(18,9)) AS ly
        FROM uni
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(lx) AS sx, SUM(ly) AS sy,
               SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx,
               SUM(ly * ly) AS syy
        FROM ranked
    )
    SELECT n AS n_vocab,
           CAST(ROUND((n * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                AS DOUBLE) AS zipf_slope,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - ROUND((n * CAST(sxy AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                               / (n * CAST(sxx AS DOUBLE)
                                  - CAST(sx AS DOUBLE)
                                    * CAST(sx AS DOUBLE)), 6)
                         * CAST(sx AS DOUBLE)) / n, 6) AS DOUBLE)
               AS intercept
    FROM sums
    """,
)
def zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X145: Zipf power-law fit of the corpus rank-frequency curve —
    ln(freq) regressed on ln(rank): the slope (~-1 on natural text)
    is the canonical corpus-health statistic (a flat slope flags
    template spam, a cliff flags truncated vocab). Mechanics follow
    X99's exact-sufficient-statistics discipline, adapted for ln
    inputs: each (ln rank, ln freq) pair is ROUNDED TO 9 and staged
    to DECIMAL(18,9) — products then occupy DECIMAL(38,18) exactly,
    so all five sums are order-free — and the closed-form slope/
    intercept is one shared IEEE expression on identical operands
    (the intercept reuses the ROUNDED slope, X99's rule). The rank
    window runs over the VOCAB relation (Heaps-law sublinear); the
    token stream reduces in the count aggregate below it."""
    docs = load_table(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    ranked = uni.select(
        F.round(
            F.log(
                F.row_number()
                .over(Window.orderBy(F.desc("freq"), F.asc("token")))
                .cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("lx"),
        F.round(F.log(F.col("freq").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("ly"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    slope = F.round(
        (nd * F.col("sxy").cast("double") - sxd * syd)
        / (nd * F.col("sxx").cast("double") - sxd * sxd),
        6,
    )
    return sums.select(
        F.col("n").alias("n_vocab"),
        slope.alias("zipf_slope"),
        F.round((syd - slope * sxd) / nd, 6).alias("intercept"),
    )


# ---- X146: Heaps vocabulary growth curve -----------------------------

_HEAPS_BUCKETS = 100


@declared_query(
    "vocab_growth_heaps",
    oracle=f"""
    WITH ids AS (
        SELECT MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM documents
    ), first_seen AS (
        SELECT token, MIN(doc_id) AS first_doc
        FROM (SELECT doc_id, unnest({_O_TOK}) AS token FROM documents)
        GROUP BY token
    ), tok_b AS (
        SELECT CAST(floor(({_HEAPS_BUCKETS} * (first_doc
                      - (SELECT min_id FROM ids)))
                    / ((SELECT max_id FROM ids)
                       - (SELECT min_id FROM ids) + 1)) AS INTEGER)
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS new_tokens
        FROM first_seen GROUP BY bucket
    ), doc_b AS (
        SELECT CAST(floor(({_HEAPS_BUCKETS} * (doc_id
                      - (SELECT min_id FROM ids)))
                    / ((SELECT max_id FROM ids)
                       - (SELECT min_id FROM ids) + 1)) AS INTEGER)
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY bucket
    )
    SELECT d.bucket,
           CAST(SUM(d.n_docs) OVER w AS BIGINT) AS docs_cum,
           CAST(SUM(COALESCE(t.new_tokens, 0)) OVER w AS BIGINT)
               AS vocab_cum
    FROM doc_b d LEFT JOIN tok_b t ON d.bucket = t.bucket
    WINDOW w AS (ORDER BY d.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY d.bucket
    """,
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X146: Heaps-law vocabulary growth curve — distinct-vocabulary
    size after each 1% prefix of the corpus (doc_id order): the
    diminishing-returns readout that sizes tokenizer vocabularies and
    decides when more data stops buying new tokens (the test pins a
    concave, monotone curve and a numpy recompute).

    Scale shape: each token reduces to its FIRST-occurrence doc (one
    combinable min aggregate over the exploded stream), first
    occurrences and doc counts bucket into 100 corpus-prefix bins by
    pure integer arithmetic (bounds broadcast as a 1-row aggregate),
    and the only window is a cumulative sum over the 100-row bucket
    grid. The fact-sized relations never meet a window or a sort."""
    docs = load_table(spark, sf_dir, "documents")
    ids = docs.agg(
        F.min("doc_id").alias("min_id"), F.max("doc_id").alias("max_id")
    )
    span = F.col("max_id") - F.col("min_id") + 1

    def bucket_of(c: F.Column) -> F.Column:
        # floor on BOTH engines: DuckDB's double->int CAST rounds
        # half-to-even while Spark's truncates; floor removes the skew
        return F.floor(
            (_HEAPS_BUCKETS * (c - F.col("min_id"))) / span
        ).cast("int")

    first_seen = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    tok_b = (
        first_seen.crossJoin(F.broadcast(ids))
        .groupBy(bucket_of(F.col("first_doc")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_tokens"))
    )
    doc_b = (
        docs.crossJoin(F.broadcast(ids))
        .groupBy(bucket_of(F.col("doc_id")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        doc_b.join(tok_b, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_docs").over(w).cast("bigint").alias("docs_cum"),
            F.sum(F.coalesce("new_tokens", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
        .orderBy("bucket")
    )


# ---- X147: Markov entropy rate ---------------------------------------


@declared_query(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ), cnt AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnt),
    termed AS (
        SELECT from_type, n,
               CAST(-(CAST(n AS DOUBLE)
                      / SUM(n) OVER (PARTITION BY from_type))
                    * ln(CAST(n AS DOUBLE)
                         / SUM(n) OVER (PARTITION BY from_type))
                    AS DECIMAL(28,12)) AS term
        FROM cnt
    )
    SELECT from_type,
           CAST(SUM(n) AS BIGINT) AS n_out,
           CAST(ROUND(CAST(SUM(n) AS DOUBLE) / (SELECT t FROM tot), 6)
                AS DOUBLE) AS pi,
           CAST(ROUND(CAST(SUM(term) AS DOUBLE), 6) AS DOUBLE) AS h_cond
    FROM termed
    GROUP BY from_type
    ORDER BY from_type
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X147: per-state conditional entropy of the X106 event-type
    Markov chain — how predictable the NEXT event is from each state
    (low entropy states = scripted flows/bots; the chain's entropy
    rate is sum pi * h_cond, pinned in the test). Transitions are
    built with exactly X106's window (total (ts, event_id) order);
    -p ln p terms stage to DECIMAL(28,12) before the order-free sum
    (X96/X132 discipline); pi derives from exact BIGINT counts and
    the 1-row grand total. Everything after the 25-cell count
    aggregate is matrix-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.agg(F.sum("n").cast("bigint").alias("t"))
    row_tot = F.sum("n").over(Window.partitionBy("from_type"))
    p = F.col("n").cast("double") / row_tot
    term = (-p * F.log(p)).cast("decimal(28,12)")
    return (
        cnt.withColumn("term", term)
        .groupBy("from_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_out"),
            F.sum("term").alias("h_dec"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "from_type",
            "n_out",
            F.round(F.col("n_out").cast("double") / F.col("t"), 6).alias(
                "pi"
            ),
            F.round(F.col("h_dec").cast("double"), 6).alias("h_cond"),
        )
        .orderBy("from_type")
    )


# ---- X148: lead-lag cross-correlation --------------------------------

_XCORR_MAX_LAG = 7


@declared_query(
    "lead_lag_xcorr",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(event_type = 'click' AS INTEGER)) AS BIGINT)
                   AS x,
               CAST(SUM(CAST(event_type = 'purchase' AS INTEGER))
                    AS BIGINT) AS y
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY day
    ), lags AS (
        SELECT unnest(generate_series(-{_XCORR_MAX_LAG},
                                      {_XCORR_MAX_LAG})) AS lag
    ), pairs AS (
        SELECT l.lag, a.x, b.y
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
    ), sums AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                   AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                   AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                   AS syy
        FROM pairs GROUP BY lag
    ), scored AS (
        SELECT lag, n,
               CAST(ROUND(CASE
                   WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy
                   THEN NULL
                   ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                           * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               END, 6) AS DOUBLE) AS xcorr
        FROM sums
    )
    SELECT CAST(lag AS INTEGER) AS lag, n AS n_days, xcorr,
           (xcorr = MAX(xcorr) OVER ()) AS is_best
    FROM scored
    ORDER BY lag
    """,
)
def lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X148: lead-lag cross-correlation between daily click and
    purchase counts at lags -7..+7 — does click volume LEAD purchase
    volume, and by how many days? (X137 correlates at lag 0 over a
    rolling frame; this scans the lag axis over the full series.)
    Pearson r per lag from the same exact machinery as X137: BIGINT
    daily counts, DECIMAL(38,0) power sums (order-free, overflow-proof
    at warehouse volume), one closed-form expression on identical
    operands, degenerate lags NULL by rule. The best-lag flag compares
    the ROUNDED statistics so a last-ulp denominator difference can't
    move the argmax. Everything after the daily aggregate runs on the
    (lags x days) grid — bounded by the time dimension."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("bigint")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("y"),
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a")
    b = daily.select(
        F.col("day").alias("b_day"), F.col("y").alias("b_y")
    ).alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b_day")
            == F.date_add(F.col("a.day"), F.col("lag")),
        )
        .select("lag", F.col("a.x").alias("x"), F.col("b_y").alias("y"))
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    xcorr = F.round(
        F.when(
            (n < 2) | (n * sxx == sx * sx) | (n * syy == sy * sy),
            F.lit(None).cast("double"),
        ).otherwise(
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ),
        6,
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = sums.select(
        "lag", F.col("n").alias("n_days"), xcorr.alias("xcorr")
    )
    return scored.select(
        "lag",
        "n_days",
        "xcorr",
        (F.col("xcorr") == F.max("xcorr").over(wall)).alias("is_best"),
    ).orderBy("lag")
