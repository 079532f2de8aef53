"""Curation / evaluation-metrics declared queries (round 6, sixteenth
batch — [north-star] scope): retrieval quality against labeled ground
truth, robust estimation, fraud auditing, inventory classification,
contrastive-training data prep, and session-shape profiling.

  * ``ndcg_label_relevance`` (X197) — NDCG@10 and precision@10 of the
    quantized-dot retrieval against the embedding LABEL ground truth —
    the labeled-eval complement to X192's label-free agreement.
  * ``median_of_means_spend`` (X198) — the heavy-tail-robust mean
    estimator: hash orders into 32 buckets, take the median of the
    bucket means; the estimator concentration theory actually
    recommends when X188-class outliers exist.
  * ``benford_first_digit_audit`` (X199) — first-significant-digit
    distribution of order values vs Benford's law with per-digit
    chi-square terms — the classic books-cooking / synthetic-data
    detector.
  * ``abc_classification_parts`` (X200) — Pareto ABC inventory
    classes (cumulative revenue share 80/95/100) with INTEGER-EXACT
    class boundaries via decimal cross-multiplication.
  * ``negative_sampling_pairs`` (X201) — k deterministic negative
    parts per sampled customer with accidental-positive flags — the
    contrastive-training data prep (the flag, not a silent re-draw,
    is the honest treatment of hash collisions with true positives).
  * ``session_length_histogram`` (X202) — 30-minute-gap sessions
    bucketed by event count — the session-shape profile behind the
    X139/X26 engagement family.

Determinism: ranks, bucket assignments, first digits, class
boundaries, and sampled keys are exact integers (md5 bridge where
randomness is needed); NDCG/Benford weights are shared literal
ladders generated once in Python and pasted into BOTH engines;
means/medians stage round-9 decimals before the order-free reduce.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X197: NDCG against label ground truth ------------------------------

_NDCG_K = 10
# literal weight ladder 1/log2(i+1), identical text on both engines
_NDCG_W = [round(1.0 / math.log2(i + 1), 12) for i in range(1, _NDCG_K + 1)]
_IDCG_PREFIX = [
    round(sum(_NDCG_W[: i + 1]), 12) for i in range(_NDCG_K)
]

_O_W_ROWS = ", ".join(
    f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W)
)
_O_IDCG_CASE = " ".join(
    f"WHEN {i + 1} THEN {v}" for i, v in enumerate(_IDCG_PREFIX)
)


@declared_query(
    "ndcg_label_relevance",
    oracle=f"""
    WITH anchors AS (
        SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        FROM embeddings WHERE vec_id % 100 = 0
    ), dots AS (
        SELECT a.qid, a.qlabel, e.vec_id, e.label,
               CAST(SUM(CAST(ROUND(CAST(e.embedding[d.d] AS DOUBLE)
                                   * 1000000) AS BIGINT)
                        * CAST(ROUND(CAST(a.qe[d.d] AS DOUBLE)
                                     * 1000000) AS BIGINT))
                    AS BIGINT) AS dot
        FROM embeddings e
        JOIN anchors a ON e.vec_id <> a.qid
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) d
        GROUP BY a.qid, a.qlabel, e.vec_id, e.label
    ), ranked AS (
        SELECT qid, qlabel, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dot DESC, vec_id) AS r
        FROM dots
        QUALIFY r <= {_NDCG_K}
    ), w(r, wt) AS (VALUES {_O_W_ROWS}),
    rel_corpus AS (
        SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_relevant
        FROM anchors a JOIN embeddings e
          ON e.label = a.qlabel AND e.vec_id <> a.qid
        GROUP BY a.qid
    ), dcg AS (
        SELECT r2.qid,
               CAST(SUM(CASE WHEN r2.label = r2.qlabel THEN w.wt
                        ELSE 0 END) AS DOUBLE) AS dcg,
               CAST(SUM(CAST(r2.label = r2.qlabel AS BIGINT))
                    AS BIGINT) AS n_hits
        FROM ranked r2 JOIN w ON w.r = r2.r
        GROUP BY r2.qid
    )
    SELECT d.qid AS query_vec, rc.n_relevant, d.n_hits,
           CAST(ROUND(CAST(d.n_hits AS DOUBLE) / {_NDCG_K}, 6)
                AS DOUBLE) AS precision_at_k,
           CAST(ROUND(d.dcg / (CASE LEAST(rc.n_relevant,
                                          CAST({_NDCG_K} AS BIGINT))
                               {_O_IDCG_CASE} END), 6) AS DOUBLE)
               AS ndcg_at_k
    FROM dcg d JOIN rel_corpus rc ON d.qid = rc.qid
    ORDER BY query_vec
    """,
)
def ndcg_label_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X197: NDCG@10 and precision@10 of quantized-dot retrieval,
    scored against the embedding LABEL column as ground truth (a
    candidate is relevant iff it shares the query's label) — the
    labeled retrieval-quality gate (X192 measures two rankers'
    agreement without labels; this measures whether the ranker is
    RIGHT). One row per anchor query (vec_id % 100 = 0).

    Determinism: dots are exact integers on the X173 grid; the
    1/log2(i+1) weight ladder and the IDCG prefix table are literal
    constants generated once and pasted into BOTH engines, so no
    engine ever evaluates a log; ndcg/precision are single divisions
    rounded 6. Scale: the per-anchor ranking is a partitioned window
    over the anchor-bounded candidate fan-out; at production scale the
    candidate stage swaps for X37 IVF retrieval with the same scoring
    on top."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    # In-row quantized dot (zip_with + aggregate): the candidate x anchor
    # pair space is quadratic, so emitting 64 per-dimension rows per pair
    # into a groupBy shuffled two orders of magnitude more rows than the
    # result has (the shape mutual_best_match was cured of) — 10x probe
    # 170 s. The fold is the same exact BIGINT sum in evaluation order,
    # and order is irrelevant for exact integers. 10x probe after: the
    # heavy stage is a shuffle-free map over the pair relation.
    # coalesce(product, 0) (ADVICE r9): zip_with null-pads ragged
    # arrays and acc + null would poison the whole dot; skipping the
    # null term instead is exactly what the oracle's SUM does.
    qdot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qe"),
            lambda x, y: F.coalesce(
                F.round(x.cast("double") * 1000000, 0).cast("bigint")
                * F.round(y.cast("double") * 1000000, 0).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    # The embeddings fixture scans as ~1 small file, so the broadcast
    # join (and every pair's dot) would otherwise run on ONE task;
    # spread candidates first (partitioning-neutral — the anchor side
    # is broadcast, so any candidate layout joins identically, and a
    # real cluster's scan parallelism gives this for free).
    dots = (
        emb.repartition(F.col("vec_id"))
        .join(F.broadcast(anchors), F.col("vec_id") != F.col("qid"))
        .select("qid", "qlabel", "vec_id", "label", qdot.alias("dot"))
    )
    ranked = (
        dots.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("dot"), F.asc("vec_id")
                )
            ),
        )
        .where(F.col("r") <= _NDCG_K)
    )
    wt = F.element_at(
        F.array(*[F.lit(w) for w in _NDCG_W]), F.col("r")
    )
    dcg = ranked.groupBy("qid", "qlabel").agg(
        F.sum(
            F.when(F.col("label") == F.col("qlabel"), wt).otherwise(0.0)
        ).alias("dcg"),
        F.sum((F.col("label") == F.col("qlabel")).cast("bigint"))
        .cast("bigint")
        .alias("n_hits"),
    )
    rel = (
        emb.join(
            F.broadcast(anchors.select("qid", "qlabel")),
            (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_relevant"))
    )
    idcg = F.element_at(
        F.array(*[F.lit(v) for v in _IDCG_PREFIX]),
        F.least(F.col("n_relevant"), F.lit(_NDCG_K))
        .cast("int"),
    )
    return (
        dcg.join(rel, "qid")
        .select(
            F.col("qid").alias("query_vec"),
            "n_relevant",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / _NDCG_K, 6).alias(
                "precision_at_k"
            ),
            F.round(F.col("dcg") / idcg, 6).alias("ndcg_at_k"),
        )
        .orderBy("query_vec")
    )


# ---- X198: median of means ----------------------------------------------

_MOM_B = 32


@declared_query(
    "median_of_means_spend",
    oracle=f"""
    WITH bucketed AS (
        SELECT (('0x' || substr(md5('mom|' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                % {_MOM_B}) AS b,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), bm AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 9)
                    AS DECIMAL(28,9)) AS mean9
        FROM bucketed GROUP BY b
    )
    SELECT CAST({_MOM_B} AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           CAST(ROUND((SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*)
                       FROM bucketed) / 100, 6) AS DOUBLE)
               AS plain_mean,
           CAST(ROUND(quantile_cont(CAST(mean9 AS DOUBLE), 0.5) / 100,
                      6) AS DOUBLE) AS median_of_means
    FROM bm
    """,
)
def median_of_means_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X198: median-of-means estimate of mean order value — orders
    hash into 32 buckets (md5 bridge), each bucket's mean is computed,
    and the estimator is the MEDIAN of the bucket means. The
    sub-Gaussian-concentration robust mean for heavy-tailed data: a
    single wild order corrupts at most one bucket mean and the median
    shrugs it off, where the plain mean moves by outlier/n. Reported
    next to the plain mean — the gap IS the heavy-tail diagnostic.

    Determinism: bucket assignment is the md5 bridge; each bucket mean
    is ONE division of exact integers rounded 9 and DECIMAL-staged;
    the median interpolates over the 32-row bucket relation (shared
    definition), rounded 6. Scale: one combinable two-level aggregate;
    everything after runs on 32 rows."""
    o = load_table(spark, sf_dir, "orders")
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("mom|"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _MOM_B
    )
    bucketed = o.select(
        b.alias("b"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    bm = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("cents").cast("double") / F.count(F.lit(1)), 9)
        .cast("decimal(28,9)")
        .alias("mean9"),
    )
    plain = bucketed.agg(
        F.round(
            F.sum("cents").cast("double") / F.count(F.lit(1)) / 100, 6
        ).alias("plain_mean")
    )
    return (
        bm.agg(
            F.lit(_MOM_B).cast("bigint").alias("n_buckets"),
            F.sum("n").cast("bigint").alias("n_orders"),
            F.round(
                F.expr("percentile(CAST(mean9 AS DOUBLE), 0.5)") / 100,
                6,
            ).alias("median_of_means"),
        )
        .crossJoin(F.broadcast(plain))
        .select(
            "n_buckets", "n_orders", "plain_mean", "median_of_means"
        )
    )


# ---- X199: Benford first-digit audit ------------------------------------

_BENFORD_P = [round(math.log10(1 + 1 / d), 12) for d in range(1, 10)]
_O_BENFORD_CASE = " ".join(
    f"WHEN {d + 1} THEN {p}" for d, p in enumerate(_BENFORD_P)
)


@declared_query(
    "benford_first_digit_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100)
                                     AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit
        FROM orders
    ), counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM digits GROUP BY digit
    ), tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts)
    SELECT c.digit, c.n_obs,
           CAST(ROUND(CAST(c.n_obs AS DOUBLE)
                      / (SELECT n FROM tot), 6) AS DOUBLE) AS obs_share,
           CAST(CASE c.digit {_O_BENFORD_CASE} END AS DOUBLE)
               AS benford_p,
           CAST(ROUND(
               (c.n_obs - (SELECT n FROM tot)
                          * CASE c.digit {_O_BENFORD_CASE} END)
               * (c.n_obs - (SELECT n FROM tot)
                            * CASE c.digit {_O_BENFORD_CASE} END)
               / ((SELECT n FROM tot)
                  * CASE c.digit {_O_BENFORD_CASE} END), 6)
                AS DOUBLE) AS chi2_term
    FROM counts c ORDER BY c.digit
    """,
)
def benford_first_digit_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X199: Benford's-law first-significant-digit audit of order
    values — observed digit shares vs log10(1 + 1/d) with per-digit
    chi-square contributions. The classic fabricated-numbers detector
    (cooked books, synthetic rows, unit-conversion bugs all break
    Benford); on TPC-H-style uniform prices the law FAILS LOUDLY,
    which is itself the fixture's honest readout — uniform generators
    are exactly what the audit exists to flag.

    Determinism: first digit via string head of the exact cents BIGINT
    (identical on both engines); the Benford probabilities are one
    literal ladder pasted into both engines; shares and chi-square
    terms are divisions of exact counts by literal-scaled totals,
    rounded 6. Scale: one combinable count; 9 output rows."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    tot = counts.agg(F.sum("n_obs").cast("bigint").alias("n"))
    p = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_P]), F.col("digit")
    )
    exp = F.col("n") * p
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "obs_share"
            ),
            p.alias("benford_p"),
            F.round(
                (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---- X200: ABC inventory classification ---------------------------------


@declared_query(
    "abc_classification_parts",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rv
        FROM lineitem GROUP BY 1
    ), ranked AS (
        SELECT l_partkey, rv,
               SUM(rv) OVER (ORDER BY rv DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(rv) OVER () AS total
        FROM rev
    ), classed AS (
        SELECT l_partkey, rv,
               CASE WHEN 5 * cum <= 4 * total THEN 'A'
                    WHEN 20 * cum <= 19 * total THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(rv) * 100, 0) AS BIGINT) AS revenue_cents,
           CAST(ROUND(CAST(SUM(rv) AS DOUBLE)
                      / (SELECT CAST(SUM(rv) AS DOUBLE) FROM rev), 6)
                AS DOUBLE) AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X200: Pareto ABC inventory classification — parts ranked by
    revenue, class A = the prefix holding the first 80% of cumulative
    revenue, B = to 95%, C = the tail. The inventory-policy workhorse
    (count A daily, C annually), and the corpus-curation analog is
    direct: A-class sources get human review, C-class gets automated
    gates.

    Exactness: revenue is the exact decimal product sum; the class
    boundaries are INTEGER cross-multiplications on exact decimals
    (5*cum <= 4*total, 20*cum <= 19*total) — the rounded share never
    decides a class. Scale: one combinable per-part aggregate; the
    cumulative window runs over the PART dimension (bounded by the
    catalog, whitelisted), not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rv")
    )
    w = Window.orderBy(F.desc("rv"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "rv",
        F.sum("rv").over(w).alias("cum"),
        F.sum("rv").over(wt).alias("total"),
    )
    classed = ranked.select(
        "l_partkey",
        "rv",
        F.when(5 * F.col("cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    total = rev.agg(F.sum("rv").cast("double").alias("t"))
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum("rv") * 100, 0)
            .cast("bigint")
            .alias("revenue_cents"),
            F.sum("rv").cast("double").alias("_rv"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "abc_class",
            "n_parts",
            "revenue_cents",
            F.round(F.col("_rv") / F.col("t"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# ---- X201: deterministic negative sampling -------------------------------

_NEG_K = 4


@declared_query(
    "negative_sampling_pairs",
    oracle=f"""
    WITH pos AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), nparts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS np FROM part
    ), custs AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_custkey % 10 = 0
    ), draws AS (
        SELECT c.o_custkey, i.i AS draw_i,
               (('0x' || substr(md5('neg|' ||
                     CAST(c.o_custkey AS VARCHAR) || '|' ||
                     CAST(i.i AS VARCHAR)), 1, 8))::BIGINT
                % (SELECT np FROM nparts)) AS sampled_partkey
        FROM custs c
        CROSS JOIN (SELECT unnest(generate_series(1, {_NEG_K})) AS i) i
    )
    SELECT d.o_custkey, CAST(d.draw_i AS BIGINT) AS draw_i,
           d.sampled_partkey,
           (p.l_partkey IS NOT NULL) AS is_accidental_positive
    FROM draws d
    LEFT JOIN pos p
      ON p.o_custkey = d.o_custkey AND p.l_partkey = d.sampled_partkey
    ORDER BY d.o_custkey, d.draw_i
    """,
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X201: deterministic negative sampling for contrastive training —
    for each sampled customer (custkey % 10 = 0), k = 4 candidate
    "never-purchased" parts drawn by the md5 bridge over the part-key
    domain, each flagged when the draw ACCIDENTALLY hits a true
    purchase. The two-tower/recommendation training-data primitive,
    with the honest treatment of collision negatives: flag them (so
    the trainer can drop or re-weight) instead of silently re-drawing,
    which would make the sample distribution key-dependent.

    Determinism: draws are pure functions of (customer, i); the
    accidental flag is an equi-join against the exact positive set.
    Scale: positives reduce to the distinct pair relation once; draws
    are |custs| x k rows; the flag join is equi on (cust, part). The
    1-row part-count aggregate broadcasts (whitelisted)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    nparts = p.agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    custs = (
        o.select("o_custkey")
        .where(F.col("o_custkey") % 10 == 0)
        .distinct()
    )
    draws = (
        custs.select(
            "o_custkey",
            F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias(
                "draw_i"
            ),
        )
        .crossJoin(F.broadcast(nparts))
        .select(
            "o_custkey",
            F.col("draw_i").cast("bigint").alias("draw_i"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit("neg"),
                                F.col("o_custkey").cast("string"),
                                F.col("draw_i").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("np")
            ).alias("sampled_partkey"),
        )
    )
    return (
        draws.join(
            pos.withColumnRenamed("l_partkey", "sampled_partkey")
            .withColumn("hit", F.lit(True)),
            ["o_custkey", "sampled_partkey"],
            "left",
        )
        .select(
            "o_custkey",
            "draw_i",
            "sampled_partkey",
            F.coalesce(F.col("hit"), F.lit(False)).alias(
                "is_accidental_positive"
            ),
        )
        .orderBy("o_custkey", "draw_i")
    )


# ---- X202: session length histogram --------------------------------------

_SESSION_GAP_MIN = 30


@declared_query(
    "session_length_histogram",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id
                               ORDER BY ts, event_id)
                         > {_SESSION_GAP_MIN} * 60 * 1000000
                         OR lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), sess AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    ), lens AS (
        SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid
    ), bucketed AS (
        SELECT CASE WHEN n_events = 1 THEN '1'
                    WHEN n_events = 2 THEN '2'
                    WHEN n_events <= 5 THEN '3-5'
                    WHEN n_events <= 10 THEN '6-10'
                    ELSE '11+' END AS bucket,
               n_events
        FROM lens
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X202: session-shape profile — 30-minute-inactivity sessions
    (the gaps-and-islands construction: a session starts where the
    per-user gap exceeds the threshold) bucketed by event count. The
    engagement-depth readout behind bounce-rate (bucket '1'), and the
    distribution a session-window operator (ST3/X143) should be sized
    against.

    Exactness: gaps are exact integer microseconds with the total
    (ts, event_id) tie-break; session ids are exact prefix sums of
    0/1 flags; bucket boundaries are integer comparisons. Scale: two
    windows and one aggregate, all partitioned/keyed by user."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(wo)
    new_s = (
        prev_us.isNull()
        | ((us - prev_us) > _SESSION_GAP_MIN * 60 * 1000000)
    ).cast("int")
    flagged = ev.select(
        "user_id", "ts", "event_id", new_s.alias("new_s")
    )
    sess = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_s")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    lens = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    bucket = (
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") == 2, "2")
        .when(F.col("n_events") <= 5, "3-5")
        .when(F.col("n_events") <= 10, "6-10")
        .otherwise("11+")
    )
    return (
        lens.select(bucket.alias("bucket"), "n_events")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("bucket")
    )
