"""Distributed-ID / experimentation-statistics declared queries (round 6,
ninth batch — [north-star] scope): the inference layer an analytics
engine needs once metrics exist — stable dense IDs, annotation
agreement, resampling-based uncertainty, variance-reduced A/B readouts,
and the training-batch assembly that consumes the corpus.

  * ``surrogate_keys_dense`` (X155) — dense, gap-free, deterministic
    1..N surrogate keys WITHOUT a global sort: the two-phase shard-count
    /offset rank (operators/ranks.py), the scale-safe replacement for
    both ``monotonically_increasing_id`` (not dense, not stable) and an
    unpartitioned ``row_number`` (single-task).
  * ``rater_agreement_kappa`` (X156) — Cohen's kappa between two
    rule-based document raters (a length gate and a lexical-diversity
    gate); the confusion matrix and kappa from exact BIGINTs in ONE
    aggregate pass.
  * ``poisson_bootstrap_ci`` (X157) — percentile CI for the mean daily
    click count via the POISSON bootstrap — the resampling scheme that
    works on distributed data because each (row, replicate) weight is an
    independent Poisson(1) draw, here a pure function of
    md5(day, replicate) so both engines draw identical weights.
  * ``jackknife_ratio_variance`` (X158) — delete-one-group jackknife
    standard error for the purchases-per-click ratio (the classic
    estimator for ratio metrics where per-row CLT doesn't apply).
  * ``cuped_adjusted_lift`` (X159) — CUPED variance reduction for an
    A/B readout: pre-period spend as the covariate, pooled-theta
    adjustment, per-arm raw vs adjusted means and the realized variance
    reduction.
  * ``length_bucket_batches`` (X160) — length-bucketed training-batch
    assembly: docs bucketed to power-of-two padded lengths, sequenced
    within bucket by the same two-phase rank, fixed token budget per
    batch, per-batch padding utilization.

Determinism: kappa/bootstrap weights/jackknife counts are exact integer
arithmetic to the last division; every ln/ratio-derived double is
rounded-9 and DECIMAL-staged before any order-free sum (the X137/X145
discipline); percentile() vs quantile_cont share the interpolation
convention on DOUBLE input with ROUND(..,6) absorbing last-ulp skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.ranks import two_phase_row_number
from ..operators.textanalysis import tokens
from .registry import declared_query
from .text_queries import _O_TOK

# ---- X155: dense surrogate keys without a global sort ----------------


@declared_query(
    "surrogate_keys_dense",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY source, doc_id) AS BIGINT)
               AS sk
    FROM documents
    ORDER BY sk
    """,
)
def surrogate_keys_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X155: dense gap-free surrogate keys 1..N ordered by
    (source, doc_id), assigned by the two-phase rank
    (operators/ranks.py): per-shard counts -> tiny offset relation ->
    within-shard row_number. The oracle IS the naive single-task
    ``row_number() OVER (ORDER BY ...)`` — the point of the test is that
    the distributed plan reproduces it exactly.

    Scale: shard = (source, doc_id DIV 4096) is monotone in the target
    order, so correctness is by construction; the only unpartitioned
    window runs over the n/4096-row shard-count relation (whitelisted),
    and data rows see one partitioned window + one broadcast join. This
    is the zipWithIndex pattern without leaving the DataFrame API."""
    docs = load_table(spark, sf_dir, "documents")
    shard = F.struct(
        F.col("source"), F.expr("doc_id DIV 4096").alias("blk")
    )
    ranked = two_phase_row_number(
        docs.select("doc_id", "source"),
        shard=shard,
        order_cols=["source", "doc_id"],
        out_col="sk",
    )
    return ranked.select("doc_id", "source", "sk").orderBy("sk")


# ---- X156: Cohen's kappa between two rule raters ---------------------


@declared_query(
    "rater_agreement_kappa",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len({_O_TOK}) AS wc,
               len(list_distinct({_O_TOK})) AS dc
        FROM documents
    ), lab AS (
        SELECT (wc BETWEEN 30 AND 80) AS a,
               (dc * 100 >= 45 * wc) AS b
        FROM t
    ), cm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n11,
               CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
        FROM lab
    )
    SELECT n, n11, n10, n01, n00,
           CAST(ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS DOUBLE)
               AS po,
           CAST(ROUND(CAST((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)
                           AS DOUBLE) / (n*n), 6) AS DOUBLE) AS pe,
           CAST(ROUND(CAST(n*(n11+n00)
                           - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
                           AS DOUBLE)
                      / (n*n - ((n11+n10)*(n11+n01)
                                + (n01+n00)*(n10+n00))), 6)
                AS DOUBLE) AS kappa
    FROM cm
    """,
)
def rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X156: Cohen's kappa between two deterministic document raters —
    rater A accepts word counts in [30, 80] (a length gate), rater B
    accepts lexical diversity distinct/total >= 0.45 (integer
    cross-multiplied). The shape of every annotation-quality audit: how
    much do two labelers agree beyond chance?

    Exactness: the confusion matrix is four BIGINT counts from ONE
    combinable aggregate pass; kappa = (po-pe)/(1-pe) is algebraically
    lifted to a single division of exact BIGINTs,
    (n·(n11+n00) − Σ marginal products) / (n² − Σ marginal products) —
    no intermediate float ever exists. Scale: one scan, one 1-row
    aggregate, nothing else."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.size(tokens("text")).alias("wc"),
        F.size(F.array_distinct(tokens("text"))).alias("dc"),
    )
    lab = t.select(
        F.col("wc").between(30, 80).alias("a"),
        (F.col("dc") * 100 >= 45 * F.col("wc")).alias("b"),
    )
    cm = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("a") & F.col("b")).cast("bigint")).alias("n11"),
        F.sum((F.col("a") & ~F.col("b")).cast("bigint")).alias("n10"),
        F.sum((~F.col("a") & F.col("b")).cast("bigint")).alias("n01"),
        F.sum((~F.col("a") & ~F.col("b")).cast("bigint")).alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return cm.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(
            (F.col("n11") + F.col("n00")).cast("double") / F.col("n"), 6
        ).alias("po"),
        F.round(
            pe_num.cast("double") / (F.col("n") * F.col("n")), 6
        ).alias("pe"),
        F.round(
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe_num).cast(
                "double"
            )
            / (F.col("n") * F.col("n") - pe_num),
            6,
        ).alias("kappa"),
    )


# ---- X157: Poisson-bootstrap confidence interval ---------------------

# Poisson(1) inverse CDF at 1/10000 resolution: cumulative e^{-1}/k!
# thresholds scaled by 10^4. Identical literal ladder on both engines.
_POIS = [3679, 7358, 9197, 9810, 9963, 9994, 9999]

_O_POIS = " ".join(
    f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS)
)


@declared_query(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6)
                    AS DOUBLE) AS est_mean
        FROM daily
    ), drawn AS (
        SELECT b, cnt,
               CASE {_O_POIS} ELSE 7 END AS w
        FROM daily
        CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS b) r
        CROSS JOIN LATERAL (
            SELECT (('0x' || substr(md5(CAST(d AS VARCHAR) || '|'
                     || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 10000) AS u
        ) h
    ), reps AS (
        SELECT b,
               CAST(ROUND(CAST(SUM(w * cnt) AS DOUBLE) / SUM(w), 9)
                    AS DOUBLE) AS mean_b
        FROM drawn GROUP BY b HAVING SUM(w) > 0
    ), ci AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_boot,
               CAST(ROUND(quantile_cont(mean_b, 0.025), 6) AS DOUBLE)
                   AS ci_lo,
               CAST(ROUND(quantile_cont(mean_b, 0.5), 6) AS DOUBLE)
                   AS ci_med,
               CAST(ROUND(quantile_cont(mean_b, 0.975), 6) AS DOUBLE)
                   AS ci_hi
        FROM reps
    )
    SELECT n_days, est_mean, n_boot, ci_lo, ci_med, ci_hi
    FROM est CROSS JOIN ci
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157: 95% percentile bootstrap CI for the mean daily click count
    via the POISSON bootstrap — the resampling scheme built for
    distributed data: instead of drawing n rows with replacement
    (impossible without a global pass), every (row, replicate) pair gets
    an independent Poisson(1) weight, here the inverse-CDF of a
    deterministic md5(day|replicate) uniform, so the 200 replicates are
    a pure function of the data and BOTH engines draw bit-identical
    weights (the same md5-bridge the sampling family uses).

    Exactness: weights come from an integer threshold ladder at 1/10000
    resolution; each replicate mean is ONE division of two exact BIGINTs
    rounded to 9; the CI is percentile()/quantile_cont (shared
    interpolation convention) rounded to 6. Scale: events reduce to ONE
    ROW PER DAY before the 200x fan-out (explode of a literal sequence —
    in-row, no join), so replicate cost is O(days x B), independent of
    event volume; the two 1-row aggregates meet in a whitelisted
    broadcast cross."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    est = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum("cnt").cast("double") / F.count(F.lit(1)), 6
        ).alias("est_mean"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("d").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    w = F.lit(7)
    for k in range(len(_POIS) - 1, -1, -1):
        w = F.when(F.col("u") < _POIS[k], k).otherwise(w)
    drawn = (
        daily.select(
            "d", "cnt", F.explode(F.sequence(F.lit(1), F.lit(200))).alias("b")
        )
        .withColumn("u", u)
        .withColumn("w", w)
    )
    reps = (
        drawn.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cnt")).cast("bigint").alias("swc"),
            F.sum("w").cast("bigint").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            F.round(
                F.col("swc").cast("double") / F.col("sw"), 9
            ).alias("mean_b")
        )
    )
    ci = reps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boot"),
        F.round(F.expr("percentile(mean_b, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(mean_b, 0.5)"), 6).alias("ci_med"),
        F.round(F.expr("percentile(mean_b, 0.975)"), 6).alias("ci_hi"),
    )
    return est.crossJoin(F.broadcast(ci)).select(
        "n_days", "est_mean", "n_boot", "ci_lo", "ci_med", "ci_hi"
    )


# ---- X158: delete-one-group jackknife for a ratio metric -------------


@declared_query(
    "jackknife_ratio_variance",
    oracle="""
    WITH g AS (
        SELECT user_id % 50 AS grp,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS p,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                        END) AS BIGINT) AS c
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(p) AS BIGINT) AS tp, CAST(SUM(c) AS BIGINT) AS tc,
               CAST(COUNT(*) AS BIGINT) AS ng
        FROM g
    ), theta AS (
        SELECT CAST(ROUND(CAST(tot.tp - g.p AS DOUBLE)
                          / (tot.tc - g.c), 9) AS DECIMAL(18,9)) AS th
        FROM g CROSS JOIN tot
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS ng,
               SUM(th) AS s1,
               SUM(th * th) AS s2
        FROM theta
    )
    SELECT tot.ng AS n_groups, tot.tp AS purchases, tot.tc AS clicks,
           CAST(ROUND(CAST(tot.tp AS DOUBLE) / tot.tc, 6) AS DOUBLE)
               AS theta_hat,
           CAST(ROUND(sqrt(CAST(s.ng - 1 AS DOUBLE) / s.ng
                           * (CAST(s.s2 AS DOUBLE)
                              - CAST(s.s1 AS DOUBLE)
                                * CAST(s.s1 AS DOUBLE) / s.ng)), 6)
                AS DOUBLE) AS se_jack
    FROM tot CROSS JOIN s
    """,
)
def jackknife_ratio_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X158: delete-one-group jackknife standard error for the
    purchases-per-click ratio — the estimator of record for ratio
    metrics, where per-row variance formulas are wrong because numerator
    and denominator covary. Groups are the 50 user_id%50 buckets
    (delete-a-bucket, not delete-a-row, is also what scales: G
    leave-one-out estimates from G partial sums, not n).

    Exactness: each leave-one-out theta_(g) = (P-p_g)/(C-c_g) is ONE
    division of exact BIGINTs rounded to 9 and staged DECIMAL(18,9);
    Σθ and Σθ² accumulate exactly in DECIMAL (order-free); the final
    se = sqrt((G-1)/G · (S2 − S1²/G)) is computed once in double on
    identical operands. Scale: events reduce to the 50-row group
    relation in one combinable pass; everything after is constant-size
    (1-row totals broadcast-crossed, whitelisted)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    g = ev.groupBy((F.col("user_id") % 50).alias("grp")).agg(
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("p"),
        F.sum((F.col("event_type") == "click").cast("bigint")).alias("c"),
    )
    tot = g.agg(
        F.sum("p").cast("bigint").alias("tp"),
        F.sum("c").cast("bigint").alias("tc"),
        F.count(F.lit(1)).cast("bigint").alias("ng"),
    )
    theta = g.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("tp") - F.col("p")).cast("double")
            / (F.col("tc") - F.col("c")),
            9,
        )
        .cast("decimal(18,9)")
        .alias("th"),
        "tp",
        "tc",
        "ng",
    )
    s = theta.groupBy("tp", "tc", "ng").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng2"),
        F.sum("th").alias("s1"),
        F.sum(F.col("th") * F.col("th")).alias("s2"),
    )
    return s.select(
        F.col("ng").alias("n_groups"),
        F.col("tp").alias("purchases"),
        F.col("tc").alias("clicks"),
        F.round(F.col("tp").cast("double") / F.col("tc"), 6).alias(
            "theta_hat"
        ),
        F.round(
            F.sqrt(
                (F.col("ng2") - 1).cast("double")
                / F.col("ng2")
                * (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1").cast("double")
                    / F.col("ng2")
                )
            ),
            6,
        ).alias("se_jack"),
    )


# ---- X159: CUPED variance-reduced A/B lift ---------------------------

_SPLIT = "2024-01-16 00:00:00"


@declared_query(
    "cuped_adjusted_lift",
    oracle=f"""
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{_SPLIT}'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_SPLIT}'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), pool AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(38,0))
                        * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxx
        FROM u
    ), th AS (
        SELECT n,
               CAST(ROUND((n * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (n * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                          9) AS DOUBLE) AS theta,
               CAST(ROUND(CAST(sx AS DOUBLE) / n, 9) AS DOUBLE) AS xbar
        FROM pool
    ), adj AS (
        SELECT u.arm, u.y,
               CAST(ROUND(u.y - th.theta * (u.x - th.xbar), 6)
                    AS DECIMAL(28,12)) AS ya,
               th.theta
        FROM u CROSS JOIN th
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)
                      / COUNT(*), 6) AS DOUBLE) AS mean_y_cents,
           CAST(ROUND(CAST(SUM(ya) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS mean_y_adj,
           CAST(ROUND(MAX(theta), 9) AS DOUBLE) AS theta
    FROM adj GROUP BY arm ORDER BY arm
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X159: CUPED variance-reduced A/B readout — per purchasing user,
    y = post-period purchase cents (after {_SPLIT}), covariate x =
    pre-period cents; arms are the user_id parity split;
    y* = y − θ(x − x̄) with the pooled θ = cov(x,y)/var(x). The
    experimentation-platform primitive: same point estimate in
    expectation, tighter CI, for free from historical data.

    Exactness: x, y are exact cents; the pooled power sums Σx, Σy, Σxy,
    Σx² accumulate in DECIMAL(38,0) (order-free); θ and x̄ are computed
    ONCE in double on identical exact operands and rounded to 9; each
    user's y* rounds to 6 and stages DECIMAL(28,12) before the per-arm
    order-free mean. Scale: one combinable per-user aggregate, a 1-row
    broadcast cross for θ (whitelisted), one 2-row arm aggregate —
    event volume is touched exactly once."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    split = F.lit(_SPLIT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
        .cast("bigint")
        .alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("bigint").alias("arm"), "x", "y"
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    pool = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
    )
    th = pool.select(
        F.round(
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
            9,
        ).alias("theta"),
        F.round(F.col("sx").cast("double") / F.col("n"), 9).alias("xbar"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "arm",
        "y",
        F.round(
            F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar")), 6
        )
        .cast("decimal(28,12)")
        .alias("ya"),
        "theta",
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(
                F.sum(F.col("y").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_y_cents"),
            F.round(
                F.sum("ya").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_y_adj"),
            F.round(F.max("theta"), 9).alias("theta"),
        )
        .orderBy("arm")
    )


# ---- X160: length-bucketed training-batch assembly -------------------

_BUDGET = 1024  # tokens per training batch

# power-of-two padded-length ladder as explicit integer comparisons —
# log2() at exact powers of two is an engine-dependent last-ulp hazard.
_LADDER = [16, 32, 64, 128, 256, 512, 1024]

_O_LADDER = " ".join(f"WHEN wc <= {p} THEN {p}" for p in _LADDER)


@declared_query(
    "length_bucket_batches",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_O_TOK}) AS BIGINT) AS wc
        FROM documents
    ), bkt AS (
        SELECT doc_id, wc,
               CAST(CASE {_O_LADDER} ELSE 2048 END AS BIGINT) AS bucket
        FROM t
    ), seq AS (
        SELECT *, row_number() OVER (PARTITION BY bucket
                                     ORDER BY doc_id) AS rn
        FROM bkt
    ), asg AS (
        SELECT bucket, wc,
               CAST((rn - 1) // ({_BUDGET} // bucket) AS BIGINT)
                   AS batch_id
        FROM seq
    )
    SELECT bucket, batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(wc) AS BIGINT) AS tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           CAST(ROUND(CAST(SUM(wc) AS DOUBLE) / (COUNT(*) * bucket), 6)
                AS DOUBLE) AS utilization
    FROM asg GROUP BY bucket, batch_id
    ORDER BY bucket, batch_id
    """,
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X160: length-bucketed training-batch assembly — every doc pads to
    the next power-of-two token length (explicit integer ladder: log2()
    at exact powers of two is a cross-engine last-ulp hazard), docs are
    sequenced within their bucket by doc_id, and consecutive runs of
    (budget DIV padded_len) docs form fixed-token-budget batches. Output
    is the per-batch packing report (docs, real vs padded tokens,
    utilization) — the batching layer between the corpus and the
    trainer, and the padding-waste gauge that motivates X93's packing.

    Scale: the within-bucket sequence comes from the SAME two-phase rank
    as X155 (shard = doc_id DIV 4096; counts -> tiny offsets -> shardwise
    row_number), so no bucket ever funnels through one task; the batch
    report is a combinable aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("wc")
    )
    bucket = F.lit(2048)
    for p in reversed(_LADDER):
        bucket = F.when(F.col("wc") <= p, p).otherwise(bucket)
    bkt = t.withColumn("bucket", bucket.cast("bigint"))
    seq = two_phase_row_number(
        bkt,
        shard=F.expr("doc_id DIV 4096"),
        order_cols=["doc_id"],
        prefix_cols=["bucket"],
        out_col="rn",
    )
    asg = seq.select(
        "bucket",
        "wc",
        F.expr(f"(rn - 1) DIV ({_BUDGET} DIV bucket)")
        .cast("bigint")
        .alias("batch_id"),
    )
    return (
        asg.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("wc").cast("bigint").alias("tokens"),
            (F.count(F.lit(1)) * F.first("bucket"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.round(
                F.sum("wc").cast("double")
                / (F.count(F.lit(1)) * F.first("bucket")),
                6,
            ).alias("utilization"),
        )
        .orderBy("bucket", "batch_id")
    )
