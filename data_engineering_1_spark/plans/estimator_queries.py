"""Estimator/meta-analytics declared queries (round 6, fifteenth batch
— [north-star] scope): the engine's self-measurement layer — data
integrity fingerprints, retrieval-ranking agreement, optimizer
cardinality-estimate audits, multivariate exact regression, mergeable
distinct sketches with a measured error, and leaderboard churn.

  * ``table_fingerprint_orders`` (X191) — Merkle-style bucketed row
    digests: order-free per-bucket digest sums/xors that localize ANY
    row change to a bucket — the cheap cross-replica consistency
    check (compare 64 rows, not 10^8; recurse into the one bucket
    that differs).
  * ``rbo_retrieval_agreement`` (X192) — rank-biased overlap (p=1/2)
    between the fine-grid and coarse-grid retrieval rankings — the
    top-weighted list-similarity metric behind X125's fusion; p=1/2
    makes every geometric weight an EXACT power of two.
  * ``join_cardinality_audit`` (X193) — textbook optimizer estimate
    |A ⋈ B| = n_a*n_b/max(d_a,d_b) vs the actual join count for three
    production joins — the estimate-vs-reality audit that explains
    planner misestimates before they burn a 100 TB shuffle.
  * ``ols2_clicks_trend`` (X194) — two-regressor OLS (day index +
    weekend flag) solved by Cramer's rule on EXACT integer normal
    equations — X99's exact-sufficient-statistics discipline, one
    matrix order up.
  * ``kmv_distinct_users`` (X195) — k-minimum-values distinct-count
    sketch from md5-bridge hashes, with the exact answer and the
    realized relative error next to it — the mergeable cousin of A6's
    HLL, fully oracle-checkable because the hash is deterministic.
  * ``leaderboard_churn_weekly`` (X196) — weekly top-10 parts and the
    week-over-week overlap/churn — the rank-stability gauge for any
    trending surface.

Determinism: digests, ranks, overlap counts, normal-equation moments,
and kth-smallest hashes are exact integers; RBO terms multiply exact
rationals by exact powers of two and stage round-15 decimals; all
final ratios are single divisions rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X191: Merkle-bucket table fingerprint ------------------------------

_FP_BUCKETS = 64


@declared_query(
    "table_fingerprint_orders",
    oracle=f"""
    WITH rows_ AS (
        SELECT o_orderkey % {_FP_BUCKETS} AS bucket,
               (('0x' || substr(md5('fp|' ||
                    CAST(o_orderkey AS VARCHAR) || '|' ||
                    CAST(o_custkey AS VARCHAR) || '|' ||
                    o_orderstatus || '|' ||
                    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR) || '|' ||
                    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' ||
                    o_orderpriority), 1, 15))::BIGINT) AS digest
        FROM orders
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(digest AS DECIMAL(38,0)))
                % 2305843009213693951 AS BIGINT) AS digest_sum,
           CAST(bit_xor(digest) AS BIGINT) AS digest_xor
    FROM rows_ GROUP BY bucket ORDER BY bucket
    """,
)
def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X191: Merkle-style table fingerprint — every row hashes its full
    business content (keys, status, cents, date, priority) through the
    md5 bridge, and per-bucket SUM and XOR digests compress the table
    to 64 comparable rows. Any single-row change flips both digests of
    exactly one bucket; comparing fingerprints localizes replica drift
    without moving data — THE cross-system consistency primitive
    (replication checks, migration sign-off, backup verification), and
    both aggregates are order-free so the result is partitioning-proof
    by construction.

    Exactness: 60-bit digests (15 hex chars) accumulate in
    DECIMAL(38,0) (exact up to ~10^19 rows per bucket) and reduce
    modulo the Mersenne prime 2^61-1 to a fixed-width comparable —
    XOR never overflows at any scale. Scale: one combinable
    aggregate, one scan."""
    o = load_table(spark, sf_dir, "orders")
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit("fp"),
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.col("o_orderstatus"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("bigint")
                    .cast("string"),
                    F.to_date("o_orderdate").cast("string"),
                    F.col("o_orderpriority"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        o.select(
            (F.col("o_orderkey") % _FP_BUCKETS).alias("bucket"),
            digest.alias("digest"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr(
                "CAST(SUM(CAST(digest AS DECIMAL(38,0)))"
                " % 2305843009213693951 AS BIGINT)"
            ).alias("digest_sum"),
            F.expr("CAST(bit_xor(digest) AS BIGINT)").alias("digest_xor"),
        )
        .orderBy("bucket")
    )


# ---- X192: rank-biased overlap ------------------------------------------

_RBO_K = 100


def _o_ranking(grid: int, alias: str) -> str:
    return f"""
    {alias} AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY dot DESC, vec_id) AS r
        FROM (
            SELECT e.vec_id,
                   CAST(SUM(CAST(ROUND(CAST(e.embedding[d.d] AS DOUBLE)
                                       * {grid}) AS BIGINT)
                            * CAST(ROUND(CAST(q.embedding[d.d] AS DOUBLE)
                                         * {grid}) AS BIGINT))
                        AS BIGINT) AS dot
            FROM embeddings e
            CROSS JOIN (SELECT embedding FROM embeddings
                        WHERE vec_id = 0) q
            CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) d
            WHERE e.vec_id <> 0
            GROUP BY e.vec_id
        ) s
        QUALIFY r <= {_RBO_K}
    )
    """


@declared_query(
    "rbo_retrieval_agreement",
    oracle=f"""
    WITH {_o_ranking(1000000, "fine")},
    {_o_ranking(100, "coarse")},
    m AS (
        SELECT f.vec_id, GREATEST(f.r, c.r) AS mr
        FROM fine f JOIN coarse c ON f.vec_id = c.vec_id
    ), spine AS (
        SELECT unnest(generate_series(1, {_RBO_K})) AS depth
    ), ov AS (
        SELECT s.depth, CAST(COUNT(m.vec_id) AS BIGINT) AS ov_d
        FROM spine s LEFT JOIN m ON m.mr <= s.depth
        GROUP BY s.depth
    ), terms AS (
        SELECT depth, ov_d,
               CAST(ROUND((CAST(ov_d AS DOUBLE) / depth)
                          * power(0.5, depth), 15) AS DECIMAL(20,15))
                   AS t15
        FROM ov
    )
    SELECT CAST({_RBO_K} AS BIGINT) AS k,
           (SELECT ov_d FROM ov WHERE depth = {_RBO_K}) AS overlap_at_k,
           CAST(ROUND(CAST(SUM(t15) AS DOUBLE), 6) AS DOUBLE)
               AS rbo_p50
    FROM terms
    """,
)
def rbo_retrieval_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X192: rank-biased overlap (Webber's RBO, p = 1/2) between the
    fine-grid (1e6) and coarse-grid (1e2) quantized retrieval rankings
    for query vector 0 — the top-weighted agreement metric for
    comparing rankers (X125 fuses two rankings; this MEASURES how much
    they agree, which is what decides whether the coarse stage can be
    trusted to prefilter). RBO = sum_d (overlap@d / d) * p^d * (1-p)/p;
    p = 1/2 is the exactness choice: every geometric weight is an
    exact power of two, so both engines compute identical terms
    (pow(0.5, d) is exact in IEEE for all relevant d) — a p = 0.9
    variant would put a correctly-rounded-pow hazard in every term.

    Exactness: dots are exact integers on the two quantization grids;
    ranks are total orders (dot DESC, vec_id); each term multiplies an
    exact rational by an exact power of two, rounds 15, and stages
    DECIMAL(20,15) (order-free sum); final round 6. Scale: rankings
    are TakeOrdered top-100s; the depth spine is 100 rows; the
    overlap join is 100 x |both-lists| rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )

    def ranking(grid: int):
        qd = (
            emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                F.posexplode("embedding").alias("p", "v"),
                F.col("qe"),
            )
            .select(
                "vec_id",
                (
                    F.round(F.col("v").cast("double") * grid, 0).cast(
                        "bigint"
                    )
                    * F.round(
                        F.element_at("qe", F.col("p") + 1).cast("double")
                        * grid,
                        0,
                    ).cast("bigint")
                ).alias("t"),
            )
        )
        dots = qd.groupBy("vec_id").agg(
            F.sum("t").cast("bigint").alias("dot")
        )
        top = dots.orderBy(F.desc("dot"), F.asc("vec_id")).limit(_RBO_K)
        return top.select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy(F.desc("dot"), F.asc("vec_id")))
            .alias("r"),
        )

    fine = ranking(1000000)
    coarse = ranking(100).select(
        F.col("vec_id"), F.col("r").alias("rc")
    )
    m = fine.join(coarse, "vec_id").select(
        "vec_id", F.greatest("r", "rc").alias("mr")
    )
    spine = spark.range(1, _RBO_K + 1).select(
        F.col("id").cast("int").alias("depth")
    )
    ov = (
        spine.join(m, F.col("mr") <= F.col("depth"), "left")
        .groupBy("depth")
        .agg(F.count("vec_id").cast("bigint").alias("ov_d"))
    )
    terms = ov.select(
        "depth",
        "ov_d",
        F.round(
            (F.col("ov_d").cast("double") / F.col("depth"))
            * F.pow(F.lit(0.5), F.col("depth")),
            15,
        )
        .cast("decimal(20,15)")
        .alias("t15"),
    )
    at_k = ov.where(F.col("depth") == _RBO_K).select(
        F.col("ov_d").alias("overlap_at_k")
    )
    return (
        terms.agg(
            F.round(F.sum("t15").cast("double"), 6).alias("rbo_p50")
        )
        .crossJoin(F.broadcast(at_k))
        .select(
            F.lit(_RBO_K).cast("bigint").alias("k"),
            "overlap_at_k",
            "rbo_p50",
        )
    )


# ---- X193: join-cardinality estimator audit ------------------------------

_CARD_JOINS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
]


def _o_card(ta: str, ka: str, tb: str, kb: str) -> str:
    return f"""
        SELECT '{ta}.{ka}={tb}.{kb}' AS join_expr,
               a.n AS n_left, b.n AS n_right,
               CAST(ROUND(CAST(a.n AS DECIMAL(38,0)) * b.n
                          / GREATEST(a.d, b.d), 6) AS DOUBLE)
                   AS est_rows,
               j.actual AS actual_rows,
               CAST(ROUND(j.actual
                          / (CAST(a.n AS DECIMAL(38,0)) * b.n
                             / GREATEST(a.d, b.d)), 6) AS DOUBLE)
                   AS actual_over_est
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT {ka}) AS BIGINT) AS d
              FROM {ta}) a
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(COUNT(DISTINCT {kb}) AS BIGINT) AS d
                    FROM {tb}) b
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS actual
                    FROM {ta} x JOIN {tb} y ON x.{ka} = y.{kb}) j
    """


@declared_query(
    "join_cardinality_audit",
    oracle=" UNION ALL ".join(_o_card(*j) for j in _CARD_JOINS)
    + " ORDER BY join_expr",
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X193: the textbook optimizer cardinality estimate
    |A join B| = n_a * n_b / max(d_a, d_b) audited against the ACTUAL
    join count for three production joins — the estimate-vs-reality
    gap is what CBO decisions (X82 feeds statistics; this measures
    what they buy) and shuffle sizing stand on; a ratio far from 1
    flags key skew or referential-integrity violations before a
    100 TB shuffle discovers them the hard way.

    Exactness: all counts exact BIGINTs; the estimate multiplies in
    DECIMAL(38,0) and divides ONCE (operands identical on both
    engines and below 2^53 at test SFs, so the double conversion is
    exact); ratio likewise. Scale: per join, two count/distinct
    aggregates plus the actual join count — the joins themselves are
    the equi-joins the pipeline already runs."""
    # Key-grain formulation (guide §2.3 "aggregate before you shuffle"):
    # each table is scanned and key-aggregated ONCE; row/distinct counts
    # come off that relation and the actual join count is the exact
    # product-sum sum(ca*cb) over matching keys — the r13-before shape
    # scanned each table twice and shuffled fact rows through the join
    # (24 scans; now 6). NULL keys: the join drops them (equality),
    # countDistinct ignored them — both reproduced below.
    out = None
    for ta, ka, tb, kb in _CARD_JOINS:
        A = load_table(spark, sf_dir, ta)
        B = load_table(spark, sf_dir, tb)
        # key-grain aggregates left lazy: each is consumed twice (scalar
        # agg + product-sum join) but the recompute is one scan +
        # combinable groupBy — cheaper at bench scale than an eager
        # materialization job each (measured r13), and still strictly
        # less work than the old fact-grain join
        ak = A.groupBy(F.col(ka).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("ca")
        )
        bk = B.groupBy(F.col(kb).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cb")
        )
        a = ak.agg(
            F.sum("ca").cast("bigint").alias("n_left"),
            F.count(F.when(F.col("k").isNotNull(), 1))
            .cast("bigint")
            .alias("da"),
        )
        b = bk.agg(
            F.sum("cb").cast("bigint").alias("n_right"),
            F.count(F.when(F.col("k").isNotNull(), 1))
            .cast("bigint")
            .alias("db"),
        )
        j = ak.join(bk, "k").agg(
            F.coalesce(
                F.sum(F.col("ca").cast("decimal(19,0)") * F.col("cb"))
                .cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("actual_rows")
        )
        est = (
            F.col("n_left").cast("decimal(38,0)") * F.col("n_right")
        ).cast("double") / F.greatest("da", "db")
        st = (
            a.crossJoin(F.broadcast(b))
            .crossJoin(F.broadcast(j))
            .select(
                F.lit(f"{ta}.{ka}={tb}.{kb}").alias("join_expr"),
                "n_left",
                "n_right",
                F.round(est, 6).alias("est_rows"),
                "actual_rows",
                F.round(F.col("actual_rows") / est, 6).alias(
                    "actual_over_est"
                ),
            )
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("join_expr")


# ---- X194: two-regressor exact OLS ---------------------------------------


@declared_query(
    "ols2_clicks_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x1,
               CAST(CAST(((date_diff('day', DATE '1970-01-01',
                           CAST(ts AS DATE)) + 4) % 7) IN (5, 6)
                    AS BIGINT) AS BIGINT) AS x2,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), m AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               CAST(SUM(x1) AS DECIMAL(38,0)) AS s1,
               CAST(SUM(x2) AS DECIMAL(38,0)) AS s2,
               CAST(SUM(x1 * x1) AS DECIMAL(38,0)) AS s11,
               CAST(SUM(x1 * x2) AS DECIMAL(38,0)) AS s12,
               CAST(SUM(x2 * x2) AS DECIMAL(38,0)) AS s22,
               CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(x1 * y) AS DECIMAL(38,0)) AS s1y,
               CAST(SUM(x2 * y) AS DECIMAL(38,0)) AS s2y
        FROM daily
    ), c AS (
        -- centered 2x2 system via Cramer (intercept eliminated):
        -- a11 b1 + a12 b2 = c1 ; a12 b1 + a22 b2 = c2, all exact
        SELECT n, s1, s2, sy,
               n * s11 - s1 * s1 AS a11,
               n * s12 - s1 * s2 AS a12,
               n * s22 - s2 * s2 AS a22,
               n * s1y - s1 * sy AS c1,
               n * s2y - s2 * sy AS c2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(ROUND(CAST(c1 * a22 - c2 * a12 AS DOUBLE)
                      / CAST(a11 * a22 - a12 * a12 AS DOUBLE), 6)
                AS DOUBLE) AS beta_day,
           CAST(ROUND(CAST(c2 * a11 - c1 * a12 AS DOUBLE)
                      / CAST(a11 * a22 - a12 * a12 AS DOUBLE), 6)
                AS DOUBLE) AS beta_weekend,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - (CAST(c1 * a22 - c2 * a12 AS DOUBLE)
                          / CAST(a11 * a22 - a12 * a12 AS DOUBLE))
                         * CAST(s1 AS DOUBLE)
                       - (CAST(c2 * a11 - c1 * a12 AS DOUBLE)
                          / CAST(a11 * a22 - a12 * a12 AS DOUBLE))
                         * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                AS DOUBLE) AS beta_intercept
    FROM c
    """,
)
def ols2_clicks_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X194: two-regressor OLS — daily clicks regressed on the day
    index AND a weekend indicator, solved by Cramer's rule on the
    CENTERED 2x2 normal equations (intercept eliminated, then
    recovered from the means). Separates trend from day-of-week mix:
    X99/X164's single-slope trend conflates "growing" with "weekend
    -heavy window"; the weekend coefficient deconfounds it — the
    minimal multivariate step every metrics pipeline eventually needs.

    Exactness: all nine moments are exact DECIMAL(38,0) integer sums;
    the three determinants are exact integer expressions; each beta is
    ONE division of exact operands rounded 6 (X99's discipline, one
    matrix order up). Scale: events reduce to one row per day; the
    solve is O(1)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    di = F.datediff(
        F.to_date("ts"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    daily = ev.groupBy(
        di.alias("x1"),
        ((di + 4) % 7).isin(5, 6).cast("bigint").alias("x2"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    d38 = "decimal(38,0)"
    m = daily.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x1").cast(d38).alias("s1"),
        F.sum("x2").cast(d38).alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast(d38).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast(d38).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast(d38).alias("s22"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast(d38).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast(d38).alias("s2y"),
    )
    c = m.select(
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).alias(
            "a11"
        ),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).alias(
            "a12"
        ),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).alias(
            "a22"
        ),
        (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).alias(
            "c1"
        ),
        (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy")).alias(
            "c2"
        ),
    )
    det = (
        F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    ).cast("double")
    b1 = (
        F.col("c1") * F.col("a22") - F.col("c2") * F.col("a12")
    ).cast("double") / det
    b2 = (
        F.col("c2") * F.col("a11") - F.col("c1") * F.col("a12")
    ).cast("double") / det
    b0 = (
        F.col("sy").cast("double")
        - b1 * F.col("s1").cast("double")
        - b2 * F.col("s2").cast("double")
    ) / F.col("n").cast("double")
    return c.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(b1, 6).alias("beta_day"),
        F.round(b2, 6).alias("beta_weekend"),
        F.round(b0, 6).alias("beta_intercept"),
    )


# ---- X195: KMV distinct sketch -------------------------------------------

_KMV_K = 8
_KMV_M = 2**32


@declared_query(
    "kmv_distinct_users",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT event_type,
               (('0x' || substr(md5('kmv|' ||
                    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT) AS h
        FROM events
    ), ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS rn
        FROM hashes
    ), exact AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.exact_distinct,
           r.h AS kth_hash,
           CAST(ROUND(({_KMV_K} - 1) * {_KMV_M}.0 / r.h, 6) AS DOUBLE)
               AS kmv_estimate,
           CAST(ROUND(ABS(({_KMV_K} - 1) * {_KMV_M}.0 / r.h
                          - e.exact_distinct) / e.exact_distinct, 6)
                AS DOUBLE) AS rel_error
    FROM exact e JOIN ranked r
      ON e.event_type = r.event_type AND r.rn = {_KMV_K}
    ORDER BY e.event_type
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X195: k-minimum-values distinct-count sketch — per event type,
    hash every user through the md5 bridge, keep the k = 8 smallest
    distinct hashes, estimate distinct = (k-1) * M / h_(k). The
    mergeable sketch family's second member (A6/X76 cover HLL), with
    two properties HLL lacks here: the estimate is oracle-checkable
    EXACTLY (deterministic hash, deterministic kth order statistic),
    and the realized relative error is measured against the exact
    answer in the same row — the calibration a pipeline needs before
    trusting sketches at 100 TB (k=8 is deliberately small so the
    fixture exposes real sketch error, not a near-exact count).

    Exactness: hashes and the kth-smallest are exact integers (the
    per-type rank window runs over <= |users| distinct-hash rows);
    estimate and error are single divisions rounded 6. Scale: the
    sketch is one distinct + one bounded window; at scale the k
    minima come from a combinable min-heap aggregate per partition —
    the DataFrame shape here keeps the same outputs."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    hashes = ev.select("event_type", h.alias("h")).distinct()
    ranked = hashes.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("h")
        ),
    ).where(F.col("rn") == _KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    est = (_KMV_K - 1) * float(_KMV_M) / F.col("h")
    return (
        exact.join(ranked, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.col("h").alias("kth_hash"),
            F.round(est, 6).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


# ---- X196: weekly leaderboard churn --------------------------------------

_CHURN_TOPK = 10


@declared_query(
    "leaderboard_churn_weekly",
    oracle=f"""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', CAST(l_shipdate AS DATE))
                    AS DATE) AS wk,
               l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), tops AS (
        SELECT wk, l_partkey FROM (
            SELECT wk, l_partkey,
                   row_number() OVER (PARTITION BY wk
                                      ORDER BY qty DESC, l_partkey)
                       AS rn
            FROM weekly
        ) t WHERE rn <= {_CHURN_TOPK}
    ), weeks AS (
        SELECT wk,
               lag(wk) OVER (ORDER BY wk) AS prev_wk
        FROM (SELECT DISTINCT wk FROM tops) w
    ), ov AS (
        SELECT w.wk, w.prev_wk,
               CAST(COUNT(p.l_partkey) AS BIGINT) AS n_common
        FROM weeks w
        LEFT JOIN tops c ON c.wk = w.wk
        LEFT JOIN tops p
          ON p.wk = w.prev_wk AND p.l_partkey = c.l_partkey
        WHERE w.prev_wk IS NOT NULL
        GROUP BY w.wk, w.prev_wk
    )
    SELECT wk, n_common,
           CAST({_CHURN_TOPK} - n_common AS BIGINT) AS n_churned,
           CAST(ROUND(1.0 - CAST(n_common AS DOUBLE) / {_CHURN_TOPK}, 6)
                AS DOUBLE) AS churn_rate
    FROM ov ORDER BY wk
    """,
)
def leaderboard_churn_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X196: week-over-week churn of the top-10 parts leaderboard —
    for every week, how many of the top 10 (by shipped quantity,
    deterministic tie-break) were also top 10 the PREVIOUS week, and
    the churn rate. The rank-stability gauge for any trending surface
    (X175 builds the decayed leaderboard; this measures how fast it
    turns over), and the canary for seasonality breaks: a churn spike
    is the first visible symptom of a demand-mix shift.

    Exactness: quantities, ranks, and overlap counts are exact
    integers (ISO-Monday week truncation matches on both engines, the
    X27 idiom); churn rate is one division rounded 6. Scale: one
    (week, part) aggregate, one rank window partitioned by week, and
    an equi-join of two 10-row-per-week relations; the lag window
    runs over the |weeks| relation (whitelisted)."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        F.date_trunc("week", F.to_date("l_shipdate"))
        .cast("date")
        .alias("wk"),
        "l_partkey",
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    tops = (
        weekly.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("wk").orderBy(
                    F.desc("qty"), F.asc("l_partkey")
                )
            ),
        )
        .where(F.col("rn") <= _CHURN_TOPK)
        .select("wk", "l_partkey")
        # |weeks| x top-k rows, consumed 3x (week spine, current side,
        # previous side): materialize the fact aggregate + rank window
        # once (guide §2.4; 8 scans / 28 exchanges in the r13-before
        # plan)
        .localCheckpoint()
    )
    weeks = (
        tops.select("wk")
        .distinct()
        .withColumn("prev_wk", F.lag("wk").over(Window.orderBy("wk")))
        .where(F.col("prev_wk").isNotNull())
    )
    cur = tops.select("wk", "l_partkey")
    prev = tops.select(F.col("wk").alias("prev_wk"), "l_partkey")
    matched = (
        weeks.join(cur, "wk")
        .join(prev, ["prev_wk", "l_partkey"])
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nc"))
    )
    ov = weeks.select("wk").join(matched, "wk", "left").select(
        "wk",
        F.coalesce(F.col("_nc"), F.lit(0)).cast("bigint").alias(
            "n_common"
        ),
    )
    return ov.select(
        "wk",
        "n_common",
        (F.lit(_CHURN_TOPK) - F.col("n_common"))
        .cast("bigint")
        .alias("n_churned"),
        F.round(
            1.0 - F.col("n_common").cast("double") / _CHURN_TOPK, 6
        ).alias("churn_rate"),
    ).orderBy("wk")
