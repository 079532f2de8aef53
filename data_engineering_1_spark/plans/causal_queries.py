"""Causal-inference / forensic-audit declared queries (round 6,
thirty-second batch — [north-star] scope): discontinuity estimation,
golden-record fusion, population estimation, digit forensics,
epidemiological effect sizes, and decay fitting.

  * ``rdd_price_threshold`` (X293) — local-linear regression
    discontinuity at a price cutoff: per-side exact-sufficient-
    statistic OLS intercepts AT the cutoff, their gap the causal
    estimate — the design-based causal tool next to X205's
    diff-in-diff and X159's CUPED.
  * ``golden_record_fusion`` (X294) — majority-vote field fusion
    over X47's fuzzy-duplicate clusters (connected components via
    the production min-label operator) — the MERGE step of entity
    resolution (X47 detects, X152 picks survivors, this FUSES).
  * ``capture_recapture_customers`` (X295) — Lincoln-Petersen and
    Chapman population estimates from two monthly buyer "captures",
    next to the true count — the dedup-undercount estimator.
  * ``last_digit_uniformity`` (X296) — chi-squared uniformity of
    the final cents digit — the price-fabrication forensic (X199's
    Benford checks leading digits; fabricators also round trailing
    ones); the statistic reduces to ONE division.
  * ``odds_ratio_nations`` (X297) — urgent-priority → fulfilled
    odds ratio per nation with the Woolf log-interval — the 2×2
    effect size with error bars.
  * ``activity_halflife_fit`` (X298) — exponential decay half-life
    of day-1 user activity via log-linear exact-sufficient-
    statistic OLS over the daily retention curve.

Determinism: counts/cents/digits exact; OLS runs on exact power
sums with ln/ratio terms staged ROUND(.., 9) into DECIMAL; the
chi-squared verdict cross-multiplies exact integers; cluster labels
are deterministic min-reachable ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

_RDD_CUTOFF = 20_000_000  # cents ($200k)
_RDD_BW = 5_000_000  # bandwidth (cents)


# ---- X293: regression discontinuity ------------------------------------------


@declared_query(
    "rdd_price_threshold",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   - {_RDD_CUTOFF} AS x,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
        WHERE abs(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  - {_RDD_CUTOFF}) < {_RDD_BW}
    ), sides AS (
        SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS above,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x)
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM scored GROUP BY 1
    ), fits AS (
        SELECT above, n,
               CAST(ROUND(
                   (CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy)
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx), 9)
                   AS DECIMAL(18,9)) AS alpha9
        FROM sides
    )
    SELECT a.n AS n_above, b.n AS n_below,
           CAST(a.alpha9 AS DOUBLE) AS rate_at_cutoff_above,
           CAST(b.alpha9 AS DOUBLE) AS rate_at_cutoff_below,
           CAST(ROUND(CAST(a.alpha9 - b.alpha9 AS DOUBLE), 6)
                AS DOUBLE) AS discontinuity
    FROM (SELECT * FROM fits WHERE above = 1) a
    CROSS JOIN (SELECT * FROM fits WHERE above = 0) b
    """,
)
def rdd_price_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X293: local-linear regression discontinuity — does the
    fulfilled rate JUMP at the $200k order-value threshold? Each
    side of the cutoff gets its own exact-sufficient-statistic OLS
    (the X99 machinery) on the centered running variable, and the
    estimate is the gap between the two fitted INTERCEPTS at x = 0:
    α = (Σy·Σx² − Σx·Σxy)/(nΣx² − (Σx)²) per side. The naive
    above-vs-below mean difference confounds the threshold effect
    with the within-bandwidth trend — the local-linear intercepts
    are THE standard RDD correction, and with no real threshold
    rule in the fixture the honest readout is a near-zero
    discontinuity (the placebo property X205's DiD also showed).

    Exactness: all five sufficient statistics exact BIGINT/DECIMAL;
    each intercept is one division staged round-9; the gap is an
    exact decimal difference rounded 6. Scale: one combinable
    two-group aggregate over the bandwidth-filtered scan."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            - _RDD_CUTOFF
        ).alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    ).where(F.abs(F.col("x")) < _RDD_BW)
    sides = scored.groupBy(
        F.when(F.col("x") >= 0, 1).otherwise(0).alias("above")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    alpha = F.round(
        (
            F.col("sy").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sxy")
        )
        / (
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        ),
        9,
    ).cast("decimal(18,9)")
    fits = sides.select("above", "n", alpha.alias("alpha9"))
    a = fits.where(F.col("above") == 1).select(
        F.col("n").alias("n_above"), F.col("alpha9").alias("a9")
    )
    b = fits.where(F.col("above") == 0).select(
        F.col("n").alias("n_below"), F.col("alpha9").alias("b9")
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_above",
        "n_below",
        F.col("a9").cast("double").alias("rate_at_cutoff_above"),
        F.col("b9").cast("double").alias("rate_at_cutoff_below"),
        F.round(
            (F.col("a9") - F.col("b9")).cast("double"), 6
        ).alias("discontinuity"),
    )


# ---- X294: golden-record fusion ------------------------------------------------


@declared_query(
    "golden_record_fusion",
    oracle="""
    WITH RECURSIVE vpairs AS (
        SELECT a.p_partkey AS u, b.p_partkey AS v
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 5
    ), e AS (
        SELECT u, v FROM vpairs UNION ALL SELECT v, u FROM vpairs
    ), cnodes AS (
        SELECT DISTINCT u AS node FROM e
    ), reach(node, r) AS (
        SELECT node, node FROM cnodes
        UNION
        SELECT reach.node, e.v FROM reach JOIN e ON reach.r = e.u
    ), comp AS (
        SELECT node AS p_partkey, CAST(MIN(r) AS BIGINT) AS cluster
        FROM reach GROUP BY node
    ), members AS (
        SELECT c.cluster, p.p_partkey, p.p_name, p.p_type,
               CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS cents
        FROM comp c JOIN part p ON c.p_partkey = p.p_partkey
    ), type_votes AS (
        SELECT cluster, p_type, CAST(COUNT(*) AS BIGINT) AS votes
        FROM members GROUP BY 1, 2
    ), fused_type AS (
        SELECT cluster, p_type AS canonical_type FROM (
            SELECT cluster, p_type,
                   row_number() OVER (PARTITION BY cluster
                       ORDER BY votes DESC, p_type) AS rn
            FROM type_votes
        ) WHERE rn = 1
    ), fused_name AS (
        SELECT cluster, p_name AS canonical_name FROM (
            SELECT cluster, p_name,
                   row_number() OVER (PARTITION BY cluster
                       ORDER BY length(p_name) DESC, p_name) AS rn
            FROM members
        ) WHERE rn = 1
    )
    SELECT m.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(ft.canonical_type) AS canonical_type,
           MAX(fn.canonical_name) AS canonical_name,
           CAST(MIN(m.cents) AS BIGINT) AS min_cents,
           CAST(MAX(m.cents) AS BIGINT) AS max_cents,
           CAST(MAX(m.cents) - MIN(m.cents) AS BIGINT)
               AS price_spread_cents
    FROM members m
    JOIN fused_type ft ON m.cluster = ft.cluster
    JOIN fused_name fn ON m.cluster = fn.cluster
    GROUP BY m.cluster
    HAVING COUNT(*) >= 2
    ORDER BY m.cluster
    """,
)
def golden_record_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X294: the MERGE step of entity resolution — X47's fuzzy
    name-duplicate pairs become clusters through the production
    min-label connected-components operator (the tenth call site of
    the iterative graph family), and each multi-member cluster is
    fused into one golden record: canonical type by MAJORITY VOTE
    (count desc, lexicographic tie-break), canonical name by the
    X152 longest-survivor rule, and the price spread kept as the
    conflict signal fusion cannot hide. Detect (X47) → cluster
    (X3's machinery) → survive (X152) → FUSE: the full ER pipeline
    now exists end to end.

    Exactness: cluster labels are deterministic min-reachable ids
    (oracle reproduces them with a recursive CTE); votes and
    spreads exact integers; no floats anywhere. Scale: pairs are
    blocking-key-bounded (X47); components move |V|-row labels per
    round; fusion is two partitioned argmax windows.

    r14: the (p_partkey, cluster) ER labels are session-cached
    (edgecache.session_cached) — the maintained entity-resolution
    cluster table of a production MDM pipeline; repeated consumers in
    one session read it instead of re-running the fuzzy-pair +
    star-contraction loop (the cold bench arm resets it per query so
    the build cost stays on the record)."""
    from ..operators.edgecache import session_cached

    def _build_clusters() -> DataFrame:
        from ..operators.components import connected_components
        from .breadth_queries import fuzzy_name_pairs_part

        pairs = fuzzy_name_pairs_part(spark, sf_dir).select(
            "part_a", "part_b"
        )
        return connected_components(
            pairs, src="part_a", dst="part_b"
        ).select(
            F.col("node").alias("p_partkey"),
            F.col("component").alias("cluster"),
        )

    comp = session_cached(
        spark, sf_dir, "er_part_clusters", _build_clusters
    )
    p = load_table(spark, sf_dir, "part")
    members = comp.join(
        F.broadcast(p.select("p_partkey", "p_name", "p_type", "p_retailprice")),
        "p_partkey",
    ).select(
        "cluster",
        "p_partkey",
        "p_name",
        "p_type",
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    # |V|-bounded labeled-member relation consumed by three passes
    # (type vote, name survivor, spread agg): materialize the label ⋈
    # dimension join once (guide §2.4)
    ).localCheckpoint()
    votes = members.groupBy("cluster", "p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )
    w_t = Window.partitionBy("cluster").orderBy(
        F.desc("votes"), F.asc("p_type")
    )
    fused_type = (
        votes.withColumn("rn", F.row_number().over(w_t))
        .where(F.col("rn") == 1)
        .select("cluster", F.col("p_type").alias("canonical_type"))
    )
    w_n = Window.partitionBy("cluster").orderBy(
        F.desc(F.length("p_name")), F.asc("p_name")
    )
    fused_name = (
        members.withColumn("rn", F.row_number().over(w_n))
        .where(F.col("rn") == 1)
        .select("cluster", F.col("p_name").alias("canonical_name"))
    )
    return (
        members.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
        .where(F.col("n_members") >= 2)
        .join(fused_type, "cluster")
        .join(fused_name, "cluster")
        .select(
            "cluster",
            "n_members",
            "canonical_type",
            "canonical_name",
            "min_cents",
            "max_cents",
            (F.col("max_cents") - F.col("min_cents"))
            .cast("bigint")
            .alias("price_spread_cents"),
        )
        .orderBy("cluster")
    )


# ---- X295: capture-recapture ------------------------------------------------------


@declared_query(
    "capture_recapture_customers",
    oracle="""
    WITH months AS (
        SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS DATE))
            AS m
        FROM orders ORDER BY m LIMIT 2
    ), bounds AS (
        SELECT MIN(m) AS m1, MAX(m) AS m2 FROM months
    ), cap AS (
        SELECT o.o_custkey,
               BOOL_OR(date_trunc('month', CAST(o.o_orderdate AS DATE))
                       = b.m1) AS in1,
               BOOL_OR(date_trunc('month', CAST(o.o_orderdate AS DATE))
                       = b.m2) AS in2
        FROM orders o CROSS JOIN bounds b
        WHERE date_trunc('month', CAST(o.o_orderdate AS DATE))
              IN (b.m1, b.m2)
        GROUP BY o.o_custkey
    ), counts AS (
        SELECT CAST(SUM(CASE WHEN in1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN in2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
               CAST(SUM(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS true_total
        FROM cap
    )
    SELECT n1, n2, m, true_total,
           CAST(ROUND(CAST(n1 AS DOUBLE) * n2 / NULLIF(m, 0), 6)
                AS DOUBLE) AS lincoln_petersen,
           CAST(ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1)
                      - 1, 6) AS DOUBLE) AS chapman,
           CAST(ROUND((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1)
                       - 1) / true_total, 6) AS DOUBLE)
               AS chapman_vs_truth
    FROM counts
    """,
)
def capture_recapture_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X295: capture-recapture population estimation — treat the
    first two order months as two "captures" of the active buyer
    population and estimate its size from the overlap:
    Lincoln-Petersen N̂ = n1·n2/m and the small-sample Chapman
    correction (n1+1)(n2+1)/(m+1) − 1, emitted NEXT TO the true
    two-month buyer count so the estimator's bias is the visible
    output (the X270 sketch-vs-truth discipline). This is the
    standard undercount tool wherever full enumeration is
    impossible — including estimating how many duplicates a dedup
    pass MISSED from two independent detector runs. On the tiny
    fixture the month overlap is small and the estimator overshoots
    hard (chapman_vs_truth ≈ 5 at sf0.001, m = 1) — the textbook
    small-recapture instability, reported rather than hidden.

    Exactness: capture flags via BOOL_OR on exact month equality
    (engine-neutral date_trunc); all counts exact; each estimate is
    one arithmetic expression on exact integers rounded 6. Scale:
    one per-customer aggregate over the two-month scan."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        F.date_trunc("month", F.to_date("o_orderdate")).alias("m"),
    )
    bounds = (
        om.select("m")
        .distinct()
        .orderBy("m")
        .limit(2)
        .agg(F.min("m").alias("m1"), F.max("m").alias("m2"))
    )
    cap = (
        om.crossJoin(F.broadcast(bounds))
        .where((F.col("m") == F.col("m1")) | (F.col("m") == F.col("m2")))
        .groupBy("o_custkey")
        .agg(
            F.max((F.col("m") == F.col("m1")).cast("int")).alias("in1"),
            F.max((F.col("m") == F.col("m2")).cast("int")).alias("in2"),
        )
    )
    counts = cap.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("true_total"),
    )
    chapman = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        / (F.col("m") + 1)
        - 1
    )
    return counts.select(
        "n1",
        "n2",
        "m",
        "true_total",
        # m = 0 guard (ADVICE r6): with zero recaptured buyers LP is
        # undefined — emit NULL explicitly on BOTH engines (Spark's
        # non-ANSI division would NULL here while DuckDB's double
        # division yields inf, breaking parity on a degenerate fixture).
        F.when(
            F.col("m") > 0,
            F.round(
                F.col("n1").cast("double") * F.col("n2") / F.col("m"), 6
            ),
        ).alias("lincoln_petersen"),
        F.round(chapman, 6).alias("chapman"),
        F.round(chapman / F.col("true_total"), 6).alias(
            "chapman_vs_truth"
        ),
    )


# ---- X296: last-digit uniformity forensics -------------------------------------------


@declared_query(
    "last_digit_uniformity",
    oracle="""
    WITH digits AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) % 10 AS d
        FROM orders
    ), counts AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS o FROM digits GROUP BY d
    ), stats AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(SUM(CAST(o AS DECIMAL(19,0)) * o)
                    AS DECIMAL(38,0)) AS sum_o2
        FROM counts
    )
    SELECT c.d AS digit, c.o AS n_orders,
           CAST(ROUND(CAST(c.o AS DOUBLE) / s.n, 6) AS DOUBLE)
               AS share,
           CAST(ROUND(CAST(10 * s.sum_o2
                - CAST(s.n AS DECIMAL(19,0)) * s.n AS DOUBLE)
                / s.n, 6) AS DOUBLE) AS chi2,
           ((10 * s.sum_o2 - CAST(s.n AS DECIMAL(19,0)) * s.n) * 100
            >= CAST(1692 AS DECIMAL(19,0)) * s.n) AS nonuniform_5pct
    FROM counts c CROSS JOIN stats s
    ORDER BY c.d
    """,
)
def last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X296: last-digit forensics — the chi-squared uniformity test
    of the final cents digit of order totals. Genuine transaction
    amounts have uniform trailing digits; fabricated or silently
    rounded ones cluster on 0/5 — the complement of X199's Benford
    first-digit law (leading digits catch invented MAGNITUDES,
    trailing digits catch invented PRECISION). The whole statistic
    collapses to ONE division: χ² = Σ(o_d − n/10)²/(n/10) =
    (10·Σo² − n²)/n on exact integers, and the 5% verdict
    cross-multiplies against the χ²(9) critical value 16.92 scaled
    ×100 — membership never touches the rounded χ².

    Exactness/scale: one combinable 10-group aggregate + one 1-row
    moment aggregate (broadcast cross, whitelisted)."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.select(
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") % 10
        ).alias("d")
    )
    counts = digits.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    stats = counts.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.sum(F.col("o").cast("decimal(19,0)") * F.col("o"))
        .cast("decimal(38,0)")
        .alias("sum_o2"),
    )
    chi2_num = (
        10 * F.col("sum_o2")
        - F.col("n").cast("decimal(19,0)") * F.col("n")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            F.col("d").alias("digit"),
            F.col("o").alias("n_orders"),
            F.round(
                F.col("o").cast("double") / F.col("n"), 6
            ).alias("share"),
            F.round(chi2_num.cast("double") / F.col("n"), 6).alias(
                "chi2"
            ),
            (
                chi2_num * 100
                >= F.lit(1692).cast("decimal(19,0)") * F.col("n")
            ).alias("nonuniform_5pct"),
        )
        .orderBy("digit")
    )


# ---- X297: odds ratios with Woolf intervals ---------------------------------------------


@declared_query(
    "odds_ratio_nations",
    oracle="""
    WITH cells AS (
        SELECT c.c_nationkey AS nation,
               CAST(SUM(CASE WHEN o.o_orderpriority IN
                    ('1-URGENT', '2-HIGH')
                    AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN o.o_orderpriority IN
                    ('1-URGENT', '2-HIGH')
                    AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                    ('1-URGENT', '2-HIGH')
                    AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                    ('1-URGENT', '2-HIGH')
                    AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ), scored AS (
        SELECT nation, a, b, c, d,
               CAST(ROUND(ln(CAST(a AS DOUBLE) * d
                             / (CAST(b AS DOUBLE) * c)), 9)
                    AS DECIMAL(18,9)) AS lnor9,
               CAST(ROUND(1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d),
                          9) AS DECIMAL(18,9)) AS half9
        FROM cells
    )
    SELECT nation, a, b, c, d,
           CAST(ROUND(CAST(a AS DOUBLE) * d
                      / (CAST(b AS DOUBLE) * c), 6) AS DOUBLE)
               AS odds_ratio,
           CAST(ROUND(exp(CAST(lnor9 - half9 AS DOUBLE)), 6)
                AS DOUBLE) AS or_ci_lo,
           CAST(ROUND(exp(CAST(lnor9 + half9 AS DOUBLE)), 6)
                AS DOUBLE) AS or_ci_hi,
           (lnor9 - half9 > 0 OR lnor9 + half9 < 0) AS significant
    FROM scored ORDER BY nation
    """,
)
def odds_ratio_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X297: the urgent-priority → fulfilled ODDS RATIO per nation
    with the Woolf 95% interval — the 2×2 effect size with error
    bars (X95's chi² says "dependent", X230's Cramér's V says "how
    strongly"; the OR says in WHICH DIRECTION and with what
    uncertainty, and unlike the risk ratio it is symmetric in
    both margins). ln(OR) ± 1.96·√(1/a+1/b+1/c+1/d), exponentiated
    back; significance = the interval excluding 1, decided on the
    STAGED log-scale decimals (lnor ± half vs 0), never on the
    rounded exponentials.

    Exactness: the 2×2 cells are one combinable aggregate; ln and
    the half-width stage ROUND(.., 9) into DECIMAL(18,9); the
    interval test is exact decimal arithmetic. Scale: everything
    after the fact join is 25 rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    full = F.col("o_orderstatus") == "F"
    cells = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum((urgent & full).cast("int")).cast("bigint").alias("a"),
            F.sum((urgent & ~full).cast("int")).cast("bigint").alias("b"),
            F.sum((~urgent & full).cast("int")).cast("bigint").alias("c"),
            F.sum((~urgent & ~full).cast("int")).cast("bigint").alias("d"),
        )
    )
    lnor9 = F.round(
        F.log(
            F.col("a").cast("double")
            * F.col("d")
            / (F.col("b").cast("double") * F.col("c"))
        ),
        9,
    ).cast("decimal(18,9)")
    half9 = F.round(
        1.96
        * F.sqrt(
            1.0 / F.col("a")
            + 1.0 / F.col("b")
            + 1.0 / F.col("c")
            + 1.0 / F.col("d")
        ),
        9,
    ).cast("decimal(18,9)")
    scored = cells.select(
        "nation", "a", "b", "c", "d",
        lnor9.alias("lnor9"), half9.alias("half9"),
    )
    return scored.select(
        "nation",
        "a",
        "b",
        "c",
        "d",
        F.round(
            F.col("a").cast("double")
            * F.col("d")
            / (F.col("b").cast("double") * F.col("c")),
            6,
        ).alias("odds_ratio"),
        F.round(
            F.exp((F.col("lnor9") - F.col("half9")).cast("double")), 6
        ).alias("or_ci_lo"),
        F.round(
            F.exp((F.col("lnor9") + F.col("half9")).cast("double")), 6
        ).alias("or_ci_hi"),
        (
            (F.col("lnor9") - F.col("half9") > 0)
            | (F.col("lnor9") + F.col("half9") < 0)
        ).alias("significant"),
    ).orderBy("nation")


# ---- X298: activity decay half-life ---------------------------------------------------


@declared_query(
    "activity_halflife_fit",
    oracle="""
    WITH firstday AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
    ), day1_users AS (
        SELECT DISTINCT e.user_id
        FROM events e CROSS JOIN firstday f
        WHERE CAST(e.ts AS DATE) = f.d0
    ), base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM day1_users
    ), active AS (
        SELECT date_diff('day', f.d0, CAST(e.ts AS DATE)) AS t,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS act
        FROM events e
        JOIN day1_users u ON e.user_id = u.user_id
        CROSS JOIN firstday f
        WHERE date_diff('day', f.d0, CAST(e.ts AS DATE)) >= 1
        GROUP BY 1
    ), pts AS (
        SELECT t,
               CAST(ROUND(ln(CAST(a.act AS DOUBLE) / b.n0), 9)
                    AS DECIMAL(18,9)) AS lny9,
               act, b.n0
        FROM active a CROSS JOIN base b
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS sx,
               CAST(SUM(t * t) AS BIGINT) AS sxx,
               CAST(SUM(lny9) AS DECIMAL(38,9)) AS sy,
               CAST(SUM(lny9 * t) AS DECIMAL(38,9)) AS sxy
        FROM pts
    )
    SELECT n AS n_days,
           CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * sxx
                    - CAST(sx AS DOUBLE) * sx), 9) AS DOUBLE)
               AS decay_slope,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) < 0
                THEN CAST(ROUND(-0.693147181 /
                    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx), 9), 6) AS DOUBLE)
           END AS half_life_days
    FROM sums
    """,
)
def activity_halflife_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X298: exponential decay half-life of day-1 user activity —
    fit ln(active_t/n0) = a + b·t over the daily retention curve of
    the first day's cohort by exact-sufficient-statistic OLS (the
    X99 machinery with the ln leg staged round-9 per the X145
    discipline), then half-life = ln2/(−b). The half-life is the
    ONE number a growth team quotes from a retention curve; when
    the fitted slope is non-negative (no decay — possible on a
    fixture whose users are uniformly active) the half-life is
    NULL rather than a negative fabrication. ln2 enters as the
    literal 0.693147181 on both engines.

    Exactness: t/counts exact; ln terms round-9 DECIMAL so the OLS
    sums are exact decimals; slope is one division staged round-9
    and the half-life one more division rounded 6. Scale: events
    reduce to one row per day (bounded grid) before the fit."""
    events = load_table(spark, sf_dir, "events")
    firstday = events.agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    day1 = (
        events.crossJoin(F.broadcast(firstday))
        .where(F.col("ts").cast("date") == F.col("d0"))
        .select("user_id")
        .distinct()
    )
    base = day1.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    active = (
        events.join(day1, "user_id")
        .crossJoin(F.broadcast(firstday))
        .select(
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("t"),
            "user_id",
        )
        .where(F.col("t") >= 1)
        .groupBy("t")
        .agg(F.countDistinct("user_id").cast("bigint").alias("act"))
    )
    pts = active.crossJoin(F.broadcast(base)).select(
        "t",
        F.round(
            F.log(F.col("act").cast("double") / F.col("n0")), 9
        )
        .cast("decimal(18,9)")
        .alias("lny9"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("sx"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx"),
        F.sum("lny9").cast("decimal(38,9)").alias("sy"),
        F.sum(F.col("lny9") * F.col("t"))
        .cast("decimal(38,9)")
        .alias("sxy"),
    )
    slope_num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    slope_den = (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    slope9 = F.round(slope_num / slope_den, 9)
    return sums.select(
        F.col("n").alias("n_days"),
        slope9.alias("decay_slope"),
        F.when(
            slope_num < 0,
            F.round(-0.693147181 / slope9, 6),
        ).alias("half_life_days"),
    )
