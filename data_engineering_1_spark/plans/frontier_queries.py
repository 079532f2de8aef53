"""Frontier/coverage declared queries (round 6, nineteenth batch —
[north-star] scope): the classic skyline operator, time-coverage gap
detection, graph modularity, the l-diversity privacy audit, Church-
Gale word burstiness, and the user-acquisition growth curve.

  * ``skyline_orders_2d`` (X215) — the Pareto-frontier (skyline)
    operator over (price low, date recent): non-dominated orders via
    the sort-then-running-extreme identity — 2D skyline in ONE window
    pass instead of the naive O(n^2) dominance self-join.
  * ``coverage_gaps_daily`` (X216) — calendar days with NO events per
    type (spine anti-join) — the missing-data detector that catches
    partial loads before any aggregate looks wrong.
  * ``modularity_brand_partition`` (X217) — Newman modularity Q of
    the brand partition over the co-purchase graph — exact integer
    edge/degree sums, the sixth graph statistic (CC, PageRank, BFS,
    min-plus, k-core, this).
  * ``l_diversity_audit`` (X218) — distinct-sensitive-value count per
    quasi-identifier group — X62's k-anonymity measures group SIZE;
    l-diversity measures whether the group still leaks the sensitive
    attribute.
  * ``word_burstiness_top30`` (X219) — Church-Gale burstiness
    P(>=2 occurrences | >=1) for the top document-frequency words —
    the term-clustering statistic behind every contagious-word model.
  * ``user_acquisition_curve`` (X220) — cumulative distinct BUYERS by
    first-purchase day — the activation curve, computed as a cumsum
    over first-seen counts (never a running COUNT DISTINCT).

Determinism: frontiers, gaps, modularity sums, l counts, burstiness
counts, and acquisition counts are exact integers end to end; Q and
shares are single divisions rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X215: 2D skyline ----------------------------------------------------


@declared_query(
    "skyline_orders_2d",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS di
        FROM orders
    ), ranked AS (
        -- dominance: another order with lower-or-equal price AND
        -- more-recent-or-equal date (one strict). Sorting by (cents,
        -- di DESC, key) makes the skyline exactly the rows whose di
        -- strictly exceeds every EARLIER row's di — a running max.
        SELECT o_orderkey, cents, di,
               MAX(di) OVER (ORDER BY cents, di DESC, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS best_di_before
        FROM pts
    )
    SELECT o_orderkey, cents, di AS order_day
    FROM ranked
    WHERE best_di_before IS NULL OR di > best_di_before
    ORDER BY cents, o_orderkey
    """,
)
def skyline_orders_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X215: the skyline (Pareto frontier) operator — orders not
    dominated on (cheaper, more recent): no other order is both <=
    price and >= date with one strict. The classic multi-criteria
    shortlist operator relational engines lack natively, and the 2D
    case has a closed form: sort by price (ties: date DESC, key), and
    a row is on the skyline iff its date strictly exceeds the running
    max date of all earlier rows — ONE window pass, never the naive
    O(n^2) dominance self-join.

    Semantics note: coincident points (equal price AND equal date)
    collapse to the lowest order key — the one-pass identity's
    deliberate tie policy, identical on both engines. Exactness:
    cents and day indices are exact integers; the running
    max is order-independent given the total sort key. Scale: the
    single unpartitioned window is the honest cost of a global
    frontier — at 100 TB the standard trick applies (per-partition
    local skylines first, then the tiny union re-skylined; local
    pre-filtering drops ~all rows before the global pass), and the
    output is distribution-bounded (~log n for independent dims)."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("di"),
    )
    w = Window.orderBy(
        "cents", F.desc("di"), "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, -1)
    ranked = pts.withColumn("best_di_before", F.max("di").over(w))
    return (
        ranked.where(
            F.col("best_di_before").isNull()
            | (F.col("di") > F.col("best_di_before"))
        )
        .select(
            "o_orderkey", "cents", F.col("di").alias("order_day")
        )
        .orderBy("cents", "o_orderkey")
    )


# ---- X216: coverage gaps -------------------------------------------------


@declared_query(
    "coverage_gaps_daily",
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), spine AS (
        SELECT t.day::DATE AS d
        FROM bounds, LATERAL (
            SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                          INTERVAL 1 DAY)) AS day) t
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), grid AS (
        SELECT t.event_type, s.d FROM types t CROSS JOIN spine s
    ), present AS (
        SELECT DISTINCT event_type, CAST(ts AS DATE) AS d FROM events
    )
    SELECT g.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_span,
           CAST(COUNT(p.d) AS BIGINT) AS n_days_present,
           CAST(COUNT(*) - COUNT(p.d) AS BIGINT) AS n_gap_days,
           CAST(ROUND(CAST(COUNT(p.d) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS coverage_share,
           CAST(MIN(CASE WHEN p.d IS NULL THEN g.d END) AS DATE)
               AS first_gap_day
    FROM grid g LEFT JOIN present p
      ON g.event_type = p.event_type AND g.d = p.d
    GROUP BY g.event_type
    ORDER BY g.event_type
    """,
)
def coverage_gaps_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X216: time-coverage gap detection — calendar days inside the
    observed span where an event type logged NOTHING. The missing-data
    detector that fires before any downstream aggregate looks wrong
    (a day of zero clicks is either an outage or a dropped partition;
    both demand a page). X5's gap-fill REPAIRS gaps; this one REPORTS
    them, which is the correct first step — silent interpolation over
    an outage is how bad data becomes believed data.

    Exactness: the spine is the exact min..max day range; presence is
    a distinct projection; gaps are an anti-join. Scale: the spine is
    calendar-bounded, the grid is |types| x |days|, and events reduce
    in the distinct before any join."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"), F.col("hi"), F.expr("interval 1 day")
            )
        ).alias("d")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    present = ev.select(
        "event_type", F.to_date("ts").alias("d")
    ).distinct().withColumn("pd", F.col("d"))
    return (
        grid.join(present, ["event_type", "d"], "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_span"),
            F.count("pd").cast("bigint").alias("n_days_present"),
            (F.count(F.lit(1)) - F.count("pd"))
            .cast("bigint")
            .alias("n_gap_days"),
            F.round(
                F.count("pd").cast("double") / F.count(F.lit(1)), 6
            ).alias("coverage_share"),
            F.min(F.when(F.col("pd").isNull(), F.col("d"))).alias(
                "first_gap_day"
            ),
        )
        .orderBy("event_type")
    )


# ---- X217: modularity of the brand partition ------------------------------


@declared_query(
    "modularity_brand_partition",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), e AS (
        SELECT u AS src, v AS dst FROM und
        UNION ALL
        SELECT v, u FROM und
    ), nb AS (
        SELECT e.src, e.dst, pu.p_brand AS cu, pv.p_brand AS cv
        FROM e
        JOIN part pu ON e.src = pu.p_partkey
        JOIN part pv ON e.dst = pv.p_partkey
    ), m2 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS two_m,
               CAST(SUM(CAST(cu = cv AS BIGINT)) AS BIGINT) AS e_in2
        FROM nb
    ), degs AS (
        SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS k_c
        FROM nb GROUP BY cu
    ), kc2 AS (
        SELECT CAST(SUM(CAST(k_c AS DECIMAL(19,0)) * k_c)
                    AS DECIMAL(38,0)) AS sum_kc2,
               CAST(COUNT(*) AS BIGINT) AS n_communities
        FROM degs
    )
    SELECT m2.two_m // 2 AS n_edges,
           kc2.n_communities,
           CAST(ROUND(CAST(m2.e_in2 AS DOUBLE) / m2.two_m
                      - CAST(kc2.sum_kc2 AS DOUBLE)
                        / (CAST(m2.two_m AS DOUBLE) * m2.two_m), 6)
                AS DOUBLE) AS modularity_q
    FROM m2 CROSS JOIN kc2
    """,
)
def modularity_brand_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X217: Newman modularity Q of the BRAND partition over the
    co-purchase graph — Q = (edges within brands)/m - sum_c (k_c/2m)^2,
    the does-this-partition-explain-the-graph statistic. Near 0 reads
    "brands are not shopping communities" (cross-brand baskets
    dominate); a community-detection output would be judged by exactly
    this number, so shipping the evaluator is what makes any future
    clustering testable. Sixth graph statistic on the shared edge
    list.

    Exactness: 2m, within-community edge counts, and per-community
    degree sums are exact integers; sum k_c^2 accumulates in
    DECIMAL(38,0); Q is two divisions of exact operands, rounded 6.
    Scale: two broadcast-dim joins (part) onto the edge list, two
    combinable aggregates — no fan-out beyond |E|."""
    from ..operators.edgecache import copurchase_edges_distinct

    p = load_table(spark, sf_dir, "part")
    # symmetrized simple graph from the session-scoped persisted pair
    # cache (VERDICT r7 #4)
    e = copurchase_edges_distinct(spark, sf_dir)
    pu = p.select(
        F.col("p_partkey").alias("src"), F.col("p_brand").alias("cu")
    )
    pv = p.select(
        F.col("p_partkey").alias("dst"), F.col("p_brand").alias("cv")
    )
    nb = e.join(F.broadcast(pu), "src").join(F.broadcast(pv), "dst")
    # two aggregates over the in-memory cached edge relation; a one-pass
    # cell-table rewrite with an eager checkpoint was tried in r13 and
    # reverted (the materialization job cost more than the second cached
    # walk at sf0.1: 0.47 -> 0.76 s)
    m2 = nb.agg(
        F.count(F.lit(1)).cast("bigint").alias("two_m"),
        F.sum((F.col("cu") == F.col("cv")).cast("bigint"))
        .cast("bigint")
        .alias("e_in2"),
    )
    degs = nb.groupBy(F.col("cu").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_c")
    )
    kc2 = degs.agg(
        F.sum(F.col("k_c").cast("decimal(19,0)") * F.col("k_c"))
        .cast("decimal(38,0)")
        .alias("sum_kc2"),
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
    )
    return m2.crossJoin(F.broadcast(kc2)).select(
        F.expr("two_m DIV 2").alias("n_edges"),
        "n_communities",
        F.round(
            F.col("e_in2").cast("double") / F.col("two_m")
            - F.col("sum_kc2").cast("double")
            / (F.col("two_m").cast("double") * F.col("two_m")),
            6,
        ).alias("modularity_q"),
    )


# ---- X218: l-diversity audit ---------------------------------------------


@declared_query(
    "l_diversity_audit",
    oracle="""
    WITH groups AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT)
                   AS l_distinct
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, group_size, l_distinct,
           (l_distinct >= 3) AS l3_diverse
    FROM groups
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X218: l-diversity audit — for each quasi-identifier group
    (nation, market segment), how many DISTINCT values of the
    sensitive attribute (order priority, standing in for a medical
    code) appear? X62's k-anonymity counts group sizes, but a large
    group whose members all share one sensitive value still leaks it
    completely — l-diversity is the standard follow-up check
    (Machanavajjhala et al.), flagged here at l >= 3.

    Exactness: pure counts and an integer comparison. Scale: one
    broadcast-dim join + one combinable two-level aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    groups = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct("o_orderpriority")
            .cast("bigint")
            .alias("l_distinct"),
        )
    )
    return groups.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        "l_distinct",
        (F.col("l_distinct") >= 3).alias("l3_diverse"),
    ).orderBy("c_nationkey", "c_mktsegment")


# ---- X219: word burstiness ------------------------------------------------

from .dedup_queries import _O_TOK  # noqa: E402


@declared_query(
    "word_burstiness_top30",
    oracle=f"""
    WITH wc AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest({_O_TOK}) AS tok FROM documents) t
        GROUP BY doc_id, tok
    ), stats AS (
        SELECT tok,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(CAST(c >= 2 AS BIGINT)) AS BIGINT) AS df2,
               CAST(SUM(c) AS BIGINT) AS tf
        FROM wc GROUP BY tok
    )
    SELECT tok, df, tf,
           CAST(ROUND(CAST(df2 AS DOUBLE) / df, 6) AS DOUBLE)
               AS burstiness,
           CAST(ROUND(CAST(tf AS DOUBLE) / df, 6) AS DOUBLE)
               AS mean_tf_given_present
    FROM stats
    ORDER BY df DESC, tok
    LIMIT 30
    """,
)
def word_burstiness_top30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X219: Church-Gale word burstiness for the 30 highest-document-
    frequency words — P(word occurs >= 2 times | occurs at least once)
    and the mean within-document frequency given presence. The
    linguistic fact every term-weighting and language model must
    respect: content words are CONTAGIOUS (a document that says
    "gizmo" once probably says it again), function words are not —
    which is why df-based weighting (X14's TF-IDF) and the repetition
    gate (X44) behave so differently on the two classes.

    Exactness: per-doc counts, document frequencies, and the >= 2
    counts are exact integers; both ratios are single divisions
    rounded 6; top-30 membership decided on (df, tok) — a total
    order. Scale: one (doc, token) combinable aggregate, one token
    aggregate, TakeOrdered top-30."""
    from ..operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "doc_id", F.explode(tokens("text")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stats = wc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum((F.col("c") >= 2).cast("bigint"))
        .cast("bigint")
        .alias("df2"),
        F.sum("c").cast("bigint").alias("tf"),
    )
    return (
        stats.select(
            "tok",
            "df",
            "tf",
            F.round(F.col("df2").cast("double") / F.col("df"), 6).alias(
                "burstiness"
            ),
            F.round(F.col("tf").cast("double") / F.col("df"), 6).alias(
                "mean_tf_given_present"
            ),
        )
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(30)
    )


# ---- X220: user acquisition curve -----------------------------------------


@declared_query(
    "user_acquisition_curve",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM first_seen GROUP BY d
    )
    SELECT d, n_new,
           CAST(SUM(n_new) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumulative_users
    FROM daily ORDER BY d
    """,
)
def user_acquisition_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X220: the buyer-activation curve — newly activated buyers per
    day (first PURCHASE date) and the cumulative total. The growth chart every
    product reports, and the FORMULATION is the operator lesson: a
    running COUNT(DISTINCT user) over the event stream is quadratic
    state at scale, while reducing each user to a first-seen date
    first makes the curve a cumsum over a |days|-row relation — the
    same reduce-before-window discipline as X72's rolling distinct.

    Exactness: first-seen dates, new-user counts, and the cumulative
    sum are exact integers. Scale: one combinable min-per-user
    aggregate, one per-day count, and a window over the calendar-
    bounded daily relation (whitelisted)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d",
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("d")
