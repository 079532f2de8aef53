"""Data-stewardship / econometrics declared queries (round 6,
eighteenth batch — [north-star] scope): the audits a table owner runs
every morning (freshness, referential coverage, financial
reconciliation), the corpus-mix diagnostic, the econometric readout,
and leakage-safe ML label generation.

  * ``price_elasticity_by_brand`` (X209) — log-log OLS of quantity on
    price per brand (the demand-curve slope), X99's exact-moment
    discipline over round-9-staged ln pairs.
  * ``freshness_audit_tables`` (X210) — per-table newest/oldest event
    time and staleness vs the freshest table — the data-SLA readout.
  * ``referential_coverage_audit`` (X211) — per FK edge: orphan child
    rows and childless parent rows — the join-integrity numbers that
    explain X193's estimate gaps.
  * ``order_reconciliation_audit`` (X212) — does o_totalprice equal
    the line-level sum(extprice*(1-disc)*(1+tax))? Exact-cents
    reconciliation with mismatch distribution — the financial-close
    primitive.
  * ``source_vocab_overlap`` (X213) — pairwise Jaccard between
    per-source vocabularies — the corpus-mix redundancy diagnostic
    (near-1 overlap means a source adds volume, not diversity).
  * ``churn_label_snapshot`` (X214) — leakage-safe label generation:
    features strictly BEFORE the snapshot date, the churn label
    strictly AFTER — the temporal-split discipline that makes the
    label usable for training at all.

Determinism: staleness, orphan counts, cents reconciliation, vocab
intersections, and labels are exact integers; elasticity moments are
round-9 DECIMAL-staged ln pairs summed exactly (X145's discipline);
every ratio is a single division rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X209: price elasticity ---------------------------------------------


@declared_query(
    "price_elasticity_by_brand",
    oracle="""
    WITH pts AS (
        SELECT p.p_brand,
               CAST(ROUND(ln(CAST(l.l_quantity AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS ly,
               CAST(ROUND(ln(CAST(ROUND(l.l_extendedprice * 100)
                                  AS BIGINT) / 100.0), 9)
                    AS DECIMAL(18,9)) AS lx
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), m AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(lx) AS DECIMAL(38,9)) AS sx,
               CAST(SUM(ly) AS DECIMAL(38,9)) AS sy,
               CAST(SUM(CAST(lx AS DECIMAL(19,9)) * ly)
                    AS DECIMAL(38,18)) AS sxy,
               CAST(SUM(CAST(lx AS DECIMAL(19,9)) * lx)
                    AS DECIMAL(38,18)) AS sxx
        FROM pts GROUP BY p_brand
    )
    SELECT p_brand, n,
           CAST(ROUND((n * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                      6) AS DOUBLE) AS elasticity
    FROM m ORDER BY p_brand
    """,
)
def price_elasticity_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X209: log-log demand slope per brand — OLS of ln(quantity) on
    ln(price) over line items, the price-elasticity point estimate
    (slope -1.2 reads "a 1% price increase loses 1.2% volume"). The
    pricing-analytics staple, and the log-log transform is exactly
    where naive float pipelines go nondeterministic — handled with
    X145's discipline: each ln is computed on an exact operand (cents
    /100, integer quantity), rounded 9, staged DECIMAL(18,9), and the
    moment products fill DECIMAL(38,18) exactly. One division per
    brand at emission, rounded 6. Scale: one fact-dim equi-join (part
    broadcasts), one combinable aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pts = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.round(F.log(F.col("l_quantity").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("ly"),
        F.round(
            F.log(
                F.round(F.col("l_extendedprice") * 100, 0)
                .cast("bigint")
                / 100.0
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("lx"),
    )
    m = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lx").cast("decimal(38,9)").alias("sx"),
        F.sum("ly").cast("decimal(38,9)").alias("sy"),
        F.sum(F.col("lx").cast("decimal(19,9)") * F.col("ly"))
        .cast("decimal(38,18)")
        .alias("sxy"),
        F.sum(F.col("lx").cast("decimal(19,9)") * F.col("lx"))
        .cast("decimal(38,18)")
        .alias("sxx"),
    )
    return m.select(
        "p_brand",
        "n",
        F.round(
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")
            ),
            6,
        ).alias("elasticity"),
    ).orderBy("p_brand")


# ---- X210: freshness audit ----------------------------------------------


def _o_fresh(table: str, ts_expr: str) -> str:
    return f"""
        SELECT '{table}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN({ts_expr}) AS DATE) AS oldest,
               CAST(MAX({ts_expr}) AS DATE) AS newest
        FROM {table}
    """


@declared_query(
    "freshness_audit_tables",
    oracle=f"""
    WITH per_table AS (
        {_o_fresh('events', 'CAST(ts AS DATE)')}
        UNION ALL
        {_o_fresh('orders', 'CAST(o_orderdate AS DATE)')}
        UNION ALL
        {_o_fresh('lineitem', 'CAST(l_shipdate AS DATE)')}
    ), ref AS (
        SELECT MAX(newest) AS global_newest FROM per_table
    )
    SELECT t.table_name, t.n_rows, t.oldest, t.newest,
           CAST(date_diff('day', t.newest,
                          (SELECT global_newest FROM ref)) AS BIGINT)
               AS staleness_days,
           (date_diff('day', t.newest,
                      (SELECT global_newest FROM ref)) > 30)
               AS stale
    FROM per_table t ORDER BY table_name
    """,
)
def freshness_audit_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X210: data-freshness audit — per time-bearing table, the row
    count, time span, and staleness in days behind the freshest table,
    with a 30-day SLA flag. The first dashboard a data platform ships:
    a pipeline that silently stopped loading shows up here before it
    shows up as wrong numbers anywhere else.

    Exactness: dates and day differences are exact; the flag is an
    integer comparison. Scale: one min/max/count aggregate per table
    (combinable, no shuffle beyond 1 row each)."""
    specs = [
        ("events", F.to_date("ts")),
        ("orders", F.to_date("o_orderdate")),
        ("lineitem", F.to_date("l_shipdate")),
    ]
    per = None
    for name, ts in specs:
        t = load_table(spark, sf_dir, name)
        st = t.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(ts).alias("oldest"),
            F.max(ts).alias("newest"),
        )
        per = st if per is None else per.unionByName(st)
    ref = per.agg(F.max("newest").alias("global_newest"))
    stale_days = F.datediff(F.col("global_newest"), F.col("newest"))
    return (
        per.crossJoin(F.broadcast(ref))
        .select(
            "table_name",
            "n_rows",
            "oldest",
            "newest",
            stale_days.cast("bigint").alias("staleness_days"),
            (stale_days > 30).alias("stale"),
        )
        .orderBy("table_name")
    )


# ---- X211: referential coverage audit ------------------------------------

_FK_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def _o_cov(ct: str, ck: str, pt: str, pk: str) -> str:
    return f"""
        SELECT '{ct}.{ck}->{pt}.{pk}' AS fk_edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {ct}
                WHERE {ck} NOT IN (SELECT {pk} FROM {pt}))
                   AS n_orphan_children,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {pt}
                WHERE {pk} NOT IN (SELECT {ck} FROM {ct}))
                   AS n_childless_parents,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {pt})
                   AS n_parents
    """


@declared_query(
    "referential_coverage_audit",
    oracle=" UNION ALL ".join(_o_cov(*e) for e in _FK_EDGES)
    + " ORDER BY fk_edge",
)
def referential_coverage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X211: referential-integrity coverage — per FK edge: orphan child
    rows (FK with no parent: broken loads, late dimensions) and
    childless parents (dimension rows no fact references: dead
    catalog, or a filter silently dropping data). These are exactly
    the rows that vanish or explode in joins — the ground truth
    behind X193's estimate-vs-actual gaps — and the anti-join/semi-
    join shapes here are the J3 operators doing audit duty.

    Exactness: pure counts. Scale: each edge is one anti-join in each
    direction on the join key (shuffle or broadcast per dim size),
    all combinable."""
    # One scan per table per edge (guide §2.3 "aggregate before you
    # shuffle"): both directions of the audit plus the parent count come
    # out of a single key-grain full-outer join of the two pre-aggregates
    # — the r13-before shape ran two anti-joins + a count per edge,
    # scanning the child fact twice and the parent three times (40 scans
    # total; now 8). Key-grain rows are bounded by distinct keys, so the
    # join shuffles far fewer bytes than the anti-joins shuffled fact
    # rows. NULL keys keep anti-join semantics: a NULL child key never
    # matches a parent and lands in the orphan count, same as before.
    out = None
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, sf_dir, ct)
        parent = load_table(spark, sf_dir, pt)
        ckeys = child.groupBy(F.col(ck).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c_rows")
        )
        pkeys = parent.groupBy(F.col(pk).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("p_rows")
        )
        st = (
            ckeys.join(pkeys, "k", "full_outer")
            .agg(
                # coalesce each sum to 0 (ADVICE r13): a sum over a
                # zero-row join is NULL, but the pre-r13 anti-join
                # counts returned 0 on empty tables — match them.
                F.coalesce(
                    F.sum(
                        F.when(F.col("p_rows").isNull(), F.col("c_rows"))
                        .otherwise(F.lit(0))
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_orphan_children"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("c_rows").isNull(), F.col("p_rows"))
                        .otherwise(F.lit(0))
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_childless_parents"),
                F.coalesce(
                    F.sum(F.coalesce(F.col("p_rows"), F.lit(0))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_parents"),
            )
            .select(
                F.lit(f"{ct}.{ck}->{pt}.{pk}").alias("fk_edge"),
                "n_orphan_children",
                "n_childless_parents",
                "n_parents",
            )
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("fk_edge")


# ---- X212: order reconciliation ------------------------------------------


@declared_query(
    "order_reconciliation_audit",
    oracle="""
    WITH line_sum AS (
        SELECT l_orderkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))
                              * (1 + CAST(l_tax AS DECIMAL(18,2))))
                          * 100, 0) AS BIGINT) AS line_cents
        FROM lineitem GROUP BY 1
    ), recon AS (
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
               ls.line_cents,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   - ls.line_cents AS diff_cents
        FROM orders o JOIN line_sum ls
          ON o.o_orderkey = ls.l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_with_lines,
           CAST(SUM(CAST(diff_cents = 0 AS BIGINT)) AS BIGINT)
               AS n_matched,
           CAST(SUM(CAST(diff_cents <> 0 AS BIGINT)) AS BIGINT)
               AS n_mismatched,
           CAST(MAX(ABS(diff_cents)) AS BIGINT) AS max_abs_diff_cents,
           CAST(ROUND(CAST(SUM(CAST(diff_cents <> 0 AS BIGINT))
                           AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS mismatch_share
    FROM recon
    """,
)
def order_reconciliation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X212: financial reconciliation — does the order header total
    equal the line-level sum(extprice * (1-disc) * (1+tax))? Exact
    cents on both sides, mismatch count and worst absolute gap. The
    close-the-books primitive: in real warehouses this catches partial
    loads, currency bugs, and double-applied discounts; on this
    synthetic fixture the header is generated independently of the
    lines, so the audit reports a (stable, exact) 100% mismatch — the
    honest readout that the invariant does NOT hold here, which is
    precisely what the audit exists to say.

    Exactness: both sides reduce to exact cents (decimal products,
    ROUND*100 once); diffs are exact integers. Scale: one combinable
    per-order aggregate + one equi-join on the order key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_sum = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                * (F.lit(1) + F.col("l_tax").cast("decimal(18,2)"))
            )
            * 100,
            0,
        )
        .cast("bigint")
        .alias("line_cents")
    )
    recon = o.join(
        line_sum, o.o_orderkey == line_sum.l_orderkey
    ).select(
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            - F.col("line_cents")
        ).alias("diff_cents")
    )
    return recon.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders_with_lines"),
        F.sum((F.col("diff_cents") == 0).cast("bigint"))
        .cast("bigint")
        .alias("n_matched"),
        F.sum((F.col("diff_cents") != 0).cast("bigint"))
        .cast("bigint")
        .alias("n_mismatched"),
        F.max(F.abs("diff_cents")).cast("bigint").alias(
            "max_abs_diff_cents"
        ),
        F.round(
            F.sum((F.col("diff_cents") != 0).cast("bigint")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mismatch_share"),
    )


# ---- X213: source vocabulary overlap --------------------------------------

from .dedup_queries import _O_TOK  # noqa: E402


@declared_query(
    "source_vocab_overlap",
    oracle=f"""
    WITH sv AS (
        SELECT DISTINCT source, unnest(list_distinct({_O_TOK})) AS tok
        FROM documents
    ), sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM sv GROUP BY source
    ), inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sv a JOIN sv b
          ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_shared,
           x.n_tok AS n_tok_a, y.n_tok AS n_tok_b,
           CAST(ROUND(CAST(i.n_shared AS DOUBLE)
                      / (x.n_tok + y.n_tok - i.n_shared), 6)
                AS DOUBLE) AS vocab_jaccard
    FROM inter i
    JOIN sizes x ON i.source_a = x.source
    JOIN sizes y ON i.source_b = y.source
    ORDER BY source_a, source_b
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X213: pairwise vocabulary Jaccard between document sources —
    the corpus-mix redundancy diagnostic: two sources with near-1
    vocabulary overlap add volume, not diversity, and the mixture
    weights (X116) should know it. Vocabulary-level comparison is the
    cheap first pass before document-level dedup across sources.

    Exactness: vocabularies, intersections, and sizes are exact; one
    division rounded 6. Scale: the (source, token) relation is
    Heaps-law bounded per source; the pair intersection is an
    inverted-index equi-join on the token (the E7 verify shape at the
    SOURCE grain, |sources|^2-bounded output)."""
    from ..operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    sv = (
        docs.select(
            "source",
            F.explode(F.array_distinct(tokens("text"))).alias("tok"),
        )
        .distinct()
    )
    sizes = sv.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    a = sv.select(F.col("source").alias("source_a"), "tok")
    b = sv.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("source", "source_a")
            .withColumnRenamed("n_tok", "n_tok_a"),
            "source_a",
        )
        .join(
            sizes.withColumnRenamed("source", "source_b")
            .withColumnRenamed("n_tok", "n_tok_b"),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_tok_a",
            "n_tok_b",
            F.round(
                F.col("n_shared").cast("double")
                / (
                    F.col("n_tok_a")
                    + F.col("n_tok_b")
                    - F.col("n_shared")
                ),
                6,
            ).alias("vocab_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# ---- X214: leakage-safe churn labels --------------------------------------

_CHURN_HORIZON_DAYS = 7


@declared_query(
    "churn_label_snapshot",
    oracle=f"""
    WITH ref AS (
        SELECT CAST(MAX(CAST(ts AS DATE))
                    - INTERVAL {_CHURN_HORIZON_DAYS} DAY AS DATE)
                   AS snap
        FROM events
    ), past AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events_past,
               CAST(SUM(CAST(event_type = 'purchase' AS BIGINT))
                    AS BIGINT) AS n_purchases_past,
               CAST(MAX(CAST(ts AS DATE)) AS DATE) AS last_seen
        FROM events
        WHERE CAST(ts AS DATE) <= (SELECT snap FROM ref)
        GROUP BY user_id
    ), future AS (
        SELECT DISTINCT user_id
        FROM events
        WHERE CAST(ts AS DATE) > (SELECT snap FROM ref)
          AND event_type = 'purchase'
    )
    SELECT p.user_id, p.n_events_past, p.n_purchases_past,
           CAST(date_diff('day', p.last_seen, (SELECT snap FROM ref))
                AS BIGINT) AS days_since_last_seen,
           (f.user_id IS NULL) AS churned
    FROM past p LEFT JOIN future f ON p.user_id = f.user_id
    ORDER BY p.user_id
    """,
)
def churn_label_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X214: leakage-safe churn-label generation — snapshot date =
    newest event minus 7 days; FEATURES (activity counts, recency)
    come strictly from at-or-before the snapshot, the LABEL (no
    purchase within the 7-day horizon after it) strictly from after.
    The temporal-split discipline that makes a supervised label
    trainable at all: any feature touching post-snapshot data is
    target leakage, and this query's structure makes the boundary a
    single WHERE, auditable at a glance.

    Exactness: dates, counts, and the label anti-join are exact.
    Scale: two passes over events split by the broadcast 1-row
    snapshot date (whitelisted cross); both aggregates combinable on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(
        F.date_sub(F.max(F.to_date("ts")), _CHURN_HORIZON_DAYS).alias(
            "snap"
        )
    )
    tagged = ev.crossJoin(F.broadcast(ref))
    past = (
        tagged.where(F.to_date("ts") <= F.col("snap"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events_past"),
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            .cast("bigint")
            .alias("n_purchases_past"),
            F.max(F.to_date("ts")).alias("last_seen"),
            F.max("snap").alias("snap"),
        )
    )
    future = (
        tagged.where(
            (F.to_date("ts") > F.col("snap"))
            & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("bought", F.lit(True))
    )
    return (
        past.join(future, "user_id", "left")
        .select(
            "user_id",
            "n_events_past",
            "n_purchases_past",
            F.datediff(F.col("snap"), F.col("last_seen"))
            .cast("bigint")
            .alias("days_since_last_seen"),
            F.col("bought").isNull().alias("churned"),
        )
        .orderBy("user_id")
    )
