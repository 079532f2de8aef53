"""Sampling / sketch / layout declared queries (round 6,
twenty-eighth batch — [north-star] scope): survey-grade selection,
mergeable set sketches, corpus byte statistics, space-filling-curve
layout keys, alert de-duplication, and language-model smoothing.

  * ``pps_systematic_sample`` (X269) — probability-proportional-to-
    size systematic sampling of orders by revenue, cumulative sums
    built with the X155 TWO-PHASE discipline (no global window over
    fact rows); step-crossing selection, certainty-unit property
    pinned.
  * ``kmv_union_intersect`` (X270) — two KMV distinct-count sketches
    MERGED into a union sketch (the property that makes KMV a
    distributed sketch), with Jaccard / intersection estimates read
    off the merged sketch and compared against exact truth.
  * ``doc_char_entropy`` (X271) — per-document character entropy —
    the random-garbage / boilerplate detector of corpus cleaning
    (natural text sits in a narrow entropy band; base64 blobs sit
    high, repeated padding sits low).
  * ``zorder_key_orders`` (X272) — Morton (Z-order) key computation
    by explicit bit interleaving + the per-prefix-bucket tile audit
    proving 2D locality (each top-byte bucket spans a 16×16 tile,
    not a 256-wide stripe) — the query-side twin of the X63 layout
    rewrite.
  * ``alert_runs_ewma`` (X273) — consecutive out-of-control RUNS on
    X267's EWMA chart via gaps-and-islands — alert de-duplication:
    one incident per sustained breach, not one page per day.
  * ``good_turing_unigrams`` (X274) — Good-Turing smoothed unigram
    probabilities r* = (r+1)·N_{r+1}/N_r with the unseen-mass
    estimate N_1/N — the classic LM smoothing, exact integers and
    single divisions end to end.

Determinism: cumulative cents, KMV hashes/ranks, char counts,
Morton bits, run spans, and count-of-count tables are exact
integers; every emitted ratio divides once (entropy terms stage
ROUND(c·ln c, 9) into DECIMAL before the exact sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import tokens
from .control_queries import _O_CHART
from .registry import declared_query
from .text_queries import _O_TOK

_PPS_BUDGET = 500
_PPS_SHARD = 4096  # orderkey range per shard (the X155 discipline)
_KMV_K = 64
_BRAND_A = "Brand#11"
_BRAND_B = "Brand#22"


# ---- X269: PPS systematic sampling -----------------------------------------


@declared_query(
    "pps_systematic_sample",
    oracle=f"""
    WITH sized AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), cum AS (
        SELECT o_orderkey, cents,
               SUM(cents) OVER (ORDER BY o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cents) OVER () AS total
        FROM sized
    )
    SELECT o_orderkey, cents,
           CAST(cum AS BIGINT) AS cum_cents,
           CAST(cum // (total // {_PPS_BUDGET}) AS BIGINT) AS tick
    FROM cum
    WHERE (cum - cents) // (total // {_PPS_BUDGET})
          < cum // (total // {_PPS_BUDGET})
    ORDER BY o_orderkey
    """,
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X269: probability-proportional-to-size SYSTEMATIC sampling —
    walk the revenue line in steps of total/500 and select every
    order whose cumulative-cents interval crosses a step boundary:
    inclusion probability ∝ cents (the unequal-probability design
    behind every revenue-weighted audit sample), orders with
    cents ≥ step are selected with CERTAINTY (pinned), and the
    sample size is 500 ± 1 by construction. The cumulative sum is
    built with the X155 two-phase discipline — orderkey-range
    shards → per-shard totals → tiny offset cumsum → within-shard
    partitioned cumsum — so NO global window ever touches fact
    rows (the oracle IS the single-task global cumsum and the
    distributed plan reproduces it exactly).

    Exactness: cents/cums/steps/ticks all exact integers
    (truncating DIV both engines); selection is an integer
    boundary-crossing test — no float anywhere. Scale: one
    combinable shard aggregate + |shards|-row offset relation +
    one partitioned window."""
    o = load_table(spark, sf_dir, "orders")
    sized = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    ).withColumn("shard", F.expr(f"o_orderkey DIV {_PPS_SHARD}"))
    shard_tot = sized.groupBy("shard").agg(
        F.sum("cents").cast("bigint").alias("stot")
    )
    w_off = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_tot.select(
        "shard",
        F.coalesce(F.sum("stot").over(w_off), F.lit(0)).alias("off"),
        F.sum("stot").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        sized.join(F.broadcast(offsets), "shard")
        .select(
            "o_orderkey",
            "cents",
            (F.col("off") + F.sum("cents").over(w_in)).alias("cum"),
            "total",
        )
    )
    return (
        cum.where(
            F.expr(
                f"(cum - cents) DIV (total DIV {_PPS_BUDGET})"
            )
            < F.expr(f"cum DIV (total DIV {_PPS_BUDGET})")
        )
        .select(
            "o_orderkey",
            "cents",
            F.col("cum").cast("bigint").alias("cum_cents"),
            F.expr(f"cum DIV (total DIV {_PPS_BUDGET})")
            .cast("bigint")
            .alias("tick"),
        )
        .orderBy("o_orderkey")
    )


# ---- X270: KMV union / intersection ------------------------------------------


@declared_query(
    "kmv_union_intersect",
    oracle=f"""
    WITH buyers AS (
        SELECT DISTINCT p.p_brand AS brand, o.o_custkey AS cust
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand IN ('{_BRAND_A}', '{_BRAND_B}')
    ), hashed AS (
        SELECT brand, cust,
               (('0x' || substr(md5('kmv|' || CAST(cust AS VARCHAR)),
                 1, 12))::BIGINT) AS h
        FROM buyers
    ), ka AS (
        SELECT h FROM hashed WHERE brand = '{_BRAND_A}'
        ORDER BY h LIMIT {_KMV_K}
    ), kb AS (
        SELECT h FROM hashed WHERE brand = '{_BRAND_B}'
        ORDER BY h LIMIT {_KMV_K}
    ), ku AS (
        SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
        ORDER BY h LIMIT {_KMV_K}
    ), exact AS (
        SELECT CAST(SUM(CASE WHEN has_a THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN has_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN has_a AND has_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS ni
        FROM (SELECT cust,
                     BOOL_OR(brand = '{_BRAND_A}') AS has_a,
                     BOOL_OR(brand = '{_BRAND_B}') AS has_b
              FROM buyers GROUP BY cust)
    ), sk AS (
        SELECT CAST((SELECT COUNT(*) FROM ku u
                     WHERE u.h IN (SELECT h FROM ka)
                       AND u.h IN (SELECT h FROM kb)) AS BIGINT)
                   AS overlap_k,
               (SELECT MAX(h) FROM ku) AS hk,
               CAST((SELECT COUNT(*) FROM ku) AS BIGINT) AS k_eff
    )
    SELECT e.na AS exact_a, e.nb AS exact_b, e.ni AS exact_intersect,
           CAST(ROUND(CAST(e.ni AS DOUBLE)
                      / (e.na + e.nb - e.ni), 6) AS DOUBLE)
               AS exact_jaccard,
           s.overlap_k, s.k_eff,
           CAST(ROUND((s.k_eff - 1) * 281474976710656.0 / s.hk, 6)
                AS DOUBLE) AS union_est,
           CAST(ROUND(CAST(s.overlap_k AS DOUBLE) / s.k_eff, 6)
                AS DOUBLE) AS jaccard_est,
           CAST(ROUND(CAST(s.overlap_k AS DOUBLE) / s.k_eff
                      * ((s.k_eff - 1) * 281474976710656.0 / s.hk),
                      6) AS DOUBLE) AS intersect_est
    FROM exact e CROSS JOIN sk s
    """,
)
def kmv_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X270: KMV (k-minimum-values) sketch SET OPERATIONS — sketch
    the buyer sets of two brands (k = 64 smallest md5 hashes each),
    MERGE them into the union sketch by re-taking the k smallest of
    the combined lists (the one-line merge that makes KMV a
    distributed/streaming sketch: shard sketches combine without
    touching raw data — X191's single-set KMV measured rate error,
    this exercises the algebra), then read off the union estimate
    (k−1)/h_k, the Jaccard estimate |KMV(A∪B) ∩ A_k ∩ B_k|/k, and
    the intersection estimate — each next to its EXACT twin so the
    sketch error is the visible output.

    Exactness: hashes exact 48-bit integers from the md5 bridge;
    ranks/overlaps exact; every estimate is arithmetic on exact
    integers both engines evaluate identically. Scale: per-brand
    top-k via TakeOrdered (never a global sort of buyers); the
    merge and membership tests run on ≤ 3k-row sketch relations."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    buyers = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(
                p.where(F.col("p_brand").isin(_BRAND_A, _BRAND_B))
                .select("p_partkey", "p_brand")
            ),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.col("o_custkey").alias("cust"),
        )
        .distinct()
    )
    hashed = buyers.select(
        "brand",
        "cust",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("kmv"), F.col("cust").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    ).localCheckpoint(eager=True)
    ka = (
        hashed.where(F.col("brand") == _BRAND_A)
        .select("h")
        .orderBy("h")
        .limit(_KMV_K)
    )
    kb = (
        hashed.where(F.col("brand") == _BRAND_B)
        .select("h")
        .orderBy("h")
        .limit(_KMV_K)
    )
    ku = (
        ka.unionByName(kb)
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
    )
    exact = (
        buyers.groupBy("cust")
        .agg(F.countDistinct("brand").alias("cnt"))
        .agg(
            F.sum(F.when(F.col("cnt") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("ni")
        )
        .crossJoin(
            F.broadcast(
                buyers.agg(
                    F.countDistinct(
                        F.when(
                            F.col("brand") == _BRAND_A, F.col("cust")
                        )
                    )
                    .cast("bigint")
                    .alias("na"),
                    F.countDistinct(
                        F.when(
                            F.col("brand") == _BRAND_B, F.col("cust")
                        )
                    )
                    .cast("bigint")
                    .alias("nb"),
                )
            )
        )
    )
    inter = ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
    sk = (
        ku.agg(
            F.max("h").alias("hk"),
            F.count(F.lit(1)).cast("bigint").alias("k_eff"),
        )
        .crossJoin(
            F.broadcast(
                inter.agg(
                    F.count(F.lit(1)).cast("bigint").alias("overlap_k")
                )
            )
        )
    )
    hspace = 2.0**48  # 12 hex chars
    return exact.crossJoin(F.broadcast(sk)).select(
        F.col("na").alias("exact_a"),
        F.col("nb").alias("exact_b"),
        F.col("ni").alias("exact_intersect"),
        F.round(
            F.col("ni").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ni")),
            6,
        ).alias("exact_jaccard"),
        "overlap_k",
        "k_eff",
        F.round(
            (F.col("k_eff") - 1) * F.lit(hspace) / F.col("hk"), 6
        ).alias("union_est"),
        F.round(
            F.col("overlap_k").cast("double") / F.col("k_eff"), 6
        ).alias("jaccard_est"),
        F.round(
            F.col("overlap_k").cast("double")
            / F.col("k_eff")
            * ((F.col("k_eff") - 1) * F.lit(hspace) / F.col("hk")),
            6,
        ).alias("intersect_est"),
    )


# ---- X271: per-doc character entropy --------------------------------------------


@declared_query(
    "doc_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT d.doc_id, substr(d.text, p.p, 1) AS ch
        FROM documents d
        JOIN LATERAL (
            SELECT unnest(generate_series(1,
                CAST(length(d.text) AS INTEGER))) AS p
        ) p ON TRUE
    ), counts AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars GROUP BY 1, 2
    ), agg AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(CAST(ROUND(c * ln(c), 9) AS DECIMAL(28,9)))
                    AS DECIMAL(38,9)) AS clnc9
        FROM counts GROUP BY 1
    )
    SELECT doc_id, n AS n_chars, n_distinct,
           CAST(ROUND(ln(n) - CAST(clnc9 AS DOUBLE) / n, 6)
                AS DOUBLE) AS entropy_nats
    FROM agg ORDER BY doc_id
    """,
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X271: per-document character entropy
    H = ln(n) − (Σ c·ln c)/n — the corpus-cleaning signal that
    catches what token-level gates miss: base64/hex blobs sit HIGH
    (near-uniform bytes), template padding and repeated-char runs
    sit LOW, and natural language occupies a narrow band in between
    (the zlib-proxy quality feature of CCNet-class pipelines,
    computed exactly instead of by compressing). The per-doc byte
    histogram is bounded by the alphabet, so the statistic costs
    one pass over corpus bytes regardless of document count.

    Exactness: char counts exact; each c·ln c stages ROUND(.., 9)
    into DECIMAL(28,9) (the X145 ln discipline) so the sum is
    exact decimal; the entropy is one subtraction/division on
    identical operands rounded 6. Scale: the char explode is
    linear in corpus bytes and reduces immediately in a combinable
    (doc, char) aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text"))
        ).alias("p"),
        F.col("text"),
    ).select(
        "doc_id", F.expr("substring(text, p, 1)").alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c")), 9).cast(
                "decimal(28,9)"
            )
        )
        .cast("decimal(38,9)")
        .alias("clnc9"),
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        "n_distinct",
        F.round(
            F.log(F.col("n")) - F.col("clnc9").cast("double") / F.col("n"),
            6,
        ).alias("entropy_nats"),
    ).orderBy("doc_id")


# ---- X272: Z-order (Morton) layout keys -------------------------------------------


def _o_morton(x: str, y: str) -> str:
    """16-bit Morton interleave of two 8-bit coords (DuckDB)."""
    terms = []
    for i in range(8):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@declared_query(
    "zorder_key_orders",
    oracle=f"""
    WITH coords AS (
        SELECT o_orderkey,
               CAST(o_custkey % 256 AS BIGINT) AS x,
               CAST(date_diff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS y
        FROM orders
    ), keyed AS (
        SELECT o_orderkey, x, y,
               CAST({_o_morton("x", "y")} AS BIGINT) AS morton
        FROM coords
    )
    SELECT CAST(morton >> 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS min_x,
           CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y,
           CAST(MAX(y) AS BIGINT) AS max_y,
           CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1)
                AS BIGINT) AS tile_area
    FROM keyed GROUP BY 1 ORDER BY 1
    """,
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X272: Morton (Z-order) key computation by explicit bit
    interleave of (custkey mod 256, order-epoch-day mod 256), with
    the per-prefix-bucket TILE AUDIT: grouping by the top 8 Morton
    bits, every bucket's (x, y) bounding box is a 16×16 tile
    (pinned ≤ 256 cells) — the measured locality property that
    makes Z-order layouts prune BOTH dimensions, where a
    sort-by-custkey layout gives the same bucket a 1×256 stripe
    and date predicates prune nothing. The query-side twin of the
    X63 layout rewrite (that one pins parquet row-group stats;
    this one exposes the key function itself as a reusable
    column).

    Exactness: pure integer bit arithmetic (shifts/masks identical
    on both engines) — no floats anywhere. Scale: one scan + one
    combinable 256-group aggregate."""
    o = load_table(spark, sf_dir, "orders")
    coords = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("bigint").alias("x"),
        (F.unix_date(F.to_date("o_orderdate")) % 256)
        .cast("bigint")
        .alias("y"),
    )
    morton = None
    for i in range(8):
        xb = F.shiftleft(
            F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        yb = F.shiftleft(
            F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
        morton = xb + yb if morton is None else morton + xb + yb
    keyed = coords.withColumn("morton", morton.cast("bigint"))
    return (
        keyed.groupBy(
            F.shiftright(F.col("morton"), 8)
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
        .withColumn(
            "tile_area",
            (
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            ).cast("bigint"),
        )
        .orderBy("bucket")
    )


# ---- X273: alert runs on the EWMA chart ---------------------------------------------


@declared_query(
    "alert_runs_ewma",
    oracle=f"""
    WITH {_O_CHART}, flags AS (
        SELECT event_type, day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS rn
        FROM lim
        WHERE ROUND(abs(ewma - CAST(mu9 AS DOUBLE))
                    - CAST(lim9 AS DOUBLE), 9) > 0
    ), islands AS (
        SELECT event_type, day,
               date_diff('day', DATE '1970-01-01', day) - rn AS grp
        FROM flags
    ), runs AS (
        SELECT event_type, MIN(day) AS run_start,
               CAST(COUNT(*) AS BIGINT) AS run_days
        FROM islands GROUP BY event_type, grp
    ), per_type AS (
        SELECT event_type,
               CAST(SUM(run_days) AS BIGINT) AS ooc_days,
               CAST(COUNT(*) AS BIGINT) AS n_incidents,
               CAST(SUM(CASE WHEN run_days >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sustained,
               CAST(MAX(run_days) AS BIGINT) AS longest_run,
               MIN(run_start) AS first_breach
        FROM runs GROUP BY event_type
    )
    SELECT t.event_type,
           COALESCE(p.ooc_days, 0) AS ooc_days,
           COALESCE(p.n_incidents, 0) AS n_incidents,
           COALESCE(p.n_sustained, 0) AS n_sustained,
           COALESCE(p.longest_run, 0) AS longest_run,
           p.first_breach
    FROM (SELECT DISTINCT event_type FROM daily) t
    LEFT JOIN per_type p ON t.event_type = p.event_type
    ORDER BY t.event_type
    """,
)
def alert_runs_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X273: incident summary over X267's EWMA control chart —
    gaps-and-islands over the out-of-control days (epoch-day minus
    per-type row number groups consecutive days) rolled up to an
    ALWAYS-|types|-row report: breach days, incident count (one per
    run — alert DE-DUPLICATION, "one incident per sustained shift"
    not "one page per day"), sustained (≥ 2-day) incidents, longest
    run, first breach date (NULL when the chart never breached —
    the shape stays stable on a quiet fixture, the X216 lesson). Built
    directly on the X267 chart definition — the Spark side recomputes
    the identical chart columns and the oracle shares X267's CTE
    text, so the two queries can never drift apart.

    Exactness: the breach set is X267's round-9-margin verdict;
    island grouping and spans are exact integer/date arithmetic.
    Scale: the chart reduces to one row per (type, day); islands
    are one partitioned window + one combinable aggregate."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("s2"),
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-50, Window.currentRow)
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    xs = F.collect_list(F.col("y").cast("double")).over(wf)
    ewma = F.aggregate(
        F.slice(xs, 2, F.size(xs) - 1),
        F.element_at(xs, 1),
        lambda acc, x: acc * 0.5 + x * 0.5,
    )
    series = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        F.row_number().over(wt).alias("t"),
        ewma.alias("ewma"),
        F.round(F.col("s1").cast("double") / F.col("n"), 9)
        .cast("decimal(18,9)")
        .alias("mu9"),
        "n",
        "s1",
        "s2",
    )
    lim = series.withColumn(
        "lim9",
        F.round(
            3
            * F.sqrt(
                (
                    F.col("n") * F.col("s2")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
            )
            / F.col("n")
            * F.sqrt((1 - F.pow(F.lit(0.25), F.col("t"))) / 3),
            9,
        ).cast("decimal(18,9)"),
    )
    flags = lim.where(
        F.round(
            F.abs(F.col("ewma") - F.col("mu9").cast("double"))
            - F.col("lim9").cast("double"),
            9,
        )
        > 0
    ).select(
        "event_type",
        "day",
        F.row_number().over(wt).alias("rn"),
    )
    islands = flags.select(
        "event_type",
        "day",
        (F.unix_date(F.col("day")) - F.col("rn")).alias("grp"),
    )
    runs = islands.groupBy("event_type", "grp").agg(
        F.min("day").alias("run_start"),
        F.count(F.lit(1)).cast("bigint").alias("run_days"),
    )
    per_type = runs.groupBy("event_type").agg(
        F.sum("run_days").cast("bigint").alias("ooc_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_incidents"),
        F.sum(F.when(F.col("run_days") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sustained"),
        F.max("run_days").cast("bigint").alias("longest_run"),
        F.min("run_start").alias("first_breach"),
    )
    types = daily.select("event_type").distinct()
    return (
        types.join(per_type, "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("ooc_days"), F.lit(0))
            .cast("bigint")
            .alias("ooc_days"),
            F.coalesce(F.col("n_incidents"), F.lit(0))
            .cast("bigint")
            .alias("n_incidents"),
            F.coalesce(F.col("n_sustained"), F.lit(0))
            .cast("bigint")
            .alias("n_sustained"),
            F.coalesce(F.col("longest_run"), F.lit(0))
            .cast("bigint")
            .alias("longest_run"),
            "first_breach",
        )
        .orderBy("event_type")
    )


# ---- X274: Good-Turing smoothing ------------------------------------------------------


@declared_query(
    "good_turing_trigrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_O_TOK} AS t FROM documents
    ), cnt AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS r
        FROM (
            SELECT t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2]
                AS word
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1,
                    CAST(len(t) - 2 AS INTEGER))) AS i
            ) i
        ) g
        GROUP BY word
    ), tot AS (
        SELECT CAST(SUM(r) AS BIGINT) AS n FROM cnt
    ), coc AS (
        SELECT r, CAST(COUNT(*) AS BIGINT) AS nr
        FROM cnt GROUP BY r
    ), smoothed AS (
        SELECT c.word, c.r, k.nr,
               CASE WHEN k1.nr IS NOT NULL THEN
                   CAST(ROUND((c.r + 1) * CAST(k1.nr AS DOUBLE)
                        / k.nr, 6) AS DOUBLE) END AS r_star
        FROM cnt c
        JOIN coc k ON c.r = k.r
        LEFT JOIN coc k1 ON k1.r = c.r + 1
    )
    SELECT s.word, s.r, s.nr, s.r_star,
           CAST(ROUND(CAST(s.r AS DOUBLE) / t.n, 6) AS DOUBLE)
               AS p_raw,
           CAST(ROUND(s.r_star / t.n, 6) AS DOUBLE) AS p_gt,
           CAST(ROUND(COALESCE((SELECT CAST(nr AS DOUBLE) FROM coc
                       WHERE r = 1), 0) / t.n, 6) AS DOUBLE)
               AS p0_unseen_mass
    FROM smoothed s CROSS JOIN tot t
    ORDER BY s.r DESC, s.word LIMIT 30
    """,
)
def good_turing_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X274: Good-Turing smoothed TRIGRAM probabilities —
    r* = (r+1)·N_{{r+1}}/N_r from the counts-of-counts table, with
    the unseen-probability mass N_1/N (the estimate that makes GT
    the classic fix for maximum-likelihood's zero-probability
    problem; X96/X123's cross-entropy scorers consume exactly this
    kind of smoothed LM). TRIGRAMS deliberately, not unigrams: the
    fixture's ~30-word vocabulary has no singletons at all (every
    unigram count is in the hundreds — N_1 = 0, GT degenerate),
    while the trigram spectrum is textbook-shaped (N_1 ≈ 9400,
    N_2 ≈ 4700 at sf0.001) — exactly the sparse-tail regime GT was
    invented for. Where N_{{r+1}} = 0 (gaps high in the count
    spectrum — GT's known tail weakness) r* is NULL on both
    engines rather than a hidden interpolation: the honest readout
    that production GT needs the Simple-GT regression fill, which
    would put a fitted log-log line (X145's machinery) behind the
    gaps.

    Exactness: r / N_r / N all exact integers from combinable
    aggregates; r* and both probabilities are single divisions
    rounded 6. Scale: the counts-of-counts table is tiny (distinct
    r values grow ~log of corpus size); the token stream reduces in
    the first aggregate."""
    from ..operators.textanalysis import ngrams

    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array in its own projection FIRST:
    # feeding tokens("text") straight into ngrams() re-evaluates the
    # regex split once per array slot inside the transform lambda
    # (measured 20s vs 1.2s at sf0.1)
    toked = docs.select(tokens("text").alias("__toks"))
    cnt = (
        toked.select(
            F.explode(ngrams(F.col("__toks"), 3)).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    tot = cnt.agg(F.sum("r").cast("bigint").alias("n"))
    coc = cnt.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("nr")
    )
    coc1 = coc.select(
        (F.col("r") - 1).alias("r"), F.col("nr").alias("nr1")
    )
    smoothed = (
        cnt.join(F.broadcast(coc), "r")
        .join(F.broadcast(coc1), "r", "left")
        .select(
            "word",
            "r",
            "nr",
            F.when(
                F.col("nr1").isNotNull(),
                F.round(
                    (F.col("r") + 1)
                    * F.col("nr1").cast("double")
                    / F.col("nr"),
                    6,
                ),
            ).alias("r_star"),
        )
    )
    # 1-row always (0 when no singletons exist), never an empty
    # relation that would zero the cross join
    p0 = coc.agg(
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("nr"))), F.lit(0)
        ).alias("n1")
    )
    return (
        smoothed.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(p0))
        .select(
            "word",
            "r",
            "nr",
            "r_star",
            F.round(F.col("r").cast("double") / F.col("n"), 6).alias(
                "p_raw"
            ),
            F.round(F.col("r_star") / F.col("n"), 6).alias("p_gt"),
            F.round(
                F.col("n1").cast("double") / F.col("n"), 6
            ).alias("p0_unseen_mass"),
        )
        .orderBy(F.desc("r"), F.asc("word"))
        .limit(30)
    )
