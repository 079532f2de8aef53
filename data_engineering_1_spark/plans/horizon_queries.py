"""Temporal / embedding-budget declared queries (round 6, thirtieth
batch — [north-star] scope): dimension budgeting, sequence mining,
time-respecting graph reach, sequential policy simulation, corpus
diversity, and product-engagement ratios.

  * ``embedding_truncation_fidelity`` (X281) — cosine fidelity of
    the first-k embedding dimensions vs the full vector over a
    deterministic pair sample — the Matryoshka-style dimension
    budget audit (how many dims can retrieval drop?).
  * ``sequential_rules_parts`` (X282) — A-then-B cross-order
    association rules (customer bought A strictly before first
    buying B) — the TEMPORAL complement of X235's same-basket
    rules.
  * ``temporal_reach_parts`` (X283) — earliest-arrival reachability
    over the TIME-STAMPED co-purchase graph (paths must respect
    edge times) — the ninth iterative graph operator; static BFS
    overstates reach on temporal networks.
  * ``ss_policy_inventory`` (X284) — the (s,S) inventory policy
    simulated EXACTLY as an ordered integer fold with the whole
    (inventory, reorders, stockouts) state PACKED into one BIGINT —
    the inherently-sequential simulation both engines replay
    bit-identically.
  * ``trigram_diversity_sources`` (X285) — per-source lexical
    diversity over trigrams (type-token ratio, hapax share,
    Herdan's C) — the corpus-mix variety readout.
  * ``wau_mau_stickiness`` (X286) — DAU / trailing-7-day / trailing
    -30-day distinct actives + the DAU/MAU stickiness ratio — the
    canonical engagement metric, via X72's per-day-set trick.

Determinism: quantized dots, support counts, arrival days, packed
policy states, and token counts are exact integers; cosines and
Herdan terms stage ROUND(.., 9) into DECIMAL; each emitted ratio
divides once, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query
from .series_queries import _O_EDGES
from .text_queries import _O_TOK

_TRUNC_Q = 1_000_000
_TRUNC_KS = (8, 16, 32, 64)
_SEQ_TOP = 50  # anchor part universe for sequential rules
_SS_SMALL = 40  # reorder point s
_SS_BIG = 400  # order-up-to level S


# ---- X281: embedding truncation fidelity ------------------------------------


@declared_query(
    "embedding_truncation_fidelity",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               a.embedding AS ea, b.embedding AS eb
        FROM embeddings a JOIN embeddings b
          ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 10 = 0
    ), qd AS (
        SELECT va, vb, d.d,
               CAST(ROUND(CAST(ea[d.d] AS DOUBLE) * {_TRUNC_Q})
                    AS BIGINT) AS qa,
               CAST(ROUND(CAST(eb[d.d] AS DOUBLE) * {_TRUNC_Q})
                    AS BIGINT) AS qb
        FROM pairs
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) d
    ), ks AS (SELECT unnest([{", ".join(str(k) for k in _TRUNC_KS)}])
                  AS k
    ), sums AS (
        SELECT q.va, q.vb, ks.k,
               CAST(SUM(CASE WHEN q.d <= ks.k
                        THEN q.qa * q.qb ELSE 0 END) AS BIGINT)
                   AS dot,
               CAST(SUM(CASE WHEN q.d <= ks.k
                        THEN q.qa * q.qa ELSE 0 END) AS BIGINT)
                   AS na,
               CAST(SUM(CASE WHEN q.d <= ks.k
                        THEN q.qb * q.qb ELSE 0 END) AS BIGINT)
                   AS nb
        FROM qd q CROSS JOIN ks
        GROUP BY 1, 2, 3
    ), coss AS (
        SELECT va, vb, k,
               CAST(ROUND(CAST(dot AS DOUBLE)
                    / sqrt(CAST(na AS DOUBLE) * nb), 9)
                    AS DECIMAL(18,9)) AS cos9
        FROM sums
    ), deltas AS (
        SELECT c.va, c.vb, c.k,
               abs(c.cos9 - f.cos9) AS adelta
        FROM coss c JOIN coss f
          ON c.va = f.va AND c.vb = f.vb AND f.k = 64
    )
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(SUM(adelta) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS mean_abs_delta,
           CAST(MAX(adelta) AS DOUBLE) AS max_abs_delta
    FROM deltas GROUP BY k ORDER BY k
    """,
)
def embedding_truncation_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X281: the dimension-budget audit — for k ∈ {8,16,32,64}, how
    far the first-k-dimensions cosine deviates from the full-vector
    cosine over a deterministic adjacent-id pair sample (the
    Matryoshka / truncated-retrieval question: serve 16 dims and
    keep ranking quality, or pay for 64?). mean/max |cos_k − cos_64|
    per k is the curve a platform reads before picking the serving
    dimension; by construction the k = 64 row is exactly 0 — the
    built-in sanity anchor.

    Exactness: components quantize to exact integers (the X173
    bridge), all dots/norms are exact BIGINT sums, each cosine is
    one division staged ROUND(.., 9) into DECIMAL, and deltas are
    exact decimal differences (the mean is one more division).
    Scale: the pair sample is id-arithmetic-bounded (n/10 pairs);
    per pair the work is one 64-term reduction per k."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b, F.col("b.vec_id") == F.col("a.vec_id") + 1
    ).where(F.col("a.vec_id") % 10 == 0).select(
        F.col("a.vec_id").alias("va"),
        F.col("b.vec_id").alias("vb"),
        F.col("a.embedding").alias("ea"),
        F.col("b.embedding").alias("eb"),
    )
    qd = pairs.select(
        "va",
        "vb",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("d"),
        "ea",
        "eb",
    ).select(
        "va",
        "vb",
        "d",
        F.round(
            F.element_at("ea", F.col("d")).cast("double") * _TRUNC_Q,
            0,
        )
        .cast("bigint")
        .alias("qa"),
        F.round(
            F.element_at("eb", F.col("d")).cast("double") * _TRUNC_Q,
            0,
        )
        .cast("bigint")
        .alias("qb"),
    )
    ks = spark.range(len(_TRUNC_KS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _TRUNC_KS]),
            (F.col("id") + 1).cast("int"),
        ).alias("k")
    )
    sums = (
        qd.crossJoin(F.broadcast(ks))
        .groupBy("va", "vb", "k")
        .agg(
            F.sum(
                F.when(
                    F.col("d") <= F.col("k"),
                    F.col("qa") * F.col("qb"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("dot"),
            F.sum(
                F.when(
                    F.col("d") <= F.col("k"),
                    F.col("qa") * F.col("qa"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("na"),
            F.sum(
                F.when(
                    F.col("d") <= F.col("k"),
                    F.col("qb") * F.col("qb"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("nb"),
        )
    )
    coss = sums.select(
        "va",
        "vb",
        "k",
        F.round(
            F.col("dot").cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb")),
            9,
        )
        .cast("decimal(18,9)")
        .alias("cos9"),
    )
    full = coss.where(F.col("k") == 64).select(
        "va", "vb", F.col("cos9").alias("cos_full")
    )
    deltas = coss.join(full, ["va", "vb"]).select(
        "k",
        F.abs(F.col("cos9") - F.col("cos_full")).alias("adelta"),
    )
    return (
        deltas.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum("adelta").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_abs_delta"),
            F.max("adelta").cast("double").alias("max_abs_delta"),
        )
        .orderBy("k")
    )


# ---- X282: sequential (A then B) rules -----------------------------------------


@declared_query(
    "sequential_rules_parts",
    oracle=f"""
    WITH firsts AS (
        SELECT o.o_custkey AS cust, l.l_partkey AS part,
               MIN(CAST(o.o_orderdate AS DATE)) AS first_day
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ), top_parts AS (
        SELECT part FROM (
            SELECT part, COUNT(*) AS buyers FROM firsts GROUP BY part
            ORDER BY buyers DESC, part LIMIT {_SEQ_TOP}
        )
    ), ft AS (
        SELECT f.* FROM firsts f JOIN top_parts t ON f.part = t.part
    ), buyers AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS n_buyers
        FROM ft GROUP BY part
    ), ncust AS (
        SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS n FROM firsts
    ), seq AS (
        SELECT a.part AS ante, b.part AS conseq,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM ft a JOIN ft b
          ON a.cust = b.cust AND a.part <> b.part
         AND a.first_day < b.first_day
        GROUP BY 1, 2
    )
    SELECT s.ante, s.conseq, s.support,
           ba.n_buyers AS ante_buyers, bc.n_buyers AS conseq_buyers,
           CAST(ROUND(CAST(s.support AS DOUBLE) / ba.n_buyers, 6)
                AS DOUBLE) AS confidence,
           CAST(ROUND(CAST(s.support AS DOUBLE) * t.n
                / (CAST(ba.n_buyers AS DOUBLE) * bc.n_buyers), 6)
                AS DOUBLE) AS lift
    FROM seq s
    JOIN buyers ba ON s.ante = ba.part
    JOIN buyers bc ON s.conseq = bc.part
    CROSS JOIN ncust t
    ORDER BY s.support DESC, s.ante, s.conseq LIMIT 30
    """,
)
def sequential_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X282: sequential association rules — "customers who bought A
    LATER bought B for the first time" (strict first-purchase date
    order), the temporal complement of X235's same-basket rules: a
    basket rule can't tell replenishment direction or gateway
    products, a sequence rule can. The part universe is the top-50
    by buyer count (the X184 anchor discipline bounding the pair
    fan-out to 50², never catalog²); support counts customers,
    confidence divides by the antecedent's buyers, lift normalizes
    by the consequent's base rate.

    Exactness: first-days/supports/buyer counts exact; confidence
    and lift are single divisions rounded 6; ties in the top-30
    break on (ante, conseq). Scale: one (cust, part) first-date
    aggregate, a broadcast top-50 semi-join, one cust-keyed
    self-join whose groups are |history∩top50| ≤ 50 per customer."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    firsts = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .agg(F.min(F.to_date("o_orderdate")).alias("first_day"))
    )
    top_parts = (
        firsts.groupBy("part")
        .agg(F.count(F.lit(1)).alias("buyers"))
        .orderBy(F.desc("buyers"), F.asc("part"))
        .limit(_SEQ_TOP)
        .select("part")
    )
    ft = firsts.join(F.broadcast(top_parts), "part").localCheckpoint(
        eager=True
    )
    buyers = ft.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers")
    )
    ncust = firsts.agg(
        F.countDistinct("cust").cast("bigint").alias("n")
    )
    a = ft.alias("a")
    b = ft.alias("b")
    seq = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.part") != F.col("b.part"))
            & (F.col("a.first_day") < F.col("b.first_day")),
        )
        .groupBy(
            F.col("a.part").alias("ante"),
            F.col("b.part").alias("conseq"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    ba = buyers.select(
        F.col("part").alias("ante"), F.col("n_buyers").alias("ante_buyers")
    )
    bc = buyers.select(
        F.col("part").alias("conseq"),
        F.col("n_buyers").alias("conseq_buyers"),
    )
    return (
        seq.join(F.broadcast(ba), "ante")
        .join(F.broadcast(bc), "conseq")
        .crossJoin(F.broadcast(ncust))
        .select(
            "ante",
            "conseq",
            "support",
            "ante_buyers",
            "conseq_buyers",
            F.round(
                F.col("support").cast("double") / F.col("ante_buyers"),
                6,
            ).alias("confidence"),
            F.round(
                F.col("support").cast("double")
                * F.col("n")
                / (
                    F.col("ante_buyers").cast("double")
                    * F.col("conseq_buyers")
                ),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "ante", "conseq")
        .limit(30)
    )


# ---- X283: time-respecting reachability ------------------------------------------


def _o_temporal_round(prev: str) -> str:
    """One unrolled earliest-arrival relaxation round (DuckDB)."""
    return f"""
        SELECT node, CAST(MIN(arrival) AS BIGINT) AS arrival FROM (
            SELECT node, arrival FROM {prev}
            UNION ALL
            SELECT e.dst AS node, e.t AS arrival
            FROM tedges e JOIN {prev} p ON e.src = p.node
            WHERE e.t >= p.arrival
        ) GROUP BY node
    """


@declared_query(
    "temporal_reach_parts",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey,
               date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS t
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, a.t
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
    ), tedges AS (
        SELECT DISTINCT u AS src, v AS dst, t FROM pairs
        UNION
        SELECT DISTINCT v AS src, u AS dst, t FROM pairs
    ), seed AS (
        SELECT MIN(src) AS node FROM tedges
    ), r0 AS (
        SELECT node, CAST(0 AS BIGINT) AS arrival FROM seed
    ), r1 AS ({_o_temporal_round("r0")}
    ), r2 AS ({_o_temporal_round("r1")}
    ), r3 AS ({_o_temporal_round("r2")}
    )
    SELECT node AS part_key, arrival AS arrival_day
    FROM r3 ORDER BY arrival, part_key LIMIT 30
    """,
)
def temporal_reach_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X283: earliest-arrival reachability over the TIME-STAMPED
    co-purchase graph — an edge (u, v, t) is traversable only if you
    reached u by time t, so arrival(v) relaxes to
    min over {{t : edge (z,v,t), t ≥ arrival(z)}} — the ninth
    iterative graph operator, and semantically distinct from every
    static one: static BFS says "connected", temporal reach says
    "an influence path EXISTS in time order" (contagion, information
    flow, supply propagation). Three synchronous relaxation rounds
    from the lowest-numbered part at arrival 0; the rank vector
    stays SPARSE (the X254 property — unreached nodes absent, work
    is ball-sized); min over exact integer epoch days is order-free
    and the oracle unrolls identical rounds under the full hash.

    Scale: per round one |ball|-row join into the temporal edge
    list + one combinable MIN; the time predicate rides the join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_partkey",
            F.unix_date(F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("t"),
        )
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("u"),
        F.col("b.l_partkey").alias("v"),
        F.col("a.t").alias("t"),
    )
    tedges = (
        pairs.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "t"
        )
        .unionByName(
            pairs.select(
                F.col("v").alias("src"), F.col("u").alias("dst"), "t"
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed = tedges.agg(F.min("src").alias("node"))
    arr = seed.select(
        "node", F.lit(0).cast("bigint").alias("arrival")
    )
    for _ in range(3):
        nxt = (
            tedges.join(
                F.broadcast(arr.withColumnRenamed("node", "src")),
                "src",
            )
            .where(F.col("t") >= F.col("arrival"))
            .select(F.col("dst").alias("node"), F.col("t").alias("arrival"))
        )
        arr = (
            arr.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("arrival").cast("bigint").alias("arrival"))
            .localCheckpoint(eager=True)
        )
    return (
        arr.select(
            F.col("node").alias("part_key"),
            F.col("arrival").alias("arrival_day"),
        )
        .orderBy("arrival_day", "part_key")
        .limit(30)
    )


# ---- X284: (s,S) inventory policy as a packed-state fold ----------------------------


# state = inv * 1e10 + reorders * 1e5 + stockout_days; inv <= S = 400,
# counts < 1e5 → state < 4.1e12 < 2^53 (exact in any engine's BIGINT).
_SS_INIT = _SS_BIG * 10_000_000_000


@declared_query(
    "ss_policy_inventory",
    oracle=f"""
    WITH daily AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), tops AS (
        SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS total_qty
        FROM daily GROUP BY 1
        ORDER BY total_qty DESC, l_partkey LIMIT 30
    ), series AS (
        SELECT d.l_partkey, t.total_qty,
               list(d.q ORDER BY d.d) AS qs
        FROM daily d JOIN tops t ON d.l_partkey = t.l_partkey
        GROUP BY 1, 2
    ), folded AS (
        SELECT l_partkey, total_qty,
               list_reduce(
                   list_prepend(CAST({_SS_INIT} AS BIGINT), qs),
                   (acc, x) -> (
                     CASE WHEN CASE WHEN acc // 10000000000 - x < 0
                                    THEN 0
                                    ELSE acc // 10000000000 - x END
                               < {_SS_SMALL}
                          THEN CAST({_SS_BIG} AS BIGINT)
                          ELSE CASE WHEN acc // 10000000000 - x < 0
                                    THEN 0
                                    ELSE acc // 10000000000 - x END
                     END) * 10000000000
                     + (acc % 10000000000 // 100000
                        + CASE WHEN CASE WHEN acc // 10000000000 - x
                                         < 0 THEN 0
                                    ELSE acc // 10000000000 - x END
                                    < {_SS_SMALL}
                               THEN 1 ELSE 0 END) * 100000
                     + (acc % 100000
                        + CASE WHEN acc // 10000000000 - x < 0
                               THEN 1 ELSE 0 END)
               ) AS state
        FROM series
    )
    SELECT l_partkey, total_qty,
           CAST(state // 10000000000 AS BIGINT) AS final_inventory,
           CAST(state % 10000000000 // 100000 AS BIGINT)
               AS n_reorders,
           CAST(state % 100000 AS BIGINT) AS stockout_days
    FROM folded ORDER BY total_qty DESC, l_partkey
    """,
)
def ss_policy_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X284: the (s,S) = (40, 400) inventory policy simulated over
    each top-30 part's daily-demand sequence — serve demand (lost
    sales below zero, counted as stockout days), then reorder up to
    S whenever the position falls below s. The recursion is
    inherently sequential, so it runs as an ORDERED FOLD with the
    ENTIRE state packed into one BIGINT (inv·1e10 + reorders·1e5 +
    stockouts < 2^53): both engines' reduce lambdas are
    single-typed, so a multi-field state that would need struct
    lambdas travels as exact integer arithmetic instead — the
    X121/X169 fold discipline extended from one running value to a
    state MACHINE. Zero-demand days are provably no-ops under this
    policy (inventory only falls on demand days, and a reorder
    restores ≥ s immediately), so the fold runs over PRESENT days
    only — the X239 analytic-zeros argument in sequential form.

    Exactness: all-integer end to end; the oracle replays the
    identical packed fold. Scale: per-part sequences are
    calendar-bounded; one combinable daily aggregate below."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    tops = (
        daily.groupBy("l_partkey")
        .agg(F.sum("q").cast("bigint").alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("l_partkey"))
        .limit(30)
    )
    series = (
        daily.join(F.broadcast(tops), "l_partkey")
        .groupBy("l_partkey", "total_qty")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("d", "q"))
            ).alias("dq")
        )
        .select(
            "l_partkey",
            "total_qty",
            F.transform(F.col("dq"), lambda s: s["q"]).alias("qs"),
        )
    )
    # identical packed-state algebra as the oracle, Spark SQL dialect
    fold = F.expr(
        f"""
        aggregate(
            qs,
            CAST({_SS_INIT} AS BIGINT),
            (acc, x) -> (
              CASE WHEN CASE WHEN acc DIV 10000000000 - x < 0 THEN 0
                             ELSE acc DIV 10000000000 - x END
                        < {_SS_SMALL}
                   THEN CAST({_SS_BIG} AS BIGINT)
                   ELSE CASE WHEN acc DIV 10000000000 - x < 0 THEN 0
                             ELSE acc DIV 10000000000 - x END
              END) * 10000000000
              + (acc % 10000000000 DIV 100000
                 + CASE WHEN CASE WHEN acc DIV 10000000000 - x < 0
                                  THEN 0
                             ELSE acc DIV 10000000000 - x END
                             < {_SS_SMALL}
                        THEN 1 ELSE 0 END) * 100000
              + (acc % 100000
                 + CASE WHEN acc DIV 10000000000 - x < 0
                        THEN 1 ELSE 0 END)
        )
        """
    )
    folded = series.withColumn("state", fold)
    return folded.select(
        "l_partkey",
        "total_qty",
        F.expr("state DIV 10000000000")
        .cast("bigint")
        .alias("final_inventory"),
        F.expr("state % 10000000000 DIV 100000")
        .cast("bigint")
        .alias("n_reorders"),
        (F.col("state") % 100000).cast("bigint").alias("stockout_days"),
    ).orderBy(F.desc("total_qty"), "l_partkey")


# ---- X285: trigram lexical diversity ------------------------------------------------


@declared_query(
    "trigram_diversity_sources",
    oracle=f"""
    WITH toks AS (
        SELECT source, {_O_TOK} AS t FROM documents
    ), tri AS (
        SELECT source,
               t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS g
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1,
                CAST(len(t) - 2 AS INTEGER))) AS i
        ) i
    ), cnt AS (
        SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM tri GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_trigrams,
           CAST(COUNT(*) AS BIGINT) AS v_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
           CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6)
                AS DOUBLE) AS ttr,
           CAST(ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS hapax_share,
           CAST(ROUND(
               CAST(CAST(ROUND(ln(COUNT(*)), 9) AS DECIMAL(18,9))
                    AS DOUBLE)
               / CAST(CAST(ROUND(ln(SUM(c)), 9) AS DECIMAL(18,9))
                      AS DOUBLE), 6) AS DOUBLE) AS herdan_c
    FROM cnt GROUP BY source ORDER BY source
    """,
)
def trigram_diversity_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X285: per-source lexical diversity over TRIGRAMS — type-token
    ratio, hapax share, and Herdan's C = ln V / ln N (the
    length-robust diversity exponent; raw TTR shrinks mechanically
    with corpus size, C doesn't) — the corpus-mix variety readout
    next to X210's cross-source vocabulary overlap. Trigrams for
    the same reason as X274: the fixture's ~30-word unigram
    vocabulary saturates in every source (V constant, zero hapax),
    while the trigram spectrum genuinely varies.

    Exactness: counts exact; both Herdan logs stage ROUND(.., 9)
    into DECIMAL before the one division; TTR and hapax share are
    single divisions rounded 6. Scale: tokens reduce in one
    combinable (source, trigram) aggregate."""
    from ..operators.textanalysis import ngrams, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "source", tokens("text").alias("__toks")
    )
    cnt = (
        toked.select(
            "source",
            F.explode(ngrams(F.col("__toks"), 3)).alias("g"),
        )
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ln9 = lambda col: F.round(F.log(col), 9).cast(  # noqa: E731
        "decimal(18,9)"
    )
    agg = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_trigrams"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
    )
    return agg.select(
        "source",
        "n_trigrams",
        "v_types",
        "hapax",
        F.round(
            F.col("v_types").cast("double") / F.col("n_trigrams"), 6
        ).alias("ttr"),
        F.round(
            F.col("hapax").cast("double") / F.col("v_types"), 6
        ).alias("hapax_share"),
        F.round(
            ln9(F.col("v_types")).cast("double")
            / ln9(F.col("n_trigrams")).cast("double"),
            6,
        ).alias("herdan_c"),
    ).orderBy("source")


# ---- X286: WAU / MAU stickiness -------------------------------------------------------


@declared_query(
    "wau_mau_stickiness",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS event_day, user_id
        FROM events
    )
    SELECT event_day,
           CAST(COUNT(*) AS BIGINT) AS dau,
           CAST((SELECT COUNT(DISTINCT d2.user_id) FROM daily d2
                 WHERE d2.event_day BETWEEN d.event_day - 6
                       AND d.event_day) AS BIGINT) AS wau,
           CAST((SELECT COUNT(DISTINCT d3.user_id) FROM daily d3
                 WHERE d3.event_day BETWEEN d.event_day - 29
                       AND d.event_day) AS BIGINT) AS mau,
           CAST(ROUND(CAST(COUNT(*) AS DOUBLE) /
                (SELECT COUNT(DISTINCT d3.user_id) FROM daily d3
                 WHERE d3.event_day BETWEEN d.event_day - 29
                       AND d.event_day), 6) AS DOUBLE) AS stickiness
    FROM daily d
    GROUP BY event_day
    ORDER BY event_day
    """,
)
def wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X286: the canonical engagement triple — per day: DAU,
    trailing-7-day WAU, trailing-30-day MAU, and the DAU/MAU
    stickiness ratio (the "how many of your monthly users show up
    on a given day" product metric). Distinct-over-sliding-window
    isn't a native window aggregate in either engine; the Spark
    plan extends X72's trick — one combinable collect_set shuffle
    to per-day user SETS, then each trailing window is an in-row
    array_distinct(flatten(...)) over a RANGE frame on the
    |days|-row daily grid (whitelisted global window with this
    justification), never a window over event volume.

    Exactness: all counts exact; stickiness is one division rounded
    6. The fixture spans ~30 days, so the MAU frame saturates to
    all-users by the tail — visible in the output and correct."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("event_day")
    ).agg(F.collect_set("user_id").alias("users"))
    w7 = (
        Window.orderBy(F.unix_date(F.col("event_day")))
        .rangeBetween(-6, 0)
    )
    w30 = (
        Window.orderBy(F.unix_date(F.col("event_day")))
        .rangeBetween(-29, 0)
    )
    counted = daily.select(
        "event_day",
        F.size("users").cast("bigint").alias("dau"),
        F.size(
            F.array_distinct(
                F.flatten(F.collect_list("users").over(w7))
            )
        )
        .cast("bigint")
        .alias("wau"),
        F.size(
            F.array_distinct(
                F.flatten(F.collect_list("users").over(w30))
            )
        )
        .cast("bigint")
        .alias("mau"),
    )
    return counted.select(
        "event_day",
        "dau",
        "wau",
        "mau",
        F.round(
            F.col("dau").cast("double") / F.col("mau"), 6
        ).alias("stickiness"),
    ).orderBy("event_day")
