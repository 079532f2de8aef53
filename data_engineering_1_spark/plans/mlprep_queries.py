"""ML-prep declared queries (round 6, third batch — [north-star]
scope): the signal-engineering and split-discipline operators that sit
between a cleaned corpus and a training run.

  * ``ewma_halflife_daily`` (X121) — exponential moving average with
    alpha = 1/2 over per-type daily sums, computed as an ORDERED FOLD
    over a bounded trailing frame (higher-order functions inside a
    window): powers of two are exact in binary floating point, and the
    51-row frame truncates only mass below 2^-50 — invisible at the
    round-6 emission.
  * ``stratified_exact_split`` (X123) — per-stratum 80/10/10
    train/val/test allocation with largest-remainder rounding in PURE
    INTEGER arithmetic: every stratum's splits sum exactly to its doc
    count, no floats anywhere.
  * ``bigram_xentropy_docs`` (X124) — per-doc bigram language-model
    cross-entropy with add-one smoothing (the CCNet-style LM
    perplexity quality filter, one order up from X96's unigram model).
  * ``prefix_filter_jaccard_join`` (X126) — EXACT set-similarity join
    via prefix filtering (PPJoin-style): unlike the LSH family this
    has NO false negatives — two sets with Jaccard >= t MUST share a
    token in their (rarest-first) prefixes of length
    |s| - ceil(t|s|) + 1 — while candidate generation still runs as an
    equi-join on (rare) prefix tokens, never an O(n^2) scan.

Determinism: EWMA folds run in explicit frame order with exact
halving; split allocation is all-integer; LM terms are staged to
DECIMAL(28,12) before the order-free sum (the X96 discipline); the
prefix ordering ties break on raw token bytes (binary collation both
engines) and the Jaccard keep-decision compares the ROUNDED value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import tokens
from .registry import declared_query
from .text_queries import _O_TOK

# ---- X121: EWMA via ordered fold -------------------------------------

_EWMA_FRAME = 50  # trailing days; tail weight < 2^-50, below round-6


@declared_query(
    "ewma_halflife_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val
        FROM events GROUP BY 1, 2
    ), framed AS (
        SELECT event_type, day, val,
               list(val) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_EWMA_FRAME} PRECEDING AND CURRENT ROW)
                   AS xs
        FROM daily
    )
    SELECT event_type, day,
           CAST(ROUND(val, 6) AS DOUBLE) AS val,
           CAST(ROUND(list_reduce(xs, (acc, x) -> acc * 0.5 + x * 0.5), 6)
                AS DOUBLE) AS ewma
    FROM framed
    ORDER BY event_type, day
    """,
)
def ewma_halflife_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X121: half-life EWMA of daily per-type value sums — the
    smoothing pass a metrics/anomaly pipeline runs before thresholding.
    alpha = 1/2 on purpose: every weight is a power of two, exact in
    IEEE doubles, so the fold's value is engine-identical given
    identical inputs (an arbitrary alpha would accumulate cross-engine
    ulp drift through the recursion).

    Implemented as an ORDERED FOLD over the window frame — collect the
    trailing 51-day list (both engines build frame-ordered lists),
    then reduce with acc/2 + x/2 seeded at the oldest element. The
    recursion is inherently sequential, but over the TIME dimension
    only: each series is |days| rows regardless of event volume, the
    heavy event pass is one combinable daily aggregate, and the frame
    caps the per-row fold at 51 elements (truncated tail weight
    < 2^-50, far below the round-6 emission)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("val")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_EWMA_FRAME, Window.currentRow)
    )
    framed = daily.select(
        "event_type", "day", "val", F.collect_list("val").over(w).alias("xs")
    )
    ewma = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.element_at("xs", 1),
        lambda acc, x: acc * 0.5 + x * 0.5,
    )
    return framed.select(
        "event_type",
        "day",
        F.round("val", 6).alias("val"),
        F.round(ewma, 6).alias("ewma"),
    ).orderBy("event_type", "day")


# ---- X123: stratified exact split ------------------------------------


@declared_query(
    "stratified_exact_split",
    oracle="""
    WITH strata AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), splits AS (
        SELECT lang, n, s.split, s.ord,
               CASE s.split WHEN 'train' THEN (8 * n) // 10
                    ELSE n // 10 END AS alloc_floor,
               CASE s.split WHEN 'train' THEN (8 * n) % 10
                    ELSE n % 10 END AS frac_num
        FROM strata
        CROSS JOIN (VALUES ('train', 1), ('val', 2), ('test', 3))
             AS s(split, ord)
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY frac_num DESC, ord) AS rr,
               n - SUM(alloc_floor) OVER (PARTITION BY lang) AS leftover
        FROM splits
    )
    SELECT lang, split,
           CAST(alloc_floor + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS n_docs
    FROM ranked
    ORDER BY lang, CASE split WHEN 'train' THEN 1 WHEN 'val' THEN 2
                   ELSE 3 END
    """,
)
def stratified_exact_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123: per-stratum EXACT 80/10/10 train/val/test allocation —
    the split-size contract an ML pipeline must honor before assigning
    rows (X4's deterministic hash split assigns ~80% in expectation;
    this computes the exact integer quota per stratum). Largest-
    remainder rounding in PURE INTEGER arithmetic — (8n) DIV 10 floors,
    (8n) MOD 10 remainders, fixed train<val<test tie order — so both
    engines agree bit-for-bit and each stratum's three splits sum exactly
    to its count. Scale: one combinable count per stratum; everything
    after runs on |strata| x 3 rows."""
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    splits = strata.crossJoin(
        F.broadcast(
            docs.sparkSession.createDataFrame(
                [("train", 1), ("val", 2), ("test", 3)], "split string, ord int"
            )
        )
    ).select(
        "lang",
        "n",
        "split",
        "ord",
        F.when(F.col("split") == "train", F.expr("(8 * n) DIV 10"))
        .otherwise(F.expr("n DIV 10"))
        .alias("alloc_floor"),
        F.when(F.col("split") == "train", (F.col("n") * 8) % 10)
        .otherwise(F.col("n") % 10)
        .alias("frac_num"),
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.desc("frac_num"), F.asc("ord")
    )
    w_sum = Window.partitionBy("lang")
    return (
        splits.withColumn("rr", F.row_number().over(w_rank))
        .withColumn(
            "leftover", F.col("n") - F.sum("alloc_floor").over(w_sum)
        )
        .select(
            "lang",
            "split",
            (
                F.col("alloc_floor")
                + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
            ).cast("bigint").alias("n_docs"),
            "ord",
        )
        .orderBy("lang", "ord")
        .drop("ord")
    )


# ---- X124: bigram LM cross-entropy -----------------------------------


@declared_query(
    "bigram_xentropy_docs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_O_TOK} AS t FROM documents
    ), bg AS (
        SELECT doc_id, t[CAST(i AS INTEGER)] AS w1,
               t[CAST(i AS INTEGER) + 1] AS w2
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks WHERE len(t) >= 2)
    ), c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
        FROM bg GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM bg GROUP BY 1
    ), vocab AS (
        SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        FROM (SELECT unnest(t) AS tok FROM toks)
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(CAST(SUM(CAST(
                    -ln((CAST(n12 + 1 AS DOUBLE))
                        / (CAST(n1 + (SELECT v FROM vocab) AS DOUBLE)))
                    AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS xent
    FROM bg b
    JOIN c12 USING (w1, w2)
    JOIN c1 USING (w1)
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def bigram_xentropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124: per-doc bigram language-model cross-entropy with add-one
    smoothing — the LM-perplexity quality filter (CCNet-style) one
    order above X96's unigram model: p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V),
    xent = -mean ln p. Low = fluent/templated, high = noisy — the
    standard keep/bucket signal for pretraining corpora.

    Same discipline and shape as X96: the corpus pass is two combinable
    counts (bigram, prefix) plus a 1-row vocab aggregate broadcast in;
    each -ln term is staged to DECIMAL(28,12) so the per-doc sum is
    order-free; the count-joins run on bigram keys where AQE's skew
    split covers hot function-word pairs."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("t"))
    bg = t.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS w1, "
                "element_at(t, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n12")
    )
    c1 = bg.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1")
    )
    vocab = t.select(F.explode("t").alias("tok")).agg(
        F.countDistinct("tok").cast("bigint").alias("v")
    )
    contr = (
        -F.log(
            (F.col("n12") + 1).cast("double")
            / (F.col("n1") + F.col("v")).cast("double")
        )
    ).cast("decimal(28,12)")
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(contr).cast("double") / F.count(F.lit(1)), 6
            ).alias("xent"),
        )
        .orderBy("doc_id")
    )


# ---- X126: exact set-similarity join via prefix filtering ------------

_JACC_T_NUM, _JACC_T_DEN = 8, 10  # threshold 0.8


@declared_query(
    "prefix_filter_jaccard_join",
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_O_TOK})) AS tok
        FROM documents
    ), dfreq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok
    ), ordered AS (
        SELECT t.doc_id,
               list(t.tok ORDER BY f.df, t.tok) AS arr
        FROM dt t JOIN dfreq f USING (tok)
        GROUP BY t.doc_id
    ), sized AS (
        SELECT doc_id, arr, len(arr) AS n,
               len(arr) - (({_JACC_T_NUM} * len(arr) + {_JACC_T_DEN} - 1)
                           // {_JACC_T_DEN}) + 1 AS plen
        FROM ordered
    ), pref AS (
        SELECT doc_id, unnest(arr[1:CAST(plen AS INTEGER)]) AS tok
        FROM sized
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pref a JOIN pref b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(ROUND(CAST(len(list_intersect(x.arr, y.arr)) AS DOUBLE)
                / (x.n + y.n - len(list_intersect(x.arr, y.arr))), 6)
                AS DOUBLE) AS jaccard
    FROM cand
    JOIN sized x ON x.doc_id = doc_a
    JOIN sized y ON y.doc_id = doc_b
    WHERE ROUND(CAST(len(list_intersect(x.arr, y.arr)) AS DOUBLE)
          / (x.n + y.n - len(list_intersect(x.arr, y.arr))), 6) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126: EXACT set-similarity self-join at Jaccard >= 0.8 via
    prefix filtering (PPJoin's core): order each doc's distinct tokens
    rarest-first (global doc-frequency, ties on token bytes), keep only
    the first |s| - ceil(t|s|) + 1 tokens as the PREFIX, and generate
    candidates by equi-joining prefixes. Completeness is a theorem, not
    a probability: if two sets overlap enough for Jaccard >= t, their
    prefixes must share a token — so unlike MinHash-LSH (X-E7) this
    join has ZERO false negatives, at the cost of candidate counts that
    grow with token-frequency skew (the rarest-first ordering is
    exactly what keeps prefix-token join groups small). ceil is exact
    integer arithmetic ((8n + 9) DIV 10) on both engines.

    Scale shape: one distinct (doc, token) pass, one combinable df
    count, one |doc|-keyed sort-aggregate for the ordered arrays, then
    the candidate equi-join lands on RARE tokens only; the verify step
    is in-row array intersection over the bounded candidate set (the
    X41 discipline). The keep-decision compares the ROUNDED Jaccard on
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    dfreq = dt.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    ordered = (
        dt.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("arr")
        )
    )
    n = F.size("arr")
    plen = n - F.expr(
        f"({_JACC_T_NUM} * size(arr) + {_JACC_T_DEN} - 1) "
        f"DIV {_JACC_T_DEN}"
    ).cast("int") + 1
    sized = ordered.select(
        "doc_id", "arr", n.cast("int").alias("n"), plen.alias("plen")
    )
    pref = sized.select(
        "doc_id", F.explode(F.slice("arr", 1, F.col("plen"))).alias("tok")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    x = sized.select(
        F.col("doc_id").alias("doc_a"),
        F.col("arr").alias("arr_a"),
        F.col("n").alias("n_a"),
    )
    y = sized.select(
        F.col("doc_id").alias("doc_b"),
        F.col("arr").alias("arr_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = F.round(
        inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter), 6
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )
