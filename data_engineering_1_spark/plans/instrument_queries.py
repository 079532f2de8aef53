"""Pipeline-instrumentation declared queries (round 6, twelfth batch —
[north-star] scope): the measurement layer a production corpus engine
runs on its OWN machinery — how good are the LSH candidates, what does
the Bloom filter actually cost in false positives, how does the
tokenizer behave per language — plus the embedding-signature near-dup
leg, the time-decayed leaderboard, and the BI share-of-parent rollup.

  * ``srp_embedding_neardup`` (X173) — signed-random-projection (SRP)
    16-bit cosine sketches over quantized embedding components, banded
    candidate join, Hamming <= 3 pairs. The embedding twin of SimHash
    (E7 sketches token sets; this sketches the vector space).
  * ``lsh_quality_eval`` (X174) — precision/recall of the E7
    MinHash-LSH candidate generator measured against the EXACT
    shingle-Jaccard >= 0.8 ground truth (X124's join) — the evaluation
    harness that decides band/row parameters before a 100 TB dedup run.
  * ``decayed_part_leaderboard`` (X175) — half-life-decayed popularity
    with EXACT power-of-two weights (weight 2^-a scaled to the integer
    2^(60-a): a DECIMAL(38,0) sum, one division at emission).
  * ``revenue_share_of_parent`` (X176) — region -> nation revenue with
    share-of-parent at each level (exact decimal sums; the BI staple).
  * ``tokenizer_fertility_by_lang`` (X177) — BPE-tokens-per-word /
    chars-per-token per language — the tokenizer-cost gauge that
    decides per-language sampling budgets.
  * ``bloom_filter_fp_audit`` (X178) — build an m-bit k-hash Bloom
    filter of customer keys from the md5 bridge, probe with synthetic
    absent keys, and MEASURE the false-positive rate — the empirical
    twin of the X55 runtime-bloom-join plan pins.

Determinism: SRP signatures, Bloom positions, Hamming distances, and
decayed-weight numerators are exact integers end to end (projection
signs and hash positions come from the md5 bridge, so both engines
draw identical values); precision/recall/fertility/shares are single
divisions of exact counts rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .dedup_queries import _O_SIGNATURES
from .mlprep_queries import _JACC_T_DEN, _JACC_T_NUM
from .registry import declared_query
from .text_queries import _BPE_RE, _O_TOK

# ---- X173: signed-random-projection embedding sketches ----------------

_SRP_BITS = 16
_SRP_DIM = 64
_SRP_Q = 1_000_000  # component quantization: round(v * 1e6)


@declared_query(
    "srp_embedding_neardup",
    oracle=f"""
    WITH signs AS (
        SELECT b.b, d.d,
               CASE WHEN (('0x' || substr(md5('srp|' ||
                        CAST(b.b AS VARCHAR) || '|' ||
                        CAST(d.d AS VARCHAR)), 1, 8))::BIGINT % 2) = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM (SELECT unnest(generate_series(0, {_SRP_BITS - 1})) AS b) b
        CROSS JOIN (SELECT unnest(generate_series(1, {_SRP_DIM})) AS d) d
    ), qd AS (
        SELECT vec_id, d.d,
               CAST(ROUND(CAST(embedding[d.d] AS DOUBLE) * {_SRP_Q})
                    AS BIGINT) AS q
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, {_SRP_DIM})) AS d) d
    ), proj AS (
        SELECT qd.vec_id, s.b,
               CAST(SUM(s.sgn * qd.q) AS BIGINT) AS s
        FROM qd JOIN signs s ON s.d = qd.d
        GROUP BY qd.vec_id, s.b
    ), sigs AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN s >= 0
                             THEN CAST(POWER(2, b) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS sig
        FROM proj GROUP BY vec_id
    ), bands AS (
        SELECT vec_id, sig, 0 AS bi, sig % 256 AS bv FROM sigs
        UNION ALL
        SELECT vec_id, sig, 1 AS bi, sig // 256 AS bv FROM sigs
    ), pairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
               a.sig AS sa, b.sig AS sb
        FROM bands a JOIN bands b
          ON a.bi = b.bi AND a.bv = b.bv AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(sa, sb)) <= 3
    ORDER BY vec_a, vec_b
    """,
)
def srp_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X173: signed-random-projection near-dup sketch over the embedding
    table — each vector gets a 16-bit signature (bit b = sign of the
    projection onto a deterministic ±1 hyperplane), candidates come
    from two 8-bit band buckets (never an all-pairs scan), survivors
    have Hamming distance <= 3. SRP Hamming distance estimates the
    ANGLE between vectors (Goemans-Williamson: P[bit differs] =
    theta/pi), so this is the cosine-space SimHash — the third member
    of the sketch family (MinHash = Jaccard on token sets, SimHash =
    token multisets, SRP = embedding space).

    Determinism: components quantize to exact BIGINTs (round(v*1e6)) —
    the operator is DEFINED on the quantized grid, so projections are
    exact integer sums and both engines compute bit-identical
    signatures (projection signs come from the md5 bridge). Scale: the
    sign table is 16x64 = 1024 rows (broadcast); projections are one
    combinable (vec, bit) aggregate; the candidate join is banded
    equi — the same sub-quadratic physics as E7, and at production
    thresholds the 8-bit band prefilter keeps buckets tiny."""
    emb = load_table(spark, sf_dir, "embeddings")
    signs = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_SRP_BITS - 1))).alias(
                "b"
            )
        )
        .select(
            "b",
            F.explode(F.sequence(F.lit(1), F.lit(_SRP_DIM))).alias("d"),
        )
        .select(
            "b",
            "d",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit("srp"),
                                F.col("b").cast("string"),
                                F.col("d").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    qd = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "v")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.round(F.col("v").cast("double") * _SRP_Q, 0)
        .cast("bigint")
        .alias("q"),
    )
    proj = (
        qd.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "b")
        .agg(F.sum(F.col("sgn") * F.col("q")).cast("bigint").alias("s"))
    )
    sigs = proj.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("s") >= 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("sig")
    )
    bands = sigs.select(
        "vec_id",
        "sig",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("bi"), (F.col("sig") % 256).alias("bv")
                ),
                F.struct(
                    F.lit(1).alias("bi"),
                    F.expr("sig DIV 256").alias("bv"),
                ),
            )
        ).alias("e"),
    ).select("vec_id", "sig", "e.bi", "e.bv")
    a = bands.select(
        F.col("vec_id").alias("vec_a"),
        F.col("sig").alias("sa"),
        "bi",
        "bv",
    )
    b = bands.select(
        F.col("vec_id").alias("vec_b"),
        F.col("sig").alias("sb"),
        "bi",
        "bv",
    )
    pairs = (
        a.join(b, ["bi", "bv"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        pairs.select(
            "vec_a", "vec_b", ham.cast("int").alias("hamming")
        )
        .where(F.col("hamming") <= 3)
        .orderBy("vec_a", "vec_b")
    )


# ---- X174: LSH candidate quality evaluation ---------------------------

# exact shingle-Jaccard >= 0.8 ground truth — the SAME definition as
# X124's prefix_filter_jaccard_join oracle (restated here as CTE text;
# the Spark side CALLS X124's implementation, so the two queries can
# never drift apart on the Spark side, and this text tracks the X124
# constants).
_O_TRUTH = f"""
    dt2 AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', t[CAST(i AS INTEGER)],
                         t[CAST(i AS INTEGER) + 1],
                         t[CAST(i AS INTEGER) + 2]) AS tok
        FROM (SELECT doc_id, {_O_TOK} AS t,
                     unnest(generate_series(1, len({_O_TOK}) - 2)) AS i
              FROM documents
              WHERE len({_O_TOK}) >= 3)
    ), dfreq2 AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt2 GROUP BY tok
    ), ordered2 AS (
        SELECT t.doc_id,
               list(t.tok ORDER BY f.df, t.tok) AS arr
        FROM dt2 t JOIN dfreq2 f USING (tok)
        GROUP BY t.doc_id
    ), sized2 AS (
        SELECT doc_id, arr, len(arr) AS n,
               len(arr) - (({_JACC_T_NUM} * len(arr) + {_JACC_T_DEN} - 1)
                           // {_JACC_T_DEN}) + 1 AS plen
        FROM ordered2
    ), pref2 AS (
        SELECT doc_id, n, unnest(arr[1:CAST(plen AS INTEGER)]) AS tok
        FROM sized2
    ), tcand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pref2 a JOIN pref2 b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
         AND {_JACC_T_DEN} * a.n >= {_JACC_T_NUM} * b.n
         AND {_JACC_T_DEN} * b.n >= {_JACC_T_NUM} * a.n
    ), truth AS (
        SELECT doc_a, doc_b
        FROM tcand
        JOIN sized2 x ON x.doc_id = doc_a
        JOIN sized2 y ON y.doc_id = doc_b
        WHERE ROUND(CAST(len(list_intersect(x.arr, y.arr)) AS DOUBLE)
              / (x.n + y.n - len(list_intersect(x.arr, y.arr))), 6)
              >= {_JACC_T_NUM / _JACC_T_DEN}
    )
"""


@declared_query(
    "lsh_quality_eval",
    oracle=f"""
    WITH {_O_SIGNATURES},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.minhash = b.minhash
        WHERE a.doc_id < b.doc_id
    ), {_O_TRUTH},
    joined AS (
        SELECT CAST(c.doc_a IS NOT NULL AS BIGINT) AS in_cand,
               CAST(t.doc_a IS NOT NULL AS BIGINT) AS in_true
        FROM cand c FULL OUTER JOIN truth t
          ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )
    SELECT CAST(SUM(in_cand) AS BIGINT) AS n_candidates,
           CAST(SUM(in_true) AS BIGINT) AS n_true_pairs,
           CAST(SUM(in_cand * in_true) AS BIGINT) AS n_tp,
           CAST(ROUND(CAST(SUM(in_cand * in_true) AS DOUBLE)
                      / SUM(in_cand), 6) AS DOUBLE) AS precision,
           CAST(ROUND(CAST(SUM(in_cand * in_true) AS DOUBLE)
                      / SUM(in_true), 6) AS DOUBLE) AS recall
    FROM joined
    """,
)
def lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X174: precision/recall of the E7 MinHash-LSH candidate generator
    against the EXACT shingle-Jaccard >= 0.8 ground truth (X124's
    prefix-filtered exact join) — the evaluation harness that tunes
    band/row parameters BEFORE a 100 TB dedup run: recall says how many
    true near-dups the bands lose, precision says how much verify work
    each candidate costs. The Spark side CALLS both production
    implementations (operators/dedup.py signatures, X124's exact join),
    so the measured numbers are the numbers the real pipeline gets.

    Exactness: both pair sets are exact; TP/precision/recall are
    integer counts and single divisions rounded 6. Scale: both sides
    are the already-audited sub-quadratic joins; the final comparison
    is one full-outer join on the pair key plus a combinable
    aggregate."""
    from ..operators.dedup import lsh_candidate_pairs
    from .mlprep_queries import prefix_filter_jaccard_join

    from ..operators.sigcache import document_signatures

    cand = lsh_candidate_pairs(document_signatures(spark, sf_dir)).withColumn(
        "in_cand", F.lit(1).cast("bigint")
    )
    truth = (
        prefix_filter_jaccard_join(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("in_true", F.lit(1).cast("bigint"))
    )
    joined = cand.join(truth, ["doc_a", "doc_b"], "full").select(
        F.coalesce(F.col("in_cand"), F.lit(0)).alias("in_cand"),
        F.coalesce(F.col("in_true"), F.lit(0)).alias("in_true"),
    )
    return joined.agg(
        F.sum("in_cand").cast("bigint").alias("n_candidates"),
        F.sum("in_true").cast("bigint").alias("n_true_pairs"),
        F.sum(F.col("in_cand") * F.col("in_true"))
        .cast("bigint")
        .alias("n_tp"),
        F.round(
            F.sum(F.col("in_cand") * F.col("in_true")).cast("double")
            / F.sum("in_cand"),
            6,
        ).alias("precision"),
        F.round(
            F.sum(F.col("in_cand") * F.col("in_true")).cast("double")
            / F.sum("in_true"),
            6,
        ).alias("recall"),
    )


# ---- X175: half-life decayed leaderboard ------------------------------

_DECAY_CAP = 60  # weights below 2^-60 are sub-ulp of any leader score


@declared_query(
    "decayed_part_leaderboard",
    oracle=f"""
    WITH ref AS (
        SELECT MAX(CAST(l_shipdate AS DATE)) AS ref_d FROM lineitem
    ), w AS (
        SELECT l_partkey,
               CAST(l_quantity AS BIGINT) AS qty,
               date_diff('day', CAST(l_shipdate AS DATE),
                         (SELECT ref_d FROM ref)) // 7 AS a
        FROM lineitem
    ), scored AS (
        SELECT l_partkey,
               CAST(SUM(qty) AS BIGINT) AS total_qty,
               CAST(SUM(CASE WHEN a <= {_DECAY_CAP}
                        THEN CAST(POWER(2, {_DECAY_CAP} - a)
                                  AS DECIMAL(28,0)) * qty
                        ELSE CAST(0 AS DECIMAL(28,0)) END)
                    AS DECIMAL(38,0)) AS scaled
        FROM w GROUP BY l_partkey
    )
    SELECT l_partkey, total_qty,
           CAST(ROUND(CAST(scaled AS DOUBLE)
                      / {2 ** _DECAY_CAP}.0, 6) AS DOUBLE)
               AS decayed_score
    FROM scored
    ORDER BY scaled DESC, l_partkey
    LIMIT 20
    """,
)
def decayed_part_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X175: half-life-decayed part popularity — each shipped quantity
    is weighted 2^-a where a = whole weeks before the newest shipment
    (7-day half-life), top 20 parts. The recency-weighted leaderboard
    every trending/popularity surface runs; the half-life makes old
    volume decay smoothly instead of falling off a window cliff.

    Exactness (the X121 power-of-two trick, lifted to integers): the
    weight 2^-a is scaled by 2^60 to the exact BIGINT 2^(60-a)
    (contributions older than 60 weeks get weight 0 — they are below
    one ulp of any leader's double score anyway, and the cap is what
    keeps the integers bounded); qty * 2^(60-a) sums exactly in
    DECIMAL(38,0); ONE division by 2^60 at emission, rounded 6. The
    top-20 membership is decided on the EXACT scaled integer, never
    the rounded double. Scale: one combinable aggregate over lineitem;
    the 1-row ref-date aggregate broadcasts (whitelisted cross)."""
    li = load_table(spark, sf_dir, "lineitem")
    ref = li.agg(F.max(F.to_date("l_shipdate")).alias("ref_d"))
    w = li.crossJoin(F.broadcast(ref)).select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr("datediff(ref_d, to_date(l_shipdate)) DIV 7").alias("a"),
    )
    scaled_w = F.when(
        F.col("a") <= _DECAY_CAP,
        F.pow(F.lit(2.0), _DECAY_CAP - F.col("a")).cast("decimal(28,0)")
        * F.col("qty"),
    ).otherwise(F.lit(0).cast("decimal(28,0)"))
    scored = w.groupBy("l_partkey").agg(
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.sum(scaled_w).cast("decimal(38,0)").alias("scaled"),
    )
    return (
        scored.orderBy(F.desc("scaled"), F.asc("l_partkey"))
        .limit(20)
        .select(
            "l_partkey",
            "total_qty",
            F.round(
                F.col("scaled").cast("double") / float(2**_DECAY_CAP), 6
            ).alias("decayed_score"),
        )
    )


# ---- X176: share-of-parent rollup --------------------------------------


@declared_query(
    "revenue_share_of_parent",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rv
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(ROUND(rv * 100, 0) AS BIGINT) AS revenue_cents,
           CAST(ROUND(CAST(rv AS DOUBLE)
                      / CAST(SUM(rv) OVER (PARTITION BY region)
                             AS DOUBLE), 6) AS DOUBLE)
               AS share_of_region,
           CAST(ROUND(CAST(rv AS DOUBLE)
                      / CAST(SUM(rv) OVER () AS DOUBLE), 6) AS DOUBLE)
               AS share_of_total
    FROM rev
    ORDER BY region, nation
    """,
)
def revenue_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X176: hierarchical share-of-parent — discounted revenue per
    (region, nation) with each nation's share of its region and of the
    grand total. The drill-down readout every BI rollup renders; the
    share-of-parent ratio is what A5's rollup/cube rows can't emit
    directly.

    Exactness: revenue sums DECIMAL(18,2) x DECIMAL(19,2) products
    exactly (order-free); shares divide the exact decimal sums cast to
    double ONCE, rounded 6; cents emit via ROUND(rv*100) (decimal, so
    both engines agree). Scale: the fact joins are equi (customer/
    nation/region all broadcast-class dims); the windows run over the
    |nations|-row aggregate (bounded by geography, whitelisted)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("rv")
        )
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round(F.col("rv") * 100, 0).cast("bigint").alias("revenue_cents"),
        F.round(
            F.col("rv").cast("double")
            / F.sum("rv").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.col("rv").cast("double")
            / F.sum("rv").over(wt).cast("double"),
            6,
        ).alias("share_of_total"),
    ).orderBy("region", "nation")


# ---- X177: tokenizer fertility ------------------------------------------


@declared_query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH per_doc AS (
        SELECT lang,
               CAST(len({_O_TOK}) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}'))
                    AS BIGINT) AS n_bpe,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words), 6)
                AS DOUBLE) AS fertility,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6)
                AS DOUBLE) AS chars_per_token
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X177: tokenizer fertility per language — BPE-ish tokens per
    whitespace word and characters per token, from the SAME regexes the
    token-counting queries use. Fertility is the number every
    multilingual training-mix budget is denominated in: a language at
    fertility 2 costs twice the context window per word, which feeds
    directly into X116's temperature mixture and X104's vocab cutoff.

    Exactness: all counts are exact integers; the two ratios are single
    divisions rounded 6. Scale: pure in-row regex work (JVM, no UDF)
    followed by one combinable aggregate — no shuffle beyond the
    |langs|-row group."""
    from ..operators.textanalysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    per_doc = docs.select(
        "lang",
        F.size(tokens("text")).cast("bigint").alias("n_words"),
        F.size(bpe).cast("bigint").alias("n_bpe"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.round(
                F.sum("n_bpe").cast("double") / F.sum("n_words"), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# ---- X178: Bloom-filter false-positive audit ---------------------------

_BLOOM_M = 65536  # bits
_BLOOM_K = 3  # hash functions
_BLOOM_PROBES = 10000


def _o_bloom_pos(key: str, i: str) -> str:
    return (
        f"(('0x' || substr(md5('bloom|' || CAST({i} AS VARCHAR) || '|' "
        f"|| CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M})"
    )


@declared_query(
    "bloom_filter_fp_audit",
    oracle=f"""
    WITH bits AS (
        SELECT DISTINCT {_o_bloom_pos('c_custkey', 'i.i')} AS pos
        FROM customer
        CROSS JOIN (SELECT unnest(generate_series(0, {_BLOOM_K - 1}))
                    AS i) i
    ), probes AS (
        SELECT 1000000000 + g AS pk
        FROM generate_series(1, {_BLOOM_PROBES}) t(g)
    ), ppos AS (
        SELECT pk, i.i, {_o_bloom_pos('pk', 'i.i')} AS pos
        FROM probes
        CROSS JOIN (SELECT unnest(generate_series(0, {_BLOOM_K - 1}))
                    AS i) i
    ), hits AS (
        SELECT p.pk, CAST(COUNT(*) AS BIGINT) AS n_set
        FROM ppos p JOIN bits b ON p.pos = b.pos
        GROUP BY p.pk
    ), fp AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_fp
        FROM hits WHERE n_set = {_BLOOM_K}
    )
    SELECT CAST({_BLOOM_M} AS BIGINT) AS m_bits,
           CAST({_BLOOM_K} AS BIGINT) AS k_hashes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_members,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
           CAST({_BLOOM_PROBES} AS BIGINT) AS n_probes,
           (SELECT n_fp FROM fp) AS n_false_positives,
           CAST(ROUND(CAST((SELECT n_fp FROM fp) AS DOUBLE)
                      / {_BLOOM_PROBES}, 6) AS DOUBLE) AS fp_rate
    """,
)
def bloom_filter_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X178: build an m=65536-bit, k=3 Bloom filter over the customer
    keys (bit positions from the md5 bridge, so both engines set the
    same bits), probe it with 10,000 synthetic ABSENT keys, and measure
    the realized false-positive rate. The empirical twin of the X55
    runtime-bloom-join plan pins: those prove Spark INJECTS a bloom
    filter; this measures what a bloom filter of this geometry actually
    does to join pruning — the number a 100 TB pipeline uses to size
    m per distinct-key count. The pin test checks the measured rate
    against the (1 - e^{{-kn/m}})^k theory curve.

    Exactness: positions, bit counts, and FP counts are exact integers
    (a probe is a false positive iff ALL k of its positions are set —
    counted via the equi-join on position, k matches required); the
    rate is one division rounded 6. Scale: the bit set is
    |members| x k distinct positions (bounded by m), the probe join is
    equi on position, everything combinable."""
    cust = load_table(spark, sf_dir, "customer")

    def pos(key_col, i_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit("bloom"),
                            i_col.cast("string"),
                            key_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_M
        )

    ks = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i")
    bits = (
        cust.select(F.col("c_custkey").alias("key"), ks)
        .select(pos(F.col("key"), F.col("i")).alias("pos"))
        .distinct()
    )
    probes = spark.range(1, _BLOOM_PROBES + 1).select(
        (F.lit(1000000000) + F.col("id")).alias("pk")
    )
    ppos = probes.select("pk", ks).select(
        "pk", "i", pos(F.col("pk"), F.col("i")).alias("pos")
    )
    hits = (
        ppos.join(bits, "pos")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_set"))
    )
    fp = hits.where(F.col("n_set") == _BLOOM_K).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp")
    )
    n_members = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    n_bits = bits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bits_set")
    )
    return (
        fp.crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(n_bits))
        .select(
            F.lit(_BLOOM_M).cast("bigint").alias("m_bits"),
            F.lit(_BLOOM_K).cast("bigint").alias("k_hashes"),
            "n_members",
            "n_bits_set",
            F.lit(_BLOOM_PROBES).cast("bigint").alias("n_probes"),
            F.col("n_fp").alias("n_false_positives"),
            F.round(
                F.col("n_fp").cast("double") / _BLOOM_PROBES, 6
            ).alias("fp_rate"),
        )
    )
