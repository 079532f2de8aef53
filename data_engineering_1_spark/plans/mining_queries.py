"""Training-data mining declared queries (round 6 batch, [north-star]
scope — the reference has no mining surface; these are the operators a
100 TB pretraining-corpus pipeline runs between ingest and packing):

  * ``hard_negative_mining`` (X111) — contrastive-training hard
    negatives: per anchor, the most-similar vectors with a DIFFERENT
    label. Same physical shape as the k-NN join (anchors broadcast,
    vectors never shuffle, one window on the anchor id).
  * ``int8_rerank_topk`` (X112) — two-stage retrieval: an integer int8
    code scan prunes to 100 candidates, exact cosine rescores them.
    The 100 TB pattern: the cheap pass touches every vector with 4x
    less memory traffic and integer arithmetic; the exact kernel runs
    on a constant-sized candidate set.
  * ``bpe_first_merges`` (X113) — the first BPE merge table: adjacent
    char-pair frequencies weighted by word frequency. Pair counting
    runs over the DISTINCT-word vocabulary (zipf-bounded), not the
    corpus token stream — the trick that makes corpus-scale BPE cheap.
  * ``url_canonical_dedup`` (X114) — canonical-URL dedup: lowercase
    host, strip tracking params and fragments, then one hash-groupBy
    on the canonical form. Per-row JVM string ops + one shuffle.
  * ``repeated_substring_spans`` (X115) — exact repeated-substring
    candidates (the memorization-risk pass from large-corpus dedup):
    strided 20-char shingles grouped by value; emitted spans are the
    inputs to an exact substring-removal rewrite. The stride bounds
    fan-out at len/stride rows per doc.
  * ``mixture_temperature_alloc`` (X116) — temperature-based mixture
    weights across sources (w_d = n_d^(1/2), the multilingual-sampling
    shape) with largest-remainder rounding to an integer example
    budget. One aggregate over the corpus; the allocation arithmetic
    runs on |sources| rows.

Determinism discipline (registry header): sqrt/floor are IEEE
correctly-rounded (bit-identical across engines), integer code dots
are exact BIGINT sums, decimal staging makes the one cross-source sum
order-free, and every emitted double is ROUND(.., 6)-ed on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import o_cosine, vec_dot, vec_norm
from ..io import load_table
from ..operators.textanalysis import tokens
from .registry import declared_query
from .text_queries import _O_TOK

# ---- X111: hard negative mining -------------------------------------

_ANCHOR_MOD = 200
_N_NEG = 5


@declared_query(
    "hard_negative_mining",
    oracle=f"""
    WITH anchors AS (
        SELECT vec_id AS anchor_id, label AS anchor_label,
               embedding AS anchor_vec
        FROM embeddings WHERE vec_id % {_ANCHOR_MOD} = 0
    ), scored AS (
        SELECT a.anchor_id, e.vec_id AS negative_id, e.label,
               CAST(ROUND({o_cosine('e.embedding', 'a.anchor_vec')}, 6)
                    AS DOUBLE) AS cosine_sim
        FROM embeddings e CROSS JOIN anchors a
        WHERE e.label <> a.anchor_label
    )
    SELECT anchor_id, negative_id, label, cosine_sim, rn
    FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
                       ORDER BY cosine_sim DESC, negative_id)
                  AS INTEGER) AS rn
        FROM scored
    ) t
    WHERE rn <= {_N_NEG}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X111: per anchor (vec_id % 200 = 0), the 5 highest-cosine vectors
    whose label DIFFERS — the hard negatives a contrastive embedding
    trainer pairs with each anchor. Physical shape mirrors the k-NN
    join (E5): the anchor table broadcasts, the vector table is scanned
    in place (never shuffled to meet the anchors), and the only shuffle
    is the |anchors|-keyed ranking window, which WindowGroupLimit
    prunes to the per-anchor top-5 before the sort completes."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % _ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("anchor_vec"),
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            "label",
            F.round(
                vec_dot("embedding", "anchor_vec")
                / (vec_norm("embedding") * vec_norm("anchor_vec")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= _N_NEG)
    )


# ---- X112: int8 coarse scan + exact rerank ---------------------------

# global symmetric code scale: x in [-4, 4] -> floor(x * 31.75) in
# [-127, 127]. floor() on identical doubles is bit-deterministic; the
# clamp makes out-of-range components safe instead of silently wrong.
_CODE = "floor(greatest(-4.0, least(4.0, CAST({x} AS DOUBLE))) * 31.75)"
_COARSE_K = 100
_FINAL_K = 10


@declared_query(
    "int8_rerank_topk",
    oracle=f"""
    WITH q AS (
        SELECT embedding AS qvec,
               list_transform(embedding,
                   x -> CAST({_CODE.format(x='x')} AS BIGINT)) AS qcode
        FROM embeddings WHERE vec_id = 1
    ), coarse AS (
        SELECT e.vec_id, e.label, e.embedding, q.qvec,
               CAST(list_sum(list_transform(
                   generate_series(1, len(e.embedding)),
                   i -> CAST({_CODE.format(x='e.embedding[i]')} AS BIGINT)
                        * q.qcode[i])) AS BIGINT) AS coarse_score
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 1
    ), cand AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                ORDER BY coarse_score DESC, vec_id) AS crn
            FROM coarse
        ) t WHERE crn <= {_COARSE_K}
    )
    SELECT vec_id, label, coarse_score,
           CAST(ROUND({o_cosine('embedding', 'qvec')}, 6) AS DOUBLE)
               AS cosine_sim,
           CAST(row_number() OVER (
               ORDER BY ROUND({o_cosine('embedding', 'qvec')}, 6) DESC,
                        vec_id) AS INTEGER) AS rn
    FROM cand
    QUALIFY rn <= {_FINAL_K}
    ORDER BY rn
    """,
)
def int8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X112: two-stage ANN for query vec_id=1 — an int8 CODE scan
    (global scale, exact BIGINT dot) takes the top-100 candidates, then
    the exact cosine kernel reranks only those 100 and emits the top-10.

    This is the production retrieval cost model: stage 1 touches every
    vector but moves 4x fewer bytes and does integer math (at cluster
    scale: SIMD-friendly, cache-resident codes, e.g. 100 TB of float32
    becomes 25 TB of codes); stage 2's expensive exact kernel runs on a
    CONSTANT 100 rows regardless of corpus size. Both top-ks compile to
    TakeOrderedAndProject (per-partition heap, no global sort), and the
    integer coarse scores are engine-exact so the candidate set —
    membership AND order — is reproducible everywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    code = lambda c: F.expr(_CODE.format(x=c)).cast("bigint")  # noqa: E731
    q = emb.filter(F.col("vec_id") == 1).select(
        F.col("embedding").alias("qvec"),
        F.transform(
            "embedding", lambda x: F.floor(
                F.greatest(F.lit(-4.0), F.least(F.lit(4.0), x.cast("double")))
                * 31.75
            ).cast("bigint")
        ).alias("qcode"),
    )
    coarse = (
        emb.filter(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "embedding",
            "qvec",
            F.aggregate(
                F.zip_with(
                    F.transform(
                        "embedding",
                        lambda x: F.floor(
                            F.greatest(
                                F.lit(-4.0), F.least(F.lit(4.0), x.cast("double"))
                            )
                            * 31.75
                        ).cast("bigint"),
                    ),
                    F.col("qcode"),
                    lambda a, b: a * b,
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("coarse_score"),
        )
    )
    cand = coarse.orderBy(
        F.desc("coarse_score"), F.asc("vec_id")
    ).limit(_COARSE_K)
    rescored = cand.select(
        "vec_id",
        "label",
        "coarse_score",
        F.round(
            vec_dot("embedding", "qvec")
            / (vec_norm("embedding") * vec_norm("qvec")),
            6,
        ).alias("cosine_sim"),
    )
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= _FINAL_K)
        .orderBy("rn")
    )


# ---- X113: BPE first-merge pair table --------------------------------

_N_MERGES = 30


@declared_query(
    "bpe_first_merges",
    oracle=f"""
    WITH vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_O_TOK}) AS word FROM documents)
        WHERE len(word) >= 2
        GROUP BY word
    ), positions AS (
        SELECT word, freq,
               unnest(generate_series(1, len(word) - 1)) AS i
        FROM vocab
    ), pairs AS (
        SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
               CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM positions
        GROUP BY 1
    )
    SELECT pair, pair_count,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
                AS INTEGER) AS merge_rank
    FROM pairs
    QUALIFY merge_rank <= {_N_MERGES}
    ORDER BY merge_rank
    """,
)
def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X113: the first BPE merge table — adjacent character-pair
    frequencies over the corpus, weighted by word frequency; the top
    pair is the tokenizer's first merge, the ranked list its first 30.

    The scalable shape: pair counting explodes the DISTINCT-word
    vocabulary (zipf-bounded — tens of millions of rows at 100 TB, a
    rounding error next to the token stream), carrying each word's
    corpus frequency as a weight, so the heavy corpus pass is ONE
    word-count aggregate (map-side combinable) and everything after is
    vocabulary-sized. Pairs are 2-char substrings (binary collation on
    both engines); merge_rank ties break on the pair bytes."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    pairs = (
        vocab.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1), "
                    "i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (
        pairs.withColumn("merge_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("merge_rank") <= _N_MERGES)
        .orderBy("merge_rank")
    )


# ---- X114: canonical-URL dedup ---------------------------------------


@declared_query(
    "url_canonical_dedup",
    oracle="""
    WITH canon AS (
        SELECT doc_id,
               'https://' || lower('WWW.' || source || '.Example.COM')
                   || '/page/' || CAST(doc_id % 25 AS VARCHAR)
                   || '?id=' || CAST(doc_id % 4 AS VARCHAR) AS canonical_url
        FROM documents
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) >= 2
    ORDER BY canonical_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114: canonical-URL deduplication — the crawl-side dedup that
    runs BEFORE content hashing: lowercase the host, drop the fragment,
    strip tracking params (utm_*), keep identity params, then group on
    the canonical form and keep the smallest doc_id.

    URLs are synthesized from the fixture (host from ``source``, path
    and id from ``doc_id`` — so the oracle derives identical strings),
    but the Spark side canonicalizes the REAL way: ``parse_url`` for
    HOST/PATH and the QUERY-key extraction for the kept param — the
    per-row JVM surface a crawler actually uses — not string
    concatenation. One hash-groupBy on the canonical key is the only
    shuffle; at 100 TB the group key is short and uniformly spread."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM/page/"),
        (F.col("doc_id") % 25).cast("string"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 4).cast("string"),
        F.lit("&utm_medium=rss#frag"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    canonical = with_url.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.lower(F.parse_url(F.col("url"), F.lit("HOST"))),
            F.parse_url(F.col("url"), F.lit("PATH")),
            F.lit("?id="),
            F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")),
        ).alias("canonical_url"),
    )
    return (
        canonical.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_dups") >= 2)
        .orderBy("canonical_url")
    )


# ---- X115: repeated-substring spans ----------------------------------

_SHINGLE_LEN = 20
_SHINGLE_STRIDE = 10
_MIN_DOCS = 3
_TOP_SPANS = 50


@declared_query(
    "repeated_substring_spans",
    oracle=f"""
    WITH positions AS (
        SELECT doc_id, text,
               unnest(generate_series(
                   1, len(text) - {_SHINGLE_LEN - 1}, {_SHINGLE_STRIDE}))
                   AS p
        FROM documents
        WHERE len(text) >= {_SHINGLE_LEN}
    ), shingles AS (
        SELECT doc_id, substr(text, CAST(p AS INTEGER), {_SHINGLE_LEN})
                   AS span
        FROM positions
    )
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM shingles
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= {_MIN_DOCS}
    QUALIFY row_number() OVER (
        ORDER BY n_docs DESC, n_occurrences DESC, span) <= {_TOP_SPANS}
    ORDER BY n_docs DESC, n_occurrences DESC, span
    """,
)
def repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X115: exact repeated-substring candidates — strided 20-char
    shingles that appear in >= 3 distinct documents: the memorization /
    boilerplate-risk pass large-corpus pipelines run before exact
    substring removal (the suffix-array approach's distributed
    approximation: a strided shingle index finds every repeat of
    length >= len + stride - 1, here >= 29 chars, at len/stride rows
    per doc instead of len).

    Scale shape: the fan-out is bounded (~len/10 rows per doc, each a
    20-char string), the groupBy key is the shingle itself (uniformly
    spread — hot boilerplate keys are exactly the signal), and the
    top-50 is a TakeOrdered over the surviving groups. The distinct
    doc-count and raw occurrence count are both exact."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = (
        docs.filter(F.length("text") >= _SHINGLE_LEN)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {_SHINGLE_LEN - 1}, "
                    f"{_SHINGLE_STRIDE}), p -> substring(text, p, {_SHINGLE_LEN}))"
                )
            ).alias("span"),
        )
    )
    agg = (
        shingles.groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= _MIN_DOCS)
    )
    return agg.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), F.asc("span")
    ).limit(_TOP_SPANS)


# ---- X116: temperature-based mixture allocation ----------------------

_MIX_BUDGET = 100_000


@declared_query(
    "mixture_temperature_alloc",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(sqrt(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(28,12))
                   AS w_dec
        FROM documents GROUP BY source
    ), shares AS (
        SELECT source, n_docs,
               CAST(w_dec AS DOUBLE) * {_MIX_BUDGET}
                   / CAST((SELECT SUM(w_dec) FROM counts) AS DOUBLE)
                   AS share
        FROM counts
    ), floors AS (
        SELECT source, n_docs, share,
               CAST(floor(share) AS BIGINT) AS alloc_floor,
               share - floor(share) AS frac
        FROM shares
    )
    SELECT source, n_docs,
           CAST(ROUND(share, 6) AS DOUBLE) AS share,
           CAST(alloc_floor
                + CASE WHEN row_number() OVER (ORDER BY frac DESC, source)
                       <= {_MIX_BUDGET}
                          - (SELECT SUM(alloc_floor) FROM floors)
                  THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM floors
    ORDER BY source
    """,
)
def mixture_temperature_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X116: temperature-based mixture weights across sources — the
    data-mixing step that decides how many examples each domain
    contributes to a training epoch: w_d = n_d^(1/2) (temperature 2
    flattening, the multilingual-sampling shape), normalized, scaled to
    a 100k-example budget, with largest-remainder rounding so the
    integer allocations sum EXACTLY to the budget.

    Determinism: sqrt is IEEE correctly-rounded (bit-identical across
    engines, unlike pow with arbitrary exponents — why the temperature
    is expressed as a square root), the per-source weight is staged to
    DECIMAL(28,12) so the cross-source total is an exact order-free
    decimal sum, and the share division then runs on identical doubles
    everywhere. Scale: one map-side-combinable count over the corpus;
    the allocation arithmetic runs on |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).select(
        "source",
        "n_docs",
        F.sqrt(F.col("n_docs").cast("double"))
        .cast("decimal(28,12)")
        .alias("w_dec"),
    )
    total = counts.agg(F.sum("w_dec").alias("w_total"))
    shares = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        (
            F.col("w_dec").cast("double")
            * _MIX_BUDGET
            / F.col("w_total").cast("double")
        ).alias("share"),
    )
    floors = shares.select(
        "source",
        "n_docs",
        "share",
        F.floor("share").cast("bigint").alias("alloc_floor"),
        (F.col("share") - F.floor("share")).alias("frac"),
    )
    leftover = floors.agg(
        (F.lit(_MIX_BUDGET) - F.sum("alloc_floor")).alias("n_extra")
    )
    w = Window.orderBy(F.desc("frac"), F.asc("source"))
    return (
        floors.crossJoin(F.broadcast(leftover))
        .withColumn("rr", F.row_number().over(w))
        .select(
            "source",
            "n_docs",
            F.round("share", 6).alias("share"),
            (
                F.col("alloc_floor")
                + F.when(F.col("rr") <= F.col("n_extra"), 1).otherwise(0)
            ).cast("bigint").alias("alloc"),
        )
        .orderBy("source")
    )
