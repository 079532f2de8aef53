"""Text-analysis declared queries (SURVEY.md §2.12): tokenization, word
counts, quality features, language-ID heuristic, fingerprints, binary
(multimodal) column plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.textanalysis import (
    STOPWORDS,
    fingerprint,
    quality_features,
    tokens,
    word_counts,
)
from .registry import declared_query

# DuckDB twin of operators.textanalysis.tokens (split on whitespace runs,
# lowercased).
_O_TOK = (
    "string_split_regex(lower(regexp_replace("
    "text, '^\\s+|\\s+$', '', 'g')), '\\s+')"
)

_O_EN_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"

# (lang, word) VALUES rows generated from the same STOPWORDS dict the Spark
# side uses, so the two can never drift.
_O_STOPWORD_ROWS = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in sorted(STOPWORDS.items()) for w in ws
)
_O_LANG_ROWS = ", ".join(f"('{lang}')" for lang in sorted(STOPWORDS))


@declared_query(
    "word_counts_top50",
    oracle=f"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({_O_TOK}) AS word FROM documents) t
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def word_counts_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed word count (explode -> partial agg -> one shuffle on the
    token), top 50 with deterministic tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return word_counts(docs).orderBy(F.desc("n"), F.asc("word")).limit(50)


@declared_query(
    "doc_quality_features",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_O_TOK} AS t, length(text) AS nc
                 FROM documents)
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(nc AS INTEGER) AS n_chars,
           CAST(ROUND(CAST(nc AS DOUBLE) / len(t), 6) AS DOUBLE)
               AS chars_per_token,
           CAST(ROUND(CAST(len(list_filter(t,
                    x -> list_contains({_O_EN_LIST}, x))) AS DOUBLE)
                / len(t), 6) AS DOUBLE) AS stopword_ratio,
           CAST(ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                AS DOUBLE) AS distinct_ratio
    FROM tok
    """,
)
def doc_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token/char counts, mean token length,
    stopword ratio, distinct-token ratio — the LLM-pipeline quality-filter
    features."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs)


@declared_query(
    "lang_text_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS avg_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def lang_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language distribution + exact length stats (integer arithmetic)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@declared_query(
    "lang_id_stopwords",
    oracle=f"""
    WITH sw(lang_guess, word) AS (VALUES {_O_STOPWORD_ROWS}),
    langs(lang_guess) AS (VALUES {_O_LANG_ROWS}),
    toks AS (
        SELECT doc_id, unnest({_O_TOK}) AS word FROM documents
    ), hits AS (
        SELECT t.doc_id, s.lang_guess, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM toks t JOIN sw s ON t.word = s.word
        GROUP BY t.doc_id, s.lang_guess
    ), grid AS (
        SELECT d.doc_id, d.lang, l.lang_guess,
               COALESCE(h.n_hits, 0) AS n_hits
        FROM documents d
        CROSS JOIN langs l
        LEFT JOIN hits h
          ON d.doc_id = h.doc_id AND l.lang_guess = h.lang_guess
    )
    SELECT doc_id, lang, lang_guess AS predicted, n_hits
    FROM (
        SELECT doc_id, lang, lang_guess, n_hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n_hits DESC, lang_guess) AS rn
        FROM grid
    ) t
    WHERE rn = 1
    """,
)
def lang_id_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit argmax per document.

    Fully IN-ROW: the per-lang stopword lists are tiny literal arrays,
    so each doc counts its hits per lang with ``filter``/
    ``array_contains`` over the bound token array and takes the argmax
    as ``array_min`` over (-hits, lang) structs — max hits, ties to
    the lexicographically smallest lang, all inside whole-stage
    codegen with ZERO exchanges. The previous relational formulation
    (explode → broadcast join → groupBy → dense grid → row_number)
    computed the identical answer through three shuffles and a window
    — measured 1.0 s vs 0.52 s at sf0.1, and at 100 TB it shuffles
    the whole exploded token stream where this shuffles nothing. The
    oracle keeps the relational formulation as the independent
    cross-check."""
    docs = load_table(spark, sf_dir, "documents")
    # bind the tokenizer output once (two-step projection; referencing
    # the raw split() in every per-lang filter would re-evaluate it)
    toks = docs.select("doc_id", "lang", tokens("text").alias("t"))
    entries = [
        F.struct(
            (
                -F.size(
                    F.filter(
                        F.col("t"),
                        lambda tok: tok.isin(*sorted(words)),
                    )
                ).cast("bigint")
            ).alias("neg_hits"),
            F.lit(lang).alias("lang_guess"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    best = F.array_min(F.array(*entries))
    return toks.select(
        "doc_id",
        "lang",
        best["lang_guess"].alias("predicted"),
        (-best["neg_hits"]).cast("bigint").alias("n_hits"),
    )


@declared_query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(regexp_replace(
               text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$', '', 'g')))
               AS fingerprint,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 fingerprint of normalized text (engine-portable
    content hash for dedup joins)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(docs).alias("fingerprint"),
        F.length("text").cast("int").alias("n_chars"),
    )


@declared_query(
    "binary_column_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           substring(to_base64(encode(text)), 1, 24) AS b64_prefix
    FROM documents
    """,
)
def binary_column_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: treat content as an opaque binary column
    with typed metadata (octet length, base64 head). The decode /
    feature-extraction path for real image/audio payloads lives in
    data_engineering_1_spark/multimodal/ (stubbed decoders, real Spark
    plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    bin_col = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(bin_col).cast("int").alias("n_bytes"),
        F.substring(F.base64(bin_col), 1, 24).alias("b64_prefix"),
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | non-space symbol runs
# (the GPT-2-style coarse split, minus byte fallback). Same RE2/Java-regex
# subset on both engines.
_BPE_RE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


@declared_query(
    "token_counts_bpe",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(text, '{_BPE_RE}') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(t, x -> regexp_matches(x, '^\\p{{L}}')))
                AS INTEGER) AS n_word_tokens,
           CAST(len(list_filter(t, x -> regexp_matches(x, '^\\p{{N}}')))
                AS INTEGER) AS n_number_tokens,
           CAST(len(t) - len(list_filter(t, x -> regexp_matches(x, '^\\p{{L}}')))
                    - len(list_filter(t, x -> regexp_matches(x, '^\\p{{N}}')))
                AS INTEGER) AS n_symbol_tokens
    FROM tok
    """,
)
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (letter / digit /
    symbol runs) — the LLM-pipeline cost estimator. Pure JVM regex, no UDF;
    one projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    n_words = F.size(F.filter(t, lambda x: x.rlike(r"^\p{L}")))
    n_nums = F.size(F.filter(t, lambda x: x.rlike(r"^\p{N}")))
    return docs.select(
        "doc_id",
        F.size(t).cast("int").alias("n_tokens"),
        n_words.cast("int").alias("n_word_tokens"),
        n_nums.cast("int").alias("n_number_tokens"),
        (F.size(t) - n_words - n_nums).cast("int").alias("n_symbol_tokens"),
    )


@declared_query(
    "bigram_counts_top30",
    oracle=f"""
    WITH toks AS (SELECT {_O_TOK} AS t FROM documents),
    bg AS (
        SELECT concat_ws(' ', t[i], t[i+1]) AS bigram
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        WHERE len(t) >= 2
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 30
    """,
)
def bigram_counts_top30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram counts (n-gram family, §2.12): explode the in-row bigram
    array, one shuffle with map-side combine, deterministic top-30.

    The token array is materialized into a column BEFORE the n-gram
    lambda: handing the raw split() expression to ngrams() makes every
    element_at re-tokenize the document (the shingle trap of
    operators/dedup.py — measured 25x slower here)."""
    from ..operators.textanalysis import ngrams

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(tokens("text").alias("__toks"))
        .select(F.explode(ngrams(F.col("__toks"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(30)
    )


@declared_query(
    "doc_length_percentiles",
    oracle="""
    SELECT lang,
           CAST(ROUND(quantile_cont(n_chars, 0.25), 6) AS DOUBLE) AS p25,
           CAST(ROUND(quantile_cont(n_chars, 0.50), 6) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(n_chars, 0.90), 6) AS DOUBLE) AS p90,
           CAST(ROUND(quantile_cont(n_chars, 0.99), 6) AS DOUBLE) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated length percentiles per language (§2.12 "length
    stats"). F.percentile is the exact sort-based aggregate — matches
    DuckDB quantile_cont bit-for-bit on integer inputs; the approximate
    sketch variant (percentile_approx) is the at-scale swap but is
    engine-specific, hence not declared."""
    docs = load_table(spark, sf_dir, "documents")
    pct = lambda p: F.round(F.percentile("n_chars", F.lit(p)), 6)
    return (
        docs.groupBy("lang")
        .agg(
            pct(0.25).alias("p25"),
            pct(0.50).alias("p50"),
            pct(0.90).alias("p90"),
            pct(0.99).alias("p99"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


@declared_query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_O_TOK}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2
    ),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    dfreq AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, d.df,
               CAST(ROUND(ln((n_docs + 1.0) / (d.df + 1.0)) + 1.0, 6)
                    AS DOUBLE) AS idf
        FROM tf JOIN dfreq d USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, idf,
           CAST(ROUND(tf * idf, 6) AS DOUBLE) AS tf_idf,
           CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY ROUND(tf * idf, 6) DESC, term) AS rk
        FROM scored
    )
    WHERE rk <= 3 AND doc_id < 50
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 exact TF-IDF (operators/textanalysis.py::tf_idf), surfaced
    as a declared query: top-3 scored terms for the first 50 docs. The
    corpus-size N enters as a broadcast 1-row aggregate (fully lazy); the
    ln() is rounded to 6 on both engines before ranking so libm last-ulp
    differences can't reorder ties."""
    from ..operators.textanalysis import tf_idf

    docs = load_table(spark, sf_dir, "documents")
    scored = tf_idf(docs)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf_idf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "term", "tf", "df", "idf", "tf_idf", "rk")
    )


@declared_query(
    "doc_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_TOK} AS t FROM documents),
    sh AS (
        SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
        WHERE len(t) >= 3
    ), agg AS (
        SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_trigrams,
               CAST(COUNT(DISTINCT shingle) AS INTEGER)
                   AS n_distinct_trigrams
        FROM sh GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_trigrams, 0) AS n_trigrams,
           COALESCE(a.n_distinct_trigrams, 0) AS n_distinct_trigrams,
           CAST(ROUND(CASE WHEN COALESCE(a.n_trigrams, 0) > 0
                THEN 1.0 - CAST(a.n_distinct_trigrams AS DOUBLE)
                           / a.n_trigrams
                ELSE 0.0 END, 6) AS DOUBLE) AS dup_trigram_frac,
           (ROUND(CASE WHEN COALESCE(a.n_trigrams, 0) > 0
                THEN 1.0 - CAST(a.n_distinct_trigrams AS DOUBLE)
                           / a.n_trigrams
                ELSE 0.0 END, 6) < 0.1) AS keep
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 repetition-based quality gate (the C4/Gopher-style rule):
    per document, the fraction of duplicate word trigrams — boilerplate
    and templated spam score high, natural prose low — with the keep
    decision at dup_frac < 0.1. Fully IN-ROW Spark (shingle array →
    size/array_distinct arithmetic inside the projection, zero shuffles,
    scan fused by codegen) vs DuckDB's unnest+GROUP BY twin; the keep
    flag compares the ROUNDED fraction on both engines so a last-ulp
    division difference can't flip a boundary document."""
    from ..operators.dedup import shingles_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    # Bind tokens, then shingles, through separate projections: feeding
    # the raw split(...) expression into the shingle transform (or
    # referencing the shingle array twice) re-evaluates the upstream
    # expression per element — measured ~100x slower at sf0.1 (the same
    # trap operators/dedup.py::shingles_from_tokens documents).
    sh = docs.select(
        "doc_id", tokens("text").alias("__toks")
    ).select(
        "doc_id", shingles_from_tokens(F.col("__toks"), 3).alias("__sh")
    )
    counted = sh.select(
        "doc_id",
        F.size("__sh").cast("int").alias("n_trigrams"),
        F.size(F.array_distinct("__sh")).cast("int").alias(
            "n_distinct_trigrams"
        ),
    )
    dup = F.when(
        F.col("n_trigrams") > 0,
        F.round(
            F.lit(1.0)
            - F.col("n_distinct_trigrams").cast("double")
            / F.col("n_trigrams").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return counted.select(
        "doc_id",
        "n_trigrams",
        "n_distinct_trigrams",
        dup.alias("dup_trigram_frac"),
        (dup < 0.1).alias("keep"),
    )


@declared_query(
    "training_corpus_pipeline",
    oracle="""
    WITH cleaned AS (
        SELECT doc_id, lang,
               trim(regexp_replace(text, '\\s{2,}', ' ', 'g')) AS text_clean
        FROM documents
    ), filtered AS (
        SELECT doc_id, lang, text_clean,
               len(string_split_regex(text_clean, '\\s+')) AS n_tokens,
               length(text_clean) AS n_chars
        FROM cleaned
        WHERE length(text_clean) >= 100
    ), quality AS (
        SELECT * FROM filtered WHERE n_tokens >= 20
    ), deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY text_clean ORDER BY doc_id) AS rn
            FROM quality
        ) t WHERE rn = 1
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS avg_chars
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline as ONE lazy plan: whitespace
    normalization (reference P1, src/pdf_extractor.py:30) -> length floor
    -> token-count quality floor -> exact dedup with deterministic min-id
    survivor -> per-language corpus stats. This is the end-to-end shape a
    100 TB corpus build runs nightly; expressing it as a single DataFrame
    chain means Catalyst fuses the scalar stages into one codegen'd scan
    stage and the only exchanges are the dedup window's hash partition on
    the cleaned text and the tiny per-language aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id",
        "lang",
        F.trim(F.regexp_replace("text", r"\s{2,}", " ")).alias("text_clean"),
    )
    quality = (
        cleaned.filter(F.length("text_clean") >= 100)
        .withColumn("n_tokens", F.size(F.split("text_clean", r"\s+")))
        .withColumn("n_chars", F.length("text_clean"))
        .filter(F.col("n_tokens") >= 20)
    )
    surv = Window.partitionBy("text_clean").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(surv))
        .filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
        )
        .orderBy("lang")
    )
