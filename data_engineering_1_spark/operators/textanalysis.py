"""Text-analysis operators (SURVEY.md §2.12, [north-star]): tokenization,
word counts, quality scoring, language-ID heuristic, fingerprinting.

All pure Spark column expressions — tokenization is a split, counts are
explode+groupBy (the classic distributed word count: map-side partial
aggregation then one shuffle on the token), scoring is arithmetic over
token arrays. No Python in the hot path, so every operator scales as a
narrow map + at most one exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and hard-coded: the declared queries need
# deterministic, oracle-reproducible behavior, not linguistic accuracy.
STOPWORDS = {
    "en": ("the", "of", "and", "to", "in", "is", "data"),
    "fr": ("le", "la", "de", "et", "les", "des"),
    "es": ("el", "la", "de", "y", "los", "las"),
    "de": ("der", "die", "das", "und", "von"),
}


def strip_ws(col: Column | str) -> Column:
    """Python-str.strip()-style whitespace strip (Spark trim only strips
    spaces)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def tokens(col: Column | str, lower: bool = True) -> Column:
    t = F.split(strip_ws(col), r"\s+")
    return F.transform(t, F.lower) if lower else t


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word count over whitespace tokens."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Per-document quality features: token count, char count, mean token
    length, stopword ratio, distinct-token ratio (all deterministic
    integer/ratio arithmetic -> oracle-checkable)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        *id_cols,
        n_tokens.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars"),
        F.round(n_chars.cast("double") / n_tokens, 6).alias("chars_per_token"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(n_distinct.cast("double") / n_tokens, 6).alias(
            "distinct_ratio"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text (engine-portable — both Spark
    and DuckDB ship bit-identical md5)."""
    return F.md5(
        F.lower(
            strip_ws(F.regexp_replace(F.col(text_col), r"\s{2,}", " "))
        )
    )


def ngrams(tokens_col: Column | str, n: int = 2) -> Column:
    """Word n-grams as an array column — pure Spark twin of MLlib's NGram
    transformer (space-joined consecutive n-tuples), usable inside any
    plan without a Pipeline.

    Pass a MATERIALIZED array column (select the tokenizer into an
    alias first), never a composite expression like ``tokens("text")``:
    the token expression appears n+1 times inside the transform lambda
    and Catalyst does not common-subexpression-eliminate across lambda
    slots — a regex tokenizer fed directly measured ~20x slower than
    the aliased form at sf0.1."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    sz = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(sz - (n - 1), F.lit(0)))
    return F.when(
        sz >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Relational TF-IDF: (doc, term, tf, df, idf, tf_idf) — exact, not
    MLlib's hashed approximation. Two shuffles total: one groupBy on
    (doc, term) for tf, one on term for document frequency; idf is the
    smoothed ln((N+1)/(df+1)) + 1.

    Exact term identity beats HashingTF's collisions for pipeline-quality
    work; at extreme vocabulary the term aggregate can be salted
    (operators.skew.salted_aggregate).

    Fully lazy: the corpus size N enters the plan as a broadcast 1-row
    aggregate cross-joined in, not a driver-side count — no eager extra
    pass over the corpus at build time."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.countDistinct(id_col).alias("__n_docs"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    idf = F.round(
        F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0, 6
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("idf", idf)
        .withColumn("tf_idf", F.round(F.col("tf") * F.col("idf"), 6))
        .select(id_col, "term", "tf", "df", "idf", "tf_idf")
    )
