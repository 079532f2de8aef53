"""Dedup + text-analysis operator tests (SURVEY.md §2.4 E6-E7, §2.12)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from data_engineering_1_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from data_engineering_1_spark.operators.textanalysis import (
    quality_features,
    word_counts,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "completely different words entirely here now"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (5, "short text"),
]


def doc_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )


def test_exact_dedup_keeps_min_id(spark):
    df = doc_df(spark)
    out = exact_dedup(df, ("text",), "doc_id").select("doc_id").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 2, 3, 5]  # 4 deduped against 1


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(shingles("text", 3).alias("s")).collect()
    assert rows[0].s == ["a b c", "b c d"]
    assert rows[1].s == []


def test_lsh_finds_near_and_exact_dups(spark):
    df = doc_df(spark)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(df)).collect()
    }
    assert (1, 4) in pairs  # exact dup always shares every band minhash
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup likely bucketed
    assert all(a < b for a, b in pairs)


def test_jaccard_values(spark):
    df = doc_df(spark)
    pairs = spark.createDataFrame(
        [(1, 4), (1, 3)], "doc_a long, doc_b long"
    )
    got = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(df, pairs).collect()}
    assert got[(1, 4)] == 1.0
    assert (1, 3) not in got or got[(1, 3)] == 0.0  # no shared tokens -> no row


def test_jaccard_hot_token_split_is_exact(spark, sf_dir):
    """The hot-token valve (max_token_df_frac) must be an exact rewrite:
    identical (pair, jaccard) rows as the plain inverted-index join on
    the fixture corpus over the real LSH candidates — at every value,
    not just at the 0.8 threshold — and the fixture must actually
    exercise the hot path (a nonempty hot vocabulary)."""
    from data_engineering_1_spark.io import load_table
    from data_engineering_1_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(minhash_signatures(docs)).cache()
    plain = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, cands).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, cands, max_token_df_frac=0.5).collect()
    }
    assert capped == plain
    # the valve must not be vacuous on this corpus
    from pyspark.sql import functions as F

    from data_engineering_1_spark.operators.textanalysis import tokens

    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    n_docs = docs.count()
    n_hot = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 0.5 * n_docs)
        .count()
    )
    assert n_hot > 0, "fixture has no hot tokens; the exactness pin is vacuous"


def test_word_counts(spark):
    df = doc_df(spark)
    wc = {r.word: r.n for r in word_counts(df, "text").collect()}
    assert wc["the"] == 6
    assert wc["dog"] == 2


def test_quality_features(spark):
    df = doc_df(spark)
    row = {
        r.doc_id: r for r in quality_features(df).collect()
    }[1]
    assert row.n_tokens == 9
    assert row.stopword_ratio > 0  # 'the' x2
    assert row.distinct_ratio == round(8 / 9, 6)
