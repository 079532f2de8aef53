"""SimHash operator semantics (SURVEY.md §2.4 E7 family)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.operators.dedup import (
    simhash,
    simhash_neardup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about database engines and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_identical_text_identical_simhash(spark, docs):
    fp = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert fp[1] == fp[2]
    assert 0 <= fp[1] < (1 << 32)


def test_near_dup_small_hamming(spark, docs):
    fp = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[1], fp[3]) < ham(fp[1], fp[4])


def test_neardup_pairs_finds_dups_not_distinct(spark, docs):
    pairs = simhash_neardup_pairs(simhash(docs), max_hamming=3).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in got  # exact dup: hamming 0
    assert all(4 not in p for p in got)  # distinct doc stays unpaired
    h12 = next(r.hamming for r in pairs if (r.doc_a, r.doc_b) == (1, 2))
    assert h12 == 0


def test_count_weighting_matters(spark):
    # same token set, very different multiplicities -> different simhash
    df = spark.createDataFrame(
        [(1, "alpha " * 50 + "beta"), (2, "alpha " + "beta " * 50)],
        "doc_id bigint, text string",
    )
    fp = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert fp[1] != fp[2]
