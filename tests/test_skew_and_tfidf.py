"""Skew utilities (salted aggregate/join) and exact TF-IDF / n-grams."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from data_engineering_1_spark.operators.textanalysis import (
    ngrams,
    tf_idf,
    tokens,
)


class TestSaltedAggregate:
    def test_equals_plain_groupby(self, spark):
        df = spark.createDataFrame(
            [("hot", float(i % 7)) for i in range(1000)]
            + [("cold", 1.0), ("cold", 2.0)],
            "k string, v double",
        )
        out = salted_aggregate(df, ["k"], {"v": "sum", "*": "count"})
        got = {r.k: (r.sum_v, r["count"]) for r in out.collect()}
        exp = {
            r.k: (r.s, r.c)
            for r in df.groupBy("k")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert got.keys() == exp.keys()
        for k in exp:
            assert got[k][0] == pytest.approx(exp[k][0])
            assert got[k][1] == exp[k][1]

    def test_rejects_non_reaggregable(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        with pytest.raises(ValueError):
            salted_aggregate(df, ["k"], {"v": "avg"})


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        skewed = spark.createDataFrame(
            [(1, i) for i in range(500)] + [(2, 1), (3, 2)],
            "k int, payload int",
        )
        small = spark.createDataFrame(
            [(1, "one"), (2, "two"), (4, "four")], "k int, name string"
        )
        got = salted_join(skewed, small, ["k"]).orderBy("k", "payload")
        exp = skewed.join(small, ["k"]).orderBy("k", "payload")
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in exp.collect()
        ]


class TestNgrams:
    def test_bigrams(self, spark):
        df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
        out = df.select(ngrams(tokens("text"), 2).alias("bg")).collect()
        assert out[0].bg == ["a b", "b c", "c d"]
        assert out[1].bg == []

    def test_trigrams(self, spark):
        df = spark.createDataFrame([("one two three four",)], "text string")
        out = df.select(ngrams(tokens("text"), 3).alias("tg")).collect()
        assert out[0].tg == ["one two three", "two three four"]


class TestTfIdf:
    def test_small_corpus_golden(self, spark):
        df = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry")],
            "doc_id bigint, text string",
        )
        rows = {(r.doc_id, r.term): r for r in tf_idf(df).collect()}
        assert rows[(1, "apple")].tf == 2
        assert rows[(1, "apple")].df == 1
        # idf = ln((2+1)/(1+1)) + 1
        assert rows[(1, "apple")].idf == pytest.approx(
            round(math.log(3 / 2) + 1, 6)
        )
        # banana in both docs -> idf = ln(3/3)+1 = 1
        assert rows[(1, "banana")].idf == 1.0
        assert rows[(2, "banana")].tf == 1
        assert rows[(1, "apple")].tf_idf == pytest.approx(
            round(2 * (math.log(1.5) + 1), 6), abs=2e-6
        )
