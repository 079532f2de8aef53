"""Sampling operators: determinism, consistency, proportions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_1_spark.operators.sampling import (
    hash_sample,
    stratified_sample_exact,
    train_test_split,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "k")


class TestHashSample:
    def test_reproducible_and_partition_invariant(self, spark):
        df = _ids(spark)
        s1 = {r.k for r in hash_sample(df, 0.2, "k").collect()}
        s2 = {r.k for r in hash_sample(df.repartition(13), 0.2, "k").collect()}
        assert s1 == s2 and s1

    def test_fraction_approximate(self, spark):
        n = 2000
        got = hash_sample(_ids(spark, n), 0.2, "k").count()
        assert abs(got / n - 0.2) < 0.05  # md5 is uniform; 2k keys

    def test_consistent_across_tables(self, spark):
        # same key universe, different tables -> same kept keys
        # (referential integrity of the sampled subset)
        a = _ids(spark).withColumn("x", F.lit(1))
        b = _ids(spark).withColumn("y", F.lit(2))
        ka = {r.k for r in hash_sample(a, 0.1, "k").collect()}
        kb = {r.k for r in hash_sample(b, 0.1, "k").collect()}
        assert ka == kb

    def test_salt_draws_independent_sample(self, spark):
        df = _ids(spark)
        s1 = {r.k for r in hash_sample(df, 0.2, "k", salt="a").collect()}
        s2 = {r.k for r in hash_sample(df, 0.2, "k", salt="b").collect()}
        assert s1 != s2
        # overlap ~ fraction^2 * n, far from identical or disjoint
        assert 0 < len(s1 & s2) < min(len(s1), len(s2))


class TestTrainTestSplit:
    def test_partition_complete_and_stable(self, spark):
        df = _ids(spark)
        rows = train_test_split(df, "k", 0.1, 0.1).collect()
        by = {}
        for r in rows:
            by.setdefault(r.split, set()).add(r.k)
        assert set(by) == {"train", "test", "val"}
        assert sum(len(v) for v in by.values()) == 2000
        # growing the corpus never moves an old row's split
        grown = train_test_split(_ids(spark, 4000), "k", 0.1, 0.1).collect()
        old = {r.k: r.split for r in rows}
        for r in grown:
            if r.k in old:
                assert r.split == old[r.k]

    def test_proportions(self, spark):
        rows = train_test_split(_ids(spark, 5000), "k", 0.2).collect()
        n_test = sum(r.split == "test" for r in rows)
        assert abs(n_test / 5000 - 0.2) < 0.03


class TestStratifiedExact:
    def test_exact_n_per_stratum(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
        got = stratified_sample_exact(df, "g", 5, ["k"]).collect()
        per = {}
        for r in got:
            per[r.g] = per.get(r.g, 0) + 1
        assert per == {0: 5, 1: 5, 2: 5}
        # deterministically the FIRST five by order
        assert {r.k for r in got if r.g == 0} == {0, 3, 6, 9, 12}

    def test_small_stratum_kept_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "k long, g string"
        )
        got = stratified_sample_exact(df, "g", 5, ["k"]).count()
        assert got == 3
