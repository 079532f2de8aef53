"""Bucketed co-located join: the write-time shuffle elimination, pinned.

The claim that matters at 100 TB: two tables bucketed identically on the
join key sort-merge-join with NO Exchange on either side, while the same
join over plain parquet must shuffle both. Both forms must also agree on
the data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.operators.bucketing import (
    bucketed_tables_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        od, "orders_b", str(root / "orders_b"),
        bucket_cols=["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", str(root / "lineitem_b"),
        bucket_cols=["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_tables_join(spark, left, right, "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed-on-join-key tables must join without shuffling"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet needs an Exchange on both
    sides once broadcast is off — proving the bucketed plan's missing
    Exchange comes from the layout, not from some session default."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        od = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        plan = _plan(od.join(li, "o_orderkey"))
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    left, right = bucketed_pair
    got = bucketed_tables_join(spark, left, right, "o_orderkey")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    exp = od.join(li, "o_orderkey")
    assert got.count() == exp.count()
    g = got.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    e = exp.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    assert g == e
