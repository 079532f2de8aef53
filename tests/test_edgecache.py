"""Session-scoped co-purchase edge cache (operators/edgecache.py).

VERDICT r7 #4: the graph family shares ONE persisted pair relation per
(application, sf_dir) instead of re-running the lineitem scan +
items self-join per query. These tests pin (1) the cache actually
reuses the same persisted DataFrame, (2) consumers read it through
InMemoryTableScan, (3) the cache keys on sf_dir, and (4) clear_cache
returns consumers to the parquet scan.
"""

from __future__ import annotations

import pytest

from data_engineering_1_spark.operators import edgecache


@pytest.fixture(autouse=True)
def _clean_cache():
    edgecache.clear_cache()
    yield
    edgecache.clear_cache()


def test_pairs_cached_and_reused(spark, sf_dir):
    p1 = edgecache.copurchase_pairs(spark, sf_dir)
    p2 = edgecache.copurchase_pairs(spark, sf_dir)
    assert p1 is p2
    # und derives from the SAME cached pairs and is itself cached
    u1 = edgecache.copurchase_und(spark, sf_dir)
    u2 = edgecache.copurchase_und(spark, sf_dir)
    assert u1 is u2
    assert u1 is not p1


def test_consumers_read_inmemory_scan(spark, sf_dir):
    pairs = edgecache.copurchase_pairs(spark, sf_dir)
    pairs.count()  # materialize the persist
    edges = edgecache.copurchase_edges(spark, sf_dir)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # the symmetrized view is a narrow explode: no shuffle ON TOP of
    # the cache (the InMemoryRelation's description still prints its
    # original build plan, exchanges included, so only the section
    # above the cache boundary must be exchange-free)
    above_cache = plan.split("InMemoryTableScan", 1)[0]
    assert "Exchange" not in above_cache


def test_edges_match_uncached_build(spark, sf_dir):
    from data_engineering_1_spark.io import load_table
    from pyspark.sql import functions as F

    got = sorted(
        (r.src, r.dst)
        for r in edgecache.copurchase_edges_distinct(spark, sf_dir).collect()
    )
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .collect()
    )
    want = sorted(
        pair for r in und for pair in ((r.u, r.v), (r.v, r.u))
    )
    assert got == want


def test_cache_keys_on_sf_dir(spark, sf_dir, tmp_path):
    import shutil
    import os

    alt = tmp_path / "sfalt"
    alt.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "lineitem.parquet"),
        alt / "lineitem.parquet",
    )
    p1 = edgecache.copurchase_pairs(spark, sf_dir)
    p2 = edgecache.copurchase_pairs(spark, str(alt))
    assert p1 is not p2


def test_clear_cache_rebuilds(spark, sf_dir):
    p1 = edgecache.copurchase_pairs(spark, sf_dir)
    p1.count()
    edgecache.clear_cache()
    p2 = edgecache.copurchase_pairs(spark, sf_dir)
    assert p1 is not p2
    plan = p2._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan
