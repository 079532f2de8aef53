"""Session-scoped persisted co-purchase edge relations.

The X37 stored-index discipline applied to the graph family (VERDICT
r7 #4): seven declared queries (pagerank, personalized pagerank, k-hop
BFS, k-core, cheapest-path, clustering coefficient, triangle count,
modularity, label propagation, 2-hop reach, assortativity) all start
from the SAME base relation — the distinct (l_orderkey, l_partkey)
items self-join — and each used to rebuild it from the lineitem
parquet scan up (~2 s of the 2.3-6.7 s per graph query at sf0.1).
This module builds it ONCE per (application, sf_dir) and persists it
(MEMORY_AND_DISK), so every graph query after the first reads the
in-memory edge relation instead of re-running the scan + self-join.

At 100 TB the same discipline holds with a durable artifact instead of
a cache: the edge list is the persisted table (bucketed by src) and
every graph algorithm reads it — never re-deriving edges from the
fact table per query. The in-session persist is the local-mode
equivalent; `operators/graph.py` additionally repartitions its own
copy on src per algorithm call (iteration-internal reuse), which this
cache feeds.

Two base relations are cached, everything else is a projection:

- ``copurchase_pairs``  — (u, v) with u < v, one row per co-purchasing
  ORDER (multiplicity preserved; parallel pairs act as weights).
- ``copurchase_und``    — DISTINCT (u, v), u < v (the simple
  undirected graph).

Symmetrized views (``copurchase_edges`` / ``copurchase_edges_distinct``)
explode each cached row into both directions — a narrow map over the
cache, deliberately NOT persisted twice.

Cache safety: entries are keyed by (applicationId, realpath(sf_dir))
and additionally pin the owning SparkSession by identity — a new
session (fresh driver run, test isolation) rebuilds rather than
reusing DataFrames whose analyzer state belongs to a dead session.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_CACHE: dict[tuple[str, str, str], tuple[SparkSession, DataFrame]] = {}


def _cached(
    spark: SparkSession, sf_dir: str, kind: str, build
) -> DataFrame:
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        kind,
    )
    hit = _CACHE.get(key)
    if hit is not None:
        cached_spark, df = hit
        if cached_spark is spark:
            return df
        try:  # same app, different session object: drop the stale entry
            df.unpersist()
        except Exception:
            pass
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _CACHE[key] = (spark, df)
    return df


def clear_cache() -> None:
    """Unpersist and forget every cached edge relation (test hygiene)."""
    for _, (_, df) in list(_CACHE.items()):
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()


def copurchase_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (l_orderkey, l_partkey) incidence — the base relation
    of the whole co-purchase family (pair build, per-part support,
    3-itemsets, HITS hubs) — persisted once per (app, sf_dir)."""

    def build() -> DataFrame:
        from ..io import load_table

        li = load_table(spark, sf_dir, "lineitem")
        return li.select("l_orderkey", "l_partkey").distinct()

    return _cached(spark, sf_dir, "items", build)


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v) part pairs with u < v, one row per co-purchasing order
    (multiplicity preserved) — persisted once per (app, sf_dir);
    built from the cached incidence so the lineitem scan + distinct
    run once across the whole family."""

    def build() -> DataFrame:
        items = copurchase_items(spark, sf_dir)
        a, b = items.alias("a"), items.alias("b")
        return a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        ).select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )

    return _cached(spark, sf_dir, "pairs", build)


def copurchase_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (u, v) with u < v — the simple undirected co-purchase
    graph, persisted once per (app, sf_dir); derived from the cached
    pairs so the lineitem scan + self-join never reruns."""
    return _cached(
        spark,
        sf_dir,
        "und",
        lambda: copurchase_pairs(spark, sf_dir).distinct(),
    )


def _symmetrize(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
                F.struct(F.col("v").alias("src"), F.col("u").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized multigraph edge list (parallel edges = weights) — a
    narrow explode over the cached pairs."""
    return _symmetrize(copurchase_pairs(spark, sf_dir))


def copurchase_edges_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized simple-graph edge list (both directions, no parallel
    edges) — a narrow explode over the cached distinct pairs."""
    return _symmetrize(copurchase_und(spark, sf_dir))
