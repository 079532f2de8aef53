"""Spark-4 surface pack (X73-X75): XML source round-trip,
parameterized SQL, collation comparisons, and the AQE runtime
re-planning guarantees (skew-join split + partition coalescing) that
the north star calls out explicitly for 100 TB work.

Avro is NOT testable here: Spark treats it as an external module
(spark-avro jar) and this container ships without it — the analogous
round-trip auto-activates if the jar appears (importorskip-style guard
below).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table


def test_xml_source_roundtrip(spark, sf_dir, tmp_path):
    """X73: Spark 4's built-in XML file source — write the nation table
    as XML rows, read it back with an explicit rowTag, values intact."""
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_xml")
    n.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .load(path)
        .select(*sorted(n.columns))
    )
    want = sorted(map(tuple, n.select(*sorted(n.columns)).collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_avro_roundtrip_if_available(spark, sf_dir, tmp_path):
    try:
        load_table(spark, sf_dir, "region").write.format("avro").mode(
            "overwrite"
        ).save(str(tmp_path / "region_avro"))
    except Exception as e:  # pragma: no cover - env-gated
        pytest.skip(f"avro module not deployed: {str(e)[:80]}")
    back = spark.read.format("avro").load(str(tmp_path / "region_avro"))
    assert back.count() == load_table(spark, sf_dir, "region").count()


def test_parameterized_sql(spark, sf_dir):
    """X74: named-parameter SQL — the injection-safe front door. The
    parameter reaches the plan as a literal (filter pushdown intact)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("p_orders")
    df = spark.sql(
        "SELECT count(*) AS n FROM p_orders WHERE o_orderstatus = :st",
        args={"st": "F"},
    )
    want = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .count()
    )
    assert df.collect()[0]["n"] == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(o_orderstatus,F)" in plan  # pushed as a literal


def test_collation_case_insensitive_compare(spark):
    """X74: Spark 4 collations — UTF8_LCASE makes comparison, DISTINCT
    and GROUP BY case-insensitive without lower() rewrites."""
    df = spark.createDataFrame(
        [("Alpha",), ("ALPHA",), ("beta",), ("Beta",), ("gamma",)],
        "name string",
    ).select(F.col("name").cast("string collate UTF8_LCASE").alias("name"))
    assert df.select("name").distinct().count() == 3
    g = {
        r["name"].lower(): r["n"]
        for r in df.groupBy("name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert g == {"alpha": 2, "beta": 2, "gamma": 1}
    eq = spark.sql("SELECT 'ABC' = 'abc' COLLATE UTF8_LCASE AS eq").collect()
    assert eq[0]["eq"] is True


def test_aqe_skew_join_split_and_coalesce(spark):
    """X75: AQE's two runtime re-plans, pinned on a synthetic 90%-hot
    key: the skewed shuffle partition is SPLIT across tasks
    (SortMergeJoin(skew=true) + 'coalesced and skewed' shuffle read)
    and the small post-shuffle partitions are COALESCED — with the
    join result verified against closed-form arithmetic. This is the
    runtime answer to skew that the salting operator (X25) solves
    statically."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        n_big, n_dim, n_keys = 500_000, 200_000, 1000
        big = spark.range(0, n_big).select(
            F.when(F.col("id") % 10 != 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, n_dim).select(
            (F.col("id") % n_keys).alias("k"), (F.col("id") * 2).alias("v")
        )
        j = big.join(dim, "k").agg(F.count(F.lit(1)).alias("n"))
        got = j.collect()[0]["n"]
        per_key = n_dim // n_keys
        hot = (n_big - n_big // 10) + 1  # k=0: all id%10!=0 rows plus id=0
        cold = len(
            [k for k in range(10, n_big, 10) if 0 < k < n_keys]
        )  # surviving k=id keys that exist in dim
        assert got == (hot + cold) * per_key
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "coalesced and skewed" in plan
        assert "AQEShuffleRead coalesced" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observe_metrics_free_ride(spark, sf_dir):
    """X101: Observation metrics — pipeline health counters (row count,
    value sum) collected DURING the action, no second pass over the
    data. The observed values must equal a direct aggregate, and
    observing must not perturb the query result."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    q = (
        orders.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "price_sum"
            ),
            F.count(F.when(F.col("o_totalprice") < 0, 1)).alias(
                "neg_prices"
            ),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["o_orderstatus"]: r["n"] for r in q.collect()}
    direct = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
            "price_sum"
        ),
    ).first()
    m = obs.get
    assert m["n_rows"] == direct["n_rows"] == sum(got.values())
    assert m["price_sum"] == direct["price_sum"]
    assert m["neg_prices"] == 0  # the data-quality assertion itself


def test_transpose_small_aggregate(spark, sf_dir):
    """X102: DataFrame.transpose (Spark 4) — rows <-> columns over a
    SMALL aggregate (the contract: the key column's values become the
    new schema, so the input must be driver-tiny; use it on crosstab-
    sized relations only, never facts). Values survive the flip."""
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )
    wide = {r["key"]: r for r in agg.transpose("o_orderstatus").collect()}
    tall = {r["o_orderstatus"]: r for r in agg.collect()}
    assert set(wide) == {"n", "total"}
    for status, row in tall.items():
        assert wide["n"][status] == row["n"]
        assert wide["total"][status] == row["total"]


def test_sql_scalar_udf_is_inlined(spark, sf_dir):
    """X103a: SQL-body scalar UDF (CREATE FUNCTION ... RETURN expr) —
    the reuse surface that costs NOTHING at scale: the body inlines
    into the Catalyst plan (no Python worker, no BatchEvalPython
    node), so calling it equals writing the expression by hand."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_udf")
    via_udf = spark.sql(
        "SELECT l_orderkey, ROUND(disc_price(l_extendedprice, l_discount), 2)"
        " AS net FROM li_udf ORDER BY l_orderkey, net LIMIT 100"
    )
    direct = spark.sql(
        "SELECT l_orderkey, ROUND(l_extendedprice * (1.0 - l_discount), 2)"
        " AS net FROM li_udf ORDER BY l_orderkey, net LIMIT 100"
    )
    assert [tuple(r) for r in via_udf.collect()] == [
        tuple(r) for r in direct.collect()
    ]
    plan = via_udf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # fully inlined: the physical plan carries the expanded expression,
    # not a function call — and the project stays in whole-stage
    # codegen (the `*(N)` stage marker in this plan format)
    assert "disc_price" not in plan
    assert "(1.0 - l_discount" in plan
    assert "*(1)" in plan


def test_sql_table_udf(spark):
    """X103b: SQL-body TABLE function (RETURNS TABLE) — a reusable
    parameterized view; composes in FROM like any relation."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION int_spine(lo INT, hi INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(lo, hi))"
    )
    got = [r["i"] for r in spark.sql(
        "SELECT i FROM int_spine(3, 7) ORDER BY i"
    ).collect()]
    assert got == [3, 4, 5, 6, 7]
