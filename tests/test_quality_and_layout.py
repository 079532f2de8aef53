"""Observation metrics, schema-evolution reads, and partition pruning —
the production-operations surface around the query engine.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.operators.quality import (
    assert_min_rows,
    observed_corpus_metrics,
)


def test_observe_metrics_ride_the_action(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    observed, obs = observed_corpus_metrics(docs)
    n = observed.count()  # one action computes rows AND metrics
    m = obs.get
    assert m["n_rows"] == n
    assert m["n_null_text"] == 0
    exp_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert m["total_chars"] == exp_chars
    assert m["mean_chars"] == pytest.approx(exp_chars / n)
    assert_min_rows(m, 1)
    with pytest.raises(ValueError, match="expected at least"):
        assert_min_rows(m, n + 1)


def test_observe_metrics_streaming(spark, sf_dir, tmp_path):
    """The same observe() mechanism surfaces per-micro-batch metrics in
    StreamingQueryProgress.observedMetrics — one instrumentation point
    for both runtimes."""
    from data_engineering_1_spark.streaming import pipelines as sp

    stream = sp.events_file_stream(spark, sf_dir).observe(
        "stream_metrics",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null"),
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    observed = [
        p["observedMetrics"]["stream_metrics"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("stream_metrics")
    ]
    assert observed, "no micro-batch surfaced observed metrics"
    total = sum(m["n_rows"] for m in observed)
    from data_engineering_1_spark.io import load_table

    assert total == load_table(spark, sf_dir, "events").count()
    assert all(m["n_null"] == 0 for m in observed)


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Schema evolution: files written before a column existed read as
    NULL for that column under mergeSchema — how a 100 TB table grows
    columns without rewriting history."""
    old = str(tmp_path / "evo/batch=1")
    new = str(tmp_path / "evo/batch=2")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    docs.write.parquet(old)
    docs.withColumn("quality_score", F.length("lang").cast("double")).write.parquet(new)

    merged = spark.read.option("mergeSchema", True).parquet(
        str(tmp_path / "evo")
    )
    assert "quality_score" in merged.columns
    n = docs.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("quality_score").isNull()).count() == n


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column
    must become a PartitionFilter (pruned at file listing — zero IO for
    other partitions), not a post-scan row filter."""
    root = str(tmp_path / "by_lang")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").parquet(root)

    q = spark.read.parquet(root).filter(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    partition_clause = plan.split("PartitionFilters")[1].split("]")[0]
    assert "lang" in partition_clause, plan
    exp = docs.filter(F.col("lang") == "en").count()
    assert q.count() == exp
    # the pruned read touches only the one partition directory
    files = {
        r["file"] for r in q.withColumn(
            "file", F.input_file_name()
        ).select("file").distinct().collect()
    }
    assert files and all(f"{os.sep}lang=en{os.sep}" in f for f in files)


def test_catalog_table_statistics_for_cbo(spark, sf_dir):
    """X82: warehouse catalog surface — saveAsTable + ANALYZE TABLE
    COMPUTE STATISTICS populates the table-level rowCount/size and the
    per-column min/max/ndv the cost-based optimizer consumes (join
    reorder and broadcast decisions at 100 TB run on exactly these
    numbers; a catalog without stats costs CBO its entire input)."""
    od = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS cat_orders_stats")
    od.write.mode("overwrite").saveAsTable("cat_orders_stats")
    try:
        spark.sql(
            "ANALYZE TABLE cat_orders_stats COMPUTE STATISTICS "
            "FOR COLUMNS o_custkey, o_totalprice"
        )
        table_stats = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE EXTENDED cat_orders_stats").collect()
        }
        n = od.count()
        assert f"{n} rows" in table_stats["Statistics"]
        col = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED cat_orders_stats o_custkey"
            ).collect()
        }
        lo, hi = (
            od.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
        )
        assert col["min"] == str(lo) and col["max"] == str(hi)
        assert col["num_nulls"] == "0"
        # ndv is an HLL estimate: within the sketch's documented error
        exact = od.select("o_custkey").distinct().count()
        assert abs(int(col["distinct_count"]) - exact) <= max(1, exact * 0.05)
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_orders_stats")
