"""Custom Python DataSource: partitioned scan, determinism, plan
integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.sources import pydatasource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pydatasource.register(spark)


def _read(spark, rows, partitions):
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_rowcount_schema_and_parallelism(spark):
    df = _read(spark, 1000, 8)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    assert df.rdd.getNumPartitions() == 8


def test_partitioning_is_invisible_in_results(spark):
    """Any (rows, partitions) split yields identical data — partitioning
    is pure parallelism."""
    a = _read(spark, 500, 1).orderBy("event_id").collect()
    b = _read(spark, 500, 8).orderBy("event_id").collect()
    assert a == b


def test_integrates_with_engine_plans(spark):
    """The custom source is a first-class scan node: joins, aggregates and
    pruning downstream all compose."""
    df = _read(spark, 2000, 4)
    agg = (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )
    got = {r["event_type"]: r["n"] for r in agg.collect()}
    assert set(got) == set(pydatasource.EVENT_TYPES)
    assert sum(got.values()) == 2000


def test_stream_reader_drains_and_matches_batch(spark, tmp_path):
    """The streaming leg of the custom source: micro-batches admit
    rowsPerBatch rows per trigger until exhausted; the drained stream
    equals the batch read exactly (same deterministic row function), the
    replayability contract behind checkpoint recovery."""
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 300)
        .option("rowsPerBatch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pyds_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_pyds_stream").orderBy("event_id").collect()
    exp = _read(spark, 300, 4).orderBy("event_id").collect()
    assert got == exp


def test_python_datasource_writer_roundtrip(spark, sf_dir, tmp_path):
    """X83: the WRITE side of the Python DataSource API — each task
    writes a JSON-lines part and returns a commit message; the driver
    commit writes a manifest. Content round-trips through Spark's own
    JSON reader and the manifest row count matches."""
    import json
    import os

    from data_engineering_1_spark.io import load_table
    from data_engineering_1_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "jsonl_out")
    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .limit(200)
    )
    src.write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 200
    assert manifest["files"] and all(
        os.path.exists(f) for f in manifest["files"]
    )
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 200
    got = sorted(
        (int(r["o_orderkey"]), r["o_orderstatus"]) for r in back.collect()
    )
    want = sorted(
        (r["o_orderkey"], r["o_orderstatus"]) for r in src.collect()
    )
    assert got == want


def test_python_datasource_writer_overwrite_clears_stale_parts(
    spark, sf_dir, tmp_path
):
    """mode('overwrite') must clear prior part files before the new
    write — otherwise glob readers mix old and new rows."""
    import json
    import os

    from data_engineering_1_spark.io import load_table
    from data_engineering_1_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "jsonl_ow")
    src = load_table(spark, sf_dir, "orders").select("o_orderkey")
    src.limit(200).write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    src.limit(50).write.format("jsonl_sink").option("path", out).mode(
        "overwrite"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 50
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 50  # no stale rows from the first write
