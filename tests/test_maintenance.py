"""Upsert (MERGE emulation) and compaction over plain parquet."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.operators.maintenance import (
    compact_parquet,
    upsert_parquet,
)


def test_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id long, v string, ver int"
    )
    base.write.parquet(path)

    updates = spark.createDataFrame(
        [
            (2, "b2", 20),   # newer version -> replaces
            (3, "c_old", 5), # OLDER version -> must NOT replace
            (4, "d", 20),    # new key -> inserts
        ],
        "id long, v string, ver int",
    )
    upsert_parquet(spark, path, updates, key_cols=["id"], version_col="ver")
    got = {
        r["id"]: (r["v"], r["ver"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}


def test_upsert_same_version_prefers_update(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, "old", 10)], "id long, v string, ver int"
    ).write.parquet(path)
    upsert_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "new", 10)], "id long, v string, ver int"),
        key_cols=["id"],
        version_col="ver",
    )
    assert spark.read.parquet(path).collect()[0]["v"] == "new"


def test_upsert_is_idempotent(spark, tmp_path):
    """Replaying the same update batch (checkpoint recovery, retried job)
    leaves the table unchanged — the CDC exactly-once property."""
    path = str(tmp_path / "tbl3")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "id long, v string, ver int"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", 2)], "id long, v string, ver int"
    )
    upsert_parquet(spark, path, updates, ["id"], "ver")
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    upsert_parquet(spark, path, updates, ["id"], "ver")
    second = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == second


def test_rewrite_swap_failure_restores_table(spark, tmp_path, monkeypatch):
    """A fault between the two swap renames must leave the table as
    old-or-new — never absent with the data stranded in a side dir."""
    from data_engineering_1_spark.operators import maintenance

    path = str(tmp_path / "tbl4")
    spark.createDataFrame(
        [(1, "a", 1)], "id long, v string, ver int"
    ).write.parquet(path)

    real_rename = os.rename

    def failing_rename(src, dst):
        if src.startswith(path + "__rewrite_"):  # the tmp -> path leg
            raise OSError("injected fault between swap renames")
        real_rename(src, dst)

    monkeypatch.setattr(maintenance.os, "rename", failing_rename)
    try:
        upsert_parquet(
            spark,
            path,
            spark.createDataFrame([(1, "b", 2)], "id long, v string, ver int"),
            ["id"],
            "ver",
        )
        raise AssertionError("injected fault did not propagate")
    except OSError:
        pass
    monkeypatch.setattr(maintenance.os, "rename", real_rename)
    # table restored with the ORIGINAL content; no stranded side dirs
    assert spark.read.parquet(path).collect()[0]["v"] == "a"
    assert glob.glob(path + "__*") == []


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    od = load_table(spark, sf_dir, "orders")
    od.repartition(40).write.parquet(path)  # fragment into 40 small files
    before_files = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before_files >= 40
    before = od.count()
    before_sum = (
        spark.read.parquet(path)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
        .collect()[0]["s"]
    )

    after_files = compact_parquet(spark, path, target_file_bytes=10**9)
    assert after_files < before_files
    assert spark.read.parquet(path).count() == before
    after_sum = (
        spark.read.parquet(path)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
        .collect()[0]["s"]
    )
    assert after_sum == before_sum
