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


def test_sort_layout_gives_nonoverlapping_file_ranges(spark, sf_dir, tmp_path):
    """The clustering rewrite must produce files whose min/max ranges on
    the sort key don't overlap (checked against the actual parquet
    row-group statistics via pyarrow) — that disjointness is exactly
    what makes predicate-driven file skipping possible — while leaving
    row content untouched."""
    import pyarrow.parquet as pq

    from data_engineering_1_spark.operators.maintenance import sort_layout

    path = str(tmp_path / "clustered")
    od = load_table(spark, sf_dir, "orders")
    od.repartition(8).write.parquet(path)  # hash layout: ranges overlap
    before = od.count()

    n = sort_layout(spark, path, ["o_orderdate", "o_orderkey"], n_files=6)
    assert n >= 4  # range partitioner may merge near-empty buckets

    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"file key ranges overlap: {ranges}"

    after = spark.read.parquet(path)
    assert after.count() == before
    assert (
        after.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).collect()
        == od.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).collect()
    )


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


def test_zorder_layout_narrows_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering must give every file a narrow range of BOTH
    interleaved columns (checked against actual parquet row-group
    stats) — the multi-dim skipping a single-column sort cannot give:
    its trailing column still spans ~the full range per file."""
    import glob as _glob

    import pyarrow.parquet as pq

    from data_engineering_1_spark.operators.maintenance import (
        sort_layout,
        zorder_layout,
    )

    def file_range_fracs(path, col):
        lo_all, hi_all = None, None
        per_file = []
        for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            ci = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_file.append((min(mins), max(maxs)))
            lo_all = min(lo_all, min(mins)) if lo_all is not None else min(mins)
            hi_all = max(hi_all, max(maxs)) if hi_all is not None else max(maxs)
        span = hi_all - lo_all
        return [(hi - lo) / span for lo, hi in per_file if span > 0]

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    od.repartition(8).write.parquet(zpath)
    od.repartition(8).write.parquet(spath)
    before = od.count()

    zorder_layout(spark, zpath, "o_custkey", "o_totalprice", n_files=16)
    sort_layout(spark, spath, ["o_custkey"], n_files=16)

    z_a = file_range_fracs(zpath, "o_custkey")
    z_b = file_range_fracs(zpath, "o_totalprice")
    s_b = file_range_fracs(spath, "o_totalprice")

    # z-order: BOTH dimensions narrow (each file ~1/sqrt(16)=1/4 of a
    # dimension; allow generous slack for boundary files)
    assert sum(z_a) / len(z_a) < 0.6
    assert sum(z_b) / len(z_b) < 0.6
    # single-column sort: the non-sort column spans ~everything per file
    assert sum(s_b) / len(s_b) > 0.8

    after = spark.read.parquet(zpath)
    assert after.count() == before
    assert (
        after.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).collect()
        == od.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).collect()
    )


def test_zorder_layout_empty_table_noop(spark, tmp_path):
    from data_engineering_1_spark.operators.maintenance import zorder_layout

    path = str(tmp_path / "empty_z")
    spark.createDataFrame([], "a bigint, b double").write.parquet(path)
    before = sorted(
        f for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    n = zorder_layout(spark, path, "a", "b", n_files=4)
    after = sorted(
        f for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert after == before and n == len(before)
    assert spark.read.parquet(path).count() == 0
