"""Table maintenance: key-based upsert and small-file compaction
([north-star] 100 TB operations surface; the reference's only
maintenance is full rebuild, src/vector_store.py:96-107).

Plain parquet has no transaction log, so MERGE is emulated as
read-union-dedup-rewrite with a deterministic "newest wins" rule — the
standard pre-lakehouse CDC pattern (a lakehouse format would replace the
full rewrite with log commits; the dedup semantics are identical). The
rewrite goes through a temp directory + atomic-ish swap so a failed job
never leaves the table truncated.

Compaction is the other chronic 100 TB operation: streaming sinks and
per-partition writers accrete small files until file-listing and
per-file open overhead dominate scans; rewriting to size-targeted files
restores scan efficiency. Compaction changes bytes-on-disk layout only —
row content is asserted identical by the tests.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> None:
    """MERGE-emulation: rows in ``updates`` replace existing rows with the
    same key when their ``version_col`` is newer (ties break toward the
    update); unmatched keys insert. Deterministic: survivor = max
    (version, is_update) per key."""
    if os.path.exists(path):
        current = spark.read.parquet(path).withColumn(
            "__is_update", F.lit(0)
        )
        merged = current.unionByName(
            updates.withColumn("__is_update", F.lit(1))
        )
    else:
        merged = updates.withColumn("__is_update", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("__is_update")
    )
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_update")
    )
    _rewrite(result, path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into files sized near
    ``target_file_bytes`` (computed from the table's current on-disk
    size). Returns the new file count. Row content is unchanged —
    compaction is purely a layout operation."""
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path).repartition(int(n_files))
    _rewrite(df, path)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def sort_layout(
    spark: SparkSession,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet table range-partitioned + sorted on
    ``sort_cols`` — the clustering (Z-order-lite) layout operation.

    After the rewrite each file covers a narrow, non-overlapping range
    of the leading sort column, so the parquet row-group min/max
    statistics let any engine skip whole files/row groups for selective
    predicates on those columns — the difference between reading 1/N of
    a 100 TB table and scanning it. ``repartitionByRange`` samples the
    key distribution, so files are near-equal-sized even under key skew
    (a hash layout can't give range pruning; a global sort would funnel
    through one task chain). Row content is unchanged — layout only,
    same guarantee the compaction op makes. Returns the file count.
    """
    if n_files is None:
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = (
        spark.read.parquet(path)
        .repartitionByRange(int(n_files), *sort_cols)
        .sortWithinPartitions(*sort_cols)
    )
    _rewrite(df, path)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def _zvalue(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    Morton (Z-order) key: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Pure shift/and/or expressions — whole-stage codegen,
    no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i) % 2, 2 * i).cast("bigint")
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1).cast("bigint")
        )
    return z


def zorder_layout(
    spark: SparkSession,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> int:
    """Rewrite a parquet table clustered on the Z-order (Morton) curve
    of TWO columns — the multi-dimensional generalization of
    ``sort_layout``.

    A single-column sort gives perfect file skipping on the leading
    column and none on any other; the Z-curve interleaves the bits of
    both keys so every file covers a narrow range of BOTH columns
    (~1/sqrt(n_files) of each dimension) — selective predicates on
    either column skip most files. Each column is min/max-scaled to
    ``bits`` bits with one tiny 1-row aggregate (for heavily skewed
    keys substitute quantile boundaries from approxQuantile — same
    rewrite, different bucketing). Layout-only: row content unchanged.
    Returns the file count.
    """
    df = spark.read.parquet(path)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(F.col(col_a).cast("double")),
        F.max(F.col(col_a).cast("double")),
        F.min(F.col(col_b).cast("double")),
        F.max(F.col(col_b).cast("double")),
    ).collect()[0]
    if lo_a is None or lo_b is None:
        # empty table (or all-null keys): nothing to cluster; leave the
        # layout untouched rather than rewriting to a keyless jumble
        return sum(
            1
            for _, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    top = (1 << bits) - 1

    def scaled(c: str, lo: float, hi: float) -> F.Column:
        if hi <= lo:
            return F.lit(0).cast("bigint")
        frac = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
        return F.least(
            F.floor(frac * (top + 1)).cast("bigint"), F.lit(top).cast("bigint")
        )

    z = _zvalue(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(int(n_files), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    _rewrite(out, path)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def _rewrite(df: DataFrame, path: str) -> None:
    """Write df to a temp sibling dir, then swap it into place — a reader
    racing the swap sees old-or-new, never a half-written table. (A real
    lakehouse makes this a log commit; plain parquet can only approximate
    with directory swap.)

    Crash safety of the swap itself: the old data moves to the
    DETERMINISTIC sibling ``<path>__old`` (so a crashed run's data is
    findable, not stranded under a random suffix), and a failure between
    the two renames restores the original directory before re-raising —
    the table is old-or-new after any single fault, never absent.
    """
    tmp = f"{path}__rewrite_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old"
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    moved = False
    if os.path.exists(path):
        os.rename(path, old)
        moved = True
    try:
        os.rename(tmp, path)
    except BaseException:
        if moved:
            os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
