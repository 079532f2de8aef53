"""Deterministic sampling & splitting — training-pipeline primitives.

[north-star] scope (the reference has no sampling); the shapes a 100 TB
corpus pipeline actually needs:

- ``hash_sample``: keep a row iff a hash of its KEY lands under the
  fraction cutoff. Unlike ``df.sample()`` this is (a) reproducible
  across runs/engines/partitionings — the decision is a pure function
  of the key, not of RNG state per partition — and (b) consistent
  across tables: sampling orders and lineitem by the same order key
  yields referentially-intact subsets. It's a narrow per-row filter:
  no shuffle, fully pushdown-friendly, and composes with partition
  pruning.
- ``train_test_split``: the same hash assigns every row a stable split
  label — new data lands in the same split tomorrow (the property that
  prevents train/test leakage when the corpus grows).
- ``stratified_sample_exact``: exactly n rows per stratum by a
  deterministic order — one window shuffle on the stratum key. For
  "fraction per stratum" at scale prefer ``hash_sample`` keyed on the
  stratum+id instead (no global sort per group).

Portability: the hash is the first-8-hex-chars-of-md5 bridge used by
the simhash/minhash pipeline (operators/dedup.py) — Spark
``conv(substring(md5(x),1,8),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,8))::BIGINT`` — so every sampling decision is
oracle-checkable. md5 on a short key is ~100 ns/row, vectorized
JVM-side; it will never be the bottleneck of a scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000  # fraction resolution: 0.01%


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5 of salt|key."""
    key_col = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws("|", F.lit(salt), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, key: str, salt: str = ""
) -> DataFrame:
    """~fraction of rows, chosen by key hash. Change ``salt`` to draw an
    independent sample; keep it fixed to get the same rows forever."""
    return df.filter(hash_bucket(key, salt) < int(fraction * BUCKETS))


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Adds a stable 'train'/'test'(/'val') label column keyed on
    ``key``'s hash. Rows keep their split across runs and across corpus
    growth — the anti-leakage property random splits don't have."""
    b = hash_bucket(key, salt)
    test_hi = int(test_fraction * BUCKETS)
    val_hi = test_hi + int(val_fraction * BUCKETS)
    label = F.when(b < test_hi, "test")
    if val_fraction > 0:
        label = label.when(b < val_hi, "val")
    return df.withColumn(out_col, label.otherwise("train"))


def stratified_sample_exact(
    df: DataFrame,
    strata: str,
    n_per_stratum: int,
    order_by: list[str],
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, deterministically
    first by ``order_by``. One shuffle on the stratum key; rank is a
    running window, so no per-group global sort materializes more than
    the stratum's partition."""
    w = Window.partitionBy(strata).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
