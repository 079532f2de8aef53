"""Bucketed-table layout: pre-shuffled storage for co-located joins
(SURVEY.md §2.13 X24, [north-star] — the reference has no storage layout
tuning at all; this is pure 100 TB engineering).

A bucketed table is hash-partitioned on its bucket columns AT WRITE TIME
(``bucketBy`` + ``saveAsTable``): every file belongs to exactly one
bucket of ``hash(key) % n_buckets``. When two tables share bucket spec on
the join key, Spark's planner proves both sides are already partitioned
the way the join needs and drops the shuffle Exchange entirely — the
single biggest cost in a repeated large x large equi-join. ``sortBy``
within buckets additionally lets the sort-merge join skip its sort.

At 100 TB this is the difference between re-shuffling 100 TB per join and
reading co-located files: fact tables that join daily (orders x lineitem
on orderkey) are written bucketed once, and every downstream join is
exchange-free. The layout survives across jobs — unlike repartition(),
which only helps within one plan.

Caveats encoded here: both sides need the same bucket count (or a
divisor, with spark.sql.bucketing.coalesceBucketsInJoin.enabled); the
bucket column set must equal the join key set; and bucket pruning applies
to equality filters on the bucket column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally sorted) on ``bucket_cols``. The one-time write pays the
    shuffle that every later join on the bucket key then skips."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_tables_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables. When both are bucketed on the join key
    with compatible bucket counts, the physical plan carries no Exchange
    on either side (pinned by tests/test_bucketing.py)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)
