"""Distributed dense row numbering without a global sort.

[north-star] scope: the scale-safe replacement for the two classic
ID-assignment traps —

- ``monotonically_increasing_id``: unique but neither dense nor stable
  (values depend on partition layout, so two runs disagree);
- ``row_number() OVER (ORDER BY ...)`` with no partition: correct but
  single-task — the whole table flows through one executor.

``two_phase_row_number`` is the zipWithIndex idea expressed in pure
DataFrame ops: shard the data by a RANGE expression that is monotone in
the desired order, count rows per shard (combinable aggregate), turn the
tiny per-shard count relation into cumulative offsets, then broadcast the
offsets back and rank WITHIN each shard only. The only unpartitioned
window runs over the shard-count relation — ``ceil(n / shard_width)``
rows, sized so it always fits one task — never over the data.

Contract: ``shard`` must be monotone non-decreasing in ``order_cols``
within every ``prefix`` group (use integer division of the leading order
column, e.g. ``doc_id DIV 4096``). Then
``(prefix, shard, order_cols)`` ordering equals ``(prefix, order_cols)``
ordering and the emitted rank equals the single-task
``row_number() OVER (PARTITION BY prefix ORDER BY order_cols)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_row_number(
    df: DataFrame,
    shard: Column,
    order_cols: list[str],
    prefix_cols: list[str] | None = None,
    out_col: str = "rn",
) -> DataFrame:
    """Dense 1-based rank by ``(prefix_cols, order_cols)`` computed in two
    phases (per-shard counts -> shard offsets -> within-shard rank), never
    sorting the full data globally. Returns ``df`` plus ``out_col``."""
    prefix_cols = prefix_cols or []
    tagged = df.withColumn("__shard", shard)
    keys = prefix_cols + ["__shard"]
    counts = tagged.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    # Cumulative offset over the shard-count relation: ~n/shard_width
    # rows, deliberately tiny — this is the ONE unpartitioned window and
    # it never sees data rows.
    off_w = (
        Window.partitionBy(*prefix_cols).orderBy("__shard")
        if prefix_cols
        else Window.orderBy("__shard")
    )
    offsets = counts.select(
        *keys,
        (F.coalesce(
            F.sum("__cnt").over(
                off_w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )).alias("__off"),
    )
    in_shard = F.row_number().over(
        Window.partitionBy(*keys).orderBy(*order_cols)
    )
    return (
        tagged.join(F.broadcast(offsets), keys)
        .withColumn(out_col, (F.col("__off") + in_shard).cast("bigint"))
        .drop("__shard", "__off")
    )
