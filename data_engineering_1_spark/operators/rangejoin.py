"""Bucketed interval join — the scale-safe non-equi time join.

A naive ``l.ts BETWEEN r.ts - upper AND r.ts - lower`` join has no equi
key, so Spark plans BroadcastNestedLoopJoin (dies when neither side fits
in memory) or a cartesian product (dies always at 100 TB). The standard
fix (Flink's interval join, Databricks' range-join hints) is to quantize
time into buckets of width >= the interval span, use the bucket id as an
equi key — shuffle-partitionable, AQE-skew-splittable — and keep the real
inequality as a cheap post-join residual.

Each left row lands in ONE bucket; each right row is expanded to the
small fixed set of buckets its window can reach (ceil(span/width)+1 ≤ 3
for width >= span), so the blow-up factor is bounded and chosen, not
data-dependent.

Reference has no such operator ([north-star], SURVEY.md §2.6 J5) — this
generalizes the J5 theta join to fact×fact scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_width_s: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``on`` where
    ``right_ts in [left_ts + lower_s, left_ts + upper_s]`` (seconds).

    The equi keys are ``(on, time_bucket)``: the left row's bucket is
    ``floor(epoch/width)``; the right row is exploded to every bucket the
    reachable window ``[right_ts - upper_s, right_ts - lower_s]`` covers.
    With the default ``bucket_width_s = upper_s - lower_s`` the fan-out is
    at most 2 buckets per right row. Only inner joins are supported (an
    outer interval join needs a post-pass to restore unmatched rows).
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    span = upper_s - lower_s
    if span < 0:
        raise ValueError("upper_s must be >= lower_s")
    width = bucket_width_s or max(span, 1)

    def _bucket(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / F.lit(width))

    lb = left.withColumn("__bucket", _bucket(F.col(left_ts)))
    # right row reaches left rows with left_ts in [right_ts-upper, right_ts-lower]
    lo_b = _bucket(F.col(right_ts) - F.expr(f"INTERVAL {upper_s} SECOND"))
    hi_b = _bucket(F.col(right_ts) - F.expr(f"INTERVAL {lower_s} SECOND"))
    rb = right.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    residual = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    joined = lb.join(rb, [on, "__bucket"]).filter(residual)
    return joined.drop("__bucket")
