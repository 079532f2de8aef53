"""Skew-mitigation utilities ([north-star] scale tooling, SURVEY.md §4).

AQE's skew-join splitting (on in ``session.py``) handles sort-merge skew
automatically; these helpers cover the cases AQE cannot: aggregation-key
skew (two-phase salted aggregate) and hot-key equi-joins where one side
must be replicated (salted join). Both are pure DataFrame rewrites — no
RDDs, no custom partitioners — so they compose with Catalyst/codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n: int) -> Column:
    """Uniform [0, n) salt. rand() is fine: the salt only spreads rows, it
    never reaches results."""
    return (F.rand() * n).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate for skewed grouping keys.

    Phase 1 groups by (keys + salt) — a hot key's rows spread over
    ``n_salts`` reducers instead of one straggler; phase 2 merges the
    partials per key. Only re-aggregable functions are allowed (sum,
    count, min, max — avg must be derived from sum/count by the caller).

    ``aggs`` maps column -> fn name, e.g. {"value": "sum", "*": "count"}.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not re-aggregable; use sum/count/min/max")

    phase1 = df.withColumn("__salt", _salt(n_salts)).groupBy(
        *keys, "__salt"
    )
    partials = phase1.agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(
                f"__p_{i}"
            )
            for i, (col, fn) in enumerate(aggs.items())
        ]
    )
    return partials.groupBy(*keys).agg(
        *[
            merge_fn[fn](f"__p_{i}").alias(
                f"{fn}_{col}" if col != "*" else "count"
            )
            for i, (col, fn) in enumerate(aggs.items())
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution has hot keys and
    ``small`` is modest but above the broadcast threshold.

    The skewed side gets a random salt; the small side is replicated
    ``n_salts`` times (explode), so each (key, salt) bucket joins a slice
    of the hot key's rows. Output equals the unsalted join exactly for
    the salt-safe join types (inner/left/left_semi/left_anti, where every
    output row is anchored to exactly one skewed-side row). right/full
    outer would emit each unmatched replicated small-side row ``n_salts``
    times, so they are rejected — salt the other side instead, or rely on
    AQE's skew-join splitting for sort-merge outer joins."""
    salt_safe = {"inner", "left", "left_outer", "leftouter",
                 "left_semi", "leftsemi", "semi",
                 "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in salt_safe:
        raise ValueError(
            f"salted_join does not preserve '{how}' semantics (unmatched "
            f"replicated rows would duplicate); use one of {sorted(salt_safe)}"
        )
    keys = list(on)
    salted_l = skewed.withColumn("__salt", _salt(n_salts))
    salted_r = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    out = salted_l.join(salted_r, [*keys, "__salt"], how)
    return out.drop("__salt")
