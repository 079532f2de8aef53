"""Determinism helpers for oracle-checked aggregates.

Floating-point sums are order-dependent; Spark's partial aggregation order
varies with partitioning, so a double SUM can differ from DuckDB's in the
last ulp and break the value-hash. Discipline (SURVEY.md §5):

  * money/quantity columns in the fixtures carry <=2 decimal places — cast
    to DECIMAL(18,2) *before* aggregating; decimal arithmetic is exact and
    order-independent, so Spark and DuckDB sums are bit-identical;
  * averages = CAST(exact decimal sum AS DOUBLE) / COUNT, rounded to 6 —
    identical inputs give identical doubles on both engines;
  * final outputs are cast to DOUBLE on both sides: the exact decimal sum
    converts to the same nearest double in both engines, and DOUBLE avoids
    any Decimal-object-vs-float representation skew in the driver's
    pandas/arrow conversion (observed: duckdb .df() renders DECIMAL as
    float64, Spark toPandas as Decimal objects).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def sum_dec(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent sum; quantized to cents, then DOUBLE.

    The DECIMAL(38,2) quantize before the double cast is a SCALE
    guard, found at 10x fixture volume: once a decimal sum's scaled
    integer exceeds 2^53 (a scale-6 money sum does at ~9e9), DuckDB's
    decimal->double conversion rounds twice (int128->double, then
    /10^scale) while Spark's BigDecimal.doubleValue rounds once — a
    1-ulp hash mismatch that only appears at volume. At scale 2 the
    scaled integer stays exact up to ~9e13, and both engines make a
    single correctly-rounded conversion. Cents precision is the money
    contract anyway."""
    return F.sum(dec(col, scale)).cast("decimal(38,2)").cast("double")


def avg6(col: Column | str, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum as double / count, round 6."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec(c, scale)).cast("double") / F.count(c), 6
    )


def count_big(col: Column | str = "*") -> Column:
    return (F.count(F.lit(1)) if col == "*" else F.count(col)).alias("n")


# Oracle-side (DuckDB) SQL fragments mirroring the helpers above.
def o_sum_dec(expr: str, scale: int = 2) -> str:
    # ROUND-to-cents before DOUBLE: see sum_dec's scale note. ROUND, not
    # a decimal cast — DuckDB's decimal downscale CAST truncates while
    # Spark's rounds HALF_UP; DuckDB ROUND() is half-away-from-zero,
    # which matches Spark's HALF_UP on both signs.
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,{scale}))), 2)"
        " AS DOUBLE)"
    )


def o_avg6(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS DOUBLE)"
    )
