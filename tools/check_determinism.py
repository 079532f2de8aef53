"""Determinism audit: run every declared query TWICE (fresh plans,
different shuffle-partition counts so partitioning genuinely differs)
and compare the sorted results exactly.

The oracle gate proves Spark==DuckDB on one execution; this proves
Spark==Spark across executions — the failure class it catches is
partition-order reliance (collect_list order, first/last without
ordering, unseeded randomness, float reduction order leaking past a
round) that can pass a single sampled run and then flip in a later
round.

Usage: python tools/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_engineering_1_spark.io import clear_table_cache  # noqa: E402
from data_engineering_1_spark.plans import registry  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("determinism_audit")
    queries = registry.get_queries()
    bad = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = normalize(fn(spark, sf_dir).toPandas())
            clear_table_cache()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:  # pragma: no cover
            print(f"[ERR]  {name}: {str(e)[:120]}")
            bad.append(name)
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            clear_table_cache()
        if len(a) != len(b) or list(a.columns) != list(b.columns):
            print(f"[FLAKY] {name}: shape {a.shape} vs {b.shape}")
            bad.append(name)
            continue
        eq = a.astype(str).equals(b.astype(str))
        if not eq:
            diff_cols = [
                c for c in a.columns if not a[c].astype(str).equals(b[c].astype(str))
            ]
            print(f"[FLAKY] {name}: differing cols {diff_cols}")
            bad.append(name)
        else:
            print(f"[ok]   {name}")
    print(f"\n{len(bad)} nondeterministic of {len(queries) if not only else len(only)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
