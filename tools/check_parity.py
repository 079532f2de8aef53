"""Local replica of the driver's correctness gate.

Runs every declared query (Spark) and its oracle twin (DuckDB) over the
same parquet fixtures, sorts columns by name and rows by value, and
compares exactly. Use before declaring any query.

Usage:
    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_engineering_1_spark.io import TABLES  # noqa: E402
from data_engineering_1_spark.plans import registry  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_df.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s = normalize(spark_df)
    d = normalize(duck_df)
    if len(s) != len(d):
        return problems
    for col in s_cols:
        sv, dv = s[col], d[col]
        try:
            eq = (sv.isna() & dv.isna()) | (sv == dv)
        except Exception:
            eq = sv.astype(str) == dv.astype(str)
        neq = (~eq.fillna(False)).to_numpy().nonzero()[0]
        if len(neq):
            i = int(neq[0])
            problems.append(
                f"col {col!r}: {len(neq)} mismatched values; first at row {i}: "
                f"spark={sv.iloc[i]!r} ({type(sv.iloc[i]).__name__}) "
                f"duck={dv.iloc[i]!r} ({type(dv.iloc[i]).__name__})"
            )
    # dtype visibility (schema check is driver-side; surface differences)
    s_types = {c: str(spark_df[c].dtype) for c in s_cols}
    d_types = {c: str(duck_df[c].dtype) for c in d_cols}
    if s_types != d_types:
        diffs = {c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]}
        problems.append(f"dtype-diff (warn): {diffs}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # 4g result cap: the gate COLLECTS both sides to compare, and the
    # plain-stacked 10x fixture's output-bound queries (every part name
    # has 9 verbatim clones, so the ER pair emitters legitimately
    # return ~100x the rows) overflow the 1g default — a harness
    # capacity knob, not an engine property.
    spark = get_spark(
        "parity-check",
        extra_conf={"spark.driver.maxResultSize": "4g"},
    )
    con = duck_connection(sf_dir)
    queries = registry.get_queries()
    oracles = registry.get_oracles()
    failed, ok, rows_only = [], [], []
    import gc

    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        # per-query gc (the bench.py r9 discipline): a long sweep
        # accumulates py4j-referenced DataFrames whose JVM broadcasts/
        # checkpoints the ContextCleaner can only free once Python
        # drops the refs; collect each round so a 347-query sweep
        # cannot build heap pressure. (Not a cure-all: the r10 10x
        # sweep ALSO surfaced DuckDB-side oracle grinds — the naive
        # SQL twins of the graph/itemset shapes can mis-plan at 10x
        # and run for hours at full thread count; those are
        # oracle-resource limits, recorded per query in round notes.)
        gc.collect()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            print(f"[FAIL] {name}: duckdb raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = compare(name, sdf, ddf)
        hard = [p for p in problems if not p.startswith("dtype-diff")]
        if hard:
            failed.append(name)
            print(f"[FAIL] {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"       - {p}")
        else:
            ok.append(name)
            warn = "; ".join(p for p in problems if p.startswith("dtype-diff"))
            extra = f" [{warn}]" if warn else ""
            print(f"[ok]   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s){extra}")
    print(
        f"\n{len(ok)} ok, {len(failed)} failed, {len(rows_only)} rows-only "
        f"of {len(queries)} declared"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
