"""Time every DuckDB oracle twin at a given SF dir (default sf0.1).

Prints one JSON line: {"queries": {name: median_sec}, "sf_dir": ...}.
Together with bench.py (the Spark side) this records both halves of the
BASELINE.md acceptance comparison.

Usage: python tools/bench_oracle.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_engineering_1_spark.io import TABLES  # noqa: E402
from data_engineering_1_spark.plans import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, float] = {}
    for name, sql in sorted(registry.get_oracles().items()):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(sorted(times)[len(times) // 2], 4)
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "reps": reps}))


if __name__ == "__main__":
    main()
