"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf"}.

Each query is fully materialized through the noop sink (count() would let
Catalyst prune the projection work away and under-report). Two timed runs
per query, min taken — the second run benefits from Spark's warmed code
cache the same way a resident cluster would.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from data_engineering_1_spark.plans import registry  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    spark = get_spark("bench")
    queries = registry.get_queries()

    # warm the JVM/parquet footprint once so query 1 doesn't pay session
    # startup costs
    materialize(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")))

    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
